"""Distributed 2-D skyline (Pareto front) — maximize both dimensions.

A row is ON the skyline iff no other row is ≥ in both dimensions and
strictly > in at least one. The naive formulation is an O(n²)
dominance self-join; the distributed plan here is the textbook
two-stage prune:

1. **Local prune** (``mapInPandas``, zero shuffle): each input
   partition computes ITS OWN exact skyline with the sorted sweep —
   sort by (x desc, y desc), a point survives iff its x-group's max y
   strictly exceeds the running max y of all strictly-greater-x
   groups. Any point dominated within a partition is dominated
   globally, so dropping it is safe — and that stays true per ARROW
   BATCH (a batch is just a finer partition), so the local stage
   sweeps batches independently, never buffering a partition. At
   corpus scale this collapses billions of rows to (roughly) the
   union of per-partition fronts — tiny, because a random partition's
   front is O(log n) in expectation for independent dimensions.
2. **Global exact skyline**: centralize the candidates into ONE task
   (a single-partition exchange over the pruned set only — never the
   input) and sweep the candidate UNION. Here per-batch sweeping
   would be WRONG — a candidate dominated only by a point in another
   Arrow batch would survive — so the global stage concatenates its
   iterator before the one final sweep; the buffered set is the
   pruned candidates, bounded as below. If the candidate set ever
   outgrew one task (it is O(partitions × per-partition front)), the
   conservative per-batch prune composes as a tree reduction —
   repartition to k, prune, repeat — before the final exact pass.

Both stages are set-deterministic: the output is exactly the skyline
of the input regardless of partitioning or batch boundaries, so a
DuckDB ``NOT EXISTS`` dominance oracle matches row-for-row. Ties are
points, not bugs — coordinate-duplicate rows of an undominated point
are ALL on the front (dominance requires a strict inequality).

Input contract: finite, non-null coordinates. NULL/NaN dominance is
three-valued-logic quicksand (SQL's NOT EXISTS keeps every NULL row
as vacuously undominated; pandas comparisons drop them) — callers
gate nullable metrics before calling, as the supplier query's decimal
sums do by construction.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def _local_front(pdf: pd.DataFrame, x: str, y: str) -> pd.DataFrame:
    """Exact skyline of one pandas chunk via the sorted sweep."""
    if pdf.empty:
        return pdf
    pdf = pdf.sort_values([x, y], ascending=[False, False], kind="mergesort")
    grp_max_y = pdf.groupby(x, sort=False)[y].transform("max")
    # running strict-prefix max of y over greater-x groups: shift the
    # per-group cummax by one GROUP (first row of each x-group carries
    # the max over all previous groups).
    lvl_max = pdf.groupby(x, sort=False)[y].max()  # x desc order kept
    prefix = lvl_max.cummax().shift(1)  # NaN for the largest x
    prefix_per_row = pdf[x].map(prefix)
    keep = (pdf[y] == grp_max_y) & (
        prefix_per_row.isna() | (grp_max_y > prefix_per_row)
    )
    return pdf[keep]


def skyline_2d(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Skyline of ``df`` maximizing ``(x_col, y_col)``; keeps all columns."""
    schema = df.schema

    def prune_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # conservative: per-batch fronts only DROP dominated rows, so
        # streaming batch-by-batch (no buffering) is safe here
        for pdf in it:
            out = _local_front(pdf, x_col, y_col)
            if not out.empty:
                yield out

    def prune_all(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # exact: the FINAL front needs cross-batch dominance, so the
        # (already-pruned, bounded) candidate set concatenates before
        # the one sweep — per-batch sweeping here would leak points
        # dominated only by another batch
        batches = [pdf for pdf in it if not pdf.empty]
        if not batches:
            return
        out = _local_front(pd.concat(batches, ignore_index=True), x_col, y_col)
        if not out.empty:
            yield out

    cand = df.mapInPandas(prune_batches, schema)
    # Global stage: the front of the candidate UNION is the global
    # front — one lineage, no second scan of the input, no dominance
    # join.
    return cand.repartition(1).mapInPandas(prune_all, schema)
