"""Round-20 staged oracle SQL — validated, NOT registered.

The round-20 slate of five, pre-built in round 17 (r18 slate staged in
``tools/r18_staged_oracles.py``, r19 in ``tools/r19_staged_oracles.py``):

- ``ref_ulcer_index`` (risk.ulcer_index) — root-mean-square drawdown:
  depth × duration retracement risk next to calmar's worst case; one
  correctly-rounded sqrt on an integer-derived double.
- ``ana_theil_index`` (skew.theil_inequality) — the DECOMPOSABLE
  inequality scalar beside gini_concentration, exact micro-nats on
  the customer-revenue relation (the kl cell discipline).
- ``llm_local_clustering`` (graph.local_clustering) — per-node local
  clustering coefficient of the MinHash-LSH candidate graph: which
  docs sit in closed duplicate cliques vs boilerplate hubs.
- ``llm_term_burstiness`` (text.term_burstiness) — per-term
  variance-to-mean ratio (zeros included), pure-integer VMR ppm:
  topical vs templated frequency.
- ``stream_mood_median`` — the 9th streaming twin: Mood's median test
  (r18 batch slate) over ``_drained_counts_monitor`` (oracle = the
  batch MOOD_SQL verbatim, stream==batch).

Run this module to re-verify the cross-engine match at sf0.001 and
sf0.01 before lifting into @register entries. At round-20 start:
apply that round's rotation, keep the window pin math, register.

Usage: python tools/r20_staged_oracles.py
"""

import math
import sys

sys.path.insert(0, "/root/repo")
import duckdb
from pyspark.sql import SparkSession

ULCER_SQL = """
SELECT stock_ticker, n_obs, msdd_ppm2, ulcer_ppm
FROM (
  WITH base AS (
    SELECT stock_ticker AS e, stock_date AS d,
           CAST(ROUND(stock_close * 100) AS BIGINT) AS vc
    FROM stock_prices
    WHERE stock_close IS NOT NULL AND stock_date IS NOT NULL),
  dd AS (
    SELECT e,
           ((CAST(MAX(vc) OVER (PARTITION BY e ORDER BY d
                                ROWS UNBOUNDED PRECEDING) AS HUGEINT)
             - vc) * 1000000)
           // MAX(vc) OVER (PARTITION BY e ORDER BY d
                            ROWS UNBOUNDED PRECEDING) AS dd_ppm
    FROM base),
  agg AS (
    SELECT e, CAST(COUNT(*) AS BIGINT) AS n_obs,
           SUM(CAST(dd_ppm AS HUGEINT) * dd_ppm) AS sq
    FROM dd GROUP BY e)
  SELECT e AS stock_ticker, n_obs,
         CAST(sq // n_obs AS BIGINT) AS msdd_ppm2,
         CAST(floor(sqrt(CAST(sq // n_obs AS BIGINT)) + 0.5) AS BIGINT)
           AS ulcer_ppm
  FROM agg)
"""

THEIL_SQL = """
WITH per_cust AS (
  SELECT o_custkey,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                       AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS rev_mu
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY o_custkey),
x AS (SELECT rev_mu AS x FROM per_cust WHERE rev_mu > 0),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s
        FROM x),
cells AS (
  SELECT n, s,
         CAST(floor((CAST(x AS DOUBLE) / s)
              * ln((CAST(x AS DOUBLE) * n) / s) * 1000000 + 0.5)
              AS BIGINT) AS tc
  FROM x CROSS JOIN tot)
SELECT n AS n_units, s AS total_value,
       CAST(SUM(tc) AS BIGINT) AS theil_micro
FROM cells GROUP BY n, s
"""

BURST_SQL = """
WITH base AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS d FROM base),
cells AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS c FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM base)
  WHERE term != '' GROUP BY doc_id, term),
per_term AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS n_docs_with,
         CAST(SUM(c) AS BIGINT) AS s,
         SUM(CAST(c AS HUGEINT) * c) AS q
  FROM cells GROUP BY term)
SELECT term, n_docs_with, s AS total_count,
       CAST(((CAST(d AS HUGEINT) * q - CAST(s AS HUGEINT) * s) * 1000000)
            // (CAST(d AS HUGEINT) * s) AS BIGINT) AS vmr_micro
FROM per_term CROSS JOIN tot
WHERE s >= 5
"""


def localcc_sql() -> str:
    from utn_dataengineering_stockmarketpipeline_spark.plans.queries_llm import (
        _BANDED_CTE,
    )

    return f"""
WITH {_BANDED_CTE.strip()},
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
    SELECT id_a AS node FROM pairs UNION ALL SELECT id_b FROM pairs)
  GROUP BY node),
tri AS (
  SELECT e1.id_a AS x, e1.id_b AS y, e2.id_b AS z
  FROM pairs e1
  JOIN pairs e2 ON e2.id_a = e1.id_b
  JOIN pairs e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b),
tric AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri FROM (
    SELECT x AS node FROM tri
    UNION ALL SELECT y FROM tri
    UNION ALL SELECT z FROM tri)
  GROUP BY node)
SELECT deg.node, deg.deg,
       CAST(COALESCE(tric.n_tri, 0) AS BIGINT) AS n_tri,
       (CAST(COALESCE(tric.n_tri, 0) AS BIGINT) * 2000000)
         // (deg.deg * (deg.deg - 1)) AS local_cc_ppm
FROM deg LEFT JOIN tric USING (node)
WHERE deg.deg >= 2
"""


def canon(v):
    if v is None:
        return "x"
    if isinstance(v, float):
        return "nan" if math.isnan(v) else f"{v:.12g}"
    return str(v)


def main() -> None:
    from pyspark.sql import functions as F

    from utn_dataengineering_stockmarketpipeline_spark.operators import (
        dedup,
        graph,
        risk,
        skew,
    )
    from utn_dataengineering_stockmarketpipeline_spark.operators import (
        text as text_ops,
    )
    from utn_dataengineering_stockmarketpipeline_spark.plans.queries_llm import (
        _BANDS,
        _NUM_PERMS,
    )
    from utn_dataengineering_stockmarketpipeline_spark.plans.queries_streaming import (
        _drained_counts_monitor,
    )
    from utn_dataengineering_stockmarketpipeline_spark.plans.reference_tables import (
        stock_prices,
        with_reference_ctes,
    )
    from utn_dataengineering_stockmarketpipeline_spark.sources.parquet import (
        load_table,
    )

    spark = SparkSession.builder.master("local[8]").getOrCreate()

    def per_cust_revenue(sf):
        li = load_table(spark, sf, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        )
        o = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey")
        rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
            "decimal(18,6)"
        )
        return (
            li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .groupBy("o_custkey")
            .agg(
                (F.sum(rev) * 1000000).cast("bigint").alias("rev_mu")
            )
        )

    ok = True
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        con = duckdb.connect()
        for t in ("region nation customer supplier part orders lineitem "
                  "events documents embeddings").split():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'"
            )
        docs = load_table(spark, sf, "documents")
        cases = [
            ("ulcer_index",
             risk.ulcer_index(stock_prices(spark, sf)),
             with_reference_ctes(ULCER_SQL)),
            ("theil_index",
             skew.theil_inequality(per_cust_revenue(sf), "rev_mu"),
             THEIL_SQL),
            ("local_clustering",
             graph.local_clustering(
                 dedup.minhash_candidates(
                     docs, num_perms=_NUM_PERMS, bands=_BANDS)),
             localcc_sql()),
            ("term_burstiness",
             text_ops.term_burstiness(docs),
             BURST_SQL),
            ("stream_mood_median",
             _drained_counts_monitor(
                 spark, sf, skew.mood_median_from_counts, "moodstream_"),
             None),  # oracle = r18 MOOD_SQL verbatim, imported below
        ]
        from tools.r18_staged_oracles import MOOD_SQL

        cases[-1] = (cases[-1][0], cases[-1][1], MOOD_SQL)
        for name, df, sql in cases:
            a = sorted(
                tuple(canon(r[c]) for c in sorted(df.columns))
                for r in df.collect()
            )
            cur = con.execute(sql)
            desc = [d[0] for d in cur.description]
            order = sorted(range(len(desc)), key=lambda i: desc[i])
            b = sorted(
                tuple(canon(row[i]) for i in order)
                for row in cur.fetchall()
            )
            if a != b:
                ok = False
                print(name, sf, "MISMATCH", "spark:", a[:2], "duck:", b[:2])
            else:
                print(name, sf, "MATCH", len(a), "rows")
    print("ALL MATCH" if ok else "FAILURES")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
