"""Round-19 staged oracle SQL — validated, NOT registered.

The round-19 slate of five, pre-built in round 17 (the r17 slate was
registered at r17 start; the r18 slate stays staged in
``tools/r18_staged_oracles.py``):

- ``ref_calmar_ratio`` (risk.calmar_ratio) — the drawdown-denominated
  risk-adjusted return: pure-integer total-return-over-max-drawdown on
  the cent series (sharpe/sortino/omega's fourth sibling).
- ``ana_cvm_drift`` (skew.cvm_drift) — two-sample Cramér-von Mises per
  group vs rest: the L2 CDF-gap member next to KS's L∞ max, on the
  shared counts grid.
- ``stream_cvm_drift`` — its streaming twin over
  ``_drained_counts_monitor`` (oracle = the batch SQL verbatim; would
  be the 8th streaming twin).
- ``ana_degree_assortativity`` (graph.degree_assortativity) — Newman
  degree assortativity of the customer→supplier order graph in signed
  ppm: the structural scalar read before paying for the iterative
  graph family.
- ``llm_source_vocab_overlap`` (text.source_vocab_overlap) — pairwise
  source vocabulary Jaccard in exact ppm: the source-granularity twin
  of the document dedup family (merge near-identical feeds first).

Run this module to re-verify the cross-engine match at sf0.001 and
sf0.01 before lifting into @register entries. At round-19 start:
apply that round's rotation, keep _WINDOW_PIN = 45, register.

Usage: python tools/r19_staged_oracles.py
"""

import math
import sys

sys.path.insert(0, "/root/repo")
import duckdb
from pyspark.sql import SparkSession

CALMAR_SQL = """
SELECT stock_ticker, n_obs, total_ret_ppm, max_dd_ppm, calmar_ppm
FROM (
  WITH base AS (
    SELECT stock_ticker AS e, stock_date AS d,
           CAST(ROUND(stock_close * 100) AS BIGINT) AS vc
    FROM stock_prices
    WHERE stock_close IS NOT NULL AND stock_date IS NOT NULL),
  dd AS (
    SELECT e, d, vc,
           ((CAST(MAX(vc) OVER (PARTITION BY e ORDER BY d
                                ROWS UNBOUNDED PRECEDING) AS HUGEINT)
             - vc) * 1000000)
           // MAX(vc) OVER (PARTITION BY e ORDER BY d
                            ROWS UNBOUNDED PRECEDING) AS dd_ppm
    FROM base),
  agg AS (
    SELECT e, CAST(COUNT(*) AS BIGINT) AS n_obs,
           CAST(MAX(dd_ppm) AS BIGINT) AS max_dd_ppm,
           arg_min(vc, d) AS vc_first, arg_max(vc, d) AS vc_last
    FROM dd GROUP BY e)
  SELECT e AS stock_ticker, n_obs,
         CAST(((CAST(vc_last AS HUGEINT) - vc_first) * 1000000)
              // vc_first AS BIGINT) AS total_ret_ppm,
         max_dd_ppm,
         CAST((((CAST(vc_last AS HUGEINT) - vc_first) * 1000000
                // vc_first) * 1000000) // max_dd_ppm AS BIGINT)
           AS calmar_ppm
  FROM agg WHERE max_dd_ppm > 0)
"""

CVM_SQL = """
WITH counts AS (
  SELECT source, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c
  FROM documents
  WHERE source IS NOT NULL AND n_chars IS NOT NULL
  GROUP BY source, n_chars),
vals AS (
  SELECT v, v_cnt, SUM(v_cnt) OVER (ORDER BY v) AS cum_all
  FROM (SELECT v, CAST(SUM(c) AS BIGINT) AS v_cnt FROM counts GROUP BY v)),
groups AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS n_g FROM counts GROUP BY source),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM counts),
grid AS (
  SELECT g.source, g.n_g, t.n, v.v, v.v_cnt, v.cum_all,
         COALESCE(c.c, 0) AS g_c
  FROM groups g CROSS JOIN tot t CROSS JOIN vals v
  LEFT JOIN counts c ON c.source = g.source AND c.v = v.v),
cums AS (
  SELECT source, n_g, n, v_cnt, cum_all,
         SUM(g_c) OVER (PARTITION BY source ORDER BY v) AS cum_g
  FROM grid),
dev AS (
  SELECT source, n_g, n,
         CAST(v_cnt AS HUGEINT)
         * (CAST(cum_g AS HUGEINT) * (n - n_g)
            - CAST(cum_all - cum_g AS HUGEINT) * n_g)
         * (CAST(cum_g AS HUGEINT) * (n - n_g)
            - CAST(cum_all - cum_g AS HUGEINT) * n_g) AS tm
  FROM cums)
SELECT source, n_g AS n_docs,
       CAST((SUM(tm) * 1000000)
            // (CAST(n AS HUGEINT) * n * n_g * (n - n_g))
            AS BIGINT) AS t_micro,
       CAST((SUM(tm) * 1000000)
            // (CAST(n AS HUGEINT) * n_g * n_g * (n - n_g) * (n - n_g))
            AS BIGINT) AS msq_gap_ppm
FROM dev
WHERE n_g < n
GROUP BY source, n_g, n
"""

ASSORT_SQL = """
WITH edges AS (
  SELECT DISTINCT 'C' || o_custkey AS src, 'S' || l_suppkey AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
outd AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS x FROM edges GROUP BY src),
ind AS (SELECT dst, CAST(COUNT(*) AS BIGINT) AS y FROM edges GROUP BY dst),
xy AS (SELECT x, y FROM edges JOIN outd USING (src) JOIN ind USING (dst)),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
         SUM(CAST(x AS HUGEINT) * y) AS sxy,
         SUM(CAST(x AS HUGEINT) * x) AS sxx,
         SUM(CAST(y AS HUGEINT) * y) AS syy
  FROM xy)
SELECT n AS n_edges,
       CAST(floor((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
             * 1000000 + 0.5) AS BIGINT) AS r_ppm
FROM m
WHERE n >= 2
  AND CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0
  AND CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy > 0
"""

VOCAB_SQL = """
WITH sets AS (
  SELECT DISTINCT g, term FROM (
    SELECT source AS g, unnest(string_split(text, ' ')) AS term
    FROM documents WHERE source IS NOT NULL)
  WHERE term != ''),
sizes AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n_terms FROM sets GROUP BY g),
shared AS (
  SELECT a.g AS source_a, b.g AS source_b,
         CAST(COUNT(*) AS BIGINT) AS n_shared
  FROM sets a JOIN sets b ON a.term = b.term AND a.g < b.g
  GROUP BY a.g, b.g)
SELECT source_a, source_b, sa.n_terms AS n_terms_a,
       sb.n_terms AS n_terms_b, n_shared,
       CAST((CAST(n_shared AS HUGEINT) * 1000000)
            // (sa.n_terms + sb.n_terms - n_shared) AS BIGINT)
         AS jaccard_ppm
FROM shared
JOIN sizes sa ON sa.g = source_a
JOIN sizes sb ON sb.g = source_b
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
        graph,
        risk,
        skew,
    )
    from utn_dataengineering_stockmarketpipeline_spark.operators import (
        text as text_ops,
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

    def order_edges(sf):
        li = load_table(spark, sf, "lineitem").select(
            "l_orderkey", "l_suppkey"
        )
        o = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey")
        return (
            li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .select(
                F.concat(F.lit("C"), F.col("o_custkey").cast("string"))
                .alias("src"),
                F.concat(F.lit("S"), F.col("l_suppkey").cast("string"))
                .alias("dst"),
            )
            .distinct()
        )

    ok = True
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        con = duckdb.connect()
        for t in ("region nation customer supplier part orders lineitem "
                  "events documents embeddings").split():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'"
            )
        cases = [
            ("calmar_ratio",
             risk.calmar_ratio(stock_prices(spark, sf)),
             with_reference_ctes(CALMAR_SQL)),
            ("cvm_drift",
             skew.cvm_drift(
                 load_table(spark, sf, "documents"), "n_chars", "source"),
             CVM_SQL),
            ("stream_cvm_drift",
             _drained_counts_monitor(
                 spark, sf, skew.cvm_from_counts, "cvmstream_"),
             CVM_SQL),
            ("degree_assortativity",
             graph.degree_assortativity(order_edges(sf)),
             ASSORT_SQL),
            ("source_vocab_overlap",
             text_ops.source_vocab_overlap(
                 load_table(spark, sf, "documents")),
             VOCAB_SQL),
        ]
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
