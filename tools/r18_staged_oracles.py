"""Round-18 staged oracle SQL — validated, NOT registered.

Cross-engine-validated DuckDB oracle drafts for the five operators
pre-built in round 16 and awaiting their round-18 catalog slots (the
round-17 window budget is already committed to the five operators in
tools/r17_staged_oracles.py):

- ``ref_sortino_ratio``  (risk.sortino_ratio — downside-semideviation
  Sharpe companion, pinned-association doubles)
- ``ref_omega_ratio``    (risk.omega_ratio — gain/loss mass ratio,
  PURE INTEGER end to end)
- ``ana_mood_median``    (skew.mood_median_drift — K-group median
  test on the shared counts grid; the outlier-resistant gate beside
  Kruskal-Wallis)
- ``ana_ppr_suppliers``  (graph.personalized_pagerank — teleport mass
  on a customer seed segment; oracle unrolls 10 iterations)
- ``llm_heaps_law``      (text.heaps_law — vocabulary saturation
  curve over id-range ingest buckets)

Each MATCHES its Spark operator under the strict canonicalizer at
sf0.001 and sf0.01 (run this module to re-verify). At round-18 start:
apply the r18 rotation, then lift these into @register(...) entries
(ref_* via with_reference_ctes, the others as-is) and re-pin
_WINDOW_PIN to 50 - planned.

Usage: python tools/r18_staged_oracles.py
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import duckdb
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

_RETS_CTE = """rets AS (
    SELECT stock_ticker,
           CAST(ROUND((stock_close / LAG(stock_close) OVER (
                         PARTITION BY stock_ticker ORDER BY stock_date)
                       - 1) * 1e6) AS BIGINT) AS ret_ppm
    FROM stock_prices)"""

SORTINO_SQL = f"""
SELECT stock_ticker, n_days,
       ROUND(mean_raw, 6) AS mean_ppm,
       ROUND(dd_raw, 6) AS downside_ppm,
       ROUND((mean_raw / dd_raw) * SQRT(252.0), 6) AS sortino_ann
FROM (
  WITH {_RETS_CTE},
  agg AS (
    SELECT stock_ticker, CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(ret_ppm) AS DOUBLE) AS s,
           CAST(SUM(CASE WHEN ret_ppm < 0 THEN ret_ppm * ret_ppm
                         ELSE 0 END) AS DOUBLE) AS qd
    FROM rets WHERE ret_ppm IS NOT NULL
    GROUP BY stock_ticker)
  SELECT stock_ticker, n_days,
         s / n_days AS mean_raw,
         SQRT(qd / n_days) AS dd_raw
  FROM agg WHERE n_days >= 2 AND qd > 0)
"""

OMEGA_SQL = f"""
SELECT stock_ticker, n_days, gain_ppm_sum, loss_ppm_sum, omega_ppm
FROM (
  WITH {_RETS_CTE},
  agg AS (
    SELECT stock_ticker, CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(CASE WHEN ret_ppm > 0 THEN ret_ppm ELSE 0 END)
                AS BIGINT) AS gain_ppm_sum,
           CAST(SUM(CASE WHEN ret_ppm < 0 THEN -ret_ppm ELSE 0 END)
                AS BIGINT) AS loss_ppm_sum
    FROM rets WHERE ret_ppm IS NOT NULL
    GROUP BY stock_ticker)
  SELECT stock_ticker, n_days, gain_ppm_sum, loss_ppm_sum,
         CAST((CAST(gain_ppm_sum AS HUGEINT) * 1000000) // loss_ppm_sum
              AS BIGINT) AS omega_ppm
  FROM agg WHERE loss_ppm_sum > 0)
"""

MOOD_SQL = """
WITH counts AS (
  SELECT source, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c
  FROM documents
  WHERE source IS NOT NULL AND n_chars IS NOT NULL
  GROUP BY source, n_chars),
vals AS (SELECT v, CAST(SUM(c) AS BIGINT) AS v_cnt FROM counts GROUP BY v),
cum AS (SELECT v, v_cnt, SUM(v_cnt) OVER (ORDER BY v) AS cum FROM vals),
tot AS (SELECT CAST(SUM(v_cnt) AS BIGINT) AS n,
               (CAST(SUM(v_cnt) AS BIGINT) + 1) // 2 AS tgt FROM vals),
med AS (SELECT MIN(v) AS grand_median
        FROM cum CROSS JOIN tot WHERE cum >= tgt),
per_g AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS n_g,
         CAST(SUM(CASE WHEN v > m.grand_median THEN c ELSE 0 END)
              AS BIGINT) AS a_g
  FROM counts CROSS JOIN med m GROUP BY source),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
         CAST(SUM(n_g) AS BIGINT) AS n_obs,
         CAST(SUM(a_g) AS BIGINT) AS n_above
  FROM per_g),
terms AS (
  SELECT SUM(((CAST(a_g AS HUGEINT) * s.n_obs
               - CAST(n_g AS HUGEINT) * s.n_above)
              * (CAST(a_g AS HUGEINT) * s.n_obs
                 - CAST(n_g AS HUGEINT) * s.n_above)
              * 1000000) // n_g) AS ssum
  FROM per_g CROSS JOIN stats s)
SELECT s.n_groups, s.n_obs, m.grand_median, s.n_above,
       CAST(t.ssum // (CAST(s.n_above AS HUGEINT)
                       * (s.n_obs - s.n_above)) AS BIGINT) AS chi2_micro
FROM stats s CROSS JOIN med m CROSS JOIN terms t
WHERE s.n_above > 0 AND s.n_above < s.n_obs
"""

HEAPS_SQL = """
WITH bounds AS (
  SELECT MIN(doc_id) AS lo,
         (MAX(doc_id) - MIN(doc_id) + 16) // 16 AS span
  FROM documents),
b AS (
  SELECT (d.doc_id - bo.lo) // bo.span AS bucket,
         list_filter(string_split(d.text, ' '), t -> t != '') AS toks
  FROM documents d CROSS JOIN bounds bo),
per_bucket AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(toks)) AS BIGINT) AS n_tokens
  FROM b GROUP BY bucket),
fb AS (
  SELECT term, MIN(bucket) AS fbk
  FROM (SELECT bucket, unnest(toks) AS term FROM b)
  GROUP BY term),
newt AS (SELECT fbk AS bucket, CAST(COUNT(*) AS BIGINT) AS new_terms
         FROM fb GROUP BY fbk)
SELECT CAST(p.bucket AS INT) AS bucket,
       CAST(SUM(p.n_docs) OVER w AS BIGINT) AS n_docs_cum,
       CAST(SUM(p.n_tokens) OVER w AS BIGINT) AS n_tokens_cum,
       CAST(SUM(COALESCE(nt.new_terms, 0)) OVER w AS BIGINT) AS n_terms_cum
FROM per_bucket p LEFT JOIN newt nt ON nt.bucket = p.bucket
WINDOW w AS (ORDER BY p.bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def ppr_oracle_sql(iters: int = 10) -> str:
    """Unrolled personalized PageRank over the customer->supplier
    order graph, teleporting to the c_custkey < 100 customer segment —
    the _pagerank_oracle structure with the teleport/init vector on a
    MATERIALIZED base relation (referenced every round). Float parity:
    (1.0 - 0.85) / s and 1.0 / s are single double expressions in both
    engines; summation-order drift stays inside the final ROUND 9."""
    ctes = ["""edges AS MATERIALIZED (
  SELECT DISTINCT 'C' || o_custkey AS src, 'S' || l_suppkey AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
nodes AS MATERIALIZED (
  SELECT src AS node FROM edges UNION SELECT dst FROM edges),
sd AS MATERIALIZED (
  SELECT DISTINCT 'C' || c_custkey AS node FROM customer
  WHERE c_custkey < 100
  INTERSECT SELECT node FROM nodes),
ss AS (SELECT COUNT(*) AS s FROM sd),
outdeg AS MATERIALIZED (
  SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
base AS MATERIALIZED (
  SELECT n.node,
         CASE WHEN sd.node IS NOT NULL THEN (1.0 - 0.85) / ss.s
              ELSE 0.0 END AS tele,
         CASE WHEN sd.node IS NOT NULL THEN 1.0 / ss.s
              ELSE 0.0 END AS r0
  FROM nodes n CROSS JOIN ss LEFT JOIN sd ON sd.node = n.node),
r0 AS (SELECT node, r0 AS rank FROM base)"""]
    for k in range(1, iters + 1):
        ctes.append(f"""r{k} AS (
  SELECT b.node, b.tele + 0.85 * COALESCE(c.inflow, 0.0) AS rank
  FROM base b
  LEFT JOIN (
    SELECT e.dst, SUM(r.rank / o.outdeg) AS inflow
    FROM edges e
    JOIN r{k - 1} r ON e.src = r.node
    JOIN outdeg o ON o.src = e.src
    GROUP BY e.dst) c ON c.dst = b.node)""")
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node, ROUND(rank, 9) AS rank FROM r{iters}"
    )


def spark_ppr(spark, sf_dir):
    """Staged Spark build for ana_ppr_suppliers (the pagerank edge and
    seed construction the registration would use)."""
    from utn_dataengineering_stockmarketpipeline_spark.operators.graph import (
        personalized_pagerank,
    )
    from utn_dataengineering_stockmarketpipeline_spark.sources.parquet import (
        load_table,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            F.concat(F.lit("C"), F.col("o_custkey").cast("string"))
            .alias("src"),
            F.concat(F.lit("S"), F.col("l_suppkey").cast("string"))
            .alias("dst"),
        )
        .distinct()
    )
    seeds = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 100)
        .select(
            F.concat(F.lit("C"), F.col("c_custkey").cast("string"))
            .alias("node")
        )
    )
    pr = personalized_pagerank(edges, seeds, iters=10)
    return pr.select("node", F.round("rank", 9).alias("rank"))


def canon(v):
    if v is None:
        return "x"
    if isinstance(v, float):
        return "nan" if math.isnan(v) else f"{v:.12g}"
    return str(v)


def main() -> None:
    from utn_dataengineering_stockmarketpipeline_spark.operators import (
        risk,
        skew,
        text,
    )
    from utn_dataengineering_stockmarketpipeline_spark.plans.reference_tables import (
        stock_prices,
        with_reference_ctes,
    )
    from utn_dataengineering_stockmarketpipeline_spark.sources.parquet import (
        load_table,
    )

    spark = SparkSession.builder.master("local[8]").getOrCreate()
    ok = True
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        con = duckdb.connect()
        for t in ("region nation customer supplier part orders lineitem "
                  "events documents embeddings").split():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'"
            )
        sp = stock_prices(spark, sf)
        docs = load_table(spark, sf, "documents")
        cases = [
            ("sortino", risk.sortino_ratio(risk.returns_ppm(sp)),
             with_reference_ctes(SORTINO_SQL)),
            ("omega", risk.omega_ratio(risk.returns_ppm(sp)),
             with_reference_ctes(OMEGA_SQL)),
            ("mood_median",
             skew.mood_median_drift(docs, value_col="n_chars",
                                    group_col="source"),
             MOOD_SQL),
            ("heaps_law", text.heaps_law(docs), HEAPS_SQL),
            ("ppr", spark_ppr(spark, sf), ppr_oracle_sql(10)),
        ]
        print(f"== {sf} ==", flush=True)
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
                diff = [(x, y) for x, y in zip(a, b) if x != y][:2]
                print(f"  {name}: MISMATCH rows {len(a)}/{len(b)}",
                      diff, flush=True)
            else:
                print(f"  {name}: MATCH {len(a)} rows", flush=True)
    print("ALL MATCH" if ok else "FAILURES")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
