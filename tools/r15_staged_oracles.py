"""Round-15 staged oracle SQL — validated, NOT registered.

Cross-engine-validated DuckDB oracle drafts for the three pre-built
round-14 operators awaiting their round-15 catalog slots
(risk.ols_trend, risk.seasonal_mann_kendall, skew.jonckheere_trend).
Each already MATCHES the Spark operator under the strict canonicalizer
at sf0.001 and sf0.01 (run this module to re-verify). At round-15
start: apply tools/next_rotation.py, then lift these strings into
@register(...) entries (ref_ols_trend / ref_seasonal_mann_kendall via
with_reference_ctes, ana_jonckheere_trend as-is).

Usage: python tools/r15_staged_oracles.py
"""

import math, sys
sys.path.insert(0, "/root/repo")
import duckdb
from pyspark.sql import SparkSession

OLS_SQL = """
SELECT stock_ticker, n_obs, slope_micro
FROM (
  WITH base AS (
    SELECT stock_ticker AS e, stock_date AS d,
           CAST(ROUND(stock_close * 100) AS BIGINT) AS vc
    FROM stock_prices
    WHERE stock_close IS NOT NULL AND stock_date IS NOT NULL),
  bx AS (
    SELECT e, vc AS y,
           CAST(date_diff('day', MIN(d) OVER (PARTITION BY e), d)
                AS BIGINT) AS x
    FROM base)
  SELECT e AS stock_ticker, CAST(COUNT(*) AS BIGINT) AS n_obs,
         CAST(((CAST(COUNT(*) AS HUGEINT) * SUM(CAST(x AS HUGEINT) * y)
                - SUM(CAST(x AS HUGEINT)) * SUM(CAST(y AS HUGEINT)))
               * 10000)
              // (CAST(COUNT(*) AS HUGEINT) * SUM(CAST(x AS HUGEINT) * x)
                  - SUM(CAST(x AS HUGEINT)) * SUM(CAST(x AS HUGEINT)))
              AS BIGINT) AS slope_micro
  FROM bx GROUP BY e
  HAVING COUNT(*) >= 2
     AND CAST(COUNT(*) AS HUGEINT) * SUM(CAST(x AS HUGEINT) * x)
         - SUM(CAST(x AS HUGEINT)) * SUM(CAST(x AS HUGEINT)) > 0)
"""

SMK_SQL = """
SELECT stock_ticker, n_obs, s_stat, tau_a_ppm
FROM (
  WITH base AS (
    SELECT stock_ticker AS e, stock_date AS d,
           CAST(month(stock_date) AS INT) AS season,
           CAST(ROUND(stock_close * 100) AS BIGINT) AS vc
    FROM stock_prices
    WHERE stock_close IS NOT NULL AND stock_date IS NOT NULL),
  m AS (
    SELECT a.e,
           CAST(SUM(CASE WHEN b.vc > a.vc THEN 1
                         WHEN b.vc < a.vc THEN -1 ELSE 0 END) AS BIGINT)
             AS s_stat,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM base a JOIN base b
      ON a.e = b.e AND a.season = b.season AND a.d < b.d
    GROUP BY a.e),
  cnt AS (SELECT e, CAST(COUNT(*) AS BIGINT) AS n_obs
          FROM base GROUP BY e)
  SELECT m.e AS stock_ticker, cnt.n_obs, m.s_stat,
         CAST((CAST(m.s_stat AS HUGEINT) * 1000000)
              // CAST(m.n_pairs AS HUGEINT) AS BIGINT) AS tau_a_ppm
  FROM m JOIN cnt ON m.e = cnt.e)
"""

JT_SQL = """
WITH counts AS (
  SELECT source, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c
  FROM documents
  WHERE source IS NOT NULL AND n_chars IS NOT NULL
  GROUP BY source, n_chars),
grp AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_g FROM counts GROUP BY source),
vals AS (SELECT v FROM counts GROUP BY v),
grid AS (
  SELECT g.source, vv.v, g.n_g, COALESCE(c.c, 0) AS g_c
  FROM grp g CROSS JOIN vals vv
  LEFT JOIN counts c ON c.source = g.source AND c.v = vv.v),
staged AS (
  SELECT source, v, g_c,
         CAST(SUM(g_c) OVER (PARTITION BY source ORDER BY v)
              AS DECIMAL(19,0)) AS cum_g
  FROM grid),
prefixed AS (
  SELECT g_c,
         COALESCE(SUM(cum_g) OVER (
           PARTITION BY v ORDER BY source
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           CAST(0 AS DECIMAL(19,0))) AS p,
         COALESCE(SUM(CAST(g_c AS DECIMAL(19,0))) OVER (
           PARTITION BY v ORDER BY source
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           CAST(0 AS DECIMAL(19,0))) AS q
  FROM staged),
j AS (
  SELECT SUM(CAST(g_c AS HUGEINT) * CAST(2 * p - q AS HUGEINT)) AS j2_num
  FROM prefixed),
e AS (
  SELECT SUM(CAST(n_g AS HUGEINT)
             * CAST(COALESCE(before, 0) AS HUGEINT)) AS ej2_num,
         CAST(SUM(n_g) AS BIGINT) AS n_obs,
         CAST(COUNT(*) AS BIGINT) AS n_groups
  FROM (SELECT n_g,
               SUM(n_g) OVER (ORDER BY source
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS before
        FROM grp))
SELECT e.n_groups, e.n_obs,
       CAST(j.j2_num AS BIGINT) AS j2,
       CAST(e.ej2_num AS BIGINT) AS ej2,
       CAST(((j.j2_num - e.ej2_num) * 1000000) // e.ej2_num AS BIGINT)
         AS trend_ppm
FROM j CROSS JOIN e
WHERE e.ej2_num > 0
"""

from utn_dataengineering_stockmarketpipeline_spark.plans.reference_tables import (
    with_reference_ctes, stock_prices,
)
from utn_dataengineering_stockmarketpipeline_spark.operators import risk, skew
from utn_dataengineering_stockmarketpipeline_spark.sources.parquet import load_table

def canon(v):
    if v is None: return "x"
    if isinstance(v, float):
        return "nan" if math.isnan(v) else f"{v:.12g}"
    return str(v)

spark = SparkSession.builder.master("local[8]").getOrCreate()
ok = True
for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
    con = duckdb.connect()
    for t in ('region nation customer supplier part orders lineitem events documents embeddings'.split()):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    sp = stock_prices(spark, sf)
    cases = [
        ("ols_trend", risk.ols_trend(sp), with_reference_ctes(OLS_SQL)),
        ("seasonal_mk", risk.seasonal_mann_kendall(sp), with_reference_ctes(SMK_SQL)),
        ("jonckheere", skew.jonckheere_trend(
            load_table(spark, sf, "documents"), "n_chars", "source"), JT_SQL),
    ]
    for name, df, sql in cases:
        a = sorted(tuple(canon(r[c]) for c in sorted(df.columns)) for r in df.collect())
        cur = con.execute(sql)
        desc = [d[0] for d in cur.description]
        order = sorted(range(len(desc)), key=lambda i: desc[i])
        b = sorted(tuple(canon(row[i]) for i in order) for row in cur.fetchall())
        status = "MATCH" if a == b else "MISMATCH"
        if a != b:
            ok = False
            print(name, sf, status, "spark:", a[:2], "duck:", b[:2])
        else:
            print(name, sf, status, len(a), "rows")
print("ALL MATCH" if ok else "FAILURES")
