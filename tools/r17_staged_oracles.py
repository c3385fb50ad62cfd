"""Round-17 staged oracle SQL — validated, NOT registered.

The full round-17 slate of five, pre-built in round 15 (the round-16
slate of five was registered at round-16 start — its staged script was
lifted into the catalog and removed):

- ``ana_kruskal_wallis`` (skew.kruskal_wallis_drift) — the K-GROUP
  member of the drift family on the shared counts grid.
- ``stream_kruskal_wallis`` — its streaming twin over
  ``_drained_counts_monitor`` (oracle = the batch SQL verbatim).
- ``llm_kl_source_divergence`` (text.kl_source_divergence) — per-source
  token-distribution KL vs the corpus in exact micro-nats (the MI/ccnet
  quantization discipline on the (source, term) cell relation).
- ``ref_acf`` (risk.acf_ppm) — the autocorrelation function at lags
  1..10, autocorr_lag1's pair-Pearson estimator resolved per horizon,
  quantized to signed ppm per (entity, lag).
- ``ref_ljung_box`` (risk.ljung_box) — the portmanteau white-noise gate
  over the quantized ACF, integer end to end.

Run this module to re-verify the cross-engine match at sf0.001 and
sf0.01 before lifting into @register entries. At round-17 start:
apply that round's rotation, re-pin _WINDOW_PIN to 50 − 5, register.

Usage: python tools/r17_staged_oracles.py
"""

import math
import sys

sys.path.insert(0, "/root/repo")
import duckdb
from pyspark.sql import SparkSession

KW_SQL = """
WITH counts AS (
  SELECT source, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c
  FROM documents
  WHERE source IS NOT NULL AND n_chars IS NOT NULL
  GROUP BY source, n_chars),
vals AS (
  SELECT v, v_cnt,
         2 * COALESCE(SUM(v_cnt) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + v_cnt + 1 AS r2
  FROM (SELECT v, CAST(SUM(c) AS BIGINT) AS v_cnt FROM counts GROUP BY v)),
per_g AS (
  SELECT c.source, CAST(SUM(c.c) AS BIGINT) AS n_g,
         CAST(SUM(CAST(c.c AS HUGEINT) * vals.r2) AS HUGEINT) AS r2g
  FROM counts c JOIN vals ON vals.v = c.v
  GROUP BY c.source),
terms AS (SELECT n_g, (r2g * r2g) // n_g AS tg FROM per_g),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
         CAST(SUM(n_g) AS BIGINT) AS n,
         CAST(SUM(tg) AS HUGEINT) AS s
  FROM terms),
ties AS (
  SELECT CAST(SUM(CAST(v_cnt AS HUGEINT) * v_cnt * v_cnt - v_cnt)
              AS HUGEINT) AS tsum
  FROM vals)
SELECT n_groups, n AS n_obs,
       CAST((3 * s * 1000000) // (CAST(n AS HUGEINT) * (n + 1))
            - 3000000 * (n + 1) AS BIGINT) AS h_micro,
       CAST((CAST((3 * s * 1000000) // (CAST(n AS HUGEINT) * (n + 1))
                  - 3000000 * (n + 1) AS HUGEINT)
             * (CAST(n AS HUGEINT) * n * n - n))
            // (CAST(n AS HUGEINT) * n * n - n - tsum) AS BIGINT)
         AS h_tie_micro
FROM stats CROSS JOIN ties
WHERE CAST(n AS HUGEINT) * n * n - n > tsum
"""


KL_SQL = """
WITH tok AS (
  SELECT source AS g, unnest(string_split(text, ' ')) AS term
  FROM documents WHERE source IS NOT NULL),
cells AS (
  SELECT g, term, CAST(COUNT(*) AS BIGINT) AS o
  FROM tok WHERE term != '' GROUP BY g, term),
ns AS (SELECT g, CAST(SUM(o) AS BIGINT) AS ns FROM cells GROUP BY g),
ct AS (SELECT term, CAST(SUM(o) AS BIGINT) AS ct FROM cells GROUP BY term),
tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
q AS (
  SELECT cells.g, ns.ns,
         CAST(floor((CAST(o AS DOUBLE) / ns)
              * ln((CAST(o AS DOUBLE) * n) / (CAST(ns AS DOUBLE) * ct))
              * 1000000 + 0.5) AS BIGINT) AS kc
  FROM cells JOIN ns USING (g) JOIN ct USING (term) CROSS JOIN tot)
SELECT g AS source, ns AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_terms,
       CAST(SUM(kc) AS BIGINT) AS kl_micro
FROM q GROUP BY g, ns
"""


_ACF_CORE = """
  WITH rets AS (
    SELECT stock_ticker, stock_date,
           CAST(ROUND((stock_close / LAG(stock_close) OVER (
                         PARTITION BY stock_ticker ORDER BY stock_date)
                       - 1) * 1e6) AS BIGINT) AS ret_ppm
    FROM stock_prices),
  r2 AS (
    SELECT stock_ticker, ret_ppm,
           ROW_NUMBER() OVER (PARTITION BY stock_ticker
                              ORDER BY stock_date) AS rn
    FROM rets WHERE ret_ppm IS NOT NULL),
  lags AS (SELECT unnest(generate_series(1, 10)) AS lag),
  p AS (
    SELECT a.stock_ticker, k.lag, a.ret_ppm AS x, b.ret_ppm AS y
    FROM r2 a CROSS JOIN lags k
    JOIN r2 b ON b.stock_ticker = a.stock_ticker
             AND b.rn = a.rn + k.lag),
  m AS (
    SELECT stock_ticker, lag, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
           CAST(SUM(x * y) AS BIGINT) AS sxy,
           CAST(SUM(x * x) AS BIGINT) AS sxx,
           CAST(SUM(y * y) AS BIGINT) AS syy
    FROM p GROUP BY stock_ticker, lag),
  acf AS (
    SELECT stock_ticker, CAST(lag AS INT) AS lag, n AS n_pairs,
           CAST(floor((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * sqrt(CAST(n AS DOUBLE) * syy
                           - CAST(sy AS DOUBLE) * sy))
                 * 1000000 + 0.5) AS BIGINT) AS rho_ppm
    FROM m
    WHERE n >= 2
      AND CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0
      AND CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy > 0)"""

ACF_SQL = f"""
SELECT stock_ticker, lag, n_pairs, rho_ppm
FROM ({_ACF_CORE}
  SELECT * FROM acf)
"""

LB_SQL = f"""
SELECT stock_ticker, n_obs, n_lags, q_micro
FROM ({_ACF_CORE},
  cnt AS (SELECT stock_ticker, CAST(COUNT(*) AS BIGINT) AS n_obs
          FROM r2 GROUP BY stock_ticker),
  qc AS (
    SELECT acf.stock_ticker, cnt.n_obs,
           (CAST(rho_ppm AS HUGEINT) * rho_ppm) // (cnt.n_obs - acf.lag)
             AS qc
    FROM acf JOIN cnt ON acf.stock_ticker = cnt.stock_ticker)
  SELECT stock_ticker, n_obs, CAST(COUNT(*) AS BIGINT) AS n_lags,
         CAST((CAST(n_obs AS HUGEINT) * (n_obs + 2) * SUM(qc)) // 1000000
              AS BIGINT) AS q_micro
  FROM qc GROUP BY stock_ticker, n_obs)
"""


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
    ok = True
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        con = duckdb.connect()
        for t in ("region nation customer supplier part orders lineitem "
                  "events documents embeddings").split():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'"
            )
        from utn_dataengineering_stockmarketpipeline_spark.operators import (
            text as text_ops,
        )

        cases = [
            ("kruskal_wallis",
             skew.kruskal_wallis_drift(
                 load_table(spark, sf, "documents"), "n_chars", "source"),
             KW_SQL),
            ("stream_kruskal_wallis",
             _drained_counts_monitor(
                 spark, sf, skew.kruskal_wallis_from_counts, "kwstream_"),
             KW_SQL),
            ("kl_source_divergence",
             text_ops.kl_source_divergence(
                 load_table(spark, sf, "documents")),
             KL_SQL),
            ("acf",
             risk.acf_ppm(risk.returns_ppm(stock_prices(spark, sf))),
             with_reference_ctes(ACF_SQL)),
            ("ljung_box",
             risk.ljung_box(risk.returns_ppm(stock_prices(spark, sf))),
             with_reference_ctes(LB_SQL)),
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
