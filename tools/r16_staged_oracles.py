"""Round-16 staged oracle SQL — validated, NOT registered.

Cross-engine-validated DuckDB oracle drafts for the five operators
pre-built in round 15 and awaiting their round-16 catalog slots:

- ``ref_runs_test``        (risk.runs_test — Wald-Wolfowitz up/down runs)
- ``ref_turning_points``   (risk.turning_points — local-extrema count test)
- ``ana_hits_graph``       (graph.hits — integer-ppm hubs & authorities)
- ``llm_embedding_recall_eval`` (sign-LSH near-dup recall vs exact truth)
- ``stream_jonckheere_trend``   (6th streaming monitor twin; oracle =
  the registered ana_jonckheere_trend SQL verbatim, stream==batch)

Each MATCHES its Spark operator under the strict canonicalizer at
sf0.001 and sf0.01 (run this module to re-verify). At round-16 start:
apply the rotation, then lift these into @register(...) entries
(ref_* via with_reference_ctes, the others as-is) and re-pin
_WINDOW_PIN to 50 - planned.

Usage: python tools/r16_staged_oracles.py
"""

import math
import sys

sys.path.insert(0, "/root/repo")
import duckdb
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

RUNS_SQL = """
SELECT stock_ticker, n_up, n_down, n_runs, runs_excess_ppm
FROM (
  WITH base AS (
    SELECT stock_ticker AS e, stock_date AS d,
           CAST(ROUND(stock_close * 100) AS BIGINT) AS vc
    FROM stock_prices
    WHERE stock_close IS NOT NULL AND stock_date IS NOT NULL),
  dif AS (
    SELECT e, d, vc - LAG(vc) OVER (PARTITION BY e ORDER BY d) AS dvc
    FROM base),
  sgn AS (
    SELECT e, d, CASE WHEN dvc > 0 THEN 1 ELSE -1 END AS s
    FROM dif WHERE dvc IS NOT NULL AND dvc <> 0),
  chg AS (
    SELECT e, s,
           CASE WHEN LAG(s) OVER (PARTITION BY e ORDER BY d) IS NULL
                  OR LAG(s) OVER (PARTITION BY e ORDER BY d) = s
                THEN 0 ELSE 1 END AS c
    FROM sgn),
  agg AS (
    SELECT e,
           CAST(SUM(CASE WHEN s > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
           CAST(SUM(CASE WHEN s < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_down,
           CAST(SUM(c) + 1 AS BIGINT) AS n_runs
    FROM chg GROUP BY e)
  SELECT e AS stock_ticker, n_up, n_down, n_runs,
         CAST(((CAST(n_runs AS HUGEINT) * (n_up + n_down)
                - (n_up + n_down)
                - 2 * CAST(n_up AS HUGEINT) * n_down) * 1000000)
              // ((n_up + n_down) + 2 * CAST(n_up AS HUGEINT) * n_down)
              AS BIGINT) AS runs_excess_ppm
  FROM agg WHERE n_up > 0 AND n_down > 0)
"""

TP_SQL = """
SELECT stock_ticker, n_obs, n_turning, turning_excess_ppm
FROM (
  WITH base AS (
    SELECT stock_ticker AS e, stock_date AS d,
           CAST(ROUND(stock_close * 100) AS BIGINT) AS vc
    FROM stock_prices
    WHERE stock_close IS NOT NULL AND stock_date IS NOT NULL),
  mk AS (
    SELECT e,
           CASE WHEN (vc > LAG(vc) OVER w AND vc > LEAD(vc) OVER w)
                  OR (vc < LAG(vc) OVER w AND vc < LEAD(vc) OVER w)
                THEN 1 ELSE 0 END AS tp
    FROM base WINDOW w AS (PARTITION BY e ORDER BY d)),
  agg AS (
    SELECT e, CAST(COUNT(*) AS BIGINT) AS n_obs,
           CAST(SUM(tp) AS BIGINT) AS n_turning
    FROM mk GROUP BY e)
  SELECT e AS stock_ticker, n_obs, n_turning,
         CAST(((3 * CAST(n_turning AS HUGEINT) - 2 * (n_obs - 2))
               * 1000000)
              // (2 * (n_obs - 2)) AS BIGINT) AS turning_excess_ppm
  FROM agg WHERE n_obs >= 3)
"""


def hits_oracle_sql(iters: int = 5) -> str:
    """Unrolled integer-ppm HITS over the customer->supplier order
    graph (the pagerank edge construction) — recursive CTEs cannot
    aggregate, so the fixed iteration unrolls. Pure integers: HUGEINT
    sums, MAX rescale, // truncation — bit-exact by construction."""
    ctes = ["""edges AS MATERIALIZED (
  SELECT DISTINCT 'C' || o_custkey AS src, 'S' || l_suppkey AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
nodes AS MATERIALIZED (
  SELECT src AS node FROM edges UNION SELECT dst FROM edges),
h0 AS (SELECT node, CAST(1000000 AS HUGEINT) AS h FROM nodes)"""]
    for k in range(1, iters + 1):
        ctes.append(f"""a{k}raw AS (
  SELECT n2.node, COALESCE(s.a, CAST(0 AS HUGEINT)) AS a
  FROM nodes n2
  LEFT JOIN (
    SELECT e.dst AS node, SUM(h.h) AS a
    FROM edges e JOIN h{k - 1} h ON e.src = h.node
    GROUP BY e.dst) s ON s.node = n2.node)""")
        ctes.append(f"""a{k} AS (
  SELECT node,
         CASE WHEN mx.mx > 0 THEN (a * 1000000) // mx.mx
              ELSE CAST(0 AS HUGEINT) END AS a
  FROM a{k}raw CROSS JOIN (SELECT MAX(a) AS mx FROM a{k}raw) mx)""")
        ctes.append(f"""h{k}raw AS (
  SELECT n2.node, COALESCE(s.h, CAST(0 AS HUGEINT)) AS h
  FROM nodes n2
  LEFT JOIN (
    SELECT e.src AS node, SUM(a.a) AS h
    FROM edges e JOIN a{k} a ON e.dst = a.node
    GROUP BY e.src) s ON s.node = n2.node)""")
        ctes.append(f"""h{k} AS (
  SELECT node,
         CASE WHEN mx.mx > 0 THEN (h * 1000000) // mx.mx
              ELSE CAST(0 AS HUGEINT) END AS h
  FROM h{k}raw CROSS JOIN (SELECT MAX(h) AS mx FROM h{k}raw) mx)""")
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT h.node, CAST(h.h AS BIGINT) AS hub_ppm,
       CAST(a.a AS BIGINT) AS auth_ppm
FROM h{iters} h JOIN a{iters} a ON h.node = a.node"""
    )


def embedding_recall_oracle_sql() -> str:
    """llm_embedding_recall_eval oracle: exact cosine >= 0.4 pairs as
    truth (the llm_embedding_near_dup relation), the banded sign-LSH
    pairs as candidates (the llm_embedding_near_dup_lsh relation,
    pinned planes_per_table=4), recall per 0.05 cosine band."""
    from utn_dataengineering_stockmarketpipeline_spark.plans.queries_llm import (
        _LSH_BUCKETS_CTES,
        _cos_sql,
    )
    from utn_dataengineering_stockmarketpipeline_spark.operators import dedup

    return f"""
WITH {_LSH_BUCKETS_CTES.strip()},
sized AS (
  SELECT tbl, bucket, COUNT(*) AS sz FROM buckets GROUP BY tbl, bucket),
lsh AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM buckets a
  JOIN sized s ON s.tbl = a.tbl AND s.bucket = a.bucket
              AND s.sz <= {dedup.DEFAULT_MAX_BUCKET_SIZE}
  JOIN buckets b ON a.tbl = b.tbl AND a.bucket = b.bucket
               AND a.vec_id < b.vec_id),
truth AS (
  SELECT id_a, id_b,
         LEAST(CAST(FLOOR(cosine * 20) AS BIGINT),
               CAST(19 AS BIGINT)) AS cos_bin
  FROM (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {_cos_sql('a.embedding', 'b.embedding')} AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
  WHERE cosine >= 0.4)
SELECT t.cos_bin,
       CAST(COUNT(*) AS BIGINT) AS n_truth,
       CAST(COUNT(l.id_a) AS BIGINT) AS n_hit,
       CAST((COUNT(l.id_a) * 1000000) // COUNT(*) AS BIGINT) AS recall_ppm
FROM truth t
LEFT JOIN lsh l ON l.id_a = t.id_a AND l.id_b = t.id_b
GROUP BY t.cos_bin
"""


def spark_embedding_recall(spark, sf_dir):
    """Staged Spark build for llm_embedding_recall_eval: truth = exact
    capped cosine pairs >= 0.4 binned by 0.05 band (the cosine is
    ROUND(...,6) in both engines, so the float floor is cross-engine
    deterministic), hits via left-semi on the pair key against the
    banded sign-LSH pairs — the third eval loop (ANN, MinHash-LSH,
    and now the embedding dedup path)."""
    from utn_dataengineering_stockmarketpipeline_spark.operators import dedup
    from utn_dataengineering_stockmarketpipeline_spark.sources.parquet import (
        load_table,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    exact = dedup.embedding_near_dup_pairs(emb, threshold=0.4)
    lsh = dedup.embedding_near_dup_pairs_lsh(
        emb, dim=64, threshold=0.4, planes_per_table=4
    ).select("id_a", "id_b")
    truth = exact.select(
        "id_a",
        "id_b",
        F.least(
            F.floor(F.col("cosine") * 20).cast("bigint"),
            F.lit(19).cast("bigint"),
        ).alias("cos_bin"),
    )
    truth_n = truth.groupBy("cos_bin").agg(F.count(F.lit(1)).alias("n_truth"))
    hit_n = (
        truth.join(lsh, ["id_a", "id_b"], "left_semi")
        .groupBy("cos_bin")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return truth_n.join(hit_n, "cos_bin", "left").select(
        "cos_bin",
        "n_truth",
        F.coalesce(F.col("n_hit"), F.lit(0)).alias("n_hit"),
        F.expr("(coalesce(n_hit, 0) * 1000000) div n_truth").alias(
            "recall_ppm"
        ),
    )


def canon(v):
    if v is None:
        return "x"
    if isinstance(v, float):
        return "nan" if math.isnan(v) else f"{v:.12g}"
    return str(v)


def main() -> None:
    from utn_dataengineering_stockmarketpipeline_spark.plans.catalog import (
        CATALOG,
    )
    from utn_dataengineering_stockmarketpipeline_spark.plans.reference_tables import (
        with_reference_ctes,
        stock_prices,
    )
    from utn_dataengineering_stockmarketpipeline_spark.plans.queries_streaming import (
        _drained_counts_monitor,
    )
    from utn_dataengineering_stockmarketpipeline_spark.operators import graph, risk
    from utn_dataengineering_stockmarketpipeline_spark.operators.skew import (
        jonckheere_from_counts,
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
        li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
        o = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey")
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
        cases = [
            ("runs_test", risk.runs_test(sp), with_reference_ctes(RUNS_SQL)),
            ("turning_points", risk.turning_points(sp),
             with_reference_ctes(TP_SQL)),
            ("hits", graph.hits(edges, iters=5), hits_oracle_sql(5)),
            ("embedding_recall", spark_embedding_recall(spark, sf),
             embedding_recall_oracle_sql()),
            ("stream_jonckheere",
             _drained_counts_monitor(
                 spark, sf,
                 lambda c, v, g: jonckheere_from_counts(c, v, g),
                 "jtstream_"),
             CATALOG["ana_jonckheere_trend"].oracle),
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
