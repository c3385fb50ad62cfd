"""Semantic tests for the round-9 curation-policy operators:
quality-ranked dedup survivor selection, token-budget data selection,
and per-group embedding outliers. Planted-construction tests — the
oracle sweep checks cross-engine parity; these check the SEMANTICS."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from utn_dataengineering_stockmarketpipeline_spark.operators import dedup, similarity, text


def test_keep_best_prefers_quality_over_min_id(spark):
    # cluster {1,2,3}: doc 3 has the most alpha tokens -> kept even
    # though min-id policy would keep 1; singleton 9 is kept trivially.
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (9, 9)], ["doc_id", "cluster_id"]
    )
    quality = spark.createDataFrame(
        [(1, 5), (2, 5), (3, 8), (9, 0)], ["doc_id", "quality"]
    )
    out = {
        r["doc_id"]: r
        for r in dedup.keep_best_per_cluster(clusters, quality).collect()
    }
    assert out[3]["is_kept"] and not out[1]["is_kept"] and not out[2]["is_kept"]
    assert out[9]["is_kept"]
    kept_per_cluster = (
        dedup.keep_best_per_cluster(clusters, quality)
        .filter("is_kept")
        .groupBy("cluster_id")
        .count()
        .collect()
    )
    assert all(r["count"] == 1 for r in kept_per_cluster)


def test_keep_best_tie_breaks_min_id(spark):
    clusters = spark.createDataFrame(
        [(4, 4), (7, 4)], ["doc_id", "cluster_id"]
    )
    quality = spark.createDataFrame([(4, 3), (7, 3)], ["doc_id", "quality"])
    kept = (
        dedup.keep_best_per_cluster(clusters, quality)
        .filter("is_kept")
        .collect()
    )
    assert [r["doc_id"] for r in kept] == [4]


def _mkdocs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_token_budget_is_greedy_prefix(spark):
    # texts engineered so scores (2*alpha - tokens) are distinct and
    # the greedy order is unambiguous.
    docs = _mkdocs(
        spark,
        [
            (1, "alpha beta gamma delta"),          # 4 alpha, score 4
            (2, "one two three"),                    # 3 alpha, score 3
            (3, "x1 y2 z3 w4"),                      # 0 alpha, score -4
            (4, "aa bb"),                            # 2 alpha, score 2
        ],
    )
    # total tokens = 4+3+4+2 = 13; budget = 13 div 4 = 3 -> only doc 2
    # fits? greedy order: doc1(score4,4tok) first but 4 > 3, so the
    # boundary group (score 4) contributes nothing; selection must NOT
    # skip ahead to smaller docs (greedy-prefix, not knapsack).
    out = text.token_budget_selection(docs, budget_num=1, budget_den=4)
    assert out.count() == 0

    # budget = 13 div 2 = 6 -> doc1 (4) then doc2 would make 7 > 6:
    # doc2 is the boundary group and does not fit; greedy stops.
    out2 = text.token_budget_selection(docs, budget_num=1, budget_den=2)
    assert [r["doc_id"] for r in out2.collect()] == [1]

    # full budget -> everything selected.
    out3 = text.token_budget_selection(docs, budget_num=1, budget_den=1)
    assert out3.count() == 4


def test_token_budget_boundary_resolves_by_doc_id(spark):
    # two docs with the SAME score at the boundary: lower id wins the
    # remaining budget.
    docs = _mkdocs(
        spark,
        [
            (10, "aa bb cc"),   # score 3, 3 tokens
            (11, "dd ee ff"),   # score 3, 3 tokens
        ],
    )
    # total 6, budget 6 div 2 = 3 -> exactly one of the tied docs fits.
    out = text.token_budget_selection(docs, budget_num=1, budget_den=2)
    assert [r["doc_id"] for r in out.collect()] == [10]


def test_embedding_outliers_finds_planted_outlier(spark):
    base = [0.1, 0.1, 0.1, 0.1]
    rows = [(i, [v + 0.001 * i for v in base], 0) for i in range(1, 6)]
    rows.append((99, [5.0, 5.0, 5.0, 5.0], 0))        # far outlier
    rows += [(200 + i, [1.0, 0.0, 0.0, 0.0], 1) for i in range(3)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = similarity.embedding_outliers(emb, k=2)
    top0 = [
        r["vec_id"]
        for r in out.filter("label = 0").orderBy("outlier_rank").collect()
    ]
    assert top0[0] == 99
    # label 1 vectors are identical -> distances all equal (0), rank by
    # vec_id, and k bounds the output.
    lbl1 = out.filter("label = 1").collect()
    assert len(lbl1) == 2
    assert {r["vec_id"] for r in lbl1} == {200, 201}
    assert all(r["dist"] == 0.0 for r in lbl1)


def test_embedding_outliers_rank_is_dense_per_group(spark):
    rows = [(i, [float(i), 0.0], 7) for i in range(10)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = similarity.embedding_outliers(emb, k=5).filter("label = 7")
    ranks = sorted(r["outlier_rank"] for r in out.collect())
    assert ranks == [1, 2, 3, 4, 5]


# ---- round-10 continuation: prototype pruning + CMS heavy hitters ----


def test_prototype_pruning_drop_set_matches_rank_order(spark):
    # two separated groups; verify per cluster: exactly (size*25) div 100
    # rows drop, and they are the FIRST rows in (sim micro-unit desc, id)
    # order — the operator's documented integer rank policy.
    rows = [(i, [1.0, 0.001 * i, 0.0, 0.0]) for i in range(1, 9)]
    rows += [(100 + i, [0.0, 0.0, 1.0, 0.002 * i]) for i in range(8)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.prototype_pruning(emb, drop_pct=25, n_centroids=2)
    got = out.collect()
    assert len(got) == len(rows)
    by_c = {}
    for r in got:
        by_c.setdefault(r["centroid"], []).append(r)
    assert len(by_c) == 2
    for members in by_c.values():
        drop_n = (len(members) * 25) // 100
        ranked = sorted(
            members,
            key=lambda r: (-round(r["proto_sim"] * 1_000_000), r["vec_id"]),
        )
        dropped = {r["vec_id"] for r in members if not r["is_kept"]}
        assert dropped == {r["vec_id"] for r in ranked[:drop_n]}


def test_prototype_pruning_small_cluster_keeps_all(spark):
    # size 3 -> (3*25) div 100 = 0 dropped.
    rows = [(i, [1.0, 0.1 * i]) for i in range(3)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.prototype_pruning(emb, drop_pct=25, n_centroids=1)
    assert all(r["is_kept"] for r in out.collect())


def test_cms_never_underestimates_and_finds_planted_hitter(spark):
    docs = spark.createDataFrame(
        [(1, "hot pair " * 30), (2, "aa bb cc dd ee ff gg hh"),
         (3, "hot pair cold one")],
        "doc_id long, text string",
    )
    out = text.cms_heavy_hitters(docs, threshold_permille=10).collect()
    by_term = {r["term"]: r for r in out}
    assert "hot pair" in by_term          # the planted heavy bigram
    for r in out:
        assert r["est_count"] >= r["exact_count"]
        assert r["overestimate"] == r["est_count"] - r["exact_count"]


def test_cms_narrow_sketch_shows_collisions(spark):
    # w=2, d=1: three distinct bigrams into two buckets — pigeonhole
    # forces a collision, so SOME reported estimate strictly exceeds
    # its exact count (the overestimate CMS trades for bounded memory).
    docs = spark.createDataFrame(
        [(1, "aa bb"), (2, "cc dd"), (3, "ee ff")],
        "doc_id long, text string",
    )
    out = text.cms_heavy_hitters(docs, d=1, w=2, threshold_permille=1)
    rows = out.collect()
    assert len(rows) == 3
    assert any(r["overestimate"] > 0 for r in rows)


def test_temperature_resample_realizes_targets_exactly(spark):
    # 40-doc dominant source vs 10-doc rare source, budget 30:
    # T=2 weights flatten the imbalance; per-source copy counts must
    # take exactly two adjacent values (base epochs + 0/1 extra) and
    # sum to the rounded per-source target.
    rows = [(i, "big") for i in range(40)] + [(100 + i, "small") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = text.temperature_resample(docs, budget=30).collect()
    assert len(out) == 50                      # audit form: every doc
    import math
    w_big, w_small = round(math.sqrt(40), 9), round(math.sqrt(10), 9)
    z = w_big + w_small
    for src, n, w in (("big", 40, w_big), ("small", 10, w_small)):
        target = round(30 * w / z)             # the operator's formula
        copies = sorted(r["n_copies"] for r in out if r["source"] == src)
        assert sum(copies) == target
        assert set(copies) <= {target // n, target // n + 1}
        assert copies.count(target // n + 1) == target % n


def test_temperature_resample_is_deterministic(spark):
    rows = [(i, "a" if i % 3 else "b") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    a = sorted(map(tuple, text.temperature_resample(docs).collect()))
    b = sorted(map(tuple, text.temperature_resample(
        docs.repartition(7)).collect()))
    assert a == b                              # partition-independent draw


def test_key_skew_profile_planted_hot_key(spark):
    from utn_dataengineering_stockmarketpipeline_spark.operators import skew

    rows = [(1,)] * 100 + [(k,) for k in range(2, 51) for _ in range(2)]
    df = spark.createDataFrame(rows, "user_id long")
    out = skew.key_skew_profile(df, key="user_id", top_k=3).collect()
    assert len(out) == 3
    hot = out[0] if out[0]["user_id"] == 1 else next(
        r for r in out if r["user_id"] == 1)
    assert hot["cnt"] == 100
    assert hot["p50_cnt"] == 2                 # 49 of 50 keys sit at 2
    assert hot["p99_cnt"] == 100               # the hot key IS the p99
    assert hot["ratio_to_p50"] == 50.0
    assert hot["share_permille"] == (100 * 1000) // 198


def test_gopher_gate_boundary_docs(spark):
    """gopher_rules: integer cross-multiplied thresholds gate boundary
    docs deterministically — a doc sitting EXACTLY on a ratio boundary
    passes the inclusive rules, and each violation is counted from the
    same one-pass report."""
    from utn_dataengineering_stockmarketpipeline_spark.operators import (
        expectations as ex,
    )
    from utn_dataengineering_stockmarketpipeline_spark.operators.text import (
        gopher_rules,
    )

    # good: 60 tokens, exactly 3 stopwords (5% boundary -> passes >=),
    # all alpha, mean token length 236/60 = 3.93, no punctuation.
    good = "the and of " + " ".join(["word"] * 57)
    # short: 3 tokens (violates 50-token floor), mean len 1 (violates
    # [3,10]), no stopwords (violates 5% floor), all alpha (passes),
    # no punct (passes).
    short = "zz yy xx"
    docs = spark.createDataFrame([(1, good), (2, short)],
                                 ["doc_id", "text"])
    rep = {r["rule"]: r for r in
           ex.quality_report(docs, gopher_rules("text")).collect()}
    assert rep["tokens_50_to_100k"]["n_violations"] == 1
    assert rep["mean_token_len_3_to_10"]["n_violations"] == 1
    assert rep["punct_le_20pct"]["n_violations"] == 0
    # good sits EXACTLY at the 5% stopword boundary (3*20 == 60) and
    # the inclusive integer rule passes it; short has none and fails
    assert rep["stopword_ge_5pct"]["n_violations"] == 1
    assert rep["alpha_ge_60pct"]["n_violations"] == 0
    assert all(r["n_rows"] == 2 for r in rep.values())
