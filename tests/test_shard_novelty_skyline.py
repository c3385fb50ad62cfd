"""Planted-case tests for the round-10 tail operators: deterministic
shard assignment, n-gram novelty, and the distributed 2-D skyline."""

from __future__ import annotations

from pyspark.sql import functions as F

from utn_dataengineering_stockmarketpipeline_spark.operators import dedup, text
from utn_dataengineering_stockmarketpipeline_spark.operators.skyline import skyline_2d


# --- shard_assignment -------------------------------------------------------

def test_shard_positions_contiguous_and_key_ordered(spark):
    docs = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    out = text.shard_assignment(docs, n_shards=8).collect()
    assert len(out) == 500
    by_shard: dict[int, list] = {}
    for r in out:
        assert r.shard == r.shuffle_key % 8
        by_shard.setdefault(r.shard, []).append(r)
    assert set(by_shard) == set(range(8))  # 500 keys cover all 8 shards
    for rows in by_shard.values():
        rows.sort(key=lambda r: r.position)
        assert [r.position for r in rows] == list(range(1, len(rows) + 1))
        keys = [(r.shuffle_key, r.doc_id) for r in rows]
        assert keys == sorted(keys)  # position order IS (key, id) order


def test_shard_assignment_stable_under_corpus_growth(spark):
    """Appending documents never reorders existing ones within a shard
    (their positions shift, their relative order does not) — the
    property that makes re-sharding a grown corpus reproducible."""
    small = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    grown = spark.range(0, 300).withColumnRenamed("id", "doc_id")

    def order(df):
        rows = text.shard_assignment(df, n_shards=4).collect()
        seq: dict[int, list] = {}
        for r in sorted(rows, key=lambda r: (r.shard, r.position)):
            seq.setdefault(r.shard, []).append(r.doc_id)
        return seq

    small_seq, grown_seq = order(small), order(grown)
    for shard, ids in small_seq.items():
        filtered = [i for i in grown_seq[shard] if i < 200]
        assert filtered == ids


# --- ngram_novelty ----------------------------------------------------------

def test_ngram_novelty_planted(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d"),   # grams abc, bcd — both first here
            (2, "a b c d"),   # exact dup: novelty 0
            (3, "a b c x"),   # abc seen, bcx new: novelty 1/2
            (4, "q r"),       # short doc: one 2-token fold, new
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in dedup.ngram_novelty(docs).collect()}
    assert rows[1].n_grams == 2 and rows[1].novel_grams == 2
    assert rows[1].novelty == 1.0
    assert rows[2].novel_grams == 0 and rows[2].novelty == 0.0
    assert rows[3].n_grams == 2 and rows[3].novel_grams == 1
    assert rows[3].novelty == 0.5
    assert rows[4].n_grams == 1 and rows[4].novelty == 1.0


def test_ngram_novelty_append_incremental(spark):
    """New docs never change earlier novelty scores (id order stands in
    for ingest order)."""
    base = [(i, f"w{i} w{i+1} w{i+2} w{i+3}") for i in range(1, 6)]
    docs_small = spark.createDataFrame(base, "doc_id long, text string")
    docs_grown = spark.createDataFrame(
        base + [(10, "w1 w2 w3 fresh")], "doc_id long, text string"
    )
    small = {r.doc_id: (r.n_grams, r.novel_grams)
             for r in dedup.ngram_novelty(docs_small).collect()}
    grown = {r.doc_id: (r.n_grams, r.novel_grams)
             for r in dedup.ngram_novelty(docs_grown).collect()}
    for i in small:
        assert grown[i] == small[i]


# --- skyline ----------------------------------------------------------------

def test_skyline_planted_front_with_ties(spark):
    pts = [
        (1, 5.0, 1.0),  # front
        (2, 5.0, 1.0),  # coordinate duplicate of a front point: kept
        (3, 5.0, 0.0),  # dominated within its x-group
        (4, 4.0, 2.0),  # front
        (5, 4.0, 1.0),  # dominated by (4, 2)
        (6, 3.0, 2.0),  # dominated by (4, 2): equal y, smaller x
        (7, 2.0, 3.0),  # front
        (8, 1.0, 3.0),  # dominated by (2, 3): equal y, smaller x
    ]
    df = spark.createDataFrame(pts, "id long, x double, y double").repartition(4)
    got = sorted(r.id for r in skyline_2d(df, "x", "y").collect())
    assert got == [1, 2, 4, 7]


def test_skyline_matches_bruteforce_on_hash_points(spark):
    df = (
        spark.range(0, 300)
        .select(
            F.col("id"),
            (F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 4), 16, 10)
             .cast("double")).alias("x"),
            (F.conv(F.substring(F.md5(F.col("id").cast("string")), 5, 4), 16, 10)
             .cast("double")).alias("y"),
        )
        .repartition(8)
    )
    pts = [(r.id, r.x, r.y) for r in df.collect()]
    brute = {
        i for (i, x, y) in pts
        if not any(
            bx >= x and by >= y and (bx > x or by > y) for (_, bx, by) in pts
        )
    }
    got = {r.id for r in skyline_2d(df, "x", "y").collect()}
    assert got == brute


def test_skyline_exact_across_arrow_batches(spark):
    """Regression: the GLOBAL stage must sweep the candidate UNION, not
    each Arrow batch independently. Two anti-correlated staircases
    where staircase B pointwise dominates staircase A, with the Arrow
    batch size forced to 10 so the candidates span many batches — a
    per-batch global sweep leaks all 30 dominated A points."""
    from utn_dataengineering_stockmarketpipeline_spark.plans.confscope import (
        scoped_sql_conf,
    )

    pts = []
    for i in range(30):  # staircase A: (i, 29-i)
        pts.append((i, float(i), float(29 - i)))
    for i in range(30):  # staircase B: (i+0.5, 30.5-i) dominates A pointwise
        pts.append((100 + i, float(i) + 0.5, float(30 - i) + 0.5))
    df = spark.createDataFrame(pts, "id long, x double, y double").repartition(8)
    with scoped_sql_conf(
        spark, **{"spark.sql.execution.arrow.maxRecordsPerBatch": "10"}
    ):
        got = sorted(r.id for r in skyline_2d(df, "x", "y").collect())
    assert got == sorted(range(100, 130))


def test_new_ops_handle_empty_input(spark):
    """Degenerate corpus: every round-10 tail operator returns an empty
    result (not an error) on zero rows."""
    from utn_dataengineering_stockmarketpipeline_spark.operators.skew import ks_drift

    docs = spark.createDataFrame([], "doc_id long, text string")
    assert dedup.ngram_novelty(docs).count() == 0
    assert text.shard_assignment(docs).count() == 0
    pts = spark.createDataFrame([], "id long, x double, y double")
    assert skyline_2d(pts, "x", "y").count() == 0
    src = spark.createDataFrame([], "source string, n_chars long")
    assert ks_drift(src, "n_chars", "source").count() == 0
