"""Deterministic BPE tokenizer: training determinism, the shipped
merge-table artifact, and encode semantics (replace-chain == classic
lowest-rank-first BPE)."""

from __future__ import annotations

from pyspark.sql import functions as F

from utn_dataengineering_stockmarketpipeline_spark.operators import text


def test_shipped_merge_table_is_training_output(spark):
    """BPE_MERGES is the artifact train_bpe produces on the sf0.01
    documents table — retraining must reproduce it byte-for-byte
    (count ties break lexicographically, so the table is unique)."""
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    assert text.train_bpe(docs, n_merges=24) == text.BPE_MERGES


def test_training_is_deterministic_across_runs(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    a = text.train_bpe(docs, n_merges=8)
    b = text.train_bpe(docs, n_merges=8)
    assert a == b and len(a) == 8


def _classic_bpe_len(word: str, merges) -> int:
    """Reference classic BPE encode: repeatedly apply the LOWEST-RANK
    applicable merge at its LEFTMOST occurrence."""
    sym = list(word)
    rules = [(tuple(p), s) for p, s in merges]
    while True:
        hit = None
        for rank, (pair, s) in enumerate(rules):
            for j in range(len(sym) - 1):
                if (sym[j], sym[j + 1]) == pair:
                    hit = (rank, j, s)
                    break
            if hit:
                break
        if hit is None:
            return len(sym)
        _, j, s = hit
        sym[j:j + 2] = [s]


def test_replace_chain_equals_classic_bpe_encode(spark):
    """The chained-replace encoder must agree with the classic
    lowest-rank-first algorithm on every corpus word."""
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    words = [
        r["w"]
        for r in docs.select(
            F.explode(F.split("text", " ")).alias("w")
        ).distinct().collect()
    ]
    got = {
        r["w"]: r["n"]
        for r in spark.createDataFrame([(w,) for w in words], "w string")
        .select("w", F.length(text.bpe_encode("w")).alias("n"))
        .collect()
    }
    for w in words:
        assert got[w] == _classic_bpe_len(w, text.BPE_MERGES), w


def test_bpe_counts_compress_vs_chars_and_exceed_ws(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    row = (
        text.bpe_token_stats(docs)
        .agg(
            F.sum("bpe_tokens").alias("bpe"),
            F.sum("ws_tokens").alias("ws"),
            F.sum(F.length(F.regexp_replace("text", " ", ""))).alias("chars"),
        )
        .first()
    )
    # subword counts sit strictly between word and character counts
    assert row["ws"] < row["bpe"] < row["chars"]


def test_symbol_collision_raises(spark):
    docs = spark.createDataFrame([("has Symbol A inside",)], "text string")
    import pytest

    with pytest.raises(ValueError, match="collides"):
        text.train_bpe(docs, n_merges=2)


def test_token_fertility_aggregates_doc_stats(spark):
    """llm_token_fertility is exactly the per-language aggregate of
    bpe_token_stats, and fertility >= 1 (every word is >= 1 subword)."""
    from utn_dataengineering_stockmarketpipeline_spark.plans.catalog import CATALOG
    from utn_dataengineering_stockmarketpipeline_spark.operators import text
    from utn_dataengineering_stockmarketpipeline_spark.sources.parquet import (
        load_table,
    )

    sf = "/root/testdata/sf0.001"
    got = {r.lang: r for r in CATALOG["llm_token_fertility"].build(spark, sf).collect()}
    stats = text.bpe_token_stats(load_table(spark, sf, "documents")).collect()
    agg: dict[str, list[int]] = {}
    for r in stats:
        a = agg.setdefault(r.lang, [0, 0, 0])
        a[0] += 1
        a[1] += r.ws_tokens
        a[2] += r.bpe_tokens
    assert set(got) == set(agg)
    for lang, (n, ws, bpe) in agg.items():
        r = got[lang]
        assert (r.n_docs, r.ws_tokens, r.bpe_tokens) == (n, ws, bpe)
        assert r.fertility >= 1.0
