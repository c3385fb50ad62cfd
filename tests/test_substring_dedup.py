"""Exact substring dedup (Lee et al. '21 mode): planted-span semantics
plus a string-level ground-truth sweep proving the 62-bit dual-fold
gram identity is collision-free on real test data."""

from __future__ import annotations

from pyspark.sql import functions as F

from utn_dataengineering_stockmarketpipeline_spark.operators.dedup import (
    substring_duplicate_pairs,
)

from conftest import SF_SMOKE

K = 8

SPAN12 = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_planted_span_found_with_exact_length(spark):
    # A and B share a verbatim 12-token span inside otherwise-disjoint
    # text; C is unrelated. A 12-token span = 5 consecutive 8-grams.
    docs = _docs(spark, [
        (1, "one two three " + SPAN12 + " four five six"),
        (2, "seven eight " + SPAN12 + " nine ten eleven twelve"),
        (3, "thirteen fourteen fifteen sixteen seventeen eighteen "
            "nineteen twenty twentyone twentytwo"),
    ])
    rows = substring_duplicate_pairs(docs, k=K).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["id_a"], r["id_b"]) == (1, 2)
    assert r["max_span_tokens"] == 12
    assert r["n_spans"] == 1
    assert r["n_shared_grams"] == 12 - K + 1


def test_two_disjoint_spans_counted_separately(spark):
    span_b = "red orange yellow green blue indigo violet ultra"  # 8 tokens
    docs = _docs(spark, [
        (1, SPAN12 + " filler0 filler1 " + span_b),
        (2, span_b + " mid0 mid1 mid2 " + SPAN12),
    ])
    rows = substring_duplicate_pairs(docs, k=K).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_spans"] == 2
    assert r["max_span_tokens"] == 12          # the longer span wins
    assert r["n_shared_grams"] == 5 + 1        # 5 grams + 1 gram


def test_min_span_gate_and_short_docs_excluded(spark):
    docs = _docs(spark, [
        # share exactly one 8-gram (span = 8): gated out at 10
        (1, "p q r s " + "a b c d e f g h" + " t u v w"),
        (2, "x y z " + "a b c d e f g h" + " m n o"),
        # doc with < k tokens never pairs, even as an exact copy of 4
        (3, "tiny doc under eight"),
        (4, "tiny doc under eight"),
    ])
    assert substring_duplicate_pairs(
        docs, k=K, min_span_tokens=10
    ).count() == 0
    rows = substring_duplicate_pairs(docs, k=K).collect()
    assert [(r["id_a"], r["id_b"], r["max_span_tokens"]) for r in rows] == [
        (1, 2, 8)
    ]


def test_gram_frequency_cap_drops_boilerplate(spark):
    # The same 8-gram in 4 docs = 4 occurrences; cap at 3 drops it.
    gram = "c0 c1 c2 c3 c4 c5 c6 c7"
    docs = _docs(spark, [
        (i, f"pre{i}a pre{i}b " + gram + f" post{i}a post{i}b")
        for i in range(1, 5)
    ])
    assert substring_duplicate_pairs(docs, k=K, max_gram_freq=3).count() == 0
    assert substring_duplicate_pairs(docs, k=K).count() == 6  # all pairs


def test_matches_string_level_ground_truth(spark):
    """The hash-based operator must agree with literal string k-grams
    on the real documents table — proves the 62-bit identity has no
    collisions here (a single 31-bit fold measurably false-matched)."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    got = {
        (r["id_a"], r["id_b"]): r["max_span_tokens"]
        for r in substring_duplicate_pairs(docs, k=K).collect()
    }

    texts = {
        r["doc_id"]: r["text"].split(" ")
        for r in docs.select("doc_id", "text").collect()
    }
    grams: dict[tuple, list[tuple]] = {}
    for did, toks in texts.items():
        for i in range(len(toks) - K + 1):
            grams.setdefault(tuple(toks[i:i + K]), []).append((did, i))
    expected: dict[tuple, int] = {}
    diag_hits: dict[tuple, set] = {}
    for occ in grams.values():
        for da, pa in occ:
            for db, pb in occ:
                if da < db:
                    diag_hits.setdefault((da, db, pa - pb), set()).add(pa)
    for (da, db, _diag), poss in diag_hits.items():
        run = best = 1
        prev = None
        for p in sorted(poss):
            run = run + 1 if prev is not None and p == prev + 1 else 1
            best = max(best, run)
            prev = p
        key = (da, db)
        expected[key] = max(expected.get(key, 0), K - 1 + best)
    assert got == expected


# --- substring_scrub (the corpus-rewrite action) ----------------------------

def test_scrub_removes_span_from_higher_id_only(spark):
    from utn_dataengineering_stockmarketpipeline_spark.operators.dedup import (
        substring_scrub,
    )

    a_text = "one two three " + SPAN12 + " four five six"
    b_text = "seven eight " + SPAN12 + " nine ten eleven twelve"
    docs = _docs(spark, [(1, a_text), (2, b_text), (3, "short text only")])
    out = {r["doc_id"]: r for r in substring_scrub(docs, k=K).collect()}
    assert len(out) == 3                       # full corpus rewrite
    assert out[1]["text"] == a_text            # lowest id keeps the span
    assert out[1]["n_tokens_removed"] == 0
    assert out[2]["text"] == "seven eight nine ten eleven twelve"
    assert out[2]["n_spans_removed"] == 1
    assert out[2]["n_tokens_removed"] == 12
    assert out[3]["text"] == "short text only"  # < k tokens: untouched


def test_scrub_merges_overlapping_intervals(spark):
    from utn_dataengineering_stockmarketpipeline_spark.operators.dedup import (
        substring_scrub,
    )

    # doc 3 shares SPAN12's first 10 tokens with doc 1 and its last 10
    # with doc 2 -> two overlapping removal intervals that must merge
    # into one 12-token cut.
    toks = SPAN12.split()
    head10, tail10 = " ".join(toks[:10]), " ".join(toks[2:])
    docs = _docs(spark, [
        (1, head10 + " pad0 pad1 pad2 pad3 pad4 pad5 pad6 pad7"),
        (2, "lead0 lead1 lead2 lead3 lead4 lead5 lead6 lead7 " + tail10),
        (3, "x0 x1 x2 " + SPAN12 + " y0 y1 y2"),
    ])
    out = {r["doc_id"]: r for r in substring_scrub(docs, k=K).collect()}
    assert out[3]["n_spans_removed"] == 1      # merged, not two
    assert out[3]["n_tokens_removed"] == 12
    assert out[3]["text"] == "x0 x1 x2 y0 y1 y2"


def test_scrub_chain_keeps_only_lowest_id(spark):
    from utn_dataengineering_stockmarketpipeline_spark.operators.dedup import (
        substring_scrub,
    )

    docs = _docs(spark, [
        (1, "a0 a1 " + SPAN12),
        (2, "b0 b1 b2 " + SPAN12),
        (3, SPAN12 + " c0 c1 c2 c3"),
    ])
    out = {r["doc_id"]: r for r in substring_scrub(docs, k=K).collect()}
    assert out[1]["n_tokens_removed"] == 0
    assert out[2]["text"] == "b0 b1 b2"
    assert out[3]["text"] == "c0 c1 c2 c3"
