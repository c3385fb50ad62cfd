"""Deduplication operators for training-data pipelines.

Not reference behavior (SURVEY.md §0: north-star extensions) — these are
the operators a 100 TB text corpus needs. All four families:

- exact:    MD5 content fingerprint → hash-groupBy (one shuffle on the
            fingerprint; map-side combine collapses most duplicates).
- MinHash+LSH: shingle → salted-MD5 min-wise signatures → banded bucket
            join (Broder '97 / Leskovec MMDS ch.3). Candidate generation
            is a self-join on (band, band_hash) buckets, so cost scales
            with colliding pairs, not n².
- SimHash:  Charikar '02 sign-of-weighted-sum fingerprint; near-dup =
            small Hamming distance.
- n-gram Jaccard: exact set overlap via shingle explode + equi-join —
            the verification stage behind MinHash's estimate.

Everything is built-in array/higher-order expressions (JVM-side); no
Python UDFs anywhere, and all hashes are MD5-derived so results are
identical across engines and cluster topologies (functions/hashing.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import minhash_signature, shingles, simhash


def exact_duplicates(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Exact-duplicate groups: (fingerprint, canonical_id, dup_count).

    Canonical row = min id per group (deterministic survivor pick).
    """
    return (
        df.select(F.md5(F.col(text_col)).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def dedup_exact(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep one row per distinct text (the min-id survivor)."""
    keep = exact_duplicates(df, text_col, id_col).select(
        F.col("canonical_id").alias(id_col)
    )
    return df.join(keep, on=id_col, how="left_semi")


def with_minhash(df: DataFrame, text_col: str = "text", k: int = 3,
                 num_perms: int = 8) -> DataFrame:
    """Attach `sig` (array<bigint>, the MinHash signature) to each row."""
    return df.withColumn(
        "sig", minhash_signature(shingles(text_col, k), num_perms)
    )


def minhash_candidates(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", k: int = 3,
                       num_perms: int = 8, bands: int = 4) -> DataFrame:
    """LSH candidate pairs with estimated Jaccard.

    Bands the signature into ``bands`` groups of ``num_perms/bands``
    rows; docs sharing any band bucket become candidates. Output:
    (id_a, id_b, est_jaccard) with id_a < id_b, distinct.

    Scale shape: explode is bands× row growth (cheap), the bucket
    self-join shuffles on the band hash — skewed buckets (boilerplate
    text) are the risk, handled by AQE skew-join; a production guard
    would also cap bucket size.
    """
    rows_per_band = num_perms // bands
    sigs = with_minhash(df, text_col, k, num_perms).select(id_col, "sig")
    banded = sigs.select(
        F.col(id_col),
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                "_",
                                *[
                                    F.element_at("sig", b * rows_per_band + i + 1)
                                    for i in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "sig", "bb.band", "bb.bucket")
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    matches = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return pairs.select(
        "id_a", "id_b", (matches / F.lit(num_perms)).alias("est_jaccard")
    )


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 3,
                        threshold: float = 0.5) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs sharing ≥1 shingle.

    (id_a, id_b, jaccard) with id_a < id_b and jaccard ≥ threshold.
    Pure counting: |A∩B| via shared-shingle equi-join, |A|/|B| via
    per-doc distinct-shingle counts — divisions of exact ints, so the
    DuckDB oracle matches bit-for-bit.
    """
    sh = (
        df.select(F.col(id_col), F.explode(shingles(text_col, k)).alias("sh"))
        .distinct()
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_shared")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def with_simhash(df: DataFrame, text_col: str = "text",
                 bits: int = 16) -> DataFrame:
    """Attach the SimHash fingerprint (bigint) to each row."""
    return df.withColumn("simhash", simhash(F.split(F.col(text_col), " "), bits))


def simhash_near_pairs(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", bits: int = 16,
                       max_hamming: int = 2) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance.

    Pigeonhole banding: split the signature into two halves; any pair
    with hamming ≤ max_hamming (< bits/2) must agree exactly on at least
    one half *when max_hamming ≤ 1*; for larger distances this is a
    recall-bounded candidate filter (same trade every production SimHash
    index makes). Each half is an EQUI-join (an OR-joined predicate
    would degrade to a nested-loop cross product — instead we union two
    hash joins and dedup), then the full Hamming distance verifies via
    xor + bit_count.
    """
    half = bits // 2
    low_mask = (1 << half) - 1
    hs = with_simhash(df, text_col, bits).select(
        F.col(id_col),
        "simhash",
        F.col("simhash").bitwiseAND(F.lit(low_mask).cast("long")).alias("h_lo"),
        F.shiftright("simhash", half).alias("h_hi"),
    )

    def half_join(key: str) -> DataFrame:
        a, b = hs.alias("a"), hs.alias("b")
        return a.join(
            b,
            (F.col(f"a.{key}") == F.col(f"b.{key}"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        ).select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )

    cand = half_join("h_lo").unionAll(half_join("h_hi")).dropDuplicates(
        ["id_a", "id_b"]
    )
    return cand.filter(F.col("hamming") <= max_hamming)
