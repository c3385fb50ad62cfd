"""Deterministic hashing for dedup / fingerprinting operators.

Everything here must be reproducible across engines (Spark vs DuckDB
oracle) and across cluster topologies, so hashes derive from MD5 — a
fixed standard both engines implement identically — never from engine
murmur variants (Spark ``hash()`` and DuckDB ``hash()`` disagree).

``md5_prefix64`` maps any string to a non-negative 60-bit int:
Spark:  cast(conv(substr(md5(s),1,15),16,10) as bigint)
DuckDB: ('0x' || substr(md5(s),1,15))::bigint
Verified byte-identical (tests/test_catalog_oracle.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_prefix64(col: Column | str) -> Column:
    """String → deterministic non-negative 60-bit integer (JVM-side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def token_hash(col: Column | str) -> Column:
    """Alias of md5_prefix64 — named for per-token use in SimHash."""
    return md5_prefix64(col)


def shingles(col: Column | str, k: int = 3) -> Column:
    """Word k-shingles of a text column as array<string>.

    ``transform`` over a sequence of start offsets keeps it JVM-side; a
    document with ≤ k tokens yields its full token string as the single
    shingle (so short docs still hash).
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(c, " ")
    n = F.size(toks)
    starts = F.sequence(F.lit(0), n - k)
    return F.when(n <= k, F.array(F.concat_ws(" ", toks))).otherwise(
        F.transform(starts, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))
    )


# --- MinHash permutation family --------------------------------------------
# h_i(x) = (a_i * x + b_i) mod M31 over the 31-bit reduction of the base
# MD5 hash. M31 = 2^31 - 1 (Mersenne prime); with a, b, x < 2^31 the
# product stays < 2^62 — exact in int64 on BOTH Spark and DuckDB, no
# 128-bit intermediates. One MD5 per shingle total (the perms are cheap
# arithmetic), which keeps MinHash scan-bound at corpus scale.

M31 = (1 << 31) - 1


def perm_seeds(num_perms: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) seeds — derived from MD5 of the perm index,
    so every run / engine / cluster computes the identical family."""
    import hashlib

    seeds = []
    for i in range(num_perms):
        h = hashlib.md5(f"minhash-seed-{i}".encode()).hexdigest()
        a = int(h[:8], 16) % (M31 - 1) + 1  # a in [1, M31-1]
        b = int(h[8:16], 16) % M31  #          b in [0, M31-1]
        seeds.append((a, b))
    return seeds


def base_hash31(col: Column | str) -> Column:
    """String → 31-bit base hash (the single MD5 evaluation)."""
    return md5_prefix64(col) % F.lit(M31)


def perm_hash(h31: Column, a: int, b: int) -> Column:
    """(a*h + b) mod M31 — one member of the permutation family."""
    return (h31 * F.lit(a) + F.lit(b)) % F.lit(M31)


# Polynomial base for composing token hashes into shingle hashes:
# (M31-1)*B + M31 < 2^62 keeps every fold step exact in int64.
SHINGLE_B = 1_000_003

# Second independent fold (modulus, base) for consumers needing a wider
# shingle identity than 31 bits: substring dedup joins on BOTH folds —
# a 62-bit combined identity, so spurious gram matches fall from
# n²/2^31 (measurable at sf0.1: ~14 false pairs over 225k grams) to
# n²/2^62 (negligible at any achievable corpus size). Both primes stay
# below 2^31 so every fold step is int64-exact on Spark AND DuckDB.
M31_2 = 2_147_483_629
SHINGLE_B2 = 1_000_033


def shingle_hash_rows(df, text_col: str = "text", id_col: str = "doc_id",
                      k: int = 3, dual: bool = False):
    """(id, pos, h): one 31-bit hash per word k-shingle, AS ROWS.

    The fast path for shingle-hash consumers (MinHash, winnowing):
    posexplode the tokens, MD5 each token ONCE in a codegen'd row
    projection (array-lambda string building is interpreted and ~2x
    slower), then compose k consecutive token hashes polynomially with
    window ``lead`` — h = fold((acc*B + th) mod M31). Only hash
    IDENTITY matters to the consumers, so shingle strings never exist.

    One shuffle on (id) for the window; downstream per-id aggregations
    reuse that partitioning (no second exchange). Documents with < k
    tokens emit one hash folding all their tokens (position 0).

    ``dual=True`` adds a second fold column ``h2`` over the SAME token
    hashes with (SHINGLE_B2, M31_2) — consumers that join on (h, h2)
    get a 62-bit combined shingle identity (substring dedup needs it;
    MinHash keeps the single 31-bit fold its permutation family
    requires). The leads are shared between the folds, so the extra
    cost is k-1 multiply-adds per position, no second window pass.
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col), F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "t")
    ).select(F.col(id_col), "pos", (md5_prefix64("t") % F.lit(M31)).alias("th"))
    w = Window.partitionBy(id_col).orderBy("pos")
    n = F.count(F.lit(1)).over(Window.partitionBy(id_col))

    def compose(m: int, base: int = SHINGLE_B, mod: int = M31) -> Column:
        h = F.col("th")
        for j in range(1, m):
            h = (h * F.lit(base) + F.lead("th", j).over(w)) % F.lit(mod)
        return h

    def guarded(base: int, mod: int) -> Column:
        h_expr = compose(k, base, mod)
        for m in range(k - 1, 0, -1):  # short docs: fold exactly n tokens
            h_expr = F.when(F.col("__n") == m, compose(m, base, mod)).otherwise(
                h_expr
            )
        return h_expr

    keep = (F.col("pos") <= F.col("__n") - k) | (
        (F.col("__n") < k) & (F.col("pos") == 0)
    )
    out = toks.withColumn("__n", n).withColumn("h", guarded(SHINGLE_B, M31))
    cols = [F.col(id_col), "pos", "h"]
    if dual:
        out = out.withColumn("h2", guarded(SHINGLE_B2, M31_2))
        cols.append("h2")
    return out.filter(keep).select(*cols)
