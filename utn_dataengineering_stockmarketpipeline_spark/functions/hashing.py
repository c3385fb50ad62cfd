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


def salted_hash(col: Column, salt: int) -> Column:
    """One member of the MinHash permutation family.

    Instead of the classic (a*x+b) mod p arithmetic family — which
    overflows 64-bit without 128-bit intermediates — each "permutation"
    is an independent salted MD5: h_i(s) = md5_prefix64(i || ':' || s).
    Equally uniform, trivially cross-engine, arbitrarily many perms.
    """
    return md5_prefix64(F.concat_ws(":", F.lit(str(salt)), col))


def minhash_signature(shingle_arr: Column, num_perms: int) -> Column:
    """MinHash signature over an array<string> of shingles.

    Returns array<bigint> of length ``num_perms``; element i is
    min(salted_hash_i(shingle)) over the document's shingles (Broder's
    min-wise independent permutations). All JVM array ops — no UDF, no
    shuffle; computed in the same task as the scan that produced the
    text column.
    """
    # NB: close over the salt with a factory — a `lambda s, i=i:` two-arg
    # lambda would be read by F.transform as (element, index) and silently
    # hash with the array index as the salt.
    def _hasher(salt: int):
        return lambda s: salted_hash(s, salt)

    return F.array(
        *[
            F.array_min(F.transform(shingle_arr, _hasher(i)))
            for i in range(num_perms)
        ]
    )


def simhash(token_arr: Column, bits: int = 32) -> Column:
    """SimHash of an array<string> of tokens (Charikar '02).

    Bit j of the result is the sign of Σ_tokens (±1 depending on bit j of
    the token's hash). One JVM-side aggregate per bit over the token-hash
    array — wide as an expression tree but codegen-fused, no UDF, no
    shuffle. ``bits`` ≤ 60 (md5_prefix64 yields 60 usable bits); 32 keeps
    the tree small and Hamming distance cheap (xor + bit_count).
    """
    if not 0 < bits <= 60:
        raise ValueError("bits must be in (0, 60]")
    hashes = F.transform(token_arr, lambda t: md5_prefix64(t))

    def _voter(mask: int):  # factory: keep the merge lambda strictly 2-arg
        return lambda acc, h: acc + F.when(
            h.bitwiseAND(F.lit(mask).cast("long")) != 0, 1
        ).otherwise(-1)

    out = F.lit(0).cast("long")
    for j in range(bits):
        vote = F.aggregate(hashes, F.lit(0).cast("long"), _voter(1 << j))
        out = out.bitwiseOR(F.when(vote > 0, F.lit(1 << j).cast("long")).otherwise(0))
    return out
