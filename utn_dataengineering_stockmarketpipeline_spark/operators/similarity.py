"""Similarity search over embedding columns (array<float>).

Two paths, same contract (query_id, neighbor_id, cosine, rank):

- ``brute_force_topk``: exact — queries × corpus equi-free join with the
  corpus side broadcast when it fits (or the query side, whichever is
  smaller), cosine in double precision, per-query top-k via window.
  The correctness baseline and perfectly adequate when one side is small.
- ``lsh_topk``: the scale path — random-hyperplane (sign) LSH buckets
  both sides, searches only same-bucket pairs, then re-ranks exactly.
  Approximate: recall < 1 by construction; pytest checks recall against
  brute force. Hyperplanes derive from salted MD5 of dimension indexes,
  so bucketing is deterministic (no RNG, reproducible across runs and
  engines).

Bucketing stays JVM-side (deterministic expression hashes); the
candidate-verify / re-rank stage uses the Arrow-batched BLAS cosine
(functions/vectors.cosine_blas) — measured ~100× the interpreted
zip_with/aggregate expressions when scoring millions of candidate
pairs, which is precisely the LSH/IVF hot path at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine_blas, l2_norm

#: Hard ceiling for driver-side corpus materialization in the exact
#: baselines (~2M x 64 float64 ≈ 1 GiB). Above this the operators
#: REFUSE to run rather than silently OOM the driver; the scale paths
#: are lsh_topk / ivf_topk / embedding_near_dup_pairs_lsh.
MAX_BROADCAST_ROWS = 2_000_000


def _collect_normalized(df: DataFrame, id_col: str, vec_col: str,
                        op_name: str, scale_alternative: str):
    """Driver-side (ids, normalized float64 matrix) with an ENFORCED row
    bound — the documented contract of the exact baselines, not a
    silent assumption. Raises before collecting anything if the corpus
    exceeds MAX_BROADCAST_ROWS."""
    import numpy as np

    # count over the pruned id column only — the row-count probe must
    # not pay a scan of the (fat) vector column
    n = df.select(id_col).count()
    if n > MAX_BROADCAST_ROWS:
        raise ValueError(
            f"{op_name}: corpus has {n} rows > MAX_BROADCAST_ROWS="
            f"{MAX_BROADCAST_ROWS}; the exact baseline materializes the "
            f"corpus on the driver. Use {scale_alternative} at this scale."
        )
    rows = df.select(id_col, vec_col).collect()
    ids = np.fromiter((r[0] for r in rows), dtype=np.int64, count=len(rows))
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    return ids, mat


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    BLAS-shaped: the corpus collects to one normalized float64 matrix
    broadcast to executors; each Arrow batch of queries scores with a
    single numpy matmul and ranks in-batch (argsort on (-cosine, id)).
    The expression formulation (crossJoin + zip_with cosine + window)
    is ~10x slower — higher-order lambdas are interpreted per element.

    Excludes self-matches. Similarity rounds to ``round_to`` BEFORE
    ranking with a deterministic (sim desc, neighbor_id) tiebreak, so
    results are stable across engines and partitionings. Corpus must
    fit driver memory (it is the BROADCAST side by definition) — the
    bound is ENFORCED (MAX_BROADCAST_ROWS, raises past it); the scale
    paths are :func:`lsh_topk` and :func:`ivf_topk`.
    """
    import numpy as np
    import pandas as pd

    c_ids, mat = _collect_normalized(
        corpus, id_col, vec_col, "brute_force_topk", "lsh_topk/ivf_topk"
    )
    bc = corpus.sparkSession.sparkContext.broadcast((c_ids, mat))

    def score(batches):
        ids_c, m = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            a = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            a /= np.linalg.norm(a, axis=1, keepdims=True)
            sims = np.round(a @ m.T, round_to)
            q_ids = pdf[id_col].to_numpy()
            outs = []
            for i in range(len(q_ids)):
                s = sims[i].copy()
                s[ids_c == q_ids[i]] = -np.inf  # exclude self
                order = np.lexsort((ids_c, -s))[:k]
                outs.append(
                    pd.DataFrame(
                        {
                            "query_id": q_ids[i],
                            "neighbor_id": ids_c[order],
                            "cosine": s[order],
                            "rank": np.arange(1, len(order) + 1),
                        }
                    )
                )
            yield pd.concat(outs, ignore_index=True)

    return queries.select(id_col, vec_col).mapInPandas(
        score, "query_id long, neighbor_id long, cosine double, rank int"
    )


def _hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random unit-ish hyperplane from MD5 bytes."""
    import hashlib

    vals = []
    for d in range(dim):
        h = hashlib.md5(f"{plane}:{d}".encode()).hexdigest()
        vals.append((int(h[:8], 16) / 0x7FFFFFFF) - 1.0)  # ~U[-1, 1)
    return vals


def lsh_bucket(vec_col, dim: int, n_planes: int = 8, plane_offset: int = 0):
    """Sign-LSH bucket id (0 .. 2^n_planes-1) as a Column expression.

    ``plane_offset`` selects a disjoint slice of the deterministic
    hyperplane family — banded multi-table LSH (dedup) gives each table
    its own offset so tables are independent.
    """
    bucket = F.lit(0)
    for p in range(n_planes):
        plane = _hyperplane(dim, plane_offset + p)
        dot = F.aggregate(
            F.zip_with(
                vec_col,
                F.array(*[F.lit(v) for v in plane]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        # Sign decision on the QUANTIZED dot: the bucket id is a
        # cross-engine identity (mirrored in the DuckDB oracles), and a
        # raw `dot >= 0` rests on no dot landing within float-summation-
        # order drift (~1e-13) of zero — BLAS here vs list_sum there can
        # then flip a bit nondeterministically. Rounding to 6 dp first
        # makes the decision stable for any |dot| drift < 5e-7.
        bucket = bucket + F.when(
            F.round(dot, 6) >= 0, F.lit(1 << p)
        ).otherwise(0)
    return bucket


def _table_buckets(vec_col, dim: int, n_tables: int, planes_per_table: int):
    """Array of (tbl, bucket) structs — one sign-LSH bucket per table,
    each table hashing with its own disjoint slice of the deterministic
    hyperplane family. Expression variant: JVM-side but interpreted per
    element (n_tables × planes × dim lambda evals per row); prefer
    :func:`table_buckets_blas` on real corpora."""
    return F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"),
                lsh_bucket(
                    vec_col, dim, planes_per_table,
                    plane_offset=t * planes_per_table,
                ).alias("bucket"),
            )
            for t in range(n_tables)
        ]
    )


def table_buckets_blas(vec_col, dim: int, n_tables: int,
                       planes_per_table: int) -> Column:
    """All tables' sign-LSH bucket ids in ONE matmul per Arrow batch.

    Returns ``array<int>`` indexed by table. Same hyperplane family and
    bit order as :func:`_table_buckets` (bit p of table t = sign of the
    dot with plane ``t*planes_per_table + p``), but the (rows ×
    n_tables·planes) dot products run as a single BLAS matmul instead
    of interpreted per-element lambdas — the difference between seconds
    and minutes once corpora hit 10⁵ rows.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    planes = np.array(
        [
            _hyperplane(dim, t * planes_per_table + p)
            for t in range(n_tables)
            for p in range(planes_per_table)
        ],
        dtype=np.float64,
    )  # (n_tables*planes_per_table, dim)
    weights = (1 << np.arange(planes_per_table)).astype(np.int64)

    def _buckets(v: "pd.Series") -> "pd.Series":
        if len(v) == 0:
            return pd.Series([], dtype="object")
        m = np.stack(v.to_numpy()).astype(np.float64)
        # quantized sign decision — same 6-dp rounding as lsh_bucket and
        # the DuckDB oracles, so summation-order drift can't flip a bit
        bits = (np.round(m @ planes.T, 6) >= 0.0).astype(np.int64)
        ids = (
            bits.reshape(len(m), n_tables, planes_per_table) * weights
        ).sum(axis=2)
        return pd.Series(list(ids.astype(np.int32)))

    _buckets.__annotations__ = {}  # explicit returnType below, no hints
    buckets = pandas_udf(_buckets, "array<int>")
    return buckets(F.col(vec_col) if isinstance(vec_col, str) else vec_col)


def auto_planes_per_table(n_rows: int, target_bucket_size: int = 64,
                          lo: int = 4, hi: int = 16) -> int:
    """Bucket-count tuning rule: pick planes so the EXPECTED bucket size
    stays ~``target_bucket_size`` as the corpus grows (2^planes buckets
    per table ≈ n / target). Keeps candidate-pair volume O(n · target ·
    tables) — linear in n — instead of O(n²/2^planes) with fixed
    planes. Collision probability for true near-duplicates (cosine →
    1, θ → 0) stays ≈1 at any plane count, so the DEDUP use case keeps
    its recall; for loose-threshold similarity SEARCH, fix planes
    manually and raise n_tables per LSH theory instead."""
    import math

    return min(hi, max(lo, math.ceil(math.log2(max(1.0, n_rows / target_bucket_size)))))


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_tables: int = 8,
    planes_per_table: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: multi-table sign-LSH, exact re-rank in-bucket.

    Single-table sign-LSH collapses on high-dimensional data (top
    neighbors sit at θ≈60-70°, so 6 planes pass only ~6% of true pairs).
    Multi-table is the standard fix: ``n_tables`` independent tables of
    ``planes_per_table`` planes; a pair is a candidate if it collides in
    ANY table (p = 1-(1-(1-θ/π)^planes)^tables ≈ 0.7 at θ=66°).

    Both sides explode to (tbl, bucket) keys — one equi-join shuffle; at
    100 TB the corpus side is hashed once and reusable across query
    batches. Candidates dedup on (query, neighbor), then exact cosine
    re-ranks, so precision of returned scores is 1 — only recall is
    approximate (pytest-checked against brute force).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.posexplode(
            table_buckets_blas(vec_col, dim, n_tables, planes_per_table)
        ).alias("tbl", "bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.posexplode(
            table_buckets_blas(vec_col, dim, n_tables, planes_per_table)
        ).alias("tbl", "bucket"),
    )
    # score BEFORE the dedup shuffle: duplicate candidates (same pair
    # colliding in several tables) get identical cosines, so deduping
    # after scoring is exact — and the shuffle then moves 24-byte rows
    # instead of two vectors per candidate
    sim = F.round(cosine_blas("q_vec", "c_vec"), 6)
    scored = (
        q.join(c, ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


#: Quantization for the IVF k-means' cross-engine identity: normalized
#: vectors round to 7 dp, per-iteration similarities and centroids to
#: 6 dp. Every value that feeds a comparison or is carried across an
#: iteration is quantized, so float summation-order drift between BLAS
#: here and list_sum in the DuckDB oracle (~1e-13) cannot flip an
#: assignment — the same discipline that made the sign-LSH bucket ids
#: an exact identity.
#:
#: Half-boundary assumption (documented per ADVICE r8): np.round is
#: round-half-to-even while DuckDB's round() is half-away-from-zero, so
#: the identity additionally assumes no similarity/centroid component
#: lands EXACTLY on a half at the rounded digit (x * 10^6 == n + 0.5
#: exactly in float64). The inputs are products/sums of 7-dp-quantized
#: float64 values whose binary expansions do not terminate at the 6th
#: decimal, so an exact representable half requires the accumulated
#: product to hit one of ~2^-52-measure points — it cannot arise from
#: drift (drift is ~1e-13, the boundary gap for a flip is 0.5e-6) and
#: would require the dataset to be adversarially constructed. A
#: mode-stable formula (floor(x*1e6+0.5)/1e6 on all three engines)
#: remains the escape hatch if a future dataset ever trips this.
IVF_ROUND_VEC = 7
IVF_ROUND_SIM = 6


def _kmeans_centroids(mat, n_centroids: int, iters: int = 5):
    """Deterministic Lloyd's k-means on a (normalized, quantized)
    matrix: init = first n rows in id order, fixed iteration count, no
    RNG, argmax ties break to the lowest centroid index, and every
    similarity/centroid is rounded (IVF_ROUND_SIM) — every run, every
    cluster, and the SQL oracle compute identical centroids."""
    import numpy as np

    import math

    scale = 10 ** IVF_ROUND_VEC
    cent = mat[:n_centroids].copy()
    for _ in range(iters):
        # cosine (rows normalized); round before argmax so the winning
        # centroid is drift-stable; np.argmax takes the FIRST max =
        # lowest centroid index on ties (ROW_NUMBER ... ORDER BY sim
        # DESC, c in the oracle)
        sims = np.round(mat @ cent.T, IVF_ROUND_SIM)
        assign = np.argmax(sims, axis=1)
        for c in range(n_centroids):
            members = mat[assign == c]
            if len(members):
                # EXACT member sums: components are IVF_ROUND_VEC-dp
                # quanta, so the micro-unit integers are exact and the
                # sum is order-independent — a float sum here (numpy
                # pairwise vs the oracle's parallel SQL SUM) wobbles in
                # the last ulp and can flip a 6dp centroid quantum
                # (observed as a run-to-run oracle flake in r10). The
                # norm comes from the same integers via python's
                # unbounded ints (mi² sums pass 2^63); float(nsq) and
                # DuckDB's VARCHAR->DOUBLE route are both correctly
                # rounded, so sqrt sees the identical double.
                mi = np.rint(members * scale).astype(np.int64).sum(axis=0)
                nsq = sum(int(x) * int(x) for x in mi)
                if nsq > 0:
                    cent[c] = np.round(
                        mi.astype(np.float64) / math.sqrt(float(nsq)),
                        IVF_ROUND_SIM,
                    )
    return cent


def train_centroids(corpus: DataFrame, n_centroids: int,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    train_sample_rows: int = 65_536):
    """Deterministic k-means centroids over a bounded corpus sample —
    the shared training step of :func:`ivf_topk` and
    :func:`semantic_dedup`. Sample membership is the
    ``train_sample_rows`` lowest rows by ``(xxhash64(id), id)`` — an
    order-statistic on a content hash (pure function of row values,
    partitioning-independent; Catalyst runs it as a distributed top-k,
    so driver memory stays O(sample)); see :func:`_kmeans_centroids`
    for the quantization that makes training a cross-engine identity.
    Returns a (n_centroids, dim) float64 ndarray."""
    return _kmeans_centroids(
        _train_matrix(corpus, id_col, vec_col, train_sample_rows),
        n_centroids,
    )


def _train_matrix(corpus: DataFrame, id_col: str, vec_col: str,
                  train_sample_rows: int):
    """The bounded, deterministic train sample as a normalized,
    quantized float64 matrix sorted by id (see train_centroids for the
    hash-order-statistic membership rule)."""
    import numpy as np

    train = (
        corpus.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col).cast("string")), F.col(id_col))
        .limit(train_sample_rows)
    )
    rows = sorted(train.collect(), key=lambda r: r[0])
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    # quantize the normalized train matrix (see IVF_ROUND_VEC): the
    # k-means downstream is then an exact cross-engine identity
    return np.round(mat, IVF_ROUND_VEC)


def assign_centroids(df: DataFrame, cent, top_n: int = 1,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     out_col: str = "centroid",
                     sim_col: str | None = None) -> DataFrame:
    """Nearest-centroid assignment (Arrow-batched BLAS, one pass):
    each input row yields its ``top_n`` closest centroids by quantized
    cosine — ``top_n=1`` builds the inverted index, ``top_n=n_probe``
    expands queries. Ties break to the lowest centroid index (stable
    sort on rounded sims), mirrored exactly by the SQL oracles.
    ``sim_col`` optionally emits the quantized (IVF_ROUND_SIM dp)
    cosine to the assigned centroid — the same rounded value the
    ranking itself compares, so it carries the identical cross-engine
    exactness contract."""
    import numpy as np
    import pandas as pd

    bc = df.sparkSession.sparkContext.broadcast(cent)
    schema = f"{id_col} long, {vec_col} array<float>, {out_col} int"
    if sim_col is not None:
        schema += f", {sim_col} double"

    def run(batches):
        c = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            a = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            a /= np.linalg.norm(a, axis=1, keepdims=True)
            # same quantization as the train matrix; stable sort on
            # the rounded sims so probe order ties break to the
            # lowest centroid index — both mirrored in the oracle
            a = np.round(a, IVF_ROUND_VEC)
            sims = np.round(a @ c.T, IVF_ROUND_SIM)
            order = np.argsort(-sims, axis=1, kind="stable")[:, :top_n]
            out = {
                id_col: pdf[id_col].to_numpy().repeat(top_n),
                vec_col: [v for v in pdf[vec_col] for _ in range(top_n)],
                out_col: order.ravel(),
            }
            if sim_col is not None:
                out[sim_col] = np.take_along_axis(sims, order, 1).ravel()
            yield pd.DataFrame(out)

    return df.select(id_col, vec_col).mapInPandas(run, schema)


def semantic_dedup(
    corpus: DataFrame,
    dim: int,
    threshold: float = 0.4,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_sample_rows: int = 65_536,
    max_cluster_size: int | None = 4096,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. '23,
    arXiv:2303.09540): cluster the embedding space with the same
    deterministic k-means as :func:`ivf_topk`, then WITHIN each cluster
    greedily drop any vector whose cosine to a lower-id cluster member
    reaches ``threshold`` — pairwise comparison cost falls from O(n²)
    to Σ|cluster|², the paper's core trick for web-scale corpora.

    Returns every corpus row as ``(id, centroid, is_kept)`` — the
    curation report form (survivors = ``is_kept``; the flag layout
    keeps the drop DECISION auditable, unlike a survivors-only set).
    Greedy-by-id is the deterministic replacement for the paper's
    random keeper choice: x drops iff SOME y < x in its cluster has
    cos(x, y) >= threshold (no transitive chaining — matches greedy
    scan order, exactly SQL-expressible, oracle-backed).

    Scale plan: assignment is one Arrow-batched map pass; in-cluster
    pairing is an equi-join on centroid over NARROW (id, centroid)
    rows with the vectors joined back only for scoring, so no vector
    payload rides the pair shuffle. ``max_cluster_size`` is the skew
    guard (same discipline as the LSH bucket cap, mirrored in the
    oracle): over-cap clusters skip pairing — at real scale raise
    ``n_centroids`` ~ n/target instead (SemDeDup uses k ≈ √n).
    """
    assigned, pairs = _semantic_assign_and_pairs(
        corpus, threshold, n_centroids, id_col, vec_col,
        train_sample_rows, max_cluster_size,
    )
    # greedy-by-id: a pair always has id_a < id_b, so the DROPPED side
    # is the higher id — exactly 'some lower-id neighbor exists'
    dropped = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return (
        assigned.select(F.col(id_col), "centroid")
        .join(dropped.withColumn("__drop", F.lit(True)), id_col, "left")
        .select(
            id_col, "centroid",
            F.coalesce(~F.col("__drop"), F.lit(True)).alias("is_kept"),
        )
    )


def _semantic_assign_and_pairs(
    corpus: DataFrame,
    threshold: float,
    n_centroids: int,
    id_col: str,
    vec_col: str,
    train_sample_rows: int,
    max_cluster_size: int | None,
) -> tuple[DataFrame, DataFrame]:
    """Shared by :func:`semantic_dedup` (greedy drop) and
    :func:`semantic_near_dup_pairs` (pair report / transitive
    clustering): deterministic k-means assignment plus the in-cluster
    near-dup pairs ``(id_a < id_b, cosine)`` — narrow id rows ride the
    pair shuffle, vectors join back only for scoring; over-cap clusters
    skip pairing (skew guard)."""
    cent = train_centroids(corpus, n_centroids, id_col, vec_col,
                           train_sample_rows)
    # deterministic, so recomputing the assignment on each branch is
    # correct; a production pipeline would persist/checkpoint it
    assigned = assign_centroids(corpus, cent, 1, id_col, vec_col)
    narrow = assigned.select(F.col(id_col).alias("id"), "centroid")
    sizes = narrow.groupBy("centroid").agg(F.count(F.lit(1)).alias("sz"))
    if max_cluster_size is not None:
        sizes = sizes.filter(F.col("sz") <= max_cluster_size)
    cand = (
        narrow.join(F.broadcast(sizes.select("centroid")), "centroid")
        .alias("a")
        .join(narrow.alias("b"),
              (F.col("a.centroid") == F.col("b.centroid"))
              & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    )
    va = corpus.select(F.col(id_col).alias("id_a"),
                       F.col(vec_col).alias("va"))
    vb = corpus.select(F.col(id_col).alias("id_b"),
                       F.col(vec_col).alias("vb"))
    pairs = (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a", "id_b",
            F.round(cosine_blas("va", "vb"), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
    return assigned, pairs


def semantic_near_dup_pairs(
    corpus: DataFrame,
    dim: int,
    threshold: float = 0.4,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_sample_rows: int = 65_536,
    max_cluster_size: int | None = 4096,
) -> DataFrame:
    """In-cluster semantic near-dup pairs ``(id_a < id_b, cosine)`` —
    the pair-report form of :func:`semantic_dedup`, and the edge list
    for transitive semantic clustering (feed to
    ``dedup.duplicate_clusters`` for the ε-ball-chaining variant the
    greedy rule deliberately avoids)."""
    _, pairs = _semantic_assign_and_pairs(
        corpus, threshold, n_centroids, id_col, vec_col,
        train_sample_rows, max_cluster_size,
    )
    return pairs


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_sample_rows: int = 65_536,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the other standard ANN
    index besides LSH (Faiss's default shape).

    Train: deterministic k-means over a bounded SAMPLE of the corpus —
    never the full corpus. When the corpus exceeds
    ``train_sample_rows``, membership is the ``train_sample_rows``
    lowest rows by ``(xxhash64(id), id)`` — an order-statistic on a
    content hash, so the sample is (a) exactly the requested size,
    (b) uniform-ish like a random draw (hash order is uncorrelated
    with id/time order), and (c) a pure function of the row VALUES:
    repartitioned or re-ordered input yields the identical sample,
    unlike ``df.sample`` whose per-partition Bernoulli draw changes
    membership with partitioning. Catalyst executes the
    orderBy+limit as a distributed top-k (TakeOrderedAndProject),
    so driver memory stays O(sample) at any corpus scale. The
    collected sample is then sorted by id before k-means so centroid
    iteration order is reproducible too.
    Index: each corpus vector assigns to its nearest centroid
    (Arrow-batched BLAS, one pass). Search: each query probes its
    ``n_probe`` closest centroids, exact-reranks only those lists —
    search cost is ~n_probe/n_centroids of brute force, recall is
    pytest-checked against the exact baseline.
    """
    cent = train_centroids(corpus, n_centroids, id_col, vec_col,
                           train_sample_rows)
    c_assigned = assign_centroids(corpus, cent, 1, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        "centroid",
    )
    q_assigned = assign_centroids(queries, cent, n_probe, id_col, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        "centroid",
    )
    # as in lsh_topk: score first, then dedup narrow (id, id, cosine)
    # rows — never shuffle vector payloads through dropDuplicates
    sim = F.round(cosine_blas("q_vec", "c_vec"), 6)
    scored = (
        q_assigned.join(c_assigned, "centroid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# --- IVF-PQ: product-quantized inverted file ---------------------------------

#: PQ geometry: dim splits into PQ_M subspaces, each quantized to one
#: of PQ_CODES codebook entries — a 64-dim float32 vector (256 B)
#: becomes PQ_M single-byte codes. Sub-k-means runs PQ_ITERS fixed
#: Lloyd's iterations under the same quantization discipline as the
#: IVF chain (IVF_ROUND_SIM on distances/means), so the whole index is
#: a cross-engine identity.
PQ_M = 8
PQ_CODES = 16
PQ_ITERS = 3


def _kmeans_euclid(mat, n_codes: int, iters: int = PQ_ITERS):
    """Deterministic Euclidean Lloyd's over sub-vectors (the PQ
    codebook trainer): init = first n_codes rows in id order, squared
    distances and means rounded to IVF_ROUND_SIM, argmin ties break to
    the lowest code (np.argmin first-min == ROW_NUMBER ORDER BY dist,
    k in the oracle), empty clusters keep their previous codeword."""
    import numpy as np

    cb = mat[:n_codes].copy()
    scale = 10 ** IVF_ROUND_VEC
    for _ in range(iters):
        d = np.round(
            ((mat[:, None, :] - cb[None, :, :]) ** 2).sum(-1), IVF_ROUND_SIM
        )
        assign = np.argmin(d, axis=1)
        for kk in range(n_codes):
            members = mat[assign == kk]
            if len(members):
                # exact micro-unit integer sums (see _kmeans_centroids:
                # float member sums are summation-order-dependent and
                # flaked against the oracle's parallel SQL SUM); the
                # mean divides by the exact double n*scale on both
                # engines
                mi = np.rint(members * scale).astype(np.int64).sum(axis=0)
                cb[kk] = np.round(
                    mi.astype(np.float64) / (len(members) * float(scale)),
                    IVF_ROUND_SIM,
                )
    return cb


def train_ivfpq(corpus: DataFrame, dim: int, n_centroids: int = 16,
                m_subspaces: int = PQ_M, n_codes: int = PQ_CODES,
                id_col: str = "vec_id", vec_col: str = "embedding",
                train_sample_rows: int = 65_536):
    """Train the IVF-PQ index on the bounded sample: coarse centroids
    (shared deterministic k-means), then per-subspace codebooks over
    the sample's RESIDUALS (vector minus its assigned centroid — the
    classic Jégou '11 residual PQ). Returns (centroids,
    codebooks[m, n_codes, dim/m])."""
    import numpy as np

    if dim % m_subspaces:
        raise ValueError("dim must divide evenly into PQ subspaces")
    sub = dim // m_subspaces
    mat = _train_matrix(corpus, id_col, vec_col, train_sample_rows)
    cent = _kmeans_centroids(mat, n_centroids)
    sims = np.round(mat @ cent.T, IVF_ROUND_SIM)
    res = mat - cent[np.argmax(sims, axis=1)]
    codebooks = np.stack([
        _kmeans_euclid(res[:, s * sub:(s + 1) * sub], n_codes)
        for s in range(m_subspaces)
    ])
    return cent, codebooks


def ivfpq_encode(corpus: DataFrame, cent, codebooks, dim: int,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """Encode the corpus against a trained IVF-PQ index: one
    Arrow-batched pass emitting NARROW rows (id, centroid,
    codes array<int>) — at 100 TB this is the whole point: the ANN
    search structure stores m single-byte codes per vector instead of
    the fat float payload (32x smaller at dim=64/m=8), and the fat
    column never leaves the scan."""
    import numpy as np
    import pandas as pd

    m, n_codes, sub = codebooks.shape
    bc = corpus.sparkSession.sparkContext.broadcast((cent, codebooks))

    def run(batches):
        c_mat, cbs = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            a = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            a /= np.linalg.norm(a, axis=1, keepdims=True)
            a = np.round(a, IVF_ROUND_VEC)
            sims = np.round(a @ c_mat.T, IVF_ROUND_SIM)
            assign = np.argmax(sims, axis=1)
            res = a - c_mat[assign]
            codes = np.empty((len(a), m), dtype=np.int32)
            for s in range(m):
                rs = res[:, s * sub:(s + 1) * sub]
                d = np.round(
                    ((rs[:, None, :] - cbs[s][None, :, :]) ** 2).sum(-1),
                    IVF_ROUND_SIM,
                )
                codes[:, s] = np.argmin(d, axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "centroid": assign.astype("int32"),
                    "codes": list(codes),
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(
        run, f"{id_col} long, centroid int, codes array<int>"
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    m_subspaces: int = PQ_M,
    n_codes: int = PQ_CODES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_sample_rows: int = 65_536,
) -> DataFrame:
    """IVF-PQ approximate top-k (Jégou et al. '11 — Faiss IVFPQ): the
    memory-scale path past plain IVF. Corpus vectors live in the index
    ONLY as (centroid, m codes); queries probe ``n_probe`` cells and
    score candidates by ASYMMETRIC DISTANCE — the query dot-products
    the RECONSTRUCTION centroid + codeword, never the original vector,
    so search moves ~m bytes per candidate instead of 4*dim.

    approx_cosine = round(q_n · (centroid_c + codebook[s][code_s]
    concat), 6): both engines see identical quantized inputs, so the
    score — and hence the top-k — is an exact cross-engine identity
    (recall vs the exact baseline is the approximate part, pytest-
    gated). Output: (query_id, neighbor_id, approx_cosine, rank).
    """
    import numpy as np
    import pandas as pd

    cent, codebooks = train_ivfpq(
        corpus, dim, n_centroids, m_subspaces, n_codes,
        id_col, vec_col, train_sample_rows,
    )
    codes = ivfpq_encode(corpus, cent, codebooks, dim, id_col, vec_col)
    q_assigned = assign_centroids(
        queries, cent, n_probe, id_col, vec_col
    ).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        "centroid",
    )
    # queries are the tiny side: broadcast them onto the narrow code
    # rows; the ADC scorer is one Arrow pass over the joined rows
    cand = (
        F.broadcast(q_assigned)
        .join(codes.withColumnRenamed(id_col, "neighbor_id"), "centroid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    bc = corpus.sparkSession.sparkContext.broadcast((cent, codebooks))

    def adc(batches):
        c_mat, cbs = bc.value
        m, _, sub = cbs.shape
        for pdf in batches:
            if pdf.empty:
                continue
            q = np.stack(pdf["q_vec"].to_numpy()).astype(np.float64)
            q /= np.linalg.norm(q, axis=1, keepdims=True)
            q = np.round(q, IVF_ROUND_VEC)
            cds = np.stack(pdf["codes"].to_numpy())
            recon = c_mat[pdf["centroid"].to_numpy()].copy()
            for s in range(m):
                recon[:, s * sub:(s + 1) * sub] += cbs[s][cds[:, s]]
            score = np.round(np.einsum("ij,ij->i", q, recon),
                             IVF_ROUND_SIM)
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy(),
                    "neighbor_id": pdf["neighbor_id"].to_numpy(),
                    "approx_cosine": score,
                }
            )

    scored = cand.select(
        "query_id", "q_vec", "neighbor_id", "centroid", "codes"
    ).mapInPandas(
        adc, "query_id long, neighbor_id long, approx_cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def embedding_norms(df: DataFrame, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Per-vector L2 norm + dimension (sanity/QA projection)."""
    return df.select(
        F.col(id_col),
        F.size(vec_col).alias("dim"),
        F.round(l2_norm(vec_col), 6).alias("l2_norm"),
    )


def quantize_int8(df: DataFrame, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Per-vector symmetric int8 scalar quantization — the standard 4×
    storage/bandwidth lever for corpus-scale embedding stores (Faiss
    SQ8): scale = max|x| / 127, q_i = round(x_i / scale) ∈ [-127, 127].

    Pure JVM-side higher-order expressions (transform + aggregate) fused
    with the scan — zero shuffle, no UDF. Emits the dequantization
    scale (rounded for cross-engine parity) and the max absolute
    reconstruction error |q_i·scale − x_i| ≤ scale/2 as an audit
    column. Zero vectors keep scale 0 and quantize to all-zeros.
    """
    x = F.col(vec_col)
    max_abs = F.array_max(F.transform(x, lambda v: F.abs(v.cast("double"))))
    scale = max_abs / F.lit(127.0)
    q = F.when(max_abs == 0, F.transform(x, lambda v: F.lit(0))).otherwise(
        F.transform(x, lambda v: F.round(v.cast("double") / scale).cast("int"))
    )
    df2 = df.select(
        F.col(id_col), scale.alias("__scale"), q.alias("q8"), x.alias("__x")
    )
    err = F.array_max(
        F.zip_with(
            "q8",
            "__x",
            lambda qi, xi: F.abs(
                qi.cast("double") * F.col("__scale") - xi.cast("double")
            ),
        )
    )
    return df2.select(
        id_col,
        F.round("__scale", 9).alias("scale"),
        "q8",
        F.round(err, 9).alias("max_abs_err"),
    )


def embedding_outliers(df: DataFrame, k: int = 5,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       group_col: str = "label") -> DataFrame:
    """Per-group embedding OUTLIERS: the ``k`` vectors farthest from
    their group centroid — the embedding-side noise gate (mislabeled /
    off-domain / garbage embeddings sit far from their cluster's mass;
    curation pipelines drop or review them before training).

    Cross-engine exactness without float accumulation (a plain AVG of
    floats is partition-order-dependent): components quantize to
    integer micro-units q = floor(x*1e6 + 0.5) — the mode-stable
    formula, identical on any engine; per-group integer sums are exact
    in int64 (|q| <= ~4e6, so groups up to ~1e12 rows stay in range);
    the reference point is the QUANTIZED centroid c_d = floor((2*s_d +
    n)/(2n)) (the centroid rounded half-up to micro-units — 1e-6
    displacement, immaterial for outlier ranking and documented),
    computed in PURE int64 arithmetic ((x - pmod(x, 2n)) div 2n — a
    double division would round its 2^53-bit mantissa before floor()
    once 2s+n passes ~9e15, i.e. billion-row groups); distances are
    exact integer sums of squares (|q - c| <= 8e6, squared * dim fits
    int64), ranked as BIGINTs — no float ever decides an order. The
    reported ``dist`` converts the SAME integer on both engines, so
    even its double is identical.

    Plan: one explode (id, group, dim, q) + groupBy(group, dim) for
    sums — the only wide stage, |groups| x dim output rows; centroid
    arrays are driver-small and BROADCAST back; per-vector distance is
    a zero-shuffle zip_with/aggregate over the original array; the
    top-k window partitions by group. At 100 TB: explode rows are 16
    bytes, partial aggregation absorbs them map-side.
    """
    micro = F.lit(1_000_000)
    q_arr = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * micro + F.lit(0.5))
        .cast("long"),
    )
    base = df.select(F.col(id_col), F.col(group_col), q_arr.alias("__q"))
    sums = (
        base.select(
            group_col, F.posexplode("__q").alias("__d", "__qd")
        )
        .groupBy(group_col, "__d")
        .agg(F.sum("__qd").alias("__s"), F.count(F.lit(1)).alias("__n"))
    )
    cent = sums.withColumn(
        "__cd",
        F.expr(
            "(2*__s + __n - pmod(2*__s + __n, 2*__n)) div (2*__n)"
        ),
    ).groupBy(group_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("__d", "__cd"))),
            lambda t: t["__cd"],
        ).alias("__c")
    )
    dist_sq = F.aggregate(
        F.zip_with(
            F.col("__q"), F.col("__c"), lambda q, c: (q - c) * (q - c)
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    scored = base.join(F.broadcast(cent), group_col).select(
        F.col(id_col),
        F.col(group_col),
        dist_sq.alias("__dist_sq"),
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col("__dist_sq").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("outlier_rank", F.row_number().over(w))
        .filter(F.col("outlier_rank") <= k)
        .select(
            id_col,
            group_col,
            "outlier_rank",
            F.round(
                F.sqrt(F.col("__dist_sq").cast("double")) / micro, 6
            ).alias("dist"),
        )
    )


def jl_sign_matrix(dim_out: int, dim_in: int) -> list[list[int]]:
    """Deterministic ±1 Johnson–Lindenstrauss projection matrix:
    sign(o, i) = parity of the first hex nibble of md5("rp_{o}_{i}") —
    a pure function of the coordinates, so every run, every engine, and
    the SQL oracle share the identical matrix (the same no-RNG
    discipline as the LSH hyperplanes above). Achlioptas '01 shows ±1
    entries satisfy the JL lemma with the same distortion bounds as
    Gaussian entries."""
    import hashlib

    return [
        [
            1 if int(
                hashlib.md5(f"rp_{o}_{i}".encode()).hexdigest()[0], 16
            ) % 2 == 0 else -1
            for i in range(dim_in)
        ]
        for o in range(dim_out)
    ]


def random_projection(df: DataFrame, dim_in: int = 64, dim_out: int = 16,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """JL random projection — the dimensionality-reduction step that
    makes downstream embedding work (ANN candidate generation,
    clustering, near-dup banding) ride dim_out numbers instead of
    dim_in: long-format output (id, proj_dim, y_q) plus the per-vector
    norm-preservation ratio (JL's whole point — should sit near 1).

    Exactness without float accumulation: components quantize to
    integer micro-units (floor(x*1e6 + 0.5), the embedding_outliers
    formula); each projected coordinate y_o = Σ_i ±q_i is an exact
    int64 (|y| <= dim_in * ~5e6, and Σy² <= dim_out·1e17 stays in
    int64); the norm ratio sqrt((Σ y²)/dim_out) / sqrt(Σ q²) divides
    deterministic doubles converted from exact integers. Zero-shuffle,
    one Arrow pass: the matmul runs as a numpy int64 product per batch
    — the expression formulation (transform over the literal matrix
    folding a zip_with) is semantically identical but interpreted per
    element (dim_in·dim_out lambda evals per row; measured 2.6 s vs
    0.4 s at sf0.1), the same HOF-vs-BLAS gap every scoring path in
    this module documents. At 100 TB the projection is embarrassingly
    parallel and the output is dim_out/dim_in the width of its input.
    """
    import numpy as np
    import pandas as pd

    rt = np.array(jl_sign_matrix(dim_out, dim_in), dtype=np.int64).T

    def run(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            q = np.floor(x * 1_000_000 + 0.5).astype(np.int64)
            y = q @ rt                          # exact int64 (n, dim_out)
            ysq = (y * y).sum(axis=1)           # <= dim_out*1e17, in range
            qsq = (q * q).sum(axis=1)
            with np.errstate(divide="ignore", invalid="ignore"):
                ratio = np.round(
                    np.sqrt(ysq.astype(np.float64) / float(dim_out))
                    / np.sqrt(qsq.astype(np.float64)),
                    6,
                )
            ratio = np.where(qsq == 0, 0.0, ratio)
            n = len(pdf)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy().repeat(dim_out),
                    "proj_dim": np.tile(
                        np.arange(dim_out, dtype=np.int32), n
                    ),
                    "y_q": y.ravel(),
                    "norm_ratio": ratio.repeat(dim_out),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        run,
        f"{id_col} long, proj_dim int, y_q long, norm_ratio double",
    )


def prototype_pruning(
    corpus: DataFrame,
    drop_pct: int = 25,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_sample_rows: int = 65_536,
) -> DataFrame:
    """Prototypicality-based data pruning (Sorscher et al. '22,
    "Beyond neural scaling laws", arXiv:2206.14486): cluster the
    embedding space with the shared deterministic k-means, rank each
    cluster's members by cosine to their OWN centroid (the paper's
    self-supervised prototypicality metric), and drop the most
    prototypical ``drop_pct`` percent per cluster — the redundant,
    "easy" core of each mode — keeping the hard boundary examples that
    actually move the loss. The complement of SemDeDup: that pass
    removes near-DUPLICATES; this one thins dense-but-distinct regions.

    Returns every corpus row as ``(id, centroid, proto_sim, is_kept)``
    — the audit form (decision visible, like :func:`semantic_dedup`).
    ``proto_sim`` is the IVF_ROUND_SIM-quantized cosine to the assigned
    centroid; the rank compares its exact micro-unit integer
    (``round(sim·1e6)`` as BIGINT, id tiebreak), so no float ever
    decides an order and the DuckDB oracle replays it verbatim.
    ``drop_pct`` is an integer percentage; the per-cluster drop count
    is ``(size · drop_pct) div 100`` — exact integer arithmetic on both
    engines.

    Scale plan: ONE Arrow-batched BLAS assignment pass (no pair join at
    all — unlike SemDeDup there is no quadratic in-cluster term), then
    one narrow (id, centroid, sim_q) shuffle for the per-cluster rank
    window. With fixed k the cluster partitions grow with n — at real
    scale raise ``n_centroids`` ~ n/target (the operator's documented
    k∝n policy, same as :func:`semantic_dedup`)."""
    cent = train_centroids(corpus, n_centroids, id_col, vec_col,
                           train_sample_rows)
    asg = assign_centroids(corpus, cent, 1, id_col, vec_col,
                           sim_col="proto_sim")
    narrow = asg.select(
        id_col, "centroid", "proto_sim",
        F.round(F.col("proto_sim") * 1_000_000).cast("long").alias("__simq"),
    )
    w = Window.partitionBy("centroid").orderBy(
        F.col("__simq").desc(), F.col(id_col)
    )
    wc = Window.partitionBy("centroid")
    return (
        narrow.withColumn("__rk", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(wc))
        .withColumn(
            "is_kept",
            F.col("__rk") > F.expr(f"(__n * {int(drop_pct)}) div 100"),
        )
        .select(id_col, "centroid", "proto_sim", "is_kept")
    )
