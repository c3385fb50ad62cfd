"""Iterative graph analytics (PageRank) — the fixed-point iteration
class beyond connected components (dedup.duplicate_clusters).

PageRank here is the Pregel shape expressed in DataFrames: one shuffle
per iteration (contributions grouped by destination), the rank vector
joined back to the edge list. Spark's native GraphX/Pregel is
JVM-Scala-only; the DataFrame formulation keeps the plan visible to
Catalyst/AQE and scales the same way (edges partitioned by src, ranks
by node).

Determinism contract: a FIXED iteration count, no convergence RNG, so
any engine that runs the same algebra reproduces the values up to float
summation order (the catalog oracle unrolls the same 10 iterations in
SQL and compares after a ROUND).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Iteration bound: PageRank error contracts by the damping factor per
#: round, so 10 rounds ≈ 0.85^10 ≈ 0.2 residual of the start gap —
#: plenty for ranking/curation uses; raise for scientific use.
DEFAULT_ITERS = 10


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             iters: int = DEFAULT_ITERS,
             damping: float = 0.85,
             checkpoint_every: int = 5,
             loop_parts: int | None = None) -> DataFrame:
    """PageRank over a directed edge list → (node, rank).

    Simple-leak variant: dangling nodes (no out-edges) absorb rank
    without redistributing it — the common simplification when ranks
    are used ordinally (dedup survivor choice, crawl prioritization).

    Plan per iteration: edges ⋈ ranks on src (one hash shuffle —
    edges re-shuffle each round; at 100 TB pre-partition the edge list
    by src ONCE and the join reuses that layout), contributions
    partial-aggregate by dst, a left join pulls isolated/no-inbound
    nodes back in at the teleport floor.

    Unlike duplicate_clusters (whose CONVERGENCE TEST needs an action
    per round), the iteration count here is fixed — so rounds chain
    lazily into ONE job and Catalyst plans the whole 10-round DAG
    at once. ``localCheckpoint`` fires only every
    ``checkpoint_every`` rounds to bound plan depth/compile time
    (measured r7 at sf0.1: every-round checkpointing 17.9 s → 10.4 s
    warm with checkpoint_every=5; the remaining cost is ~30
    fixed-overhead stages, inherent to 10 chained shuffle rounds on a
    16k-node graph — at real scale per-stage work dominates that
    overhead).
    """
    # Persisted once: the raw edge projection feeds the node inventory,
    # the out-degree table, AND the weighted edge build — without the
    # persist each re-derives the caller's upstream (often a join +
    # distinct) from scratch.
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")
                     ).persist()
    m = e.count()
    nodes_raw = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes_raw.count()
    if n == 0:
        e.unpersist()
        return nodes_raw.withColumn("rank", F.lit(None).cast("double"))
    # Loop shuffle width is pinned PER PLAN with explicit repartition —
    # not by mutating the session-global spark.sql.shuffle.partitions
    # (which leaks to concurrent queries and races on restore). Width
    # scales with EDGES, not nodes: per-round work is the edge⋈rank
    # join, so ~75k edges/partition keeps tasks busy without drowning
    # a small graph in task overhead (measured at sf0.1: 587k edges →
    # 8 parts 5.6 s vs 8.0 s at the old node-derived 4; 5.9M edges →
    # 32 parts 14 s vs 25 s). Capped at the session setting — at real
    # graph scale the session width wins and the scoping is a no-op.
    spark = edges.sparkSession
    if loop_parts is None:
        session_parts = int(
            spark.conf.get("spark.sql.shuffle.partitions")
        )
        loop_parts = max(4, min(session_parts, -(-m // 75_000)))
    nodes = nodes_raw.repartition(loop_parts, "node").persist()
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # weighted edges: contribution fraction per edge is rank-independent.
    # Partitioned by src ONCE — every round's rank join is then
    # co-partitioned against the rank vector with no edge re-shuffle.
    we = e.join(outdeg, "src").repartition(loop_parts, "src").persist()
    we.count()

    teleport = (1.0 - damping) / n
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for it in range(iters):
        contrib = (
            we.join(ranks, we["src"] == ranks["node"])
            .select("dst", (F.col("rank") / F.col("outdeg")).alias("c"))
            .repartition(loop_parts, "dst")
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        # nodes (hash node @ loop_parts) ⋈ contrib (hash dst @
        # loop_parts): co-partitioned, no exchange; the new rank
        # vector stays partitioned by node for the next round's join
        ranks = nodes.join(
            contrib, nodes["node"] == contrib["dst"], "left"
        ).select(
            "node",
            (
                F.lit(teleport)
                + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))
            ).alias("rank"),
        )
        if (it + 1) % checkpoint_every == 0 and it + 1 < iters:
            ranks = ranks.localCheckpoint()
    # eager final checkpoint so the persisted inputs can release NOW —
    # returning a lazy tail over unpersisted inputs would recompute them
    ranks = ranks.localCheckpoint()
    e.unpersist()
    nodes_raw.unpersist()
    nodes.unpersist()
    we.unpersist()
    return ranks


def bfs_hops(edges: DataFrame, seeds: DataFrame, max_hops: int = 4,
             src: str = "src", dst: str = "dst",
             node_col: str = "node") -> DataFrame:
    """Minimum-hop distance from a SEED SET over an undirected edge
    list, bounded at ``max_hops`` → ``(node, hops)`` for every node
    reached (seeds at 0; unreached nodes absent). The level-synchronous
    BFS / bounded shortest-path class: supply-chain reach, blast-radius
    ("everything within k hops of the contaminated source"), curation
    neighborhood expansion.

    Expressed as bounded Bellman-Ford relaxation rather than
    frontier/anti-join BFS: ``d_k = min(d_{k-1}, 1 + d_{k-1} ⋈ edges)``
    per round, which is pure join + union + groupBy-MIN on INTEGER
    hops — no anti-join state, deterministic on any engine, and it
    unrolls to SQL CTEs verbatim (the pagerank-oracle discipline).
    Unlike :func:`pagerank` (each round references the rank vector
    once), each relaxation references its predecessor TWICE, so rounds
    checkpoint eagerly instead of chaining lazily — see the loop
    comment. The edge list is made undirected and persisted once.

    Plan per round: reached ⋈ edges on the source key (one hash
    shuffle), union with the carried distances, partial-agg MIN by
    node. At 100 TB: edges pre-partitioned by ``src`` are reused every
    round; the reached relation is the growing side but shuffles only
    (node, hops) int pairs. Relaxation visits |frontier's edges| per
    round like frontier BFS — the union-min just carries settled nodes
    through the narrow agg instead of maintaining anti-join state.
    """
    if max_hops < 0:
        raise ValueError("max_hops must be >= 0")
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    # Hash-partitioned by the join key ONCE (pagerank's weighted-edge
    # discipline): every round's expansion join then re-exchanges only
    # the small (node, hops) relation, never the edge list.
    spark = edges.sparkSession
    m = e.count()  # directed count; undirected is ≤ 2m after distinct
    session_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    loop_parts = max(4, min(session_parts, -(-2 * m // 75_000)))
    und = (
        e.unionAll(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .repartition(loop_parts, "a")
        .persist()
    )
    und.count()
    reached = seeds.select(
        F.col(node_col).alias("node"), F.lit(0).cast("int").alias("hops")
    ).distinct()
    # Each round references reached TWICE (carried union branch + the
    # expansion join), so lazy chaining would double the plan subtree
    # per round — 2^k copies by round k (measured: 87 s for 4 rounds at
    # sf0.1 vs ~5 s checkpointed). An eager localCheckpoint per round
    # keeps the plan flat; the materialized state is only (node, hops)
    # int pairs. The oracle mirrors this with MATERIALIZED CTEs.
    reached = reached.localCheckpoint()
    for _ in range(max_hops):
        expanded = (
            und.join(reached, und["a"] == reached["node"])
            .select(
                F.col("b").alias("node"),
                (F.col("hops") + F.lit(1)).cast("int").alias("hops"),
            )
        )
        reached = (
            reached.unionAll(expanded)
            .groupBy("node")
            .agg(F.min("hops").alias("hops"))
            .localCheckpoint()
        )
    und.unpersist()
    return reached
