"""Distributed graph operators over the edges table.

Beyond the reference's graph surface (storage + NetworkX export,
kb.py:681-722), these are the analysis operators a property graph at
scale needs — all expressed as DataFrame self-joins / iterative
frontier expansion, no driver-side graph materialization:

- triangle_count: multi-way self-join with ordered endpoints
- bfs_depths: iterative frontier BFS (bounded depth, localCheckpoint)
- pagerank: power iteration with out-degree normalization

Scale notes: triangles join on endpoint keys (shuffle-heavy but
standard; at 100 TB pre-filter to the k-core first); BFS/PageRank
iterations shuffle on node id and truncate lineage per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def undirected(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Symmetrized edge list (both arcs per undirected edge), deduped."""
    return (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(
            edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """Triangles per ordered vertex triple (a < b < c): one row each.

    Ordered endpoints make each triangle appear exactly once, and the
    ordering predicate prunes 5/6 of the join space before the second
    join (the standard distributed triangle enumeration).
    """
    und = undirected(edges)
    e1 = und.filter(F.col("a") < F.col("b"))
    e2 = e1.select(F.col("a").alias("b2"), F.col("b").alias("c"))
    e3 = e1.select(F.col("a").alias("a3"), F.col("b").alias("c3"))
    wedges = e1.join(e2, e1["b"] == e2["b2"]).select("a", "b", "c")
    return wedges.join(
        e3, (wedges["a"] == e3["a3"]) & (wedges["c"] == e3["c3"])
    ).select("a", "b", "c")


def bfs_depths(
    edges: DataFrame, source: int, max_depth: int = 6
) -> DataFrame:
    """Minimum hop count from ``source`` to every reachable node within
    ``max_depth`` (iterative frontier expansion; cycles handled by the
    visited set, lineage truncated per round)."""
    und = undirected(edges).persist()
    spark = edges.sparkSession
    visited = spark.createDataFrame(
        [(source, 0)], "node long, depth int"
    ).localCheckpoint()
    frontier = visited
    for d in range(1, max_depth + 1):
        neighbors = (
            und.join(frontier, und["a"] == frontier["node"])
            .select(F.col("b").alias("node"))
            .distinct()
        )
        frontier = (
            neighbors.join(visited.select("node"), "node", "left_anti")
            .withColumn("depth", F.lit(d))
            .localCheckpoint()
        )
        if frontier.limit(1).count() == 0:
            break
        visited = visited.unionByName(frontier).localCheckpoint()
    und.unpersist()
    return visited


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 10,
) -> DataFrame:
    """PageRank over the symmetrized graph via power iteration.

    Returns (node, rank). Uniform initial ranks 1/N; dangling nodes
    can't occur after symmetrization (every node has out-degree ≥ 1).
    """
    und = undirected(edges).persist()
    nodes = und.select(F.col("a").alias("node")).distinct().persist()
    n = nodes.count()
    out_deg = und.groupBy(F.col("a").alias("node")).agg(
        F.count("*").alias("deg")
    )
    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).localCheckpoint()
    for _ in range(iterations):
        contribs = (
            und.join(ranks, und["a"] == ranks["node"])
            .join(out_deg.withColumnRenamed("node", "dn"), F.col("a") == F.col("dn"))
            .select(
                F.col("b").alias("node"),
                (F.col("rank") / F.col("deg")).alias("contrib"),
            )
            .groupBy("node")
            .agg(F.sum("contrib").alias("inflow"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    und.unpersist()
    nodes.unpersist()
    return ranks


def lpa_communities(edges: DataFrame, iterations: int = 3) -> DataFrame:
    """Synchronous label-propagation community detection over the
    symmetrized graph, made deterministic: each round every node adopts
    the most frequent label among its neighbors AND itself (the
    self-vote breaks the 2-cycle label swap synchronous LPA exhibits
    on bipartite components — a bare pair otherwise trades labels
    forever), ties broken by the SMALLEST label (plain LPA's random
    tie-break is unusable for an oracle-checked operator). Labels
    start as node ids; the fixed round count keeps the operator a
    bounded DAG.

    Returns (node, community). Scale shape: each round is one
    neighbor-key join + one (node, label) count + one node-partitioned
    argmax window — all on the node exchange; localCheckpoint truncates
    the per-round lineage (DEVNOTES invariant #2).
    """
    from pyspark.sql.window import Window

    und = undirected(edges).persist()
    labels = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(iterations):
        votes = und.join(labels, und["b"] == labels["node"]).select(
            F.col("a").alias("v"), "label"
        ).unionByName(
            labels.select(F.col("node").alias("v"), "label")
        )
        counts = votes.groupBy("v", "label").agg(F.count("*").alias("c"))
        w = Window.partitionBy("v").orderBy(F.desc("c"), F.asc("label"))
        labels = (
            counts.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("v").alias("node"), "label")
            .localCheckpoint()
        )
    und.unpersist()
    return labels.select("node", F.col("label").alias("community"))


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """k-core decomposition: iteratively peel nodes of degree < k
    until the residual graph is stable; returns the surviving
    (node, degree) rows — degree measured INSIDE the core.

    The standard cohesion screen before community detection: spam
    link-farms and long chains peel away, the dense interaction core
    stays. Every iteration is two node-keyed exchanges (degree count +
    semi-join filter) over the CURRENT edge set, which only shrinks;
    localCheckpoint truncates the per-iteration lineage exactly like
    bfs_depths/pagerank above. Terminates when an iteration removes
    nothing (checked via a driver-side count — one scalar per round,
    same discipline as the Lloyd driver's convergence test).

    Edges are treated as undirected: callers pass each edge once and
    degrees count both endpoints.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        deg = (
            e.select(F.col("a").alias("node"))
            .unionByName(e.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("degree"))
        )
        keep = deg.filter(F.col("degree") >= k).select("node")
        e2 = (
            e.join(keep.withColumnRenamed("node", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("node", "b"), "b", "left_semi")
            .localCheckpoint(eager=True)
        )
        n_before, n_after = e.count(), e2.count()
        e = e2
        if n_after == n_before or n_after == 0:
            break
    return (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
        .filter(F.col("degree") >= k)
    )
