"""Graph analytics over document graphs: PageRank centrality.

Training-data pipelines use link/similarity-graph centrality as a
document-quality prior (well-connected docs are likelier canonical); the
corpus already yields two natural graphs — near-dup candidate pairs
(dedup.lsh_candidate_pairs) and symbol cross-references
(codesearch.symbol_xref def→ref edges).

Scale shape: one shuffle per iteration (contributions keyed by dst),
ranks and out-degrees are doc-keyed DataFrames; ranks are materialized
with localCheckpoint once per iteration so the two consumers (dangling
aggregate + contribution join) and the next step all reuse one
constant-size plan — the same iterative-join discipline as
dedup.resolve_clusters.
A FIXED iteration count (no convergence sampling) keeps the result
deterministic and SQL-oracle-reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    n_iter: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Standard power-iteration PageRank over a directed edge list.

    Nodes are the distinct endpoints of *edges*; duplicate edges count
    once (dedup'd up front — parallel edges would silently double
    contributions).  Dangling nodes' rank mass is redistributed uniformly
    each step (the textbook stochastic fix-up).  Returns (node, rank)
    with ranks summing to 1."""
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    try:
        n = nodes.count()
        if n == 0:
            return nodes.withColumn("rank", F.lit(0.0)).localCheckpoint(eager=True)
        outdeg = e.groupBy("src").agg(F.count("*").alias("deg")).cache()
    except Exception:
        nodes.unpersist()
        raise
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    d = float(damping)
    try:
        for _ in range(int(n_iter)):
            # materialize ranks ONCE per iteration: the dangling aggregate
            # and the contribution join both consume it, and the next
            # iteration's plan builds on it — without this the join
            # lineage re-executes for every consumer and grows each step
            ranks = ranks.localCheckpoint(eager=True)
            # mass sitting on nodes with no out-edges, redistributed evenly
            dangling = (
                ranks.join(outdeg, ranks["node"] == outdeg["src"], "left_anti")
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
                .collect()[0][0]
            )
            contrib = (
                e.join(ranks, e["src"] == ranks["node"])
                .join(outdeg, "src")
                .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
                .groupBy("dst")
                .agg(F.sum("c").alias("contrib"))
            )
            ranks = (
                nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
                .select(
                    "node",
                    (
                        F.lit((1.0 - d) / n)
                        + F.lit(d)
                        * (F.coalesce("contrib", F.lit(0.0)) + F.lit(dangling / n))
                    ).alias("rank"),
                )
            )
        return ranks.localCheckpoint(eager=True)
    finally:
        nodes.unpersist()
        outdeg.unpersist()
