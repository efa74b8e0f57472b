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
    seeds: list | None = None,
) -> DataFrame:
    """Power-iteration PageRank over a directed edge list — uniform, or
    PERSONALIZED when ``seeds`` is given (Page et al. 1999 §6;
    Haveliwala 2002 topic-sensitive PageRank): the teleport vector puts
    mass 1/|seeds∩nodes| on each seed node and 0 elsewhere, so ranks
    measure proximity to the seed set ("documents related to these" —
    the graph-walk cousin of more_like_this) instead of global
    centrality. Dangling mass follows the teleport vector too (the
    standard personalized fix-up); seeds absent from the graph are
    ignored, and an entirely-absent seed set raises.

    Nodes are the distinct endpoints of *edges*; duplicate edges count
    once (dedup'd up front — parallel edges would silently double
    contributions).  Returns (node, rank) with ranks summing to 1.
    The uniform path's float arithmetic is kept BIT-IDENTICAL to the
    pre-personalization form ((1-d)/n precomputed on the driver) so the
    existing oracle replay still matches."""
    # e is consumed by nodes, outdeg, AND the contribution join of EVERY
    # power iteration — without the cache the whole upstream edge
    # derivation (e.g. an LSH candidate-pair pipeline) re-executes
    # n_iter+2 times (measured 69s -> ~7s on the sf0.1 bench entry)
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct().cache()
    # every cached DataFrame is registered here the moment it is created,
    # so the single finally below unpersists them on EVERY exit path —
    # early empty-graph return, seeds-absent raise, mid-setup failure
    cached = [e]
    try:
        nodes = (
            e.select(F.col("src").alias("node"))
            .unionByName(e.select(F.col("dst").alias("node")))
            .distinct()
            .cache()
        )
        cached.append(nodes)
        n = nodes.count()
        if n == 0:
            return nodes.withColumn("rank", F.lit(0.0)).localCheckpoint(
                eager=True
            )
        outdeg = e.groupBy("src").agg(F.count("*").alias("deg")).cache()
        cached.append(outdeg)
        # dangling node set is CONSTANT across iterations — one anti-join,
        # not one per step
        no_out = (
            nodes.join(outdeg, nodes["node"] == outdeg["src"], "left_anti")
            .select("node")
            .cache()
        )
        cached.append(no_out)
        # the edge⋈outdeg join is iteration-invariant too: materialize
        # (src, dst, deg) once so each power step is ranks⋈edges→agg, not
        # a fresh three-way join
        e_deg = e.join(outdeg, "src").select("src", "dst", "deg").cache()
        cached.append(e_deg)
        d = float(damping)
        if seeds is None:
            tele = None
            ranks = nodes.withColumn("rank", F.lit(1.0 / n))
        else:
            in_seed = F.col("node").isin(list(seeds))
            s = nodes.filter(in_seed).count()
            if s == 0:
                raise ValueError("pagerank: no seed node present in the graph")
            tele = nodes.withColumn(
                "t", F.when(in_seed, F.lit(1.0 / s)).otherwise(F.lit(0.0))
            ).cache()
            cached.append(tele)
            ranks = tele.select("node", F.col("t").alias("rank"))
        for _ in range(int(n_iter)):
            # materialize ranks ONCE per iteration: the dangling aggregate
            # and the contribution join both consume it, and the next
            # iteration's plan builds on it — without this the join
            # lineage re-executes for every consumer and grows each step
            ranks = ranks.localCheckpoint(eager=True)
            # mass sitting on nodes with no out-edges, redistributed along
            # the teleport vector (uniform / seed-concentrated). Kept IN
            # the plan as a broadcast 1-row aggregate instead of a
            # .collect() scalar: each iteration is then ONE Spark job
            # (the next checkpoint), not two — same double-precision
            # value, same expression shape, so results are bit-identical
            # to the collected-literal form the oracle replays.
            dangling = F.broadcast(
                ranks.join(no_out, "node")
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dang"))
            )
            contrib = (
                e_deg.join(ranks, e_deg["src"] == ranks["node"])
                .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
                .groupBy("dst")
                .agg(F.sum("c").alias("contrib"))
            )
            if tele is None:
                ranks = (
                    nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
                    .crossJoin(dangling)
                    .select(
                        "node",
                        (
                            F.lit((1.0 - d) / n)
                            + F.lit(d)
                            * (
                                F.coalesce("contrib", F.lit(0.0))
                                + F.col("_dang") / F.lit(float(n))
                            )
                        ).alias("rank"),
                    )
                )
            else:
                ranks = (
                    tele.join(contrib, tele["node"] == contrib["dst"], "left")
                    .crossJoin(dangling)
                    .select(
                        "node",
                        (
                            F.lit(1.0 - d) * F.col("t")
                            + F.lit(d)
                            * (
                                F.coalesce("contrib", F.lit(0.0))
                                + F.col("_dang") * F.col("t")
                            )
                        ).alias("rank"),
                    )
                )
        return ranks.localCheckpoint(eager=True)
    finally:
        for df in cached:
            df.unpersist()
