"""Graph analytics over the constructed KG: entity-graph degrees and
PageRank.

PageRank uses FIXED-POINT integer arithmetic throughout (ranks scaled
by 2^20-ish SCALE, per-edge contribution = rank DIV outdegree, damping
as (85 * sum) DIV 100): integer sums are associative, so the result is
bit-identical regardless of partitioning/merge order — reproducible
run-to-run at any cluster size and exactly replayable in the DuckDB
oracle (floating-point PageRank is neither).  Dangling-node mass is
redistributed uniformly each round (integer teleport), mirrored on
both sides.

Each iteration is one shuffle (groupBy dst) plus a broadcast-sized
join with the out-degree table; lineage is truncated per round with
localCheckpoint like the other iterative ops (link.py CC)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SCALE = 1_000_000
DAMP_NUM, DAMP_DEN = 85, 100
BASE = (SCALE * (DAMP_DEN - DAMP_NUM)) // DAMP_DEN  # (1-d) * SCALE


def entity_edges(triples: DataFrame) -> DataFrame:
    """Distinct (src, dst) entity edges: subject → IRI object."""
    return (
        triples.filter(F.col("obj_kind") == "iri")
        .select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
        .distinct()
    )


def degrees(triples: DataFrame) -> DataFrame:
    """Per-node in/out degree over the distinct entity edge set."""
    # lazy barrier: the out- and in-degree aggregations each reference
    # the edge set — without it the upstream pipeline (distinct +
    # whatever produced the triples, possibly a full page-parse) runs
    # twice inside the one consuming action
    e = entity_edges(triples).localCheckpoint(eager=False)
    out = e.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("out_degree"))
    inn = e.groupBy(F.col("dst").alias("node")).agg(
        F.count("*").alias("in_degree"))
    return (
        out.join(inn, "node", "full")
        .select(
            "node",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
    )


def pagerank(triples: DataFrame, iters: int = 10) -> DataFrame:
    """(node, pr) with pr an integer rank in SCALE units.

    Dangling-node mass is redistributed uniformly each round (the
    standard teleport treatment): dang = Σ pr over nodes with no
    out-edges, and every node receives ``dang DIV n_nodes`` before
    damping — all in integer arithmetic, so the result stays
    bit-identical at any partitioning and exactly replayable in the
    unrolled DuckDB oracle.  Iteration count is FIXED (no convergence
    test): a convergence stop would make the output depend on a
    float tolerance and break oracle replay; 10 rounds is the
    documented contract (COVERAGE.md)."""
    e = entity_edges(triples).localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n_nodes = nodes.count()
    # the driver knows the graph size here — size the per-round
    # shuffles to it (restored after plan construction): 10 rounds x
    # several stages of 64 near-empty reducers was ~25% of the
    # wall-clock on a 10k-node graph, and a real-cluster session's
    # larger default stays the ceiling for web-scale graphs
    sess = triples.sparkSession
    prev_parts = sess.conf.get("spark.sql.shuffle.partitions")
    n_parts = max(8, min(int(prev_parts), n_nodes // 50_000 + 1))
    sess.conf.set("spark.sql.shuffle.partitions", str(n_parts))
    try:
        ranks = _pagerank_rounds(e, nodes, n_nodes, iters)
    finally:
        sess.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return ranks


def _pagerank_rounds(e: DataFrame, nodes: DataFrame, n_nodes: int,
                     iters: int) -> DataFrame:
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    # Edges carry their source's outdegree and are cached PRE-PARTITIONED
    # by src: every round's contribs join reuses that partitioning, so
    # the edge payload is shuffled ZERO times per round (it used to ride
    # a fresh exchange in all `iters` rounds) — guide §2.4 "remove
    # shuffles outright" / §3.3 co-partitioning.  persist() (not
    # localCheckpoint) keeps the partitioning visible to the planner.
    n_parts = int(e.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    e_out = e.join(outdeg, "src").repartition(n_parts, "src").persist()
    # ranks carries a precomputed `dangling` flag, so the per-round
    # dangling-mass term is a scan of ranks (agg over the flag), not the
    # ranks⋈outdeg anti-join it used to be — one join family removed per
    # round.
    ranks = (
        nodes.join(outdeg, nodes["node"] == outdeg["src"], "left")
        .select("node", F.col("outdeg").isNull().alias("dangling"),
                F.lit(SCALE).cast("long").alias("pr"))
        .localCheckpoint(eager=False)
    )
    for _ in range(iters):
        contribs = (
            e_out.join(ranks, e_out["src"] == ranks["node"])
            .select(F.col("dst").alias("node"),
                    F.expr("pr DIV outdeg").alias("contrib"),
                    F.lit(None).cast("boolean").alias("dangling"))
        )
        # dangling mass: one scalar row, broadcast — no driver action
        dang = (
            ranks.filter(F.col("dangling"))
            .agg(F.coalesce(F.sum("pr"), F.lit(0)).alias("dang"))
        )
        # union + single groupBy replaces the old groupBy + nodes-join:
        # each node's zero base row rides the same aggregation as the
        # contributions (sum ≡ coalesce(join-sum, 0)), and max(dangling)
        # re-attaches the flag (exactly one non-null per node) — two
        # narrow exchanges per round total (ranks into the join, the
        # union into the agg) instead of the previous seven.
        ranks = (
            contribs.unionByName(
                ranks.select("node", F.lit(0).cast("long").alias("contrib"),
                             "dangling"))
            .groupBy("node")
            .agg(F.sum("contrib").alias("s"),
                 F.max("dangling").alias("dangling"))
            .crossJoin(F.broadcast(dang))
            .select(
                "node", "dangling",
                (F.lit(BASE)
                 + F.expr("%d * (s + dang DIV %d) DIV %d"
                          % (DAMP_NUM, n_nodes, DAMP_DEN))).cast("long")
                .alias("pr"),
            )
            # LAZY barrier: truncates the Catalyst plan per round (the
            # next round scans a LogicalRDD, not a 10-round expression
            # tree) but defers execution — all rounds run as chained
            # stages of ONE action (per-job overhead was ~25% of the
            # bench on a toy graph; at scale the stages dominate either
            # way)
            .localCheckpoint(eager=False)
        )
    # EAGER final barrier: materializes the whole 10-round chain as the
    # one action (same total work, same single-action shape), so the
    # partitioned edge cache can be released deterministically instead
    # of leaking into the session.
    out = ranks.select("node", "pr").localCheckpoint()
    e_out.unpersist()
    return out
