"""Distributed PageRank over an edge-list DataFrame — the iterative
join/aggregate pattern (same family as the transitive-closure A5 and
connected-components operators, reference has nothing comparable).

Each iteration is one join (ranks x edges on src) + one groupBy(dst):
both shuffle on node id, so a cluster co-partitions them and the
per-iteration cost is linear in |edges|.  The contribution table is
localCheckpoint-ed eagerly every iteration, which both truncates
lineage (no O(iters)-deep plan) and makes the dangling-mass scalar —
1 - sum(contrib), since ranks always sum to 1 — a near-free aggregate
over materialized blocks instead of a second graph traversal.
Dangling nodes' mass is redistributed uniformly (the standard
correction), so ranks sum to 1 every iteration.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def pagerank(edges: DataFrame, iters: int = 10, damping: float = 0.85,
             src: str = "src", dst: str = "dst",
             weight: str | None = None) -> DataFrame:
    """Weighted PageRank. Returns (node, rank); ranks sum to 1."""
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"),
                     w.alias("w"))
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct().cache())
    n = nodes.count()

    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    e_norm = (e.join(out_w, "src")
              .select("src", "dst", (F.col("w") / F.col("out_w"))
                      .alias("frac")).cache())

    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    base = (1.0 - damping) / n
    for _ in range(iters):
        # One job per iteration: the eager localCheckpoint materializes
        # the contributions AND truncates lineage, so the dangling-mass
        # scalar below is a cheap agg over in-memory blocks instead of
        # the extra left_anti traversal of `ranks` it used to be.
        contrib = (
            ranks.join(e_norm, ranks["node"] == e_norm["src"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("frac")).alias("c"))
        ).localCheckpoint()
        # ranks sum to 1 and every non-dangling node forwards its whole
        # rank (frac sums to 1 per src), so the mass parked on dangling
        # nodes is exactly 1 - sum(contrib) — no second graph traversal.
        s = contrib.agg(F.sum("c")).collect()[0][0] or 0.0
        dangling = 1.0 - s
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .select("node",
                    (F.lit(base)
                     + F.lit(damping)
                     * (F.coalesce(F.col("c"), F.lit(0.0))
                        + F.lit(dangling / n))).alias("rank"))
        )
    return ranks


# Fixed-point integer PageRank: same dataflow as `pagerank`, but ranks
# live in integer units of 2^-40 and damping is the rational 17/20, so
# every iteration is exact BIGINT arithmetic — floor division only ever
# sheds deterministic dust, which the dangling-mass term absorbs. The
# point: a 10-iteration run is bit-identical on ANY engine that has
# 64-bit integers, which is what lets the registry carry a full DuckDB
# value-hash oracle for an ITERATIVE algorithm (the double-precision
# `pagerank` stays NumPy-locked instead — float sums are
# partition-order-dependent).
PR_SCALE = 1 << 40
PR_DAMP_NUM = 17
PR_DAMP_DEN = 20


def _fixedpoint_prep(edges: DataFrame, src: str, dst: str,
                     weight: str) -> tuple[DataFrame, int, DataFrame]:
    """Shared setup for the integer-fixpoint family: normalized edge
    table with out-weights, the cached node spine, and |V|."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"),
                     F.col(weight).cast("bigint").alias("w"))
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct().cache())
    n = nodes.count()
    e_out = (e.join(e.groupBy("src").agg(F.sum("w").alias("out_w")),
                    "src").cache())
    return nodes, n, e_out


def _fixedpoint_step(nodes: DataFrame, n: int, e_out: DataFrame,
                     ranks: DataFrame) -> DataFrame:
    """ONE exact-integer PageRank iteration (contrib join, the single
    driver round-trip for both fixed-point scalars, dangling-share
    math, new-rank projection) — the shared body of
    `pagerank_fixedpoint` and `pagerank_convergence`, extracted so the
    convergence audit can never desync from the fixpoint it audits."""
    base_q = ((PR_DAMP_DEN - PR_DAMP_NUM) * PR_SCALE) // (PR_DAMP_DEN * n)
    contrib = (
        ranks.join(e_out, ranks["node"] == e_out["src"])
        .select("dst", F.expr("(q * w) div out_w").alias("cc"))
        .groupBy("dst").agg(F.sum("cc").alias("c"))
    ).localCheckpoint()
    # both fixed-point scalars in ONE driver round-trip: union the
    # two frames tagged, conditional-sum, single collect (was two
    # jobs per iteration — pure latency, identical integer values)
    tot = (ranks.select(F.col("q").alias("x"),
                        F.lit(True).alias("is_rank"))
           .unionAll(contrib.select(F.col("c").alias("x"),
                                    F.lit(False).alias("is_rank")))
           .agg(F.sum(F.when(F.col("is_rank"), F.col("x")))
                .alias("prev_total"),
                F.sum(F.when(~F.col("is_rank"), F.col("x")))
                .alias("s"))
           .collect()[0])
    prev_total, s = tot["prev_total"], tot["s"] or 0
    dangling_share = (prev_total - s) // n
    return (
        nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
        .select("node",
                (F.lit(base_q)
                 + F.expr(f"({PR_DAMP_NUM} * (coalesce(c, 0L)"
                          f" + {dangling_share}L))"
                          f" div {PR_DAMP_DEN}")).alias("q"))
    )


def pagerank_fixedpoint(edges: DataFrame, iters: int = 10,
                        src: str = "src", dst: str = "dst",
                        weight: str = "weight") -> DataFrame:
    """Integer PageRank. Returns (node, rank_q BIGINT, rank DOUBLE)
    with rank = rank_q / 2^40 (exact: rank_q < 2^53)."""
    nodes, n, e_out = _fixedpoint_prep(edges, src, dst, weight)
    ranks = nodes.select("node", F.lit(PR_SCALE // n).alias("q"))
    for _ in range(iters):
        ranks = _fixedpoint_step(nodes, n, e_out, ranks)
    return ranks.select(
        "node", F.col("q").alias("rank_q"),
        (F.col("q").cast("double") / F.lit(float(PR_SCALE))).alias("rank"))


def label_propagation(edges: DataFrame, n_iter: int = 3,
                      src: str = "u", dst: str = "v",
                      canonical: bool = False) -> DataFrame:
    """Synchronous label propagation (community detection): each round
    every node adopts its neighbors' most frequent label, ties broken
    by the smaller label — fully deterministic, unlike the classic
    async/random-tie formulation, so the result is oracle-checkable.
    One join + one grouped vote + one rank per round, all shuffling on
    the node key; labels start as the node ids.

    `canonical=True` declares the input already deduplicated with
    src < dst on every row (the memoized co-purchase edge table's
    contract) — then the union with the reversed copy cannot collide
    and BOTH full-edge distinct shuffles are skipped.

    Returns DataFrame[node, label] after `n_iter` rounds."""
    e = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
         .where(F.col("u").isNotNull() & F.col("v").isNotNull()))
    if not canonical:
        e = e.distinct()
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    if not canonical:
        sym = sym.distinct()
    sym = sym.localCheckpoint(eager=True)
    labels = (sym.select(F.col("u").alias("node")).distinct()
              .withColumn("label", F.col("node"))
              .localCheckpoint(eager=True))
    for _ in range(n_iter):
        votes = (sym.join(labels.select(F.col("node").alias("v"),
                                        F.col("label").alias("lab")), "v")
                 .groupBy("u", "lab").agg(F.count(F.lit(1)).alias("c")))
        # adopt = argmax (c, -lab): most-frequent label, min-label tie
        # — max_by over a struct keeps it ONE hash aggregate instead
        # of a sort-window per round (same deterministic result)
        labels = (votes.groupBy("u")
                  .agg(F.max_by("lab", F.struct(
                      F.col("c"), (-F.col("lab")).alias("nl")))
                      .alias("label"))
                  .select(F.col("u").alias("node"), "label")
                  .localCheckpoint(eager=True))
    return labels


def pagerank_convergence(edges: DataFrame, iters: int = 10,
                         src: str = "src", dst: str = "dst",
                         weight: str = "weight") -> DataFrame:
    """Convergence audit of the integer fixpoint: per iteration the
    exact L1 and max |Δrank_q| between consecutive rank vectors —
    BIGINT arithmetic end-to-end, so the whole trajectory (not just
    the endpoint) is value-hash-checkable. One extra small join per
    iteration over the node set; the per-iteration scalars are a
    documented driver barrier (same class as the fixpoint's
    dangling-mass collect). Each iteration IS `_fixedpoint_step` — the
    audit runs the literal fixpoint body, plus only the delta
    aggregate."""
    spark = edges.sparkSession
    nodes, n, e_out = _fixedpoint_prep(edges, src, dst, weight)
    ranks = nodes.select("node", F.lit(PR_SCALE // n).alias("q"))
    deltas: list[tuple] = []
    for k in range(1, iters + 1):
        new_ranks = _fixedpoint_step(nodes, n, e_out,
                                     ranks).localCheckpoint()
        d = (new_ranks.alias("a")
             .join(ranks.alias("b"), F.col("a.node") == F.col("b.node"))
             .agg(F.sum(F.abs(F.col("a.q") - F.col("b.q")))
                  .cast("bigint").alias("l1"),
                  F.max(F.abs(F.col("a.q") - F.col("b.q")))
                  .cast("bigint").alias("mx"))
             .collect()[0])
        deltas.append((k, d["l1"], d["mx"]))
        ranks = new_ranks
    return spark.createDataFrame(
        deltas, "iteration int, l1_delta_q bigint, max_delta_q bigint"
    ).withColumn("l1_delta",
                 F.col("l1_delta_q").cast("double")
                 / F.lit(float(PR_SCALE)))
