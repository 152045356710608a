"""Distributed connected components by iterative min-label propagation.

Used by operators.lines.merge_lines (GEOSMergeLines analog) and
operators.dedup.minhash_dedup's exact-cluster mode. Large-star/
small-star-style label propagation on an edge list: each round every
vertex takes the min label among itself and its neighbors; converges
in O(diameter) rounds (checked by a fixed-point count). Each round
persists its labels so round N's plan does not recursively contain
round N-1 (the lineage-compounding trap)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gfp_gdal_spark.plans.lineage import flat_checkpoint

__all__ = ["connected_components", "pagerank", "bfs_hops"]


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 40
) -> DataFrame:
    """edges (src, dst) -> (vertex, component) with component = min
    vertex id in the component. Vertex ids must be orderable (long).

    Shiloach-Vishkin-style hook + compress (round 3 — the previous
    per-vertex min-label + one-jump variant was O(log n) only when ids
    happen to be ordered along the component; on PERMUTED ids, e.g.
    monotonically_increasing_id segment chains, it needed near-linear
    rounds). Each round:

    1. HOOK: every edge contributes its endpoint-label pair; each
       region root adopts the minimum neighboring region label
       (a groupBy on the label — region-level, so the information
       reaches the ROOT, not just the border vertex).
    2. COMPRESS: component := component(component), two pointer-
       doubling steps per round (collapses label trees of depth <= 4;
       deeper trees finish over the following rounds — partial
       compression only affects convergence SPEED, never correctness,
       and skipping the per-step fixpoint count saves one driver
       action per step).

    Region count at least halves per round (every non-minimal region
    hooks onto a smaller neighbor), giving O(log n) rounds for ANY id
    assignment — verified on permuted 10^5-vertex chains (11 rounds).
    Convergence is detected by hook-emptiness (hook empty <=> every
    edge's endpoints share a label <=> done, independent of how
    compressed the labels are); if not reached within ``max_iter``
    rounds the function RAISES rather than silently returning wrong
    (split) components. Per round: ONE count action (the hook
    cardinality, piggybacked on its cache materialization) + the
    flat_checkpoint of the labels (absolute-stats reset — see
    plans.lineage.flat_checkpoint for why a plain localCheckpoint
    stalls) + two cheap compress checkpoints.
    """
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    # localCheckpoint (not just persist): each iteration would otherwise
    # grow the logical plan, and Catalyst re-analysis of the deepening
    # self-join tree dominates wall time long before the data does.
    # repartition("a") BEFORE the checkpoint: LogicalRDD preserves the
    # physical outputPartitioning, so every round's first hook join
    # (sym ⋈ labels on "a") reuses it and only the labels side
    # exchanges — one full edge-list shuffle per round removed
    # (measured ~11% per CC run at sf1.0, more when rounds are many).
    sym = (
        sym.where(F.col("a") != F.col("b")).distinct().repartition("a").localCheckpoint()
    )
    labels = (
        sym.select(F.col("a").alias("vertex"))
        .distinct()
        .withColumn("component", F.col("vertex"))
        .localCheckpoint()
    )
    converged = False
    for _ in range(max_iter):
        # (1) HOOK — per-edge label pairs, min cross-region label per root
        la = labels.select(F.col("vertex").alias("a"), F.col("component").alias("_la"))
        lb = labels.select(F.col("vertex").alias("b"), F.col("component").alias("_lb"))
        cross = (
            sym.join(la, "a")
            .join(lb, "b")
            .where(F.col("_la") != F.col("_lb"))
            .select("_la", "_lb")
        )
        hook = (
            cross.groupBy("_la")
            .agg(F.min("_lb").alias("_m"))
            .where(F.col("_m") < F.col("_la"))
            .persist()
        )
        if hook.count() == 0:
            hook.unpersist()
            converged = True
            break
        old_labels = labels
        labels = flat_checkpoint(
            labels.join(hook, labels["vertex"] == hook["_la"], "left")
            .select(
                "vertex",
                F.least(
                    F.col("component"), F.coalesce("_m", F.col("component"))
                ).alias("component"),
            )
        )
        hook.unpersist()
        old_labels.unpersist()
        # (2) COMPRESS — two fixed doubling steps CHAINED LAZILY with a
        # single localCheckpoint after both (one materialization job per
        # round instead of two; the inputs are materialized LogicalRDD
        # blocks, so the duplicated subtree scans inside the chained
        # self-joins are cheap cached reads — measured ~5% per CC run).
        # Stats square per step but the next round's flat_checkpoint
        # resets them to absolute, so growth stays bounded at ^4.
        cur = labels
        for _c in range(2):
            mapping = cur.select(
                F.col("vertex").alias("_mv"), F.col("component").alias("_mc")
            )
            cur = (
                cur.withColumnRenamed("component", "_old")
                .join(mapping, F.col("_old") == F.col("_mv"), "left")
                .select(
                    "vertex",
                    F.least(F.col("_old"), F.coalesce("_mc", F.col("_old"))).alias(
                        "component"
                    ),
                )
            )
        prev = labels
        labels = cur.localCheckpoint()
        prev.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            f"raise max_iter (rounds needed ~ log2(n) for any id layout)"
        )
    return labels


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    n_iter: int = 20,
    checkpoint_every: int = 2,
) -> DataFrame:
    """PageRank (Brin & Page 1998) over a directed edge list ->
    (vertex, rank), Σ rank = 1. The link-authority quality signal
    web-corpus curation pipelines score crawl domains with — the
    importance axis beside the text-quality heuristics.

    Power iteration, FIXED ``n_iter`` rounds (deterministic output and
    zero per-round driver actions, unlike a tolerance loop; 20 rounds
    puts the residual below d^20 ~ 0.04 of the initial gap and any
    caller can raise it). Dangling-vertex mass (no out-edges) is
    redistributed uniformly — the standard stochastic-matrix patch —
    via a 1-row cross join, not a driver collect.

    Per round: contribs = ranks ⋈ out-degree-normalized edges ->
    ONE groupBy(dst) sum + the dangling-mass scalar; the new ranks
    right-join the vertex table so zero-in-degree vertices keep the
    teleport term. flat_checkpoint per round kills both the recursive
    lineage and the join-size-estimate squaring (see plans.lineage).

    Scale: each round is one equi-join + one hash agg on vertex keys —
    the CC shape; a hot (high-in-degree) vertex is a groupBy key whose
    partial sums map-side combine. Edge weights are uniform 1/outdeg
    (the classic formulation); pass pre-weighted edges through a
    custom loop if you need weighted links.
    """
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1): {damping!r}")
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1: {n_iter!r}")
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    verts = flat_checkpoint(
        e.select(F.col("_s").alias("v"))
        .unionByName(e.select(F.col("_d").alias("v")))
        .distinct()
    )
    n_v = verts.count()
    outd = e.groupBy("_s").agg(F.count(F.lit(1)).alias("_outd"))
    # normalized adjacency, invariant across rounds — pre-partitioned
    # by the join key so each round's contribs join reuses the
    # checkpointed partitioning (only the ranks side exchanges)
    adj = flat_checkpoint(
        e.join(outd, "_s")
        .select("_s", "_d", (1.0 / F.col("_outd")).alias("_w"))
        .repartition("_s")
    )
    teleport = (1.0 - damping) / n_v
    # dangling vertices are a STRUCTURAL property — detect once, and
    # when there are none (most link graphs after a sink-filter pass)
    # drop the per-round anti-join + scalar-broadcast entirely; this
    # halves the per-round stage count
    dangle_v = flat_checkpoint(
        verts.join(outd.withColumnRenamed("_s", "v"), "v", "left_anti")
    )
    has_dangling = dangle_v.limit(1).count() > 0
    # Checkpoint cadence: ranks joins the CHECKPOINTED adj each round
    # (never itself), so the sizeInBytes estimate grows by one multiply
    # per round — linear bit growth, NOT the self-join squaring trap —
    # and the only cost of deferring is plan depth. Cutting every
    # ``checkpoint_every`` rounds amortizes flat_checkpoint's two
    # materializations without letting the analyzer walk an O(n_iter)
    # recursive plan.
    ranks = verts.select("v", F.lit(1.0 / n_v).alias("rank"))
    for it in range(n_iter):
        contribs = (
            adj.join(ranks.withColumnRenamed("v", "_s"), "_s")
            .groupBy(F.col("_d").alias("v"))
            .agg(F.sum(F.col("rank") * F.col("_w")).alias("_in"))
        )
        new_rank = F.lit(teleport) + F.lit(damping) * F.coalesce(
            F.col("_in"), F.lit(0.0)
        )
        nxt = verts.join(contribs, "v", "left")
        if has_dangling:
            # dangling mass: rank sitting on vertices with no out-edges
            dangling = (
                ranks.join(dangle_v, "v")
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm"))
            )
            nxt = nxt.crossJoin(dangling)
            new_rank = F.lit(teleport) + F.lit(damping) * (
                F.coalesce(F.col("_in"), F.lit(0.0)) + F.col("_dm") / n_v
            )
        ranks = nxt.select("v", new_rank.alias("rank"))
        if (it + 1) % max(int(checkpoint_every), 1) == 0 or it == n_iter - 1:
            ranks = flat_checkpoint(ranks)
    return ranks


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "src",
    dst: str = "dst",
    vertex: str = "vertex",
    max_hops: int = 30,
    directed: bool = False,
) -> DataFrame:
    """Minimum-hop distance from a SEED SET — multi-source BFS over an
    edge list (the crawl-graph curation signal: link distance from
    trusted seed domains ranks crawl frontiers, beside pagerank's
    authority score; also reachability pruning and mesh/track hop
    counts). ``sources`` is a one-column DataFrame of seed vertex ids
    (never a driver-side list — seed sets can be large). Returns
    (vertex, hops) for every vertex reachable within ``max_hops``;
    seeds get 0, unreachable vertices are absent (left-join the vertex
    table and fill if a sentinel is wanted).

    Level-synchronous frontier BFS: round k joins the CURRENT frontier
    to the adjacency (ONE equi-join), anti-joins the settled set, and
    the surviving vertices become frontier k+1. Exact min-hops under
    any partitioning (a vertex is settled the first level it appears,
    which IS its minimum hop count). Each round shuffles only the
    frontier's adjacency — total traffic over the run is O(|E|)
    amortized, the settled side of the anti-join stays hash-joinable,
    and every round's frontier is flat_checkpoint-ed so round N's plan
    never contains round N-1 (the connected_components lineage rule).
    One count action per round (empty frontier = convergence, free on
    the checkpoint materialization). A frontier still alive at
    ``max_hops`` returns the <= max_hops truncation — documented, not
    an error: distance-from-seeds consumers cap the horizon by design.
    """
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    if not directed:
        sym = sym.unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
    # pre-partitioned by the frontier-join key (see connected_components)
    sym = (
        sym.where(F.col("a") != F.col("b")).distinct().repartition("a").localCheckpoint()
    )
    seed = flat_checkpoint(
        sources.select(F.col(sources.columns[0]).alias("vertex"))
        .distinct()
        .withColumn("hops", F.lit(0))
    )
    # settled is kept as a LAZY union of the per-round checkpointed
    # frontiers: every leaf is a materialized LogicalRDD with ABSOLUTE
    # size stats, and a union's estimate is the SUM of its leaves (no
    # product, so no stats-squaring — the trap flat_checkpoint exists
    # for only bites join-shaped lineage). This keeps the loop at TWO
    # jobs per round (frontier materialize + eager checkpoint); the
    # old shape re-checkpointed the whole settled set every round,
    # ~2.5x the fixed per-round job overhead that dominates high-
    # diameter graphs.
    settled = seed
    frontier = seed
    for hop in range(1, max_hops + 1):
        nxt = (
            sym.join(frontier.select(F.col("vertex").alias("a")), "a")
            .select(F.col("b").alias("vertex"))
            .distinct()
            .join(settled.select("vertex"), "vertex", "left_anti")
            .withColumn("hops", F.lit(hop))
        )
        # the flat_checkpoint's own materialization count doubles as
        # the convergence check (one wasted checkpoint job on the
        # final empty frontier — negligible)
        frontier, n = flat_checkpoint(nxt, return_count=True)
        if n == 0:
            break
        settled = settled.unionByName(frontier)
    return settled.select(F.col("vertex").alias(vertex), "hops")
