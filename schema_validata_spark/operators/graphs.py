"""Graph-shaped QA over label-transition structure: degree profiles,
reciprocity, and triangle counts of the directed graph whose nodes are
sequence labels (tools, event types, roles) and whose edges are the
adjacent-pair transitions ``transition_counts`` already extracts.

The reference has no graph layer at all (its closest surface is flat
value counting, src/schema_validata.py:955-1147); these are north-rule
additions for transcript corpora, where the tool-call graph's SHAPE is
a quality signal: a tool that only ever self-loops, a missing reverse
edge on a request/response tool pair, or a sudden triangle-density jump
(new tool-chaining behavior) are all invisible to per-column stats.

Design: the row-level scan is ONE keyed lag window + ONE hash aggregate
(the ``transition_counts`` shape, sequence.py:184) producing an
|alphabet|²-bounded edge frame; every graph metric here is computed on
that tiny frame — self-joins included — so nothing downstream of the
first aggregate is corpus-sized. No UDFs, no collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .sequence import transition_counts


def transition_edges(df: DataFrame, part_col: str,
                     order_cols: list[str],
                     value_col: str) -> DataFrame:
    """Directed weighted edge list (src, dst, n) of the transition
    graph: adjacent label pairs within partitions, openers (NULL prev)
    and NULL labels excluded — graph metrics need real endpoints.

    SCALE: the ``transition_counts`` plan (one window + one map-side
    combined aggregate); output is |alphabet|²-bounded."""
    t = transition_counts(df, part_col, order_cols, value_col)
    return (t.where(F.col("prev_value").isNotNull()
                    & F.col("value").isNotNull())
             .select(F.col("prev_value").alias("src"),
                     F.col("value").alias("dst"),
                     F.col("n").alias("n")))


def degree_profile(edges: DataFrame) -> DataFrame:
    """Per-node degree/strength profile of a directed weighted edge
    frame ``(src, dst, n)``: how connected each label is, split by
    direction, with self-loops counted in both (standard directed
    convention) and also reported separately.

    Output per node: node, out_degree (distinct successors),
    in_degree (distinct predecessors), out_strength / in_strength
    (Σn by direction, bigint), self_loops (n on the node→node edge).

    SCALE: two tiny aggregates over the edge frame + one full outer
    join on the node label — all |alphabet|-sized."""
    outs = (edges.groupBy(F.col("src").alias("node"))
            .agg(F.countDistinct("dst").cast("bigint").alias("out_degree"),
                 F.sum("n").cast("bigint").alias("out_strength"),
                 F.sum(F.when(F.col("dst") == F.col("src"), F.col("n"))
                        .otherwise(F.lit(0)))
                  .cast("bigint").alias("self_loops")))
    ins = (edges.groupBy(F.col("dst").alias("node"))
           .agg(F.countDistinct("src").cast("bigint").alias("in_degree"),
                F.sum("n").cast("bigint").alias("in_strength")))
    z = F.lit(0).cast("bigint")
    return (outs.join(ins, "node", "full_outer")
            .select("node",
                    F.coalesce("out_degree", z).alias("out_degree"),
                    F.coalesce("in_degree", z).alias("in_degree"),
                    F.coalesce("out_strength", z).alias("out_strength"),
                    F.coalesce("in_strength", z).alias("in_strength"),
                    F.coalesce("self_loops", z).alias("self_loops")))


def graph_reciprocity(edges: DataFrame) -> DataFrame:
    """Edge reciprocity of the directed graph: for each non-loop edge
    a→b, is b→a present, and how balanced is the traffic? A
    request/response tool pair should be near-symmetric; a missing
    reverse edge on a supposedly bidirectional hop is a protocol
    smell.

    Output per unordered non-loop pair (node_a < node_b): node_a,
    node_b, n_ab, n_ba (0 when absent), reciprocal (boolean),
    imbalance = |n_ab − n_ba| / (n_ab + n_ba) (6dp). Plus the caller
    can aggregate ``reciprocal`` for the global reciprocity rate.

    SCALE: one self-join of the |alphabet|²-bounded edge frame on the
    canonicalized pair key — nothing corpus-sized."""
    e = edges.where(F.col("src") != F.col("dst"))
    fwd = (e.where(F.col("src") < F.col("dst"))
           .select(F.col("src").alias("node_a"),
                   F.col("dst").alias("node_b"),
                   F.col("n").alias("n_ab")))
    rev = (e.where(F.col("src") > F.col("dst"))
           .select(F.col("dst").alias("node_a"),
                   F.col("src").alias("node_b"),
                   F.col("n").alias("n_ba")))
    z = F.lit(0).cast("bigint")
    j = fwd.join(rev, ["node_a", "node_b"], "full_outer")
    n_ab = F.coalesce("n_ab", z)
    n_ba = F.coalesce("n_ba", z)
    return (j.select("node_a", "node_b",
                     n_ab.alias("n_ab"), n_ba.alias("n_ba"),
                     ((n_ab > 0) & (n_ba > 0)).alias("reciprocal"),
                     F.round(F.abs(n_ab - n_ba)
                             / (n_ab + n_ba).cast("double"), 6)
                      .alias("imbalance")))


def graph_triangles(edges: DataFrame) -> DataFrame:
    """Triangle participation per node of the UNDIRECTED simple graph
    underlying the edge frame (direction and weight dropped, loops
    removed): how enmeshed each label is in 3-cliques. Triangle density
    jumps flag new chaining behavior between tools that previously
    never co-occurred in a loop.

    Standard a<b<c enumeration: undirected edges are canonicalized to
    (lo, hi) pairs, then triangles are e(a,b) ⋈ e(b,c) ⋈ e(a,c). Each
    triangle is found exactly once and credits each of its three
    nodes.

    Output per node (nodes in ≥1 triangle): node, triangles (bigint).

    SCALE: two self-joins of the deduped |alphabet|²-bounded
    undirected edge frame — the classic triangle-join, safe here
    because it runs post-aggregation on the label graph, never on
    corpus rows."""
    und = (edges.where(F.col("src") != F.col("dst"))
           .select(F.least("src", "dst").alias("lo"),
                   F.greatest("src", "dst").alias("hi"))
           .distinct())
    ab = und.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    bc = und.select(F.col("lo").alias("b2"), F.col("hi").alias("c"))
    ac = und.select(F.col("lo").alias("a2"), F.col("hi").alias("c2"))
    tri = (ab.join(bc, F.col("b") == F.col("b2"))
             .join(ac, (F.col("a") == F.col("a2"))
                   & (F.col("c") == F.col("c2")))
             .select(F.col("a").alias("x"), F.col("b").alias("y"),
                     F.col("c").alias("z")))
    per_node = (tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
                .groupBy("node")
                .agg(F.count(F.lit(1)).cast("bigint").alias("triangles")))
    return per_node


def pagerank(edges: DataFrame, damping: float = 0.85,
             iterations: int = 5) -> DataFrame:
    """Weighted PageRank of the transition graph, FIXED-iteration power
    method (deterministic, oracle-checkable — the iteration count is
    part of the contract, not a convergence heuristic): which labels
    are the traffic sinks of the corpus once indirect flow is counted?
    A tool whose PageRank rises while its raw in_strength is flat is
    being reached through longer chains — a behavior shift
    ``degree_profile`` can't see.

    Update rule (standard, with dangling redistribution): pr'(v) =
    (1−d)/N + d·(Σ_in pr(u)·w(u,v)/wout(u) + dangling_mass/N), where
    dangling_mass = Σ pr(u) over nodes with no out-edges. pr(0) = 1/N.
    Σpr stays 1 every iteration.

    Output per node: node, pagerank (6dp).

    SCALE: the iteration LOOP runs on the |alphabet|²-bounded edge
    frame; each iterate is ``localCheckpoint``-ed so the logical plan
    stays O(1) per round instead of doubling (the classic iterative-
    DataFrame lineage blowup). For billion-node graphs you'd switch to
    Pregel-style partitioned iteration, out of scope for label
    alphabets."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    nodes = (edges.select(F.col("src").alias("node"))
             .union(edges.select("dst")).distinct()
             .localCheckpoint())
    n_total = nodes.count()  # tiny frame; the count also materializes it
    if n_total == 0:
        return nodes.select("node", F.lit(0.0).alias("pagerank"))
    wout = edges.groupBy("src").agg(
        F.sum(F.col("n").cast("double")).alias("__wout"))
    # per-edge share of the source's outflow — fixed across iterations
    share = (edges.join(wout, "src")
             .select("src", "dst",
                     (F.col("n").cast("double") / F.col("__wout"))
                     .alias("__share")).localCheckpoint())
    d = float(damping)
    pr = nodes.select("node", F.lit(1.0 / n_total).alias("pr"))
    for _ in range(iterations):
        contrib = (share.join(pr.withColumnRenamed("node", "src"), "src")
                   .groupBy(F.col("dst").alias("node"))
                   .agg(F.sum(F.col("pr") * F.col("__share"))
                        .alias("__in")))
        dangling = (pr.join(wout.withColumnRenamed("src", "node"),
                            "node", "left_anti")
                    .agg(F.coalesce(F.sum("pr"), F.lit(0.0))
                         .alias("__dm")))
        pr = (nodes.join(contrib, "node", "left")
              .crossJoin(F.broadcast(dangling))
              .select("node",
                      (F.lit((1.0 - d) / n_total)
                       + F.lit(d) * (F.coalesce("__in", F.lit(0.0))
                                     + F.col("__dm") / F.lit(n_total)))
                      .alias("pr")).localCheckpoint())
    return pr.select("node", F.round("pr", 6).alias("pagerank"))


def k_core(edges: DataFrame, k: int = 2, peels: int = 10) -> DataFrame:
    """Nodes surviving ``peels`` rounds of k-core peeling on the
    UNDIRECTED simple graph underlying the edge frame: repeatedly drop
    every node with fewer than k distinct neighbors among survivors.
    The k-core is the load-bearing skeleton of the tool graph —
    peripheral one-neighbor tools peel away, and a core that shrinks
    between snapshots means chained-tool behavior is disappearing.

    FIXED peel count (like ``pagerank``'s fixed iterations): after the
    core stabilizes further peels are no-ops, and |alphabet| peels
    always suffice, so ``peels`` >= the label-alphabet size gives the
    true k-core; the fixed count is what makes the operator
    deterministic and oracle-checkable.

    Output: node (nodes in the k-core after ``peels`` rounds).

    SCALE: every round is a semi-join + degree aggregate on the
    |alphabet|²-bounded undirected edge frame, with each survivor set
    ``localCheckpoint``-ed so the plan does not double per round."""
    if k < 1 or peels < 0:
        raise ValueError("k >= 1 and peels >= 0 required")
    und = (edges.where(F.col("src") != F.col("dst"))
           .select(F.col("src").alias("x"), F.col("dst").alias("y"))
           .union(edges.where(F.col("src") != F.col("dst"))
                  .select("dst", "src"))
           .distinct().localCheckpoint())
    alive = und.select(F.col("x").alias("node")).distinct() \
               .localCheckpoint()
    for _ in range(peels):
        deg = (und.join(alive.withColumnRenamed("node", "x"), "x")
               .join(alive.withColumnRenamed("node", "y"), "y")
               .groupBy(F.col("x").alias("node"))
               .agg(F.count(F.lit(1)).alias("__deg")))
        alive = deg.where(F.col("__deg") >= k).select("node") \
                   .localCheckpoint()
    return alive


def assortativity(edges: DataFrame) -> DataFrame:
    """Degree assortativity of the undirected simple graph: the Pearson
    correlation between the degrees at the two ends of every edge
    (each undirected edge counted in both directions, the standard
    convention). Positive = hubs talk to hubs (mesh-like tool usage);
    negative = hub-and-spoke. A sign flip between corpus snapshots is
    a topology change invisible to any per-node stat.

    Output one row: n_nodes, n_edges (undirected), r (6dp; NULL when
    degrees are constant — correlation undefined).

    SCALE: degree aggregate + one join of the |alphabet|²-bounded
    symmetrized edge frame; the correlation is corr() over that tiny
    frame."""
    und = (edges.where(F.col("src") != F.col("dst"))
           .select(F.least("src", "dst").alias("lo"),
                   F.greatest("src", "dst").alias("hi"))
           .distinct().cache())
    sym = und.union(und.select(F.col("hi"), F.col("lo")))
    deg = sym.groupBy(F.col("lo").alias("node")) \
             .agg(F.count(F.lit(1)).cast("double").alias("deg"))
    j = (sym.join(deg.select(F.col("node").alias("lo"),
                             F.col("deg").alias("dx")), "lo")
         .join(deg.select(F.col("node").alias("hi"),
                          F.col("deg").alias("dy")), "hi"))
    # corr() raises DIVIDE_BY_ZERO under ANSI when a degree is constant
    # (e.g. any regular graph); build Pearson from moment sums with an
    # explicit zero-variance guard -> NULL, matching DuckDB's corr()
    agg = j.agg(F.countDistinct("lo").cast("bigint").alias("n_nodes"),
                (F.count(F.lit(1)) / 2).cast("bigint").alias("n_edges"),
                F.count(F.lit(1)).cast("double").alias("__n"),
                F.sum("dx").alias("__sx"), F.sum("dy").alias("__sy"),
                F.sum(F.col("dx") * F.col("dx")).alias("__sxx"),
                F.sum(F.col("dy") * F.col("dy")).alias("__syy"),
                F.sum(F.col("dx") * F.col("dy")).alias("__sxy"))
    vx = F.col("__n") * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    vy = F.col("__n") * F.col("__syy") - F.col("__sy") * F.col("__sy")
    cov = F.col("__n") * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    r = F.when((vx > 0) & (vy > 0), cov / F.sqrt(vx * vy))
    return agg.select("n_nodes", "n_edges", F.round(r, 6).alias("r"))


def transition_entropy(edges: DataFrame) -> DataFrame:
    """Per-node outgoing-transition entropy and its contribution to the
    corpus entropy RATE: how predictable is what follows each label?
    H_out(i) = −Σ_j p_ij·log2(p_ij) with p_ij = n_ij / out_strength(i);
    the rate contribution weights it by the node's share of total
    transition traffic (the empirical analog of Σ π_i H_i for a Markov
    chain). A collapsing entropy rate between snapshots means behavior
    is templating (scripted loops); a rising one means chains are
    diversifying. Complements ``pagerank`` (where traffic settles) with
    how UNCERTAIN each step is.

    Output per node with outgoing edges: node, out_strength (bigint),
    h_out (bits, 6dp), traffic_share (6dp), rate_contribution
    (traffic_share·h_out, 6dp — sum over nodes = corpus entropy rate).

    SCALE: two aggregates on the |alphabet|²-bounded edge frame plus a
    broadcast single-row total. Self-loops count like any transition."""
    outs = edges.groupBy("src").agg(
        F.sum(F.col("n").cast("double")).alias("__w"))
    total = outs.agg(F.sum("__w").alias("__t"))
    p = F.col("n").cast("double") / F.col("__w")
    per_node = (edges.join(outs, "src")
                .groupBy(F.col("src").alias("node"))
                .agg(F.sum("n").cast("bigint").alias("out_strength"),
                     F.sum(-p * F.log2(p)).alias("__h")))
    j = per_node.crossJoin(F.broadcast(total))
    share = F.col("out_strength").cast("double") / F.col("__t")
    return j.select(
        "node", "out_strength",
        F.round("__h", 6).alias("h_out"),
        F.round(share, 6).alias("traffic_share"),
        F.round(share * F.col("__h"), 6).alias("rate_contribution"))


def transition_lift(edges: DataFrame, min_count: int = 1) -> DataFrame:
    """Markov lift of each transition: P(dst | src) / P(dst) — how much
    more (or less) likely does ``dst`` become GIVEN the previous label
    was ``src``, versus its base rate as a destination? ``lift > 1`` on
    (error → error) is the cascade smell; ``lift ≪ 1`` on a documented
    follow-up hop means the protocol isn't being followed. This is the
    sequence-order counterpart of ``pairwise_lift`` (which ignores
    order and adjacency).

    Output per edge with n >= min_count: src, dst, n (bigint), p_cond
    (P(dst|src)), p_dst (destination base rate), lift (6dp).

    SCALE: two tiny aggregates (per-src totals, per-dst totals) joined
    back onto the |alphabet|²-bounded edge frame; the row-level work
    happened in ``transition_edges``."""
    outs = edges.groupBy("src").agg(
        F.sum(F.col("n").cast("double")).alias("__srctot"))
    ins = edges.groupBy("dst").agg(
        F.sum(F.col("n").cast("double")).alias("__dsttot"))
    total = edges.agg(F.sum(F.col("n").cast("double")).alias("__t"))
    p_cond = F.col("n").cast("double") / F.col("__srctot")
    p_dst = F.col("__dsttot") / F.col("__t")
    return (edges.where(F.col("n") >= min_count)
            .join(outs, "src").join(ins, "dst")
            .crossJoin(F.broadcast(total))
            .select("src", "dst", F.col("n").cast("bigint").alias("n"),
                    F.round(p_cond, 6).alias("p_cond"),
                    F.round(p_dst, 6).alias("p_dst"),
                    F.round(p_cond / p_dst, 6).alias("lift")))
