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
