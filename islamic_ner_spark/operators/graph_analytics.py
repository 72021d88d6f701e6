"""Whole-graph analytics over the merged KG: PageRank and triangles.

The reference stops at point lookups and BFS (`src/graph/query.py`);
these are the two whole-graph measures a KG consumer asks for next —
"who are the central narrators" (PageRank) and "how clustered is the
transmission network" (triangle enumeration).  Both are built to be
DuckDB-replayable bit-for-bit, which forces a discipline that also
pays off at scale:

- **Integer-exact arithmetic.**  PageRank is computed in fixed-point
  (ranks scaled by 1e9, integer division only), so every sum is an
  order-independent integer sum — the result is invariant to partition
  layout, task scheduling, and engine, and the driver's value-hash
  oracle can replay the whole iteration in SQL.  Float PageRank would
  differ across engines in the last ulp because float addition is not
  associative.
- **Bounded iteration.**  A fixed ``n_iters`` (default 5) keeps the
  oracle expressible as unrolled CTEs and the Spark lineage bounded
  (each iteration is localCheckpoint-ed, same as BFS/components).

Scale shape (1000-executor reading):

- PageRank per iteration: one equi-join of the edge list against the
  rank table on ``src`` (both hash-partitioned on the same key, so AQE
  reuses the exchange across iterations) followed by one partial-agg
  sum keyed on ``tgt``.  No driver-side collect; the rank table is
  node-sized, never corpus-sized.
- Triangles: edges are oriented from the lower-(degree, key) endpoint
  to the higher one, the standard worst-case-optimal orientation — a
  node's out-neighborhood in the oriented graph is O(sqrt(|E|)), so the
  wedge join (the only quadratic step) is bounded even on skewed
  degree distributions; the closing edge check is a semi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

PAGERANK_SCALE = 1_000_000_000
PAGERANK_ITERS = 5


def scholar_digraph(edges: DataFrame) -> DataFrame:
    """Distinct directed Scholar->Scholar NARRATED_FROM pairs (no
    self-loops) from a merged edge table (operators/graph.py schema)."""
    return (
        edges.where(
            (F.col("pred") == "NARRATED_FROM")
            & (F.col("src_label") == "Scholar")
            & (F.col("tgt_label") == "Scholar")
            & (F.col("src_key") != F.col("tgt_key"))
        )
        .select(F.col("src_key").alias("src"), F.col("tgt_key").alias("tgt"))
        .distinct()
    )


def pagerank_integer(
    edges: DataFrame,
    n_iters: int = PAGERANK_ITERS,
    scale: int = PAGERANK_SCALE,
    checkpoint: bool = True,
) -> DataFrame:
    """Fixed-point PageRank over the scholar narration digraph.

    rank_0(v) = scale (i.e. 1.0); each iteration
    rank_{i+1}(v) = (15 * scale) div 100
                  + (85 * sum over in-edges (s,v) of rank_i(s) div out(s))
                    div 100
    with ``div`` integer division throughout — the dangling-mass
    variant that redistributes nothing (documented; both engines
    compute it identically).  All values stay well inside int64:
    total mass <= n_nodes * scale and the 85x intermediate fits until
    n_nodes ~ 1e8 per partition-sum; beyond that, lower ``scale``.

    Returns (node, rank_x1e9) — bit-identical to the driver oracle's
    unrolled-CTE replay.
    """
    se = scholar_digraph(edges)
    nodes = (
        se.select(F.col("src").alias("node"))
        .union(se.select(F.col("tgt").alias("node")))
        .distinct()
    )
    out_deg = se.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    # per-source contribution denominator joined once; re-used every
    # iteration (edge list and degree table are iteration-invariant)
    edges_d = se.join(out_deg, "src")
    if checkpoint:
        edges_d = edges_d.localCheckpoint(eager=True)
    base = (15 * scale) // 100

    ranks = nodes.select("node", F.lit(scale).cast("long").alias("rank"))
    for _ in range(n_iters):
        contribs = (
            edges_d.join(ranks, edges_d["src"] == ranks["node"])
            .select(F.col("tgt"), F.expr("rank div d").alias("c"))
            .groupBy("tgt")
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(
            contribs, nodes["node"] == contribs["tgt"], "left"
        ).select(
            "node",
            (F.lit(base) + F.expr("(85 * coalesce(s, 0L)) div 100"))
            .cast("long")
            .alias("rank"),
        )
        # cap lineage growth per iteration (same discipline as BFS /
        # connected components); the audit path keeps the plan lazy so
        # the iteration's physical shape stays inspectable
        if checkpoint:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node", F.col("rank").alias("rank_x1e9"))


def triangles(edges: DataFrame) -> DataFrame:
    """Enumerate triangles in the undirected scholar narration graph.

    Standard degree-ordered orientation: every undirected edge {u, v}
    is directed from the endpoint with the smaller (degree, key) tuple
    to the larger, making the orientation acyclic with out-degrees
    bounded by O(sqrt(|E|)); a triangle is a wedge a->b, b->c whose
    closing edge a->c exists (checked with a semi-join, so the output
    never materializes non-triangle wedges).

    Returns one row per triangle, keys sorted lexicographically
    (s1 < s2 < s3 as strings), exactly reproducible in SQL.
    """
    se = scholar_digraph(edges)
    und = (
        se.select(
            F.least("src", "tgt").alias("u"), F.greatest("src", "tgt").alias("v")
        )
        .distinct()
    )
    ends = und.select(F.col("u").alias("node")).union(
        und.select(F.col("v").alias("node"))
    )
    deg = ends.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    oriented = (
        und.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("a"), F.col("v").alias("b")),
            )
            .otherwise(F.struct(F.col("v").alias("a"), F.col("u").alias("b")))
            .alias("e")
        )
        .select("e.a", "e.b")
    )
    e1 = oriented.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = oriented.select(F.col("a").alias("y"), F.col("b").alias("z"))
    wedges = e1.join(e2, "y").select("x", "y", "z")
    closing = oriented.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = wedges.join(closing, ["x", "z"], "left_semi")
    s = F.array_sort(F.array("x", "y", "z"))
    return tri.select(
        s.getItem(0).alias("s1"), s.getItem(1).alias("s2"), s.getItem(2).alias("s3")
    )
