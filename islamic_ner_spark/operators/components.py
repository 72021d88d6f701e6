"""Connected components via alternating large-star / small-star joins.

Kiveris et al., "Connected Components in MapReduce and Beyond" (SOCC'14):
alternate two edge rewrites until fixpoint; each surviving edge then links
a node to its component minimum.  Used for canonicalization of unmatched
("new") entity mentions — the distributed replacement for the reference
resolver's sequential statefulness (entity_resolver.py:55-68, see
functions/resolve.py docstring).

Each round is groupBy(min) + join; lineage is cut with localCheckpoint so
iteration count doesn't blow up the plan.  Node ids are strings; min is
lexicographic, which makes the chosen canonical deterministic under any
partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(N(u) + {u})."""
    bidir = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    mins = bidir.groupBy("src").agg(F.min("dst").alias("nbr_min"))
    mins = mins.select("src", F.least("nbr_min", F.col("src")).alias("m"))
    return (
        bidir.join(mins, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges large->small; connect u and its small neighbors to the min."""
    oriented = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).where(F.col("src") != F.col("dst"))
    mins = oriented.groupBy("src").agg(F.min("dst").alias("m"))
    nbr_edges = (
        oriented.join(mins, "src")
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )
    self_edges = mins.select(F.col("src"), F.col("m").alias("dst"))
    return (
        nbr_edges.union(self_edges)
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _signature(edges: DataFrame) -> tuple[int, int]:
    row = edges.select(
        F.count(F.lit(1)).alias("n"),
        # bit_xor is overflow-free and order-independent
        F.coalesce(F.expr("bit_xor(xxhash64(src, dst))"), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def _local_components(spark, rows) -> DataFrame:
    """Driver-side union-find for small (already collected) edge lists.

    Below ``local_threshold`` the iterative join rounds cost far more in
    job overhead than the data justifies; solving a few-hundred-KB edge
    list locally is the standard hybrid cutover (the same min-label
    semantics, so results are identical to the distributed path)."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for row in rows:
        ra, rb = find(row["src"]), find(row["dst"])
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    mapping = [(node, find(node)) for node in parent]
    # single partition: a locally-solved mapping is tiny, and fanning it
    # over defaultParallelism tasks just adds scheduling overhead.  The
    # frame is built via pandas/Arrow: createDataFrame over a plain list
    # parallelizes into defaultParallelism pickled partitions, and every
    # downstream action re-reads them through one coalesced task at
    # ~4s per action (measured) — the Arrow path is a single local
    # batch and costs ~0.1s for the identical result.
    import pandas as pd

    frame = pd.DataFrame(mapping or [("", "")], columns=["node", "component"])
    return (
        spark.createDataFrame(frame, schema="node string, component string")
        .coalesce(1)
        .where(F.col("node") != "")
    )


def connected_components(
    edges: DataFrame, max_iterations: int = 30, local_threshold: int = 500_000
) -> DataFrame:
    """``edges(src, dst)`` -> ``(node, component)``.

    ``component`` is the lexicographic minimum node id of the component.
    Isolated nodes (present only as self-referencing inputs) map to
    themselves; callers typically union singletons back in afterwards.

    Size-adaptive: edge sets under ``local_threshold`` rows are solved
    with driver-side union-find (identical result, none of the per-round
    shuffle/job overhead); larger graphs run the iterative
    large-star/small-star rounds.  Probing is one COUNT over the deduped
    edges — a fully parallel scan returning a scalar (the earlier
    ``limit(100k).collect()`` probe ran through CollectLimit's
    incremental partition scale-up, which serialized the whole
    dedup scan through a handful of tasks: measured ~5s wall at 4-5x
    effective parallelism on a 10^7-row cached edge table vs <1s for
    the parallel count).  Rows ship to the driver only after the count
    says they fit; no code path ever ships more than
    ``local_threshold`` rows.
    """
    spark = edges.sparkSession
    # materialize the dedup ONCE, fully parallel: the count then reads
    # executor-local blocks, the small-case collect ships the already-
    # computed rows, and the distributed rounds (which needed this
    # checkpoint anyway to cap lineage) start from the same blocks —
    # upstream (e.g. the fuzzy pair-scoring Arrow pass feeding entity
    # canonicalization) is never evaluated twice
    current = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    n_edges = current.count()
    if n_edges == 0:
        return spark.createDataFrame([], "node string, component string")
    if n_edges <= local_threshold:
        return _local_components(spark, current.collect())

    signature = _signature(current)

    for _ in range(max_iterations):
        current = _small_star(_large_star(current)).localCheckpoint(eager=True)
        new_signature = _signature(current)
        if new_signature == signature:
            break
        signature = new_signature

    members = current.select(F.col("src").alias("node"), F.col("dst").alias("component"))
    roots = current.select(F.col("dst").alias("node"), F.col("dst").alias("component"))
    return members.union(roots).groupBy("node").agg(F.min("component").alias("component"))


def numeric_groups(comp: DataFrame) -> DataFrame:
    """``(node, component)`` with string keys -> ``(id, group)`` longs,
    where ``group`` is the NUMERIC min id of the cluster.

    ``connected_components`` labels clusters with the *lexicographic*
    min of the string node keys, so a cluster ``{2, 1000002}`` would get
    component ``'1000002'`` (``'1' < '2'``) — surprising for a consumer
    of a numeric group column.  This re-aggregates to the numeric min
    with one window over the component key (tiny: one row per clustered
    node)."""
    from pyspark.sql import Window

    nid = F.col("node").cast("long")
    return comp.select(
        nid.alias("id"),
        F.min(nid).over(Window.partitionBy("component")).alias("group"),
    )
