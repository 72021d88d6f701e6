"""Read-side graph queries (Q1-Q7) over the nodes/edges tables.

Parity target: GraphQuerier (/root/reference/src/graph/query.py) and the
FakeGraphBackend query doubles (tests/test_graph.py:99-198).  All queries
are plain DataFrame plans (filter/join/distinct/orderBy) except BFS, which
is an iterative frontier-expansion join bounded at 20 hops (query.py:125).
"""

from __future__ import annotations

from typing import Dict, List

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def find_scholar(nodes: DataFrame, name: str) -> Dict[str, str]:
    """Substring lookup, shortest canonical name wins (Q1, query.py:14-38).

    Deterministic tiebreak on the name itself (the reference leaves ties
    to store order)."""
    rows = (
        nodes.where(F.col("label") == "Scholar")
        .where(
            F.col("key").contains(name)
            | F.coalesce(F.col("name_ar"), F.col("key")).contains(name)
        )
        .select(
            F.col("key").alias("canonical_name"),
            F.coalesce(F.col("name_ar"), F.col("key")).alias("name_ar"),
        )
        .orderBy(F.length("canonical_name"), F.col("canonical_name"))
        .limit(1)
        .collect()
    )
    if not rows:
        return {}
    return {"canonical_name": rows[0]["canonical_name"], "name_ar": rows[0]["name_ar"]}


def narration_chain(edges: DataFrame, doc_id: str) -> DataFrame:
    """NARRATED_FROM edges of one document, ordered (Q2, query.py:40-66)."""
    return (
        edges.where(
            (F.col("pred") == "NARRATED_FROM")
            & (F.col("source_hadith") == doc_id)
            & (F.col("src_label") == "Scholar")
            & (F.col("tgt_label") == "Scholar")
        )
        .select(
            F.col("src_key").alias("source"),
            F.col("tgt_key").alias("target"),
            "confidence",
            "evidence",
        )
        .orderBy("source", "target")
    )


def scholar_connections(edges: DataFrame, scholar: str) -> Dict[str, object]:
    """Teachers (out-neighbors) and students (in-neighbors) via
    NARRATED_FROM, distinct + sorted (Q3, query.py:68-94)."""
    narrated = edges.where(F.col("pred") == "NARRATED_FROM")
    teachers = [
        r["name"]
        for r in narrated.where(F.col("src_key") == scholar)
        .select(F.col("tgt_key").alias("name"))
        .distinct()
        .orderBy("name")
        .collect()
    ]
    students = [
        r["name"]
        for r in narrated.where(F.col("tgt_key") == scholar)
        .select(F.col("src_key").alias("name"))
        .distinct()
        .orderBy("name")
        .collect()
    ]
    return {"scholar": scholar, "teachers": teachers, "students": students}


def concepts_in_book(nodes: DataFrame, edges: DataFrame, book_name: str) -> DataFrame:
    """Two-hop semi-join: Hadith-[IN_BOOK]->Book(~name) x
    Hadith-[MENTIONS_CONCEPT]->Concept (Q4, query.py:96-113)."""
    books = (
        nodes.where(F.col("label") == "Book")
        .where(
            F.col("key").contains(book_name)
            | F.coalesce(F.col("name_ar"), F.lit("")).contains(book_name)
        )
        .select(F.col("key").alias("book_key"))
    )
    in_book = (
        edges.where((F.col("pred") == "IN_BOOK") & (F.col("tgt_label") == "Book"))
        .join(F.broadcast(books), F.col("tgt_key") == F.col("book_key"), "left_semi")
        .select(F.col("src_key").alias("hadith_key"))
        .distinct()
    )
    mentions = edges.where(
        (F.col("pred") == "MENTIONS_CONCEPT") & (F.col("tgt_label") == "Concept")
    ).select(F.col("src_key").alias("hadith_key"), F.col("tgt_key").alias("concept"))
    return (
        mentions.join(in_book, "hadith_key", "left_semi")
        .select("concept")
        .distinct()
        .orderBy("concept")
    )


def count_narrated_hadiths(edges: DataFrame, scholar: str) -> int:
    """count(DISTINCT source_hadith) touching a scholar either direction,
    excluding empty provenance (Q6, api/routes/graph.py:49-71)."""
    row = (
        edges.where(F.col("pred") == "NARRATED_FROM")
        .where((F.col("src_key") == scholar) | (F.col("tgt_key") == scholar))
        .where(F.col("source_hadith") != "")
        .agg(F.countDistinct("source_hadith").alias("n"))
        .collect()[0]
    )
    return int(row["n"])


def top_narrators(edges: DataFrame, k: int = 20) -> DataFrame:
    """Scholars ranked by distinct narrated hadiths (the all-scholars
    generalization of Q6).  Narrator keys are Zipf-hot, so the naive
    groupBy(src_key).countDistinct would bottleneck one partition per
    top narrator; the skew-safe rewrite dedupes on (key, hadith) first
    (operators/skew.py)."""
    from islamic_ner_spark.operators.skew import count_distinct_skew_safe

    chains = edges.where(
        (F.col("pred") == "NARRATED_FROM") & (F.col("source_hadith") != "")
    )
    return (
        count_distinct_skew_safe(chains, "src_key", "source_hadith")
        .orderBy(F.desc("n"), "src_key")
        .limit(k)
    )


def shortest_path(
    edges: DataFrame, scholar1: str, scholar2: str, max_hops: int = 20
) -> List[str]:
    """Undirected BFS over NARRATED_FROM Scholar edges (Q5, query.py:115-135).

    Iterative frontier-expansion joins; the frontier carries the path as an
    array column, visited nodes are anti-joined out, and each level is
    localCheckpoint-ed to cap lineage.  Ties resolve to the
    lexicographically smallest path for determinism.
    """
    if scholar1 == scholar2:
        return [scholar1]

    scholar_edges = edges.where(
        (F.col("pred") == "NARRATED_FROM")
        & (F.col("src_label") == "Scholar")
        & (F.col("tgt_label") == "Scholar")
    ).select("src_key", "tgt_key")
    undirected = (
        scholar_edges.select(F.col("src_key").alias("a"), F.col("tgt_key").alias("b"))
        .union(
            scholar_edges.select(F.col("tgt_key").alias("a"), F.col("src_key").alias("b"))
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )

    spark = edges.sparkSession
    frontier = spark.createDataFrame(
        [(scholar1, [scholar1])], "node string, path array<string>"
    )
    visited = frontier.select("node")

    for _ in range(max_hops):
        expanded = (
            frontier.join(undirected, frontier["node"] == undirected["a"])
            .select(
                F.col("b").alias("node"),
                F.concat("path", F.array(F.col("b"))).alias("path"),
            )
            .join(visited, "node", "left_anti")
        )
        # one best (shortest tie-broken) path per node this level
        expanded = expanded.groupBy("node").agg(F.min("path").alias("path"))
        expanded = expanded.localCheckpoint(eager=True)
        hits = expanded.where(F.col("node") == scholar2).select("path").collect()
        if hits:
            return list(min(r["path"] for r in hits))
        if expanded.isEmpty():
            return []
        visited = visited.union(expanded.select("node")).distinct().localCheckpoint(eager=True)
        frontier = expanded
    return []


def bfs_distances(
    edges: DataFrame, source: str | None = None, max_hops: int = 8
) -> DataFrame:
    """All shortest-path distances from ``source`` over the undirected
    Scholar NARRATED_FROM graph, capped at ``max_hops`` (the
    all-destinations generalization of Q5's point-to-point BFS).

    Iterative frontier expansion: each level joins the frontier to the
    (deduplicated, undirected) edge list, anti-joins everything already
    reached (BFS guarantees the first visit is minimal), and
    localCheckpoints to cap lineage growth — ``max_hops`` joins total,
    each a keyed equi-join Catalyst can broadcast when the frontier is
    small.  When ``source`` is None the lexicographically smallest
    scholar key seeds the walk (a deterministic choice both engines can
    compute; the driver oracle replays the whole walk as a recursive
    CTE with MIN(dist)).
    """
    scholar_edges = edges.where(
        (F.col("pred") == "NARRATED_FROM")
        & (F.col("src_label") == "Scholar")
        & (F.col("tgt_label") == "Scholar")
    ).select("src_key", "tgt_key")
    undirected = (
        scholar_edges.select(F.col("src_key").alias("a"), F.col("tgt_key").alias("b"))
        .union(
            scholar_edges.select(F.col("tgt_key").alias("a"), F.col("src_key").alias("b"))
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if source is None:
        row = undirected.agg(F.min("a").alias("s")).collect()[0]  # bounded: 1 row
        source = row["s"]
        if source is None:
            return edges.sparkSession.createDataFrame([], "node string, dist int")

    spark = edges.sparkSession
    frontier = spark.createDataFrame([(source, 0)], "node string, dist int")
    reached = frontier

    for depth in range(1, max_hops + 1):
        nxt = (
            frontier.join(undirected, frontier["node"] == undirected["a"])
            .select(F.col("b").alias("node"))
            .distinct()
            .join(reached.select("node"), "node", "left_anti")
            .withColumn("dist", F.lit(depth))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        reached = reached.union(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return reached
