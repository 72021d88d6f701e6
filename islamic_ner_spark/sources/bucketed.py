"""Spark-native bucketed tables: co-located joins without a shuffle.

The partitioned-parquet layer (sources/tables.py) hash-buckets by
directory for O(touched-buckets) incremental MERGE; THIS module is the
complementary read-side optimization — Spark's `bucketBy` table format,
where both sides of an equi-join are pre-hashed into the same number of
buckets on the join key, so the sort-merge join reads bucket i of each
table into the same task and the per-query Exchange (the dominant cost
of repeated KG joins at 100 TB) disappears entirely.

Use it for the serving layer: a KG consumer's hot loop is
nodes-join-edges ("expand these scholars' narrations"), run thousands
of times against the same built graph.  Bucketing pays the shuffle ONCE
at publish time; every subsequent join is exchange-free, which at
1000-executor scale also means no shuffle-spill and no network step.

Production note: with the in-memory catalog the bucket metadata lives
only in the current session's catalog; a real deployment backs this
with the Hive metastore or (preferred — see ParquetTableSink's Iceberg
mapping) Iceberg's bucket partition transform, which persists the same
layout contract in table metadata.  Reference export parity:
src/graph/builder.py writes nodes/edges once and queries them
repeatedly (src/graph/query.py) — this is that read-mostly shape.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

GRAPH_BUCKETS = 16


def write_bucketed(
    df: DataFrame,
    table_name: str,
    *,
    n_buckets: int,
    bucket_cols: Sequence[str],
    sort_cols: Optional[Sequence[str]] = None,
    path: Optional[str | Path] = None,
    mode: str = "overwrite",
) -> None:
    """Publish ``df`` as a bucketed (and optionally sorted) parquet
    table.  Sorting within buckets additionally removes the per-task
    Sort from later sort-merge joins on the same key."""
    writer = (
        df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", str(path))
    writer.saveAsTable(table_name)


def publish_graph_tables(
    spark: SparkSession,
    nodes: DataFrame,
    edges: DataFrame,
    base_dir: str | Path,
    *,
    n_buckets: int = GRAPH_BUCKETS,
    prefix: str = "kg",
) -> tuple[str, str]:
    """Publish the built graph for serving: nodes bucketed+sorted on
    ``key``, edges on ``src_key`` — the join key of the expand-neighbors
    pattern — with matching bucket counts so node⋈edge co-locates.

    Returns the two table names.  (``tgt_key`` expansion joins still
    shuffle the edge side only; publishing a second edge copy bucketed
    by ``tgt_key`` — the classic space-for-shuffle trade — is the same
    one-line call with the other column.)
    """
    base_dir = Path(base_dir)
    nodes_tbl = f"{prefix}_nodes_b"
    edges_tbl = f"{prefix}_edges_b"
    write_bucketed(
        nodes,
        nodes_tbl,
        n_buckets=n_buckets,
        bucket_cols=["key"],
        sort_cols=["key"],
        path=base_dir / "nodes_b",
    )
    write_bucketed(
        edges,
        edges_tbl,
        n_buckets=n_buckets,
        bucket_cols=["src_key"],
        sort_cols=["src_key"],
        path=base_dir / "edges_b",
    )
    return nodes_tbl, edges_tbl


def expand_neighbors(
    spark: SparkSession, nodes_tbl: str, edges_tbl: str
) -> DataFrame:
    """The serving-layer hot join: every node with its outgoing edges,
    co-located — zero Exchange when both tables came from
    :func:`publish_graph_tables` (asserted by scripts/plan_audit.py)."""
    nodes = spark.table(nodes_tbl)
    edges = spark.table(edges_tbl)
    return nodes.join(
        edges, nodes["key"] == edges["src_key"], "inner"
    ).select(
        nodes["key"],
        nodes["label"],
        edges["pred"],
        edges["tgt_label"],
        edges["tgt_key"],
        edges["confidence"],
    )
