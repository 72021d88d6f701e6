"""Corpus snapshot diff — the incremental-refresh primitive.

A continuous 100 TB pipeline never reprocesses the whole corpus; it
diffs the new crawl/dump snapshot against the published one and feeds
only added/changed keys downstream (the same role DataFusion/Iceberg
incremental scans play).  The reference pipeline is batch-only; this
operator is the Spark-first equivalent of that maintenance step,
complementing the streaming graph MERGE (streaming/stream_pipeline.py)
for sources that arrive as whole snapshots rather than event streams.

Scale shape: one full-outer equi-join on the snapshot key — both sides
hash-partitioned on that key (co-partitioned, single exchange each) —
with the content fingerprint computed as a narrow projection before
the join, so the join carries (key, 32-byte digest), not documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

ADDED = "added"
DELETED = "deleted"
CHANGED = "changed"
UNCHANGED = "unchanged"


def snapshot_diff(
    old: DataFrame, new: DataFrame, key: str = "doc_id", content: str = "text"
) -> DataFrame:
    """(key, status) with status in {added, deleted, changed,
    unchanged}, comparing ``new`` against ``old`` by an md5 content
    fingerprint.  Engine-exact (md5 + string compares only), so the
    driver oracle replays it verbatim."""
    o = old.select(F.col(key).alias("k"), F.md5(F.col(content)).alias("old_fp"))
    n = new.select(F.col(key).alias("k"), F.md5(F.col(content)).alias("new_fp"))
    return o.join(n, "k", "full_outer").select(
        F.col("k").alias(key),
        F.when(F.col("old_fp").isNull(), F.lit(ADDED))
        .when(F.col("new_fp").isNull(), F.lit(DELETED))
        .when(F.col("old_fp") != F.col("new_fp"), F.lit(CHANGED))
        .otherwise(F.lit(UNCHANGED))
        .alias("status"),
    )
