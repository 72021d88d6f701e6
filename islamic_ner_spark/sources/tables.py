"""Partitioned-parquet table layer with lineage manifests and resume.

The production design targets Iceberg tables (``MERGE INTO``, snapshot
ids, hidden partitioning); this sandbox has no Iceberg runtime jar, so the
same contract is implemented over partitioned parquet:

* every stage write lands as a parquet table + ``_manifest.json`` holding
  stage name, row count, schema, per-bucket row counts, duration, and the
  fingerprint of the stage's inputs/config;
* bucketed stages (hash of conv_id -> ``bucket=N`` directories) can resume:
  completed buckets are listed in the manifest and skipped on re-run —
  a killed job restarts without recomputing finished partitions;
* cross-batch MERGE upserts are read-merge-overwrite with the same
  (max-confidence, first-non-empty-evidence) semantics Iceberg MERGE INTO
  would express (operators/graph.merge_edges_incremental).

Swap-in point for Iceberg: replace ``write_table``/``read_table`` with
``df.writeTo(...).createOrReplace()`` / ``spark.table`` — the pipeline
code does not change.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_NAME = "_manifest.json"


def manifest_path(table_path: str | Path) -> Path:
    return Path(table_path) / MANIFEST_NAME


def read_manifest(table_path: str | Path) -> Optional[dict]:
    path = manifest_path(table_path)
    if not path.exists():
        return None
    try:
        return json.loads(path.read_text())
    except (OSError, json.JSONDecodeError):
        return None


def write_table(
    df: DataFrame,
    table_path: str | Path,
    *,
    stage: str,
    fingerprint: str,
    partition_by: Optional[Sequence[str]] = None,
    mode: str = "overwrite",
) -> dict:
    """Write a stage output with a lineage manifest.

    The manifest is written only after the parquet commit succeeds, so a
    missing/st stale manifest means "recompute this stage"."""
    table_path = str(table_path)
    started = time.time()
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(table_path)

    spark = df.sparkSession
    written = spark.read.parquet(table_path)
    per_partition = None
    if partition_by:
        per_partition = {
            "|".join(str(row[c]) for c in partition_by): row["rows"]
            for row in written.groupBy(*partition_by)
            .agg(F.count(F.lit(1)).alias("rows"))
            .collect()
        }
    manifest = {
        "stage": stage,
        "fingerprint": fingerprint,
        "rows": written.count(),
        "schema": written.schema.simpleString(),
        "partition_by": list(partition_by or []),
        "per_partition_rows": per_partition,
        "duration_s": round(time.time() - started, 3),
        "written_at_unix": int(started),
    }
    manifest_path(table_path).write_text(json.dumps(manifest, indent=2))
    return manifest


def read_table(spark: SparkSession, table_path: str | Path) -> DataFrame:
    return spark.read.parquet(str(table_path))


def table_is_current(table_path: str | Path, fingerprint: str) -> bool:
    manifest = read_manifest(table_path)
    return bool(manifest) and manifest.get("fingerprint") == fingerprint


def completed_buckets(table_path: str | Path) -> set[str]:
    """Bucket values recorded complete by the manifest (for partition-level
    resume of bucketed stages)."""
    manifest = read_manifest(table_path)
    if not manifest or not manifest.get("per_partition_rows"):
        return set()
    return set(manifest["per_partition_rows"].keys())
