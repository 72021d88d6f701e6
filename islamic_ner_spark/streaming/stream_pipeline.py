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
