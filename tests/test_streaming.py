"""Structured Streaming extraction: stream output == batch output."""

from __future__ import annotations

from islamic_ner_spark.operators.ner import annotate_transcripts
from islamic_ner_spark.operators.relations import extract_triples
from islamic_ner_spark.plans.pipeline import DEFAULT_GAZETTEER_DIR
from islamic_ner_spark.sources.gazetteer import Gazetteer
from islamic_ner_spark.sources.transcripts import synthetic_transcripts
from islamic_ner_spark.streaming.stream_pipeline import start_triples_stream


def test_stream_matches_batch(spark, tmp_path) -> None:
    input_dir = str(tmp_path / "in")
    output_dir = str(tmp_path / "out")
    checkpoint_dir = str(tmp_path / "ckpt")

    transcripts = synthetic_transcripts(spark, 8, turns_per_conv=4)
    transcripts.write.parquet(input_dir)

    gazetteer_bc = spark.sparkContext.broadcast(Gazetteer.from_dir(DEFAULT_GAZETTEER_DIR))
    query = start_triples_stream(
        spark, input_dir, output_dir, checkpoint_dir, gazetteer_bc, available_now=True
    )
    query.awaitTermination(timeout=120)

    streamed = spark.read.parquet(output_dir)
    batch = extract_triples(
        annotate_transcripts(spark.read.parquet(input_dir), gazetteer_bc)
    )
    key_cols = [
        "doc_id", "pred", "subj_text", "subj_type", "subj_start", "subj_end",
        "obj_text", "obj_type", "obj_start", "obj_end", "confidence", "evidence",
    ]
    streamed_set = {tuple(r) for r in streamed.select(key_cols).collect()}
    batch_set = {tuple(r) for r in batch.select(key_cols).collect()}
    assert streamed_set == batch_set
    assert len(batch_set) > 0

    # restart with no new input: checkpoint resume adds nothing
    query2 = start_triples_stream(
        spark, input_dir, output_dir, checkpoint_dir, gazetteer_bc, available_now=True
    )
    query2.awaitTermination(timeout=120)
    assert spark.read.parquet(output_dir).count() == len(streamed_set)


def test_graph_stream_matches_batch(spark, tmp_path) -> None:
    """Continuously maintained nodes/edges (foreachBatch incremental
    MERGE over multiple micro-batches) match the one-shot batch build.

    name_ar depends on batch arrival order, and mention_count/merge
    semantics are batch-scoped, so the comparison pins the
    order-independent columns: edge keys + confidence/evidence, node
    keys + variants + mention_count.
    """
    from pyspark.sql import functions as F

    from islamic_ner_spark.plans.pipeline import build_graph
    from islamic_ner_spark.streaming.stream_pipeline import start_graph_stream

    input_dir = str(tmp_path / "in")
    graph_dir = str(tmp_path / "graph")
    checkpoint_dir = str(tmp_path / "ckpt")

    transcripts = synthetic_transcripts(spark, 12, turns_per_conv=3)
    # several files so maxFilesPerTrigger=1 yields multiple micro-batches
    transcripts.repartition(4, "conv_id").write.parquet(input_dir)

    gazetteer_bc = spark.sparkContext.broadcast(Gazetteer.from_dir(DEFAULT_GAZETTEER_DIR))
    query = start_graph_stream(
        spark, input_dir, graph_dir, checkpoint_dir, gazetteer_bc,
        available_now=True, max_files_per_trigger=1,
    )
    query.awaitTermination(timeout=180)

    batch = build_graph(spark, spark.read.parquet(input_dir))

    edge_cols = ["pred", "src_label", "src_key", "tgt_label", "tgt_key",
                 "source_hadith", "confidence", "evidence"]
    streamed_edges = {tuple(r) for r in
                      spark.read.parquet(f"{graph_dir}/edges").select(edge_cols).collect()}
    batch_edges = {tuple(r) for r in batch.edges.select(edge_cols).collect()}
    assert streamed_edges == batch_edges and len(batch_edges) > 0

    def node_set(df):
        return {(r["label"], r["key"], tuple(r["variants"]), r["mention_count"])
                for r in df.collect()}
    assert node_set(spark.read.parquet(f"{graph_dir}/nodes")) == node_set(batch.nodes)

    # replayed/no-new-input restart leaves the graph unchanged
    before = spark.read.parquet(f"{graph_dir}/edges").count()
    query2 = start_graph_stream(
        spark, input_dir, graph_dir, checkpoint_dir, gazetteer_bc,
        available_now=True, max_files_per_trigger=1,
    )
    query2.awaitTermination(timeout=120)
    assert spark.read.parquet(f"{graph_dir}/edges").count() == before
