"""End-to-end pipeline: P/R gate, determinism, checkpoint resume."""

from __future__ import annotations

from pyspark.sql import functions as F

from islamic_ner_spark.plans.pipeline import build_graph
from islamic_ner_spark.sources.transcripts import (
    expected_triples,
    synthetic_transcripts,
    triple_precision_recall,
)

N_CONVS = 60
TURNS = 5


def test_triple_pr_gate(spark) -> None:
    """Pipeline triples == golden triples (P/R = 1.0 >= 0.95 gate)."""
    transcripts = synthetic_transcripts(spark, N_CONVS, turns_per_conv=TURNS)
    result = build_graph(spark, transcripts)
    golden = expected_triples(spark, N_CONVS, turns_per_conv=TURNS)
    pr = triple_precision_recall(result.triples, golden)
    assert pr["precision"] == 1.0, pr
    assert pr["recall"] == 1.0, pr
    assert pr["expected"] > 0


def test_determinism_across_partitionings(spark) -> None:
    """Same graph regardless of input partitioning (order-free semantics)."""
    t1 = synthetic_transcripts(spark, 30, turns_per_conv=4, partitions=1)
    t16 = synthetic_transcripts(spark, 30, turns_per_conv=4, partitions=16)
    r1 = build_graph(spark, t1)
    r16 = build_graph(spark, t16)

    def edge_set(result):
        return {
            tuple(row)
            for row in result.edges.select(
                "pred", "src_label", "src_key", "tgt_label", "tgt_key",
                "source_hadith", "confidence", "evidence",
            ).collect()
        }

    def node_set(result):
        return {
            (row["label"], row["key"], tuple(row["variants"]))
            for row in result.nodes.collect()
        }

    assert edge_set(r1) == edge_set(r16)
    assert node_set(r1) == node_set(r16)


def test_per_turn_text_equality_invariant(spark) -> None:
    """Per-turn normalized text equality under stable (conv_id, turn_idx)
    ordering — the input_hint's per-row invariant."""
    from islamic_ner_spark.functions.normalize import normalize as py_normalize

    transcripts = synthetic_transcripts(spark, 10, turns_per_conv=4)
    result = build_graph(spark, transcripts)
    rows = (
        result.annotated.select("conv_id", "turn_idx", "norm_text")
        .orderBy("conv_id", "turn_idx")
        .collect()
    )
    source = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in transcripts.collect()
    }
    assert len(rows) == len(source)
    for row in rows:
        assert row["norm_text"] == py_normalize(source[(row["conv_id"], row["turn_idx"])])


def test_workdir_checkpoint_and_resume(spark, tmp_path) -> None:
    """Stage manifests make re-runs no-ops and bucket resume append-only."""
    import json

    from islamic_ner_spark.sources import tables

    transcripts = synthetic_transcripts(spark, 12, turns_per_conv=3)
    work = str(tmp_path / "work")
    r1 = build_graph(spark, transcripts, work_dir=work, n_buckets=4)
    edges_1 = sorted(map(tuple, r1.edges.select("pred", "src_key", "tgt_key", "source_hadith").collect()))

    # simulate a killed job: drop some annotate buckets from the manifest
    annotated_path = tmp_path / "work" / "annotated"
    manifest = json.loads((annotated_path / "_manifest.json").read_text())
    full_buckets = dict(manifest["per_partition_rows"])
    kept = dict(list(full_buckets.items())[:2])
    manifest["per_partition_rows"] = kept
    manifest["fingerprint"] = "stale"
    (annotated_path / "_manifest.json").write_text(json.dumps(manifest))
    # drop the corresponding parquet bucket dirs
    import shutil

    for bucket in full_buckets:
        if bucket not in kept:
            shutil.rmtree(annotated_path / f"bucket={bucket}", ignore_errors=True)

    r2 = build_graph(spark, transcripts, work_dir=work, n_buckets=4)
    edges_2 = sorted(map(tuple, r2.edges.select("pred", "src_key", "tgt_key", "source_hadith").collect()))
    assert edges_1 == edges_2
    resumed = tables.read_manifest(annotated_path)
    assert resumed["resumed"] is True
    assert set(resumed["per_partition_rows"]) == set(full_buckets)
