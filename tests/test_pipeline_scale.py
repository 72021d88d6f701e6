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


def test_turn_local_edge_merge_matches_global(spark) -> None:
    """The shuffle-free per-turn edge merge (pipeline path) must produce
    exactly the global groupBy MERGE result, including merge_count for
    within-turn duplicate edge keys."""
    from islamic_ner_spark.operators.graph import build_edges, build_edges_turn_local

    transcripts = synthetic_transcripts(spark, 40, turns_per_conv=4, partitions=3)
    result = build_graph(spark, transcripts)
    resolved = result.resolved_triples

    cols = [
        "pred", "src_label", "src_key", "tgt_label", "tgt_key",
        "source_hadith", "confidence", "evidence", "merge_count",
    ]
    local_rows = sorted(tuple(r) for r in build_edges_turn_local(resolved).select(cols).collect())
    global_rows = sorted(tuple(r) for r in build_edges(resolved).select(cols).collect())
    assert local_rows == global_rows
    assert len(local_rows) > 0


def test_split_node_build_matches_global(spark) -> None:
    """Pipeline node table (vocab global agg + turn-local Hadith nodes)
    must equal the single global groupBy strategy."""
    from islamic_ner_spark.operators.graph import build_nodes

    transcripts = synthetic_transcripts(spark, 40, turns_per_conv=4, partitions=3)
    result = build_graph(spark, transcripts)

    doc_index = result.annotated.select("conv_id", "turn_idx", "doc_id")
    global_nodes = build_nodes(result.resolved_mentions, doc_index, result.resolved_triples)

    def rows(df):
        return sorted(
            (r["label"], r["key"], r["name_ar"], r["confidence"],
             tuple(r["variants"]), r["mention_count"], r["book_ref"], r["chapter"])
            for r in df.collect()
        )

    assert rows(result.nodes) == rows(global_nodes)
    assert any(r[0] == "Hadith" for r in rows(result.nodes))
    assert any(r[0] == "Scholar" for r in rows(result.nodes))


def test_turn_local_edge_merge_duplicates_first_writer_wins(spark) -> None:
    """Within-turn duplicate edge keys: first writer (lowest rel_idx) fixes
    confidence/evidence, merge_count counts all writers — matching the
    global groupBy strategy exactly (in-batch first-wins, builder.py:99-123)."""
    from islamic_ner_spark.operators.graph import build_edges, build_edges_turn_local

    schema = (
        "doc_id string, conv_id string, turn_idx int, rel_idx int, pred string, "
        "subj_text string, subj_type string, obj_text string, obj_type string, "
        "subj_canonical string, obj_canonical string, source_hadith string, "
        "confidence double, evidence string"
    )
    rows = [
        # turn c:0 — same edge key twice (different spans/evidence), one other
        ("c:0", "c", 0, 0, "MENTIONS_CONCEPT", "h", "HADITH_REF", "x", "CONCEPT",
         "c:0", "X", "c:0", 0.6, "first-ev"),
        ("c:0", "c", 0, 1, "NARRATED_FROM", "a", "SCHOLAR", "b", "SCHOLAR",
         "A", "B", "c:0", 0.9, "chain"),
        ("c:0", "c", 0, 2, "MENTIONS_CONCEPT", "h", "HADITH_REF", "x2", "CONCEPT",
         "c:0", "X", "c:0", 0.6, "second-ev"),
        # turn c:1 — same canonicals as c:0 but different source_hadith: no merge
        ("c:1", "c", 1, 0, "MENTIONS_CONCEPT", "h", "HADITH_REF", "x", "CONCEPT",
         "c:1", "X", "c:1", 0.6, "other-turn"),
    ]
    resolved = spark.createDataFrame(rows, schema).coalesce(1)
    cols = [
        "pred", "src_label", "src_key", "tgt_label", "tgt_key",
        "source_hadith", "confidence", "evidence", "merge_count",
    ]
    local = sorted(tuple(r) for r in build_edges_turn_local(resolved).select(cols).collect())
    glob = sorted(tuple(r) for r in build_edges(resolved).select(cols).collect())
    assert local == glob
    merged = [r for r in local if r[-1] == 2]
    assert len(merged) == 1 and merged[0][7] == "first-ev" and merged[0][5] == "c:0"
    assert len(local) == 3


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

    # simulate a killed job: the wave-commit protocol leaves a manifest
    # with the CURRENT fingerprint, a subset of buckets, complete=False
    annotated_path = tmp_path / "work" / "annotated"
    manifest = json.loads((annotated_path / "_manifest.json").read_text())
    full_buckets = dict(manifest["per_partition_rows"])
    kept = dict(list(full_buckets.items())[:2])
    manifest["per_partition_rows"] = kept
    manifest["complete"] = False
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
    assert resumed["complete"] is True
    assert set(resumed["per_partition_rows"]) == set(full_buckets)


def test_workdir_not_reused_across_inputs(spark, tmp_path) -> None:
    """A work_dir pointed at a DIFFERENT input (different fingerprint via
    input_token) must rebuild, never resume stale buckets."""
    work = str(tmp_path / "work")
    t_a = synthetic_transcripts(spark, 12, turns_per_conv=3)
    t_b = synthetic_transcripts(spark, 6, turns_per_conv=3)
    build_graph(spark, t_a, work_dir=work, n_buckets=4, input_token="a")
    r_b = build_graph(spark, t_b, work_dir=work, n_buckets=4, input_token="b")
    fresh = build_graph(spark, t_b, work_dir=str(tmp_path / "fresh"), n_buckets=4,
                        input_token="b")
    rows = lambda r: sorted(  # noqa: E731
        map(tuple, r.edges.select("pred", "src_key", "tgt_key", "source_hadith").collect())
    )
    assert rows(r_b) == rows(fresh)


def test_workdir_resume_crash_between_commit_and_manifest(spark, tmp_path) -> None:
    """A wave's parquet job can commit and the process die BEFORE the
    manifest update records it.  The re-run must treat those un-manifested
    bucket dirs as uncommitted (delete + re-annotate), never append a
    second copy of their rows."""
    import json

    transcripts = synthetic_transcripts(spark, 12, turns_per_conv=3)
    work = str(tmp_path / "work")
    r1 = build_graph(spark, transcripts, work_dir=work, n_buckets=4)
    clean_rows = r1.annotated.count()
    edges_1 = sorted(
        map(tuple, r1.edges.select("pred", "src_key", "tgt_key", "source_hadith").collect())
    )

    # crash window: roll the manifest back to 2 buckets but LEAVE every
    # parquet bucket dir on disk (the committed-but-unrecorded state)
    annotated_path = tmp_path / "work" / "annotated"
    manifest = json.loads((annotated_path / "_manifest.json").read_text())
    full_buckets = dict(manifest["per_partition_rows"])
    manifest["per_partition_rows"] = dict(list(full_buckets.items())[:2])
    manifest["complete"] = False
    (annotated_path / "_manifest.json").write_text(json.dumps(manifest))

    r2 = build_graph(spark, transcripts, work_dir=work, n_buckets=4)
    assert r2.annotated.count() == clean_rows  # no duplicated turns
    edges_2 = sorted(
        map(tuple, r2.edges.select("pred", "src_key", "tgt_key", "source_hadith").collect())
    )
    assert edges_1 == edges_2


def test_in_memory_metrics(spark) -> None:
    """metrics() reports per-stage row counts from the cached
    intermediates — the in-memory counterpart of _manifest.json."""
    transcripts = synthetic_transcripts(spark, 10, turns_per_conv=4)
    result = build_graph(spark, transcripts)
    m = result.metrics()
    assert m["turns"] == 40
    assert m["triples"] == result.triples.count() > 0
    assert m["mentions"] >= m["triples"]
    assert m["nodes"] == result.nodes.count() > 0
    assert m["edges"] == result.edges.count() > 0
    assert m["resolution_strings"] > 0
