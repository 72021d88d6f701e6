"""Composed corpus-curation admission pipeline (operators/curation.py)."""

from __future__ import annotations

from islamic_ner_spark.operators.curation import curate_corpus
from islamic_ner_spark.operators.dedup import near_duplicate_groups

LONG_A = (
    "the quick brown fox jumps over the lazy dog and runs far away into the "
    "woods tonight while the moon rises slowly over the quiet hills"
)
LONG_B = (
    "spark query engines shuffle data between executors during wide "
    "transformations and prune columns at the parquet scan boundary"
)


def test_curate_corpus_statuses(spark) -> None:
    rows = [
        (0, LONG_A),
        (1, LONG_A),                                # exact dup of 0
        (2, LONG_A.replace("lazy", "sleepy")),      # near dup of 0
        (3, "tiny"),                                # < min_words
        (4, "a a a a a a"),                         # avg word len 100 < 200
        (5, LONG_B),                                # unique, admitted
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    groups = near_duplicate_groups(docs, threshold=0.7)
    status = {r["doc_id"]: r["status"] for r in curate_corpus(docs, groups).collect()}
    assert status == {
        0: "kept",
        1: "exact_dup",
        2: "near_dup",
        3: "short",
        4: "low_quality",
        5: "kept",
    }


def test_curate_corpus_partitioning_invariant(spark) -> None:
    rows = [(i, f"{LONG_A} variant {i}") for i in range(20)] + [(100, LONG_A)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    groups = near_duplicate_groups(docs, threshold=0.7)
    one = sorted(map(tuple, curate_corpus(docs, groups).collect()))
    other = sorted(
        map(tuple, curate_corpus(docs.repartition(7), groups).collect())
    )
    assert one == other and len(one) == 21
