"""Inverted-index unit tests: hand-computed postings plus equivalence
of the salted two-phase top-k against a direct single-window pick (the
property the skew-safe plan relies on)."""

from __future__ import annotations

import random

from pyspark.sql import Window, functions as F

from islamic_ner_spark.operators.index import inverted_index, term_frequencies

DOC_SCHEMA = "doc_id long, text string"


def test_inverted_index_hand_docs(spark) -> None:
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog"),
            (3, "cat cat cat"),
        ],
        DOC_SCHEMA,
    )
    got = {
        r["term"]: (r["n_docs"], r["total_tf"], r["top_docs"])
        for r in inverted_index(docs, top_k=2).collect()
    }
    assert got["the"] == (2, 3, "1:2,2:1")
    # tf ties broken by doc_id ASC
    assert got["cat"] == (2, 4, "3:3,1:1")
    assert got["dog"] == (1, 1, "2:1")
    assert got["mat"] == (1, 1, "1:1")


def test_salted_topk_matches_global_window(spark) -> None:
    rng = random.Random(4242)
    vocab = [f"w{i}" for i in range(12)]
    docs = spark.createDataFrame(
        [
            (i, " ".join(rng.choices(vocab, k=rng.randint(3, 40))))
            for i in range(60)
        ],
        DOC_SCHEMA,
    )
    # direct single-window top-k (the plan that would skew at scale)
    tf = term_frequencies(docs)
    w = Window.partitionBy("term").orderBy(F.desc("tf"), F.asc("doc_id"))
    direct = (
        tf.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= 5)
        .groupBy("term")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("r", "doc_id", "tf"))),
                    lambda s: F.concat_ws(
                        ":", s.doc_id.cast("string"), s.tf.cast("string")
                    ),
                ),
            ).alias("top_docs")
        )
    )
    expect = {r["term"]: r["top_docs"] for r in direct.collect()}
    for buckets in (1, 4, 32):
        got = {
            r["term"]: r["top_docs"]
            for r in inverted_index(docs, salt_buckets=buckets).collect()
        }
        assert got == expect, f"salt_buckets={buckets}"


from itertools import combinations

from islamic_ner_spark.operators.dedup import typo_pairs


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_typo_pairs_matches_naive(spark) -> None:
    vocab = [
        "join", "coin", "jon", "joins", "hash", "cash", "bash",
        "scan", "span", "a", "at", "ate", "gate", "batch", "catch",
        "merge", "purge", "xylophone",
    ]
    docs = spark.createDataFrame(
        [(0, " ".join(vocab)), (1, "join hash a")], DOC_SCHEMA
    )
    for k in (1, 2):
        got = {
            (r["w_a"], r["w_b"]): r["dist"]
            for r in typo_pairs(docs, max_dist=k).collect()
        }
        expect = {
            (a, b): _lev(a, b)
            for a, b in combinations(sorted(vocab), 2)
            if _lev(a, b) <= k
        }
        assert got == expect, f"max_dist={k}"


def test_typo_pairs_rejects_bad_dist(spark) -> None:
    import pytest

    docs = spark.createDataFrame([(0, "a b")], DOC_SCHEMA)
    with pytest.raises(ValueError, match="1 or 2"):
        typo_pairs(docs, max_dist=3)
