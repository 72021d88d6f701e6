"""Hand-computed cases for benchmark decontamination (n-gram overlap)
and domain-mixture sampling."""

from __future__ import annotations

import hashlib

import pytest

from islamic_ner_spark.operators.decontam import ngram_contamination, word_shingles
from islamic_ner_spark.operators.stats import domain_mix_sample


def test_word_shingles_hand_case(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d"),  # 2 trigrams
            (2, "  x  y   z "),  # ragged whitespace -> 1 trigram
            (3, "too short"),  # < n words -> no rows
            (4, "a a a a"),  # repeated words -> duplicate shingles kept
        ],
        "doc_id long, text string",
    )
    rows = sorted(
        (r["doc_id"], r["shingle"])
        for r in word_shingles(docs, n=3).collect()
    )
    assert rows == [
        (1, "a b c"),
        (1, "b c d"),
        (2, "x y z"),
        (4, "a a a"),
        (4, "a a a"),
    ]


def test_ngram_contamination_hand_case(spark):
    # eval doc contains "the quick brown fox jumps"; train doc 10 embeds
    # that sentence (2 shared 5-grams), train doc 20 shares nothing,
    # train doc 30 repeats a shared 5-gram twice (distinct-counted once)
    evalset = spark.createDataFrame(
        [(100, "the quick brown fox jumps high")], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [
            (10, "see the quick brown fox jumps high today"),
            (20, "completely different words in this one here"),
            (30, "the quick brown fox jumps and the quick brown fox jumps"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_shingles"], r["n_shared"])
        for r in ngram_contamination(train, evalset, n=5).collect()
    }
    # doc 10: 4 distinct 5-grams, 2 shared ("the quick brown fox jumps",
    # "quick brown fox jumps high"); doc 20 absent (no overlap);
    # doc 30: 7 positions but "the quick brown fox jumps" occurs twice
    # -> 6 distinct, 1 shared
    assert out == {10: (4, 2), 30: (6, 1)}


def test_ngram_contamination_short_docs_excluded(spark):
    evalset = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    train = spark.createDataFrame([(2, "a b c d")], "doc_id long, text string")
    assert ngram_contamination(train, evalset, n=5).count() == 0


def _md5_order(keys):
    return sorted(keys, key=lambda k: (hashlib.md5(str(k).encode()).hexdigest(), k))


def test_domain_mix_sample_exact_membership(spark):
    # domains: a has 10 rows, b has 6.  weights a=50, b=25 -> feasible
    # total T = min(10*100//50, 6*100//25) = min(20, 24) = 20;
    # quotas: a = 50*20//100 = 10, b = 25*20//100 = 5.
    rows = [(f"a{i}", "a") for i in range(10)] + [(f"b{i}", "b") for i in range(6)]
    df = spark.createDataFrame(rows, "k string, dom string")
    out = domain_mix_sample(df, {"a": 50, "b": 25}, domain_col="dom", key_col="k")
    got = {r["dom"]: [] for r in out.collect()}
    for r in out.collect():
        got[r["dom"]].append(r["k"])
    assert len(got["a"]) == 10
    assert sorted(got["b"]) == sorted(_md5_order([f"b{i}" for i in range(6)])[:5])


def test_domain_mix_sample_drops_unlisted_and_is_layout_independent(spark):
    rows = (
        [(f"a{i}", "a") for i in range(8)]
        + [(f"b{i}", "b") for i in range(8)]
        + [(f"z{i}", "zz") for i in range(5)]  # not in the mix -> dropped
    )
    df = spark.createDataFrame(rows, "k string, dom string")
    weights = {"a": 30, "b": 60}
    base = sorted(
        (r["dom"], r["k"], r["sample_rank"])
        for r in domain_mix_sample(
            df, weights, domain_col="dom", key_col="k"
        ).collect()
    )
    assert all(dom != "zz" for dom, _, _ in base)
    # T = min(8*100//30, 8*100//60) = min(26, 13) = 13; quotas a=3, b=7
    by_dom = {"a": 0, "b": 0}
    for dom, _, _ in base:
        by_dom[dom] += 1
    assert by_dom == {"a": 3, "b": 7}
    repart = sorted(
        (r["dom"], r["k"], r["sample_rank"])
        for r in domain_mix_sample(
            df.repartition(7), weights, domain_col="dom", key_col="k"
        ).collect()
    )
    assert repart == base


def test_domain_mix_sample_rejects_bad_weights(spark):
    df = spark.createDataFrame([("x", "a")], "k string, dom string")
    with pytest.raises(ValueError):
        domain_mix_sample(df, {"a": 0}, domain_col="dom", key_col="k")
    with pytest.raises(ValueError):
        domain_mix_sample(df, {}, domain_col="dom", key_col="k")


def test_domain_mix_sample_empty_domain_yields_empty(spark):
    # a weighted domain with zero rows makes the exact mixture
    # infeasible at any size -> empty output, not a crash
    df = spark.createDataFrame([(f"a{i}", "a") for i in range(4)], "k string, dom string")
    out = domain_mix_sample(df, {"a": 50, "b": 50}, domain_col="dom", key_col="k")
    assert out.count() == 0
