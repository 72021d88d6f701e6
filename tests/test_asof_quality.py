"""Tests for the as-of join, repetition filters, PII scrub, and
stratified sampling operators (round-4 training-data additions)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from islamic_ner_spark.operators.asof import asof_join
from islamic_ner_spark.operators.quality import repetition_stats
from islamic_ner_spark.operators.stats import stratified_sample
from islamic_ner_spark.functions.pii import PII_PATTERNS, pii_counts, redact_pii


# ---------------------------------------------------------------------------
# as-of join
# ---------------------------------------------------------------------------


def naive_asof(left_rows, right_rows):
    """Per-row reference: latest right (t <= left t) per key, greatest
    tie value at equal t."""
    out = {}
    for key, lt, lid in left_rows:
        best = None
        for rkey, rt, rv in right_rows:
            if rkey != key or rt > lt:
                continue
            if best is None or (rt, rv) > (best[0], best[1]):
                best = (rt, rv)
        out[lid] = best
    return out


@pytest.fixture(scope="module")
def asof_frames(spark):
    left_rows = [
        ("a", 10, 1), ("a", 20, 2), ("a", 5, 3),
        ("b", 100, 4), ("b", 99, 5),
        ("c", 7, 6),  # key with no right rows at all
    ]
    right_rows = [
        ("a", 10, 100),  # equal-time: must be visible to left ("a",10)
        ("a", 10, 101),  # tie at (a,10): greatest value wins
        ("a", 15, 102),
        ("b", 100, 103),
        ("d", 1, 104),  # right-only key: must not leak
    ]
    left = spark.createDataFrame(left_rows, "k string, t long, lid long")
    right = spark.createDataFrame(right_rows, "k string, t long, v long")
    return left, right, left_rows, right_rows


def test_asof_matches_naive_reference(asof_frames):
    left, right, left_rows, right_rows = asof_frames
    got = asof_join(
        left, right, on=["k"], left_time="t", right_time="t", value_cols=["v"]
    ).collect()
    expected = naive_asof(left_rows, right_rows)
    assert len(got) == len(left_rows)
    for row in got:
        best = expected[row["lid"]]
        if best is None:
            assert row["v"] is None and row["__asof_matched_t"] is None
        else:
            assert (row["__asof_matched_t"], row["v"]) == best


def test_asof_tolerance_nulls_stale_matches(asof_frames):
    left, right, left_rows, right_rows = asof_frames
    got = asof_join(
        left, right, on=["k"], left_time="t", right_time="t",
        value_cols=["v"], tolerance=5,
    ).collect()
    expected = naive_asof(left_rows, right_rows)
    for row in got:
        best = expected[row["lid"]]
        lt = dict((lid, t) for _, t, lid in left_rows)[row["lid"]]
        if best is None or lt - best[0] > 5:
            assert row["v"] is None
        else:
            assert row["v"] == best[1]


def test_asof_partition_layout_invariance(asof_frames):
    """Result must not depend on the physical layout of either side."""
    left, right, left_rows, _ = asof_frames
    base = sorted(
        (r["lid"], r["v"])
        for r in asof_join(
            left, right, on=["k"], left_time="t", right_time="t", value_cols=["v"]
        ).collect()
    )
    scrambled = sorted(
        (r["lid"], r["v"])
        for r in asof_join(
            left.repartition(7), right.repartition(3),
            on=["k"], left_time="t", right_time="t", value_cols=["v"],
        ).collect()
    )
    assert base == scrambled


def test_asof_rejects_colliding_value_cols(asof_frames):
    left, right, *_ = asof_frames
    with pytest.raises(ValueError, match="collide"):
        asof_join(
            left, right, on=["k"], left_time="t", right_time="t",
            value_cols=["lid"],
        )


def test_asof_plan_has_single_exchange(asof_frames):
    """The scalable-composition claim: one hash exchange (the window),
    no join operator at all in the physical plan."""
    left, right, *_ = asof_frames
    plan = (
        asof_join(
            left, right, on=["k"], left_time="t", right_time="t", value_cols=["v"]
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan, plan
    assert plan.count("hashpartitioning") <= 1 or plan.count("Exchange") <= 1, plan


# ---------------------------------------------------------------------------
# repetition filters
# ---------------------------------------------------------------------------


def test_repetition_stats_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),          # top bigram "a b" x3 of 5 slots
            (2, "x y z w"),              # all distinct
            (3, "q q q q q"),            # one word repeated
            (4, "   "),                  # whitespace-only: dropped
            (5, "solo"),                 # single word: no bigrams
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert set(rows) == {1, 2, 3, 5}

    r1 = rows[1]
    assert r1["n_words"] == 6 and r1["n_distinct_words"] == 2
    assert r1["top_word_count"] == 3
    assert r1["n_bigrams"] == 5 and r1["top_bigram_count"] == 3
    assert r1["dup_word_frac_x1000"] == (6 - 2) * 1000 // 6
    assert r1["is_repetitive"] == 1

    r2 = rows[2]
    assert r2["n_distinct_words"] == 4 and r2["is_repetitive"] == 0
    assert r2["top_bigram_count"] == 1

    r3 = rows[3]
    assert r3["top_word_count"] == 5 and r3["is_repetitive"] == 1

    r5 = rows[5]
    assert r5["n_bigrams"] == 0 and r5["top_bigram_count"] == 0
    assert r5["is_repetitive"] == 0


# ---------------------------------------------------------------------------
# PII scrub
# ---------------------------------------------------------------------------


def test_pii_redaction_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at jo.smith+x@corp.example.org today"),
            (2, "call +14155551234 or visit 192.168.1.77 now"),
            (3, "card 4111111111111111 expires soon"),
            (4, "clean text with no contact data at all"),
            (5, "two mails a@b.co c@d.io and ip 10.0.0.1"),
        ],
        "doc_id long, text string",
    )
    counts = pii_counts(F.col("text"))
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            *[c.alias(n) for n, c in counts.items()],
            redact_pii(F.col("text")).alias("red"),
        ).collect()
    }
    assert out[1]["n_email"] == 1 and "<EMAIL>" in out[1]["red"]
    assert "jo.smith" not in out[1]["red"]
    assert out[2]["n_phone"] == 1 and out[2]["n_ipv4"] == 1
    assert "<PHONE>" in out[2]["red"] and "<IPV4>" in out[2]["red"]
    # the phone's digits must NOT also count as a long id (ordering)
    assert out[2]["n_long_id"] == 0
    assert out[3]["n_long_id"] == 1 and "<ID>" in out[3]["red"]
    assert all(out[4][f"n_{n}"] == 0 for n, _, _ in PII_PATTERNS)
    assert out[4]["red"] == "clean text with no contact data at all"
    assert out[5]["n_email"] == 2 and out[5]["n_ipv4"] == 1


def test_pii_patterns_re2_compatible():
    """Every pattern must parse under RE2 semantics (DuckDB oracle) and
    Java-compatible syntax — approximated here by Python re plus a ban
    on constructs RE2 lacks."""
    import re

    for name, pattern, _ in PII_PATTERNS:
        re.compile(pattern)
        assert "(?<" not in pattern and "(?=" not in pattern and "(?!" not in pattern, (
            f"{name} uses lookaround, which RE2 cannot run"
        )
        assert "\\1" not in pattern, f"{name} uses a backreference"


# ---------------------------------------------------------------------------
# stratified sampling
# ---------------------------------------------------------------------------


def test_stratified_sample_deterministic_and_capped(spark):
    rows = [(i, "g%d" % (i % 3)) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, grp string")
    got = stratified_sample(df, ["grp"], k=4, key_col="id")
    picked = got.collect()
    per_group: dict[str, list] = {}
    for r in picked:
        per_group.setdefault(r["grp"], []).append(r)
    assert all(len(v) == 4 for v in per_group.values())
    assert {r["sample_rank"] for v in per_group.values() for r in v} == {1, 2, 3, 4}
    # deterministic under re-layout
    again = stratified_sample(df.repartition(13), ["grp"], k=4, key_col="id")
    assert sorted((r["id"], r["sample_rank"]) for r in again.collect()) == sorted(
        (r["id"], r["sample_rank"]) for r in picked
    )
    # matches the spec: first k by md5(str(id))
    for grp, members in per_group.items():
        ids = [i for i, g in rows if g == grp]
        expect = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:4]
        assert sorted(r["id"] for r in members) == sorted(expect)
