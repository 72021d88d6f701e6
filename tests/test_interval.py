"""Interval-containment join: hand cases (boundaries, multi-bucket
spans, no-match) plus a randomized cross-check against the naive
crossJoin + filter encoding it replaces."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from islamic_ner_spark.operators.interval import interval_join

P_SCHEMA = "pid long, t long"
I_SCHEMA = "iid string, s long, e long"


def test_interval_join_hand_cases(spark) -> None:
    points = spark.createDataFrame(
        [(1, 100), (2, 3600), (3, 7200), (4, 99999)], P_SCHEMA
    )
    intervals = spark.createDataFrame(
        [
            ("a", 0, 100),        # closed on both ends: contains t=100
            ("b", 100, 8000),     # spans 3 buckets at width 3600
            ("c", 7200, 7200),    # degenerate single-instant interval
        ],
        I_SCHEMA,
    )
    got = {
        (r["pid"], r["iid"])
        for r in interval_join(
            points, intervals, point_ts="t", start_col="s", end_col="e"
        ).collect()
    }
    assert got == {
        (1, "a"), (1, "b"),
        (2, "b"),
        (3, "b"), (3, "c"),
        # pid 4 at 99999 matches nothing
    }


def test_interval_join_matches_naive_crossjoin(spark) -> None:
    rng = random.Random(31)
    points = spark.createDataFrame(
        [(i, rng.randint(0, 50_000)) for i in range(120)], P_SCHEMA
    )
    intervals = spark.createDataFrame(
        [
            (f"i{j}", s, s + rng.randint(0, 12_000))
            for j in range(40)
            for s in [rng.randint(0, 45_000)]
        ],
        I_SCHEMA,
    )
    for width in (500, 3600, 100_000):
        got = {
            (r["pid"], r["iid"])
            for r in interval_join(
                points,
                intervals,
                point_ts="t",
                start_col="s",
                end_col="e",
                width=width,
            ).collect()
        }
        naive = {
            (r["pid"], r["iid"])
            for r in points.crossJoin(intervals)
            .where((F.col("s") <= F.col("t")) & (F.col("t") <= F.col("e")))
            .collect()
        }
        assert got == naive, f"width={width}"


import pytest


def test_interval_join_guards(spark) -> None:
    points = spark.createDataFrame([(1, 100)], P_SCHEMA)
    # end < start: malformed interval matches nothing (no reversed
    # bucket-sequence blowup)
    bad = spark.createDataFrame([("x", 5000, 100)], I_SCHEMA)
    assert (
        interval_join(
            points, bad, point_ts="t", start_col="s", end_col="e"
        ).count()
        == 0
    )
    # reserved column name is rejected, not silently clobbered
    with pytest.raises(ValueError, match="__bucket"):
        interval_join(
            points.withColumn("__bucket", F.lit(1)),
            bad,
            point_ts="t",
            start_col="s",
            end_col="e",
        )
