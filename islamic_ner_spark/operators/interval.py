"""Interval (range-containment) join — the second time-series operator
Spark lacks natively (the first, as-of, lives in operators/asof.py).

"Which intervals contain this point" — events vs sessions, trades vs
halts, log lines vs deploy windows.  Spark compiles the literal
predicate ``start <= t AND t <= end`` to a broadcast nested loop
(O(|points| x |intervals|)): at 10^9 points x 10^7 intervals that is
10^16 comparisons and the job never finishes.

The scalable encoding is time bucketization: chop time into fixed-width
buckets, replicate every interval into each bucket it overlaps (cost:
``ceil(span/width) + 1`` rows per interval — pick ``width`` near the
median interval span so the replication factor is ~2), send each point
to its single bucket, and equi-join on the bucket id with the exact
containment predicate as a post-filter.  Each qualifying (point,
interval) pair meets in EXACTLY one bucket — the point's — so the join
emits no duplicates to dedupe.  Plan shape: one exchange per side keyed
on the bucket id, then a hash join; hot buckets (many concurrent
intervals at the same hour) spread under AQE skew-join like any other
keyed hot spot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

BUCKET_WIDTH_S = 3600


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_ts: str,
    start_col: str,
    end_col: str,
    width: int = BUCKET_WIDTH_S,
) -> DataFrame:
    """Inner containment join: every (point, interval) pair with
    ``start <= point_ts <= end``.  Time columns are integer epochs
    (cast timestamps to long upstream for engine-exact semantics).
    Returns all point columns + all interval columns.
    """
    clash = {"__bucket"} & (set(points.columns) | set(intervals.columns))
    if clash:
        raise ValueError(
            "interval_join reserves the column name '__bucket'; rename it "
            "on the input side"
        )
    b_points = points.withColumn(
        "__bucket", F.floor(F.col(point_ts) / F.lit(width)).cast("long")
    )
    # malformed intervals (end < start) contain no points by definition;
    # guard them to an empty bucket array (explode drops the row) —
    # otherwise F.sequence defaults to step -1 when start > stop and a
    # single corrupt row replicates across the whole reversed span
    lo = F.floor(F.col(start_col) / F.lit(width)).cast("long")
    hi = F.floor(F.col(end_col) / F.lit(width)).cast("long")
    b_intervals = intervals.withColumn(
        "__bucket",
        F.explode(
            F.when(F.col(end_col) >= F.col(start_col), F.sequence(lo, hi))
            .otherwise(F.array().cast("array<long>"))
        ),
    )
    return (
        b_points.join(b_intervals, "__bucket")
        .where(
            (F.col(start_col) <= F.col(point_ts))
            & (F.col(point_ts) <= F.col(end_col))
        )
        .drop("__bucket")
    )
