"""As-of (point-in-time) join — the time-series operator Spark lacks.

For every left row, attach the latest right row whose timestamp is at or
before the left row's timestamp, per key — "last error before each
click", "prevailing quote at each trade", "active config at each event".
The reference workload needs it to attach the newest tool result to a
transcript turn; a training-data pipeline needs it to version-stamp
documents against a mutating dimension.

Spark has no ASOF JOIN.  The naive encodings both collapse at scale:

* range self-join (``l.ts >= r.ts``) is a non-equi join — Catalyst
  can only nested-loop it, O(|L|·|R|) per key;
* per-key ``collect_list`` + UDF search moves whole keys through Python.

This implementation is the scalable composition: tag both sides, union,
and run ONE window pass per key ordered by (time, side, tie) with
``last(value, ignorenulls=True)`` carrying the most recent right value
forward onto each left row.  Plan shape: two narrow filtered scans →
union → a single hash exchange on the key → sort → window.  No
non-equi join, no Python, no second shuffle; skewed keys cost one sort
of their own rows (the same cost any keyed window pays).

Tie semantics (deterministic by construction): right rows at a
timestamp equal to the left row's ARE visible (side orders right=0
before left=1), and among right rows sharing (key, time) the one with
the greatest tie-break column wins (sort is ascending; ``last`` picks
the latest).  DuckDB's native ``ASOF JOIN`` (``ON l.ts >= r.ts``) has
the same at-or-before semantics, which is what the driver oracle runs.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_TIME = "__asof_t"
_TIE = "__asof_tie"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    value_cols: Sequence[str],
    tie_break: str | None = None,
    tolerance: int | None = None,
) -> DataFrame:
    """Backward as-of join: latest right row with time <= left time, per key.

    Parameters
    ----------
    on : equi-key columns present on both sides.
    left_time / right_time : numeric or timestamp ordering columns.
    value_cols : right-side columns to attach (must not collide with
        left column names).
    tie_break : right-side column deciding ties among right rows that
        share (key, time) — the greatest value wins.  Defaults to the
        first value column.
    tolerance : optional maximum allowed (left_time - right_time), in
        the time column's own units (use integer epoch columns for
        exact semantics).  Matches older than the tolerance are nulled
        out, like pandas ``merge_asof(tolerance=...)``.

    Returns the left rows + ``value_cols`` (null where no right row
    qualifies) + ``__asof_matched_t`` (the matched right time, null when
    unmatched) for gap computations.
    """
    on = list(on)
    value_cols = list(value_cols)
    tie = tie_break or value_cols[0]
    collisions = set(value_cols) & set(left.columns)
    if collisions:
        raise ValueError(f"value_cols collide with left columns: {sorted(collisions)}")

    right_tagged = right.select(
        *on,
        F.col(right_time).alias(_TIME),
        F.lit(0).alias(_SIDE),
        F.col(tie).alias(_TIE),
        *[F.col(c) for c in value_cols],
        F.col(right_time).alias("__asof_matched_t"),
    )
    left_tagged = left.select(
        *left.columns,
        F.col(left_time).alias(_TIME),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(right_tagged.schema[_TIE].dataType).alias(_TIE),
        *[F.lit(None).cast(right_tagged.schema[c].dataType).alias(c) for c in value_cols],
        F.lit(None).cast(right_tagged.schema["__asof_matched_t"].dataType).alias(
            "__asof_matched_t"
        ),
    )
    # align column order for the union (left carries extra payload cols)
    right_aligned = right_tagged.select(
        *[
            F.col(c) if c in right_tagged.columns else F.lit(None).cast(
                left_tagged.schema[c].dataType
            ).alias(c)
            for c in left_tagged.columns
        ]
    )

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(_TIME).asc(), F.col(_SIDE).asc(), F.col(_TIE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = left_tagged.unionByName(right_aligned).select(
        *[c for c in left.columns],
        F.col(_SIDE),
        F.col(_TIME),
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in value_cols],
        F.last("__asof_matched_t", ignorenulls=True).over(w).alias("__asof_matched_t"),
    )
    out = carried.where(F.col(_SIDE) == 1).drop(_SIDE)
    if tolerance is not None:
        stale = (F.col(_TIME) - F.col("__asof_matched_t")) > F.lit(tolerance)
        out = out.select(
            *[c for c in left.columns],
            F.col(_TIME),
            *[F.when(stale, F.lit(None)).otherwise(F.col(c)).alias(c) for c in value_cols],
            F.when(stale, F.lit(None))
            .otherwise(F.col("__asof_matched_t"))
            .alias("__asof_matched_t"),
        )
    return out.drop(_TIME)
