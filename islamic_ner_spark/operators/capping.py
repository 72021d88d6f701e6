"""Bucket/block capping with dropped-work observability.

Every path that bounds quadratic candidate generation — MinHash LSH
bands (operators/dedup.py), SimHash bands (same), hyperplane-LSH bands
(operators/similarity.py), token blocking for new-entity resolution
(operators/linking.py) — runs through :func:`cap_buckets`, so every
build emits the same evidence when it drops work: one WARNING naming
the path, how many buckets were dropped, and the largest offenders.
No silent caps anywhere.

:func:`log_candidate_stats` is the companion visibility hook: one INFO
line per build reporting candidate-pair volume against corpus size, so
an LSH parameterization that fails to prune (the round-2 verdict's
2-4-bit band defect) is self-evident in the logs instead of only in a
plan audit.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

log = logging.getLogger("islamic_ner_spark.capping")


def cap_buckets(
    banded: DataFrame,
    key_cols: list[str],
    max_bucket_size: int | None,
    what: str,
    persisted: list | None = None,
) -> DataFrame:
    """Drop (and log) over-capacity buckets/blocks from ``banded``.

    When ``persisted`` (a list) is given, ``banded`` is cached and
    appended to it so the caller can ``unpersist()`` once the candidate
    join has materialized — the overflow check and the downstream
    self-join otherwise each re-run the kernel that produced it.  With
    no tracking list the input is deliberately NOT cached: recomputing
    it twice is bounded work, whereas an untracked cache would leak
    until Spark's LRU reclaims it (e.g. a driver invoking the query
    catalog in a loop).
    """
    if max_bucket_size is None:
        return banded
    if persisted is not None:
        banded = banded.persist()
        persisted.append(banded)

    bucket_w = Window.partitionBy(*key_cols)
    capped = banded.withColumn(
        "_bucket_n", F.count(F.lit(1)).over(bucket_w)
    ).where(F.col("_bucket_n") <= max_bucket_size).drop("_bucket_n")

    # ONE driver job: top over-capacity buckets (len>5 => "more exist")
    hot_rows = (
        banded.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("_bucket_n"))
        .where(F.col("_bucket_n") > max_bucket_size)
        .orderBy(F.desc("_bucket_n"))
        .take(6)
    )
    if hot_rows:
        log.warning(
            "%s: dropped %s%d over-capacity bucket(s) (> %d members) from "
            "candidate generation; largest: %s",
            what,
            ">=" if len(hot_rows) > 5 else "",
            len(hot_rows),
            max_bucket_size,
            [tuple(r[c] for c in key_cols) + (r["_bucket_n"],)
             for r in hot_rows[:5]],
        )
    return capped


def log_candidate_stats(
    what: str,
    *,
    n_candidates: int,
    corpus_size: int,
    extra: str = "",
) -> None:
    """One INFO line per build: candidate volume vs corpus size.

    ``pairs/doc`` is the number a reader compares against the corpus
    size: for a pruning LSH it should stay roughly constant as the
    corpus grows; if it tracks the corpus size, candidate generation
    has gone quadratic.
    """
    per_doc = n_candidates / corpus_size if corpus_size else 0.0
    log.info(
        "%s: %d candidate pairs over corpus of %d (%.1f pairs/doc)%s",
        what, n_candidates, corpus_size, per_doc,
        f" [{extra}]" if extra else "",
    )
