"""Corpus curation: the composed training-data admission pipeline.

The individual operators (quality scoring, exact dedup, MinHash near-dup)
each exist standalone; this composes them in admission order into one
``(doc_id, status)`` decision table — the shape a 100 TB pretraining
pipeline actually runs, where every drop needs an attributable reason:

* ``short``       — fewer than ``min_words`` whitespace words;
* ``low_quality`` — average word length outside
  ``[min_awl_x100, max_awl_x100]`` x100 (gibberish / run-on detector),
  decided by cross-multiplied integer comparison
  (``n_chars * 100  vs  bound * n_words``) — no division at all;
* ``exact_dup``   — same ``md5(text)`` as a surviving smaller doc_id
  (dedup runs over the quality-surviving subset: a rejected doc never
  claims a keep slot);
* ``near_dup``    — member of a near-duplicate cluster whose smallest
  exact-surviving doc_id is someone else.  Clusters come from the
  verified-pair connected components (full corpus); the survivor is the
  min *surviving* id within the cluster, so the decision composes with
  the earlier stages deterministically;
* ``kept``        — admitted.

Every decision is integer/string-exact — the word-length bounds are
cross-multiplied integer comparisons, not float division — so an
independent SQL engine reproduces the status column bit-for-bit — the
paired DuckDB oracle (``corpus_curation``) replays quality filters,
hash dedup, and the cluster-survivor rule from the same staged pair
table.

Scale shape: two window functions over hash/cluster keys (shuffled by
key, map-side combinable), one broadcast-size join against the cluster
table; no collect, no cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def curate_corpus(
    docs: DataFrame,
    dup_groups: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 5,
    min_awl_x100: int = 200,
    max_awl_x100: int = 2500,
) -> DataFrame:
    """(doc_id, status) admission decisions; see module docstring.

    ``dup_groups``: ``(id, group)`` near-duplicate clusters with group =
    the cluster's numeric min id (operators/dedup.near_duplicate_groups
    or the staged equivalent); singletons absent.
    """
    words = F.split(F.trim(text_col), r"\s+")
    n_words = F.size(words)
    # integer-exact bounds: floor(chars*100 / words) < lo  <=>
    # chars*100 < lo*words, and floor(...) > hi  <=>  chars*100 >=
    # (hi+1)*words — cross-multiplication keeps every comparison in
    # integer arithmetic (same statuses as the floor form, no division)
    n_chars_x100 = F.length(F.regexp_replace(text_col, r"\s", "")) * 100
    flagged = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        F.when(n_words < min_words, F.lit("short"))
        .when(
            (n_chars_x100 < min_awl_x100 * n_words)
            | (n_chars_x100 >= (max_awl_x100 + 1) * n_words),
            F.lit("low_quality"),
        )
        .alias("q_status"),
    )
    rejected = flagged.where(F.col("q_status").isNotNull()).select(
        "doc_id", F.col("q_status").alias("status")
    )

    survivors = flagged.where(F.col("q_status").isNull())
    hash_w = Window.partitionBy(F.md5("text"))
    with_keep = survivors.withColumn("keep_id", F.min("doc_id").over(hash_w))
    exact_dups = with_keep.where(F.col("doc_id") != F.col("keep_id")).select(
        "doc_id", F.lit("exact_dup").alias("status")
    )

    exact_survivors = with_keep.where(F.col("doc_id") == F.col("keep_id")).select(
        "doc_id"
    )
    joined = exact_survivors.join(
        dup_groups.select(F.col("id").alias("doc_id"), "group"), "doc_id", "left"
    )
    # NULL groups (not near-duplicated) must each stay their own
    # partition, not pool into one NULL bucket
    cluster_w = Window.partitionBy(F.coalesce("group", F.col("doc_id")))
    near = joined.withColumn("survivor", F.min("doc_id").over(cluster_w)).select(
        "doc_id",
        F.when(
            F.col("group").isNotNull() & (F.col("doc_id") != F.col("survivor")),
            F.lit("near_dup"),
        )
        .otherwise(F.lit("kept"))
        .alias("status"),
    )
    return rejected.unionByName(exact_dups).unionByName(near)
