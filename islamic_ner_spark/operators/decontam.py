"""Benchmark decontamination: flag training documents that share word
n-grams with a held-out evaluation set.

A training corpus that contains an eval benchmark's text (verbatim or
near-verbatim) invalidates the benchmark; the standard defense is an
n-gram overlap scan (e.g. GPT-3's 13-gram and PaLM's 8-gram filters).
This module implements the scan as a shingle equi-join:

1. explode each side into word ``n``-grams (shingles),
2. distinct the eval side — a benchmark is FIXED-SIZE (thousands of
   documents) regardless of corpus scale, so its shingle set broadcasts,
3. left-join training shingles against it and aggregate per document in
   ONE exchange keyed by doc (two partial-aggregated count-distincts).

Scale shape at 100 TB: the only corpus-wide movement is the single
hash exchange on ``doc_col`` for the per-document rollup; the eval side
never shuffles the corpus (broadcast hash join), and no all-pairs or
similarity join exists anywhere.  Contrast operators/dedup.py, which
handles the corpus-vs-corpus (near-dup) case with banded LSH; here the
right side is benchmark-sized by definition, so the plan is simpler.

The reference has no decontamination operator (it is a KG-construction
engine); this extends the training-data-pipeline family alongside
operators/dedup.py and operators/curation.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_shingles(
    df: DataFrame, *, doc_col: str = "doc_id", text_col: str = "text", n: int = 5
) -> DataFrame:
    """Explode ``text_col`` into overlapping word ``n``-grams.

    Whitespace tokenization (split on ``\\s+`` after trim) matches the
    engine's token_stats convention.  Documents with fewer than ``n``
    words produce no rows.  Output: (``doc_col``, ``shingle``),
    NON-distinct — callers aggregate with distinct counters so the
    explode stays narrow (no shuffle here).
    """
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    grams = F.expr(
        f"transform(sequence(1, size(_words) - {n - 1}), "
        f"i -> array_join(slice(_words, i, {n}), ' '))"
    )
    return (
        df.withColumn("_words", words)
        .where(F.size("_words") >= n)
        .select(F.col(doc_col), F.explode(grams).alias("shingle"))
    )


def ngram_contamination(
    train: DataFrame,
    evalset: DataFrame,
    *,
    doc_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Per-training-document overlap with the eval set's shingles.

    Returns one row per CONTAMINATED training document:
    (``doc_col``, ``n_shingles`` = distinct shingles in the doc,
    ``n_shared`` = distinct shingles also present anywhere in the eval
    set).  ``n_shared / n_shingles`` is the contamination fraction;
    thresholding/dropping is left to the caller (corpus_curation
    composes admission decisions).

    Plan: eval shingles are distincted (eval-sized shuffle only) and
    broadcast; training shingles left-join the broadcast and roll up
    per document in one partial-aggregated exchange.  No corpus-vs-
    corpus join.
    """
    ev = (
        word_shingles(evalset, doc_col=doc_col, text_col=text_col, n=n)
        .select("shingle")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    tr = word_shingles(train, doc_col=doc_col, text_col=text_col, n=n)
    joined = tr.join(F.broadcast(ev), "shingle", "left")
    return (
        joined.groupBy(doc_col)
        .agg(
            F.countDistinct("shingle").alias("n_shingles"),
            F.countDistinct(
                F.when(F.col("_hit") == 1, F.col("shingle"))
            ).alias("n_shared"),
        )
        .where(F.col("n_shared") > 0)
    )
