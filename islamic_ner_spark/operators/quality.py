"""Repetition-based document quality metrics (Gopher-style filters).

Degenerate documents in a web-scale corpus are dominated by a few
repeated words or phrases (boilerplate, keyword stuffing, decoding
loops in synthetic data).  The standard pretraining filters measure the
mass of the most-repeated unit; this module computes them exactly, with
integer outputs so the DuckDB oracle hash cannot drift on float
formatting:

* ``n_words`` / ``n_distinct_words`` / ``dup_word_frac_x1000``
  — fraction of word occurrences that are repeats of an earlier word
* ``top_word_count`` — occurrences of the single most frequent word
* ``top_bigram_count`` — occurrences of the most frequent word bigram
* ``is_repetitive`` — 1 when the top bigram covers >= 20% of bigram
  slots or repeats make up >= 60% of words (the Gopher-style cut)

Plan shape at 100 TB: bigrams are built array-side (``transform`` over
the split array — no self-join, no window), then ONE explode feeds a
two-level aggregation: partial map-side combine on (doc_id, unit)
collapses each task's counts before the only exchange, keyed by
doc_id+unit (so a hot document's units still spread by unit).  The
per-doc rollup then reduces (doc_id, unit, count) — already nearly
unique — to one row per document.  Nothing is corpus-wide except those
keyed aggregations; no Python runs per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOP_BIGRAM_PCT = 20  # top bigram covering >= 20% of slots => repetitive
DUP_WORD_PCT = 60  # >= 60% of word slots are repeats => repetitive


def repetition_stats(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document repetition metrics; one row per non-empty document."""
    words_arr = F.split(F.trim(F.col(text_col)), r"\s+")
    base = docs.where(F.length(F.trim(F.col(text_col))) > 0).select(
        F.col(id_col).alias("doc_id"), words_arr.alias("words")
    )
    # bigrams built array-side: element i of the sliced array pairs with
    # element i+1 of the original (0-based indexing inside transform)
    with_units = base.select(
        "doc_id",
        "words",
        F.expr(
            "transform(slice(words, 1, size(words) - 1),"
            " (x, i) -> concat(x, ' ', words[i + 1]))"
        ).alias("bigrams"),
    )

    def unit_rollup(frame: DataFrame, unit_col: str, prefix: str) -> DataFrame:
        counts = (
            frame.select("doc_id", F.explode(unit_col).alias("unit"))
            .groupBy("doc_id", "unit")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        return counts.groupBy("doc_id").agg(
            F.sum("cnt").alias(f"n_{prefix}"),
            F.count(F.lit(1)).alias(f"n_distinct_{prefix}"),
            F.max("cnt").alias(f"top_{prefix}_count"),
        )

    word_stats = unit_rollup(with_units, "words", "words")
    bigram_stats = unit_rollup(
        with_units.where(F.size("bigrams") > 0), "bigrams", "bigrams"
    ).select("doc_id", "n_bigrams", "top_bigrams_count")

    joined = word_stats.join(bigram_stats, "doc_id", "left").select(
        "doc_id",
        "n_words",
        "n_distinct_words",
        "top_words_count",
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        F.coalesce("top_bigrams_count", F.lit(0)).alias("top_bigram_count"),
    )
    # integer-exact: `div` is integral division (non-negative operands
    # here), so no float rounding can diverge from the oracle's `//`
    dup_frac = F.expr(
        "CAST((n_words - n_distinct_words) * 1000 div n_words AS BIGINT)"
    )
    # a bigram must actually repeat (count >= 2) before its share can
    # flag the doc — otherwise every <=5-bigram document trips the 20%
    repetitive = (
        (F.col("top_bigram_count") * 100 >= F.col("n_bigrams") * TOP_BIGRAM_PCT)
        & (F.col("top_bigram_count") >= 2)
    ) | (
        (F.col("n_words") - F.col("n_distinct_words")) * 100
        >= F.col("n_words") * DUP_WORD_PCT
    )
    return joined.select(
        "doc_id",
        "n_words",
        "n_distinct_words",
        dup_frac.alias("dup_word_frac_x1000"),
        F.col("top_words_count").alias("top_word_count"),
        "n_bigrams",
        "top_bigram_count",
        repetitive.cast("int").alias("is_repetitive"),
    )
