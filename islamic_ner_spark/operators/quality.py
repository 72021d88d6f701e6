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

    # words and bigrams fuse into ONE kind-tagged explode feeding one
    # (doc, kind, unit)-keyed count and one doc-keyed rollup — two
    # exchanges total.  The earlier two-branch formulation (separate
    # word/bigram explodes re-joined per doc) re-ran the scan + split +
    # bigram build per branch and paid 4 exchanges + a join: measured
    # 4.5s vs 0.14s warm at sf0.1 for identical output.
    tagged = with_units.select(
        "doc_id",
        F.explode(
            F.concat(
                F.transform(
                    "words",
                    lambda w: F.struct(F.lit(0).alias("kind"), w.alias("unit")),
                ),
                F.transform(
                    "bigrams",
                    lambda b: F.struct(F.lit(1).alias("kind"), b.alias("unit")),
                ),
            )
        ).alias("u"),
    ).select("doc_id", F.col("u.kind").alias("kind"), F.col("u.unit").alias("unit"))
    counts = tagged.groupBy("doc_id", "kind", "unit").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    is_word = F.col("kind") == 0
    is_bigram = F.col("kind") == 1
    joined = counts.groupBy("doc_id").agg(
        F.sum(F.when(is_word, F.col("cnt"))).alias("n_words"),
        F.count(F.when(is_word, True)).alias("n_distinct_words"),
        F.max(F.when(is_word, F.col("cnt"))).alias("top_words_count"),
        F.coalesce(F.sum(F.when(is_bigram, F.col("cnt"))), F.lit(0)).alias(
            "n_bigrams"
        ),
        F.coalesce(F.max(F.when(is_bigram, F.col("cnt"))), F.lit(0)).alias(
            "top_bigram_count"
        ),
    ).select(
        "doc_id",
        "n_words",
        "n_distinct_words",
        "top_words_count",
        "n_bigrams",
        "top_bigram_count",
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


def bigram_lm_surprise(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus-trained bigram-LM surprise per document — the integer-exact
    stand-in for perplexity-based quality bucketing (CCNet-style: score
    every document under a language model trained on the corpus itself,
    then filter/bucket by mean surprise).

    Each bigram (w1, w2) scores ``(c(w1) + V) div (c(w1 w2) + 1)`` — the
    integer reciprocal of the add-one-smoothed conditional probability
    p(w2 | w1) = (c12 + 1) / (c1 + V) — so a document's mean surprise is
    a monotone proxy for its LM perplexity that both engines reproduce
    bit-for-bit (no float log to drift on).  Gibberish documents (unseen
    continuations after common words) score high; conventional text
    scores low.

    Plan shape at 100 TB: bigrams are built array-side (one explode, no
    self-join).  Training is two keyed aggregations over the exploded
    stream — bigram counts ``cb`` (map-side partial combine, then one
    (w1, w2)-keyed exchange) and first-word counts ``cu`` derived from
    ``cb`` (model-sized, not corpus-sized).  The model is assembled
    model-side: ``cb ⋈ cu`` on w1 plus a 1-row crossJoin for V, so the
    corpus stream pays exactly ONE scoring join, keyed on (w1, w2) —
    finer than w1, so stopword skew is diluted across continuations;
    AQE skew-join covers the residual head.  Nothing collects.
    """
    words_arr = F.split(F.trim(F.col(text_col)), r"\s+")
    base = docs.where(F.length(F.trim(F.col(text_col))) > 0).select(
        F.col(id_col).alias("doc_id"), words_arr.alias("words")
    )
    bg = (
        base.where(F.size("words") >= 2)
        .select(
            "doc_id",
            F.expr(
                "transform(slice(words, 1, size(words) - 1),"
                " (x, i) -> struct(x AS w1, words[i + 1] AS w2))"
            ).alias("pairs"),
        )
        .select("doc_id", F.explode("pairs").alias("p"))
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    cb = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    cu = cb.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = cu.agg(F.count(F.lit(1)).alias("vsz"))
    # model assembly is model-sized (distinct bigrams), never corpus-sized
    model = cb.join(cu, "w1").crossJoin(F.broadcast(vocab))
    scored = bg.join(model, ["w1", "w2"]).select(
        "doc_id", F.expr("(c1 + vsz) div (c12 + 1)").alias("s")
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum("s").cast("long").alias("surprise_sum"),
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("surprise_sum", F.lit(0))
            .cast("long")
            .alias("surprise_sum"),
            F.when(
                F.coalesce("n_bigrams", F.lit(0)) > 0,
                F.expr("(surprise_sum * 100) div n_bigrams"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("avg_surprise_x100"),
        )
    )
