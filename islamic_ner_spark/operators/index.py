"""Inverted-index construction over the document corpus.

The reference serves entity lookups out of its graph store; a corpus
consumer's next ask is term-level retrieval — "which documents contain
this term, ranked" — i.e. a posting list per term with document
frequency and corpus term frequency.  This operator builds that index
relationally so it stays engine-exact (the DuckDB oracle replays it
bit-for-bit) and survives the one place a naive plan dies at 100 TB:
**stopword skew**.

Scale shape:

- The (term, doc_id) term-frequency aggregation keys on BOTH columns,
  so a stopword occurring in every document still spreads across the
  cluster (same argument as top_terms_per_source).
- Document frequency / total term frequency are plain partial-agg
  ``groupBy(term)`` sums — map-side combine collapses them before the
  vocabulary-keyed exchange, skew-safe by construction.
- The top-k posting pick is the skewed step: a single
  ``Window.partitionBy(term)`` row_number would pull a stopword's
  entire df-sized posting set (up to corpus size) into ONE task.  We
  therefore rank in two phases: top-k per (term, salt-of-doc_id) over
  ``SALT_BUCKETS`` buckets — bounding every window partition by
  df/buckets — then top-k of the <= buckets*k survivors per term.
  Phase 2's partitions are <= buckets*k rows regardless of skew.  The
  two-phase pick is exactly equivalent to the global one because every
  global top-k row is necessarily top-k within its own bucket, and the
  (tf DESC, doc_id ASC) order is total, so ties are deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

SALT_BUCKETS = 32
TOP_K = 5


def term_frequencies(docs: DataFrame) -> DataFrame:
    """Whitespace-token (term, doc_id, tf) triples — the index's base
    relation, identical tokenization to top_terms_per_source /
    vocab_coverage so the corpus queries agree on what a term is."""
    words = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("term")
    ).where(F.length("term") > 0)
    return words.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))


def inverted_index(
    docs: DataFrame, top_k: int = TOP_K, salt_buckets: int = SALT_BUCKETS
) -> DataFrame:
    """Posting list per term: document frequency, corpus term
    frequency, and the top_k documents by (tf DESC, doc_id ASC) as a
    ``doc_id:tf`` comma string (string-exact for the oracle).

    Returns (term, n_docs, total_tf, top_docs).
    """
    tf = term_frequencies(docs)
    tot = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("tf").cast("long").alias("total_tf"),
    )
    order = [F.desc("tf"), F.asc("doc_id")]
    pre_w = Window.partitionBy(
        "term", F.pmod(F.hash("doc_id"), F.lit(salt_buckets))
    ).orderBy(*order)
    survivors = (
        tf.withColumn("pre_rank", F.row_number().over(pre_w))
        .where(F.col("pre_rank") <= top_k)
        .drop("pre_rank")
    )
    final_w = Window.partitionBy("term").orderBy(*order)
    ranked = survivors.withColumn("r", F.row_number().over(final_w)).where(
        F.col("r") <= top_k
    )
    postings = ranked.groupBy("term").agg(
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(F.collect_list(F.struct("r", "doc_id", "tf"))),
                lambda s: F.concat_ws(
                    ":", s.doc_id.cast("string"), s.tf.cast("string")
                ),
            ),
        ).alias("top_docs")
    )
    return tot.join(postings, "term").select(
        "term", "n_docs", "total_tf", "top_docs"
    )
