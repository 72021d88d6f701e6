"""Sequence packing for training-data pipelines (sample packing).

Pretraining consumers want documents packed into fixed-capacity token
budgets (max_seq) with minimal padding; the ubiquitous streaming form is
GREEDY IN-ORDER packing: walk documents in a stable order, start a new
pack whenever the next document would overflow the capacity.  A document
larger than the capacity occupies its own pack (it will be truncated or
split downstream — packing never drops it silently).

Scale shape: a global greedy walk is inherently sequential, so the
distributed form packs ``n_groups`` independent streams — documents are
hash-assigned to groups and each group packs its members in ascending id
order inside ONE ``applyInPandas`` task with O(1) carry state (running
``(pack_id, used)``).  At 100 TB ``n_groups`` is sized to the cluster
(tens of thousands of groups), each group's walk is a single pass over
its partition, and pack ids are globally unique via ``(group, pack_id)``.
This is the standard approximation: packing quality equals the global
walk's on each stream, and no stage ever materializes more than one
group's metadata in memory.

The decision rule is pure integer arithmetic over whitespace token
counts, so an independent SQL engine replays the walk exactly (DuckDB:
recursive CTE carrying ``(pack_id, used)`` per group — the paired
``sequence_packing`` oracle).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    docs: DataFrame,
    *,
    capacity: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_groups: int = 64,
) -> DataFrame:
    """(doc_id, group, pack_id, n_tokens) greedy in-order pack
    assignments; see module docstring for the exact walk rule.

    ``n_tokens`` is the whitespace token count (identical to
    ``token_stats``/``lang_quality`` semantics, incl. the empty-string ->
    1 artifact both engines share)."""
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    with_counts = docs.select(
        F.col(id_col).alias("doc_id"),
        F.pmod(F.col(id_col), F.lit(n_groups)).cast("int").alias("group"),
        F.size(F.split(F.trim(text_col), r"\s+")).cast("long").alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        pack_ids = []
        pack_id = 0
        used = 0
        for row_idx, n in enumerate(pdf["n_tokens"]):
            n = int(n)
            if row_idx == 0:
                used = n
            elif used + n > capacity:
                pack_id += 1
                used = n
            else:
                used += n
            pack_ids.append(pack_id)
        pdf["pack_id"] = pd.Series(pack_ids, dtype="int64")
        return pdf[["doc_id", "group", "pack_id", "n_tokens"]]

    return with_counts.groupBy("group").applyInPandas(
        pack, schema="doc_id long, group int, pack_id long, n_tokens long"
    )


def chunk_documents(
    docs: DataFrame,
    chunk_words: int = 100,
    overlap: int = 20,
) -> DataFrame:
    """Split every document into fixed-size word windows with overlap —
    the chunking step a RAG index or a long-context training pipeline
    runs before embedding/packing.  Chunks start every
    ``chunk_words - overlap`` words; the final chunk is the remainder
    (>= 1 word, never empty, never duplicated when the document is
    shorter than one chunk).

    Everything is a narrow array-side projection (transform over the
    word array — no explode-then-window, no shuffle at all until a
    downstream consumer aggregates), so chunking is embarrassingly
    parallel at any corpus size; the per-chunk md5 gives downstream
    exact-dedup a ready key.

    Returns (doc_id, chunk_idx, start_word, n_words, chunk_md5), one
    row per chunk, documents with no words dropped.
    """
    if not (0 <= overlap < chunk_words):
        raise ValueError(
            f"need 0 <= overlap < chunk_words, got {overlap}/{chunk_words}"
        )
    step = chunk_words - overlap
    w = "split(trim(text), '\\\\s+')"
    nw = f"size({w})"
    # starts: 1, 1+step, 1+2*step, ... while start <= n_words and the
    # previous chunk did not already reach the end (start == 1 OR the
    # prior window ended before n_words)
    starts = (
        f"filter(transform(sequence(0, greatest(0, ({nw} - 1) div {step})),"
        f" k -> k * {step} + 1),"
        f" s -> s = 1 OR s + {overlap} <= {nw})"
    )
    chunks = (
        f"transform({starts}, s -> struct("
        f"s AS start_word,"
        f"least({chunk_words}, {nw} - s + 1) AS n_words,"
        f"md5(array_join(slice({w}, s, {chunk_words}), ' ')) AS chunk_md5))"
    )
    return (
        docs.where(F.expr(nw) >= 1)
        .where(F.length(F.trim("text")) > 0)
        .select(
            "doc_id",
            F.posexplode(F.expr(chunks)).alias("chunk_idx", "c"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.col("c.start_word").cast("long").alias("start_word"),
            F.col("c.n_words").cast("long").alias("n_words"),
            F.col("c.chunk_md5").alias("chunk_md5"),
        )
    )
