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
