"""Graph materialize: resolved mentions + triples -> nodes & edges tables.

Neo4j MERGE semantics re-expressed as deterministic aggregations
(builder.py:394-443, FakeGraphBackend in tests/test_graph.py:31-84):

* node upsert ``SET n += props``  -> last-writer-wins per property under a
  stable (conv_id, turn_idx, mention order) sequence, except ``variants``
  which accumulates as a sorted set union
* edge MERGE keyed by (pred, src_label, src_key, tgt_label, tgt_key,
  source_hadith) -> first writer fixes evidence/confidence; later writers
  raise confidence to the max and fill evidence only if empty.  Within one
  document the reference's in-batch dedupe keeps the *first* relation
  per key (builder.py:99-123), which ``min_by`` over the emit order
  reproduces exactly.

Node schema per entity type (builder.py:19-26, 325-392):
SCHOLAR->(Scholar, canonical_name), BOOK->(Book, canonical_name),
CONCEPT->(Concept, term), PLACE->(Place, canonical_name),
HADITH_REF->(Hadith, hadith_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NODE_LABELS = {
    "SCHOLAR": "Scholar",
    "BOOK": "Book",
    "CONCEPT": "Concept",
    "PLACE": "Place",
    "HADITH_REF": "Hadith",
    "HADITH": "Hadith",
}

def _label_expr(type_col: str) -> F.Column:
    """entity_type -> node label as a when-chain (codegen-friendly)."""
    expr = F.lit(None).cast("string")
    for entity_type, label in reversed(list(NODE_LABELS.items())):
        expr = F.when(F.col(type_col) == entity_type, F.lit(label)).otherwise(expr)
    return expr


def _order_col() -> F.Column:
    """Stable write-order surrogate: (conv_id, turn_idx, within-doc idx)."""
    return F.struct(
        F.col("conv_id"), F.col("turn_idx").cast("int"), F.col("emit_idx").cast("long")
    )


def build_nodes(
    resolved_mentions: DataFrame,
    doc_index: DataFrame,
    resolved_triples: DataFrame | None = None,
) -> DataFrame:
    """Node table from resolved mention spans + one Hadith node per doc +
    triple endpoints (inferred entities, e.g. author-map books, exist only
    as endpoints — the reference merges endpoint nodes during relation
    insert, builder.py:125-126).

    ``resolved_mentions`` columns: conv_id, turn_idx, doc_id, mention_idx,
    text, entity_type, canonical_name, confidence, match_type.
    ``doc_index`` columns: conv_id, turn_idx, doc_id (distinct docs).
    """
    linkable = resolved_mentions.where(
        F.col("entity_type").isin(list(NODE_LABELS))
    ).select(
        "conv_id",
        "turn_idx",
        F.col("mention_idx").alias("emit_idx"),
        F.col("entity_type"),
        # HADITH_REF mentions key to the doc id (builder.py:149-167)
        F.when(F.col("entity_type") == "HADITH_REF", F.col("doc_id"))
        .otherwise(F.col("canonical_name"))
        .alias("key"),
        F.col("text").alias("original_text"),
        F.col("confidence"),
    )

    hadith_meta = doc_index.select(
        "conv_id",
        "turn_idx",
        F.lit(2_000_000_000).alias("emit_idx"),  # appended after mentions
        F.lit("HADITH_REF").alias("entity_type"),
        F.col("doc_id").alias("key"),
        F.col("doc_id").alias("original_text"),
        F.lit(1.0).alias("confidence"),
    )

    rows = linkable.unionByName(hadith_meta)

    if resolved_triples is not None:
        def endpoint(side: str, offset: int) -> DataFrame:
            return resolved_triples.select(
                "conv_id",
                "turn_idx",
                # endpoints are merged after the doc's mention nodes, src
                # before tgt, in relation emit order (builder.py:125-126)
                (F.lit(3_000_000_000) + F.col("rel_idx") * 2 + F.lit(offset))
                .alias("emit_idx"),
                F.col(f"{side}_type").alias("entity_type"),
                F.col(f"{side}_canonical").alias("key"),
                F.when(
                    F.col(f"{side}_type") == "HADITH_REF", F.col("doc_id")
                ).otherwise(F.col(f"{side}_text")).alias("original_text"),
                F.coalesce(F.col(f"{side}_confidence_r"), F.lit(1.0)).alias(
                    "confidence"
                ),
            ).where(F.col("entity_type").isin(list(NODE_LABELS)))

        rows = rows.unionByName(endpoint("subj", 0)).unionByName(endpoint("obj", 1))

    rows = rows.withColumn("label", _label_expr("entity_type"))

    order = _order_col()
    return (
        rows.groupBy("label", "key")
        .agg(
            F.max_by("original_text", order).alias("name_ar"),
            F.max_by("confidence", order).alias("confidence"),
            F.array_sort(F.collect_set("original_text")).alias("variants"),
            F.count(F.lit(1)).alias("mention_count"),
        )
        # Hadith nodes carry provenance fields, empty for transcript input
        # (builder.py:339-343); Book author / Concept category default ""
        .withColumn("book_ref", F.when(F.col("label") == "Hadith", F.lit("")))
        .withColumn("chapter", F.when(F.col("label") == "Hadith", F.lit("")))
    )


def build_edges(resolved_triples: DataFrame) -> DataFrame:
    """Edge table from resolved triples with MERGE-upsert aggregation.

    ``resolved_triples``: output of linking.resolve_triples — must carry
    subj_canonical/obj_canonical, source_hadith, rel_idx.
    """
    rows = resolved_triples.select(
        "conv_id",
        "turn_idx",
        F.col("rel_idx").alias("emit_idx"),
        F.col("pred"),
        _label_expr("subj_type").alias("src_label"),
        F.col("subj_canonical").alias("src_key"),
        _label_expr("obj_type").alias("tgt_label"),
        F.col("obj_canonical").alias("tgt_key"),
        F.col("source_hadith"),
        F.col("confidence"),
        F.col("evidence"),
    ).where(
        F.col("src_key").isNotNull()
        & (F.col("src_key") != "")
        & F.col("tgt_key").isNotNull()
        & (F.col("tgt_key") != "")
        & F.col("src_label").isNotNull()
        & F.col("tgt_label").isNotNull()
    )

    order = _order_col()
    first = lambda col: F.min_by(col, order)  # noqa: E731
    return rows.groupBy(
        "pred", "src_label", "src_key", "tgt_label", "tgt_key", "source_hadith"
    ).agg(
        first("confidence").alias("confidence"),
        first("evidence").alias("evidence"),
        F.count(F.lit(1)).alias("merge_count"),
    )


def merge_edges_incremental(existing: DataFrame, incoming: DataFrame) -> DataFrame:
    """Cross-batch MERGE (A4): confidence = max, evidence = first
    non-empty, existing row wins ties (builder.py:427-435)."""
    e = existing.select(
        "pred", "src_label", "src_key", "tgt_label", "tgt_key", "source_hadith",
        F.col("confidence").alias("old_conf"), F.col("evidence").alias("old_ev"),
    )
    i = incoming.select(
        "pred", "src_label", "src_key", "tgt_label", "tgt_key", "source_hadith",
        F.col("confidence").alias("new_conf"), F.col("evidence").alias("new_ev"),
        "merge_count",
    )
    key = ["pred", "src_label", "src_key", "tgt_label", "tgt_key", "source_hadith"]
    return (
        e.join(i, key, "full_outer")
        .select(
            *key,
            F.greatest(
                F.coalesce("old_conf", F.lit(0.0)), F.coalesce("new_conf", F.lit(0.0))
            ).alias("confidence"),
            F.when(
                F.coalesce(F.col("old_ev"), F.lit("")) != "", F.col("old_ev")
            ).otherwise(F.coalesce("new_ev", F.lit(""))).alias("evidence"),
            F.coalesce("merge_count", F.lit(0)).alias("merge_count"),
        )
    )


def graph_stats(nodes: DataFrame, edges: DataFrame) -> dict:
    """Counts by node label and edge type + totals (A6, builder.py:244-283)."""
    nodes_by_label = {
        r["label"]: r["count"] for r in nodes.groupBy("label").count().collect()
    }
    rels_by_type = {
        r["pred"]: r["count"] for r in edges.groupBy("pred").count().collect()
    }
    return {
        "nodes_by_label": nodes_by_label,
        "relationships_by_type": rels_by_type,
        "total_nodes": int(sum(nodes_by_label.values())),
        "total_relationships": int(sum(rels_by_type.values())),
    }
