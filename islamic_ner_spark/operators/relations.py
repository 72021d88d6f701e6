"""Mentions + triples fact tables: JVM-side explodes of the annotate
stage's array columns.

The Python work already happened inside the fused annotate pass
(operators/ner.py); these operators are pure Catalyst plans (explode +
project), so they cost no JVM<->Python crossing and stay inside
whole-stage codegen.

Reference semantics carried by the arrays: RelationExtractor.extract
(extract.py:49-65) per turn with the turn's ``doc_id`` as hadith_id;
entity spans via the BIO state machine (extract.py:67-156).  ``rel_idx``
preserves the within-document emit order that Neo4j MERGE's first-writer
semantics depend on (builder.py:99-123).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TRIPLES_SCHEMA = (
    "doc_id string, conv_id string, turn_idx int, rel_idx int, pred string, "
    "subj_text string, subj_type string, subj_start int, subj_end int, "
    "obj_text string, obj_type string, obj_start int, obj_end int, "
    "confidence double, evidence string"
)

MENTIONS_SCHEMA = (
    "doc_id string, conv_id string, turn_idx int, mention_idx int, "
    "text string, entity_type string, start_token int, end_token int"
)


def extract_triples(annotated: DataFrame) -> DataFrame:
    """annotated -> one row per (subj, pred, obj) triple."""
    return annotated.select(
        "doc_id", "conv_id", "turn_idx", F.explode("triples").alias("t")
    ).select("doc_id", "conv_id", "turn_idx", "t.*")


def extract_mentions(annotated: DataFrame) -> DataFrame:
    """annotated -> one row per entity span (mention provenance table)."""
    return annotated.select(
        "doc_id", "conv_id", "turn_idx", F.explode("mentions").alias("m")
    ).select("doc_id", "conv_id", "turn_idx", "m.*")
