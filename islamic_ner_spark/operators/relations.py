"""Triples + mentions stages: annotated turns -> exploded fact tables.

Both stages are narrow ``mapInPandas`` passes over the annotated table —
no shuffle is introduced until linking/materialize, so the extraction
phase scales linearly with input partitions.

Reference semantics: RelationExtractor.extract (extract.py:49-65) per
turn, with the turn's ``doc_id`` as ``hadith_id`` metadata; entity spans
via the BIO state machine (extract.py:67-156).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from islamic_ner_spark.functions.relations import bio_to_entity_spans, extract_relations

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
    """annotated -> one row per (subj, pred, obj) triple.

    ``rel_idx`` preserves the reference's within-document emit order; the
    graph-materialize stage uses it to reproduce Neo4j MERGE's
    "first non-empty evidence wins" semantics deterministically.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for doc_id, conv_id, turn_idx, tokens, labels in zip(
                batch["doc_id"], batch["conv_id"], batch["turn_idx"],
                batch["tokens"], batch["labels"],
            ):
                tokens = list(tokens)
                labels = list(labels)
                relations = extract_relations(
                    tokens, labels, metadata={"hadith_id": doc_id}
                )
                for rel_idx, rel in enumerate(relations):
                    src = rel["source"]
                    tgt = rel["target"]
                    rows.append(
                        (
                            doc_id, conv_id, int(turn_idx), rel_idx, rel["type"],
                            src["text"], src["type"], src["start"], src["end"],
                            tgt["text"], tgt["type"], tgt["start"], tgt["end"],
                            float(rel["confidence"]), rel["evidence"],
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "conv_id", "turn_idx", "rel_idx", "pred",
                    "subj_text", "subj_type", "subj_start", "subj_end",
                    "obj_text", "obj_type", "obj_start", "obj_end",
                    "confidence", "evidence",
                ],
            )

    return annotated.mapInPandas(run, schema=TRIPLES_SCHEMA)


def extract_mentions(annotated: DataFrame) -> DataFrame:
    """annotated -> one row per entity span (the mention-provenance table)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for doc_id, conv_id, turn_idx, tokens, labels in zip(
                batch["doc_id"], batch["conv_id"], batch["turn_idx"],
                batch["tokens"], batch["labels"],
            ):
                spans = bio_to_entity_spans(list(tokens), list(labels))
                for idx, span in enumerate(spans):
                    rows.append(
                        (
                            doc_id, conv_id, int(turn_idx), idx,
                            span["text"], span["type"], span["start"], span["end"],
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "conv_id", "turn_idx", "mention_idx",
                    "text", "entity_type", "start_token", "end_token",
                ],
            )

    return annotated.mapInPandas(run, schema=MENTIONS_SCHEMA)
