"""Annotate stage: transcripts -> normalized text + tokens + BIO labels.

One narrow ``mapInPandas`` pass (no shuffle): per turn, normalize (P1-P8),
tokenize (P11), run isnad/hadith-ref/gazetteer mention detection with the
broadcast Aho-Corasick automaton (M1-M15), and emit token + label arrays.
The JVM<->Python crossing is Arrow-batched; there is no per-row Python UDF
anywhere (north-rule requirement).

Reference lifecycle being re-expressed: scripts/build_graph.py:363-421
(normalize -> split -> NER labels) using the model-free gazetteer+pattern
path (api/routes/ner.py:145-188, silver_annotator.annotate_from_raw).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.broadcast import Broadcast
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from islamic_ner_spark.functions.annotate import annotate_raw
from islamic_ner_spark.functions.normalize import normalize

ANNOTATED_SCHEMA = (
    "conv_id string, turn_idx int, role string, tool string, ts timestamp, "
    "doc_id string, norm_text string, tokens array<string>, labels array<string>"
)

_PASSTHROUGH = ["conv_id", "turn_idx", "role", "tool", "ts"]


def annotate_transcripts(transcripts: DataFrame, gazetteer_bc: Broadcast) -> DataFrame:
    """transcripts(conv_id, turn_idx, role, text, tool, ts) -> annotated.

    ``doc_id`` = ``conv_id:turn_idx`` is the per-turn document identity
    (the reference's ``hadith_id``) used as edge provenance
    (``source_hadith``) downstream.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        gazetteer = gazetteer_bc.value
        for batch in batches:
            norm_texts = [normalize(t) if t is not None else "" for t in batch["text"]]
            token_rows = []
            label_rows = []
            for ntext in norm_texts:
                tokens, labels = annotate_raw(ntext, gazetteer, is_normalized=True)
                token_rows.append(tokens)
                label_rows.append(labels)
            out = batch[_PASSTHROUGH].copy()
            out["doc_id"] = (
                batch["conv_id"].astype(str) + ":" + batch["turn_idx"].astype(str)
            )
            out["norm_text"] = norm_texts
            out["tokens"] = token_rows
            out["labels"] = label_rows
            yield out

    return transcripts.mapInPandas(run, schema=ANNOTATED_SCHEMA)


def ordered_turns(transcripts: DataFrame) -> DataFrame:
    """Stable per-conversation turn ordering (north-rule invariant):
    ``Window.partitionBy(conv_id).orderBy(turn_idx)`` surfaced as an
    explicit ordering column so every downstream consumer inherits a
    deterministic sequence."""
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return transcripts.withColumn("turn_seq", F.row_number().over(w))
