"""POST /ner-equivalent driver surface — mirrors the reference's
tests/test_api.py:34-53 contract over the batch engine."""

from __future__ import annotations

import pytest

from islamic_ner_spark.functions.ner_api import (
    labels_to_entities,
    ner_table,
    ner_text,
    word_offsets,
)
from islamic_ner_spark.plans.pipeline import DEFAULT_GAZETTEER_DIR
from islamic_ner_spark.sources.gazetteer import Gazetteer

SAMPLE = "قال الإمام البخاري في صحيح البخاري إن الربا من الكبائر."


@pytest.fixture(scope="module")
def default_gazetteer() -> Gazetteer:
    return Gazetteer.from_dir(DEFAULT_GAZETTEER_DIR)


def test_ner_text_with_sample_hadith(spark, default_gazetteer) -> None:
    payload = ner_text(spark, SAMPLE, gazetteer=default_gazetteer, return_tokens=True)

    assert payload["text"] == SAMPLE
    assert isinstance(payload["normalized_text"], str)
    assert isinstance(payload["entities"], list)
    assert isinstance(payload["tokens"], list)
    assert payload["tokens"], "Expected token-level output when return_tokens=true."
    # gazetteer fallback must still find known entities
    assert any(
        entity["type"] in {"SCHOLAR", "BOOK", "CONCEPT"}
        for entity in payload["entities"]
    )
    # entity char spans index into the NORMALIZED text and reproduce it
    norm = payload["normalized_text"]
    for entity in payload["entities"]:
        assert norm[entity["start"] : entity["end"]] == entity["text"]
        assert 0.0 <= entity["confidence"] <= 1.0
    # token payload shape (ner.py:368-382)
    tok = payload["tokens"][0]
    assert set(tok) == {"index", "token", "label", "confidence", "start", "end"}


def test_ner_text_without_tokens_and_empty(spark, default_gazetteer) -> None:
    payload = ner_text(spark, SAMPLE, gazetteer=default_gazetteer)
    assert payload["tokens"] is None
    empty = ner_text(spark, "   ", gazetteer=default_gazetteer, return_tokens=True)
    assert empty["entities"] == [] and empty["tokens"] == []


def test_word_offsets_and_span_build() -> None:
    text = "a bb  ccc"
    words = text.split()
    offsets = word_offsets(text, words)
    assert offsets == [(0, 1), (2, 4), (6, 9)]
    entities = labels_to_entities(
        words, ["B-SCHOLAR", "I-SCHOLAR", "O"], offsets, [0.75, 0.7, 0.0]
    )
    assert entities == [
        {"text": "a bb", "type": "SCHOLAR", "start": 0, "end": 4, "confidence": 0.725}
    ]


def test_ner_table_matches_driver_function(spark, default_gazetteer) -> None:
    rows = [(0, SAMPLE), (1, "nothing arabic here"), (2, "")]
    table = spark.createDataFrame(rows, "id long, text string")
    bc = spark.sparkContext.broadcast(default_gazetteer)
    got = {r["id"]: r for r in ner_table(table, bc).collect()}
    assert len(got) == 3
    for rid, text in rows:
        expected = ner_text(spark, text, gazetteer=default_gazetteer)
        assert got[rid]["normalized_text"] == expected["normalized_text"]
        batch_entities = [
            {"text": e["text"], "type": e["type"], "start": e["start"],
             "end": e["end"], "confidence": e["confidence"]}
            for e in (r.asDict() for r in got[rid]["entities"])
        ]
        assert batch_entities == expected["entities"]
    assert got[0]["entities"], "sample hadith must yield entities in batch mode"
