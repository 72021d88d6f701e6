"""Triple-extraction parity — ports /root/reference/tests/test_relations.py."""

from __future__ import annotations

from islamic_ner_spark.functions.relations import extract_relations


def _by_type(relations, relation_type):
    return [r for r in relations if r["type"] == relation_type]


def test_narration_chain_extraction() -> None:
    tokens = ["حدثنا", "عبد", "الله", "عن", "مالك", "عن", "نافع"]
    labels = ["O", "B-SCHOLAR", "I-SCHOLAR", "O", "B-SCHOLAR", "O", "B-SCHOLAR"]
    narration = _by_type(
        extract_relations(tokens, labels, metadata={"hadith_id": "h1"}), "NARRATED_FROM"
    )
    assert len(narration) == 2
    assert narration[0]["source"]["text"] == "عبد الله"
    assert narration[0]["target"]["text"] == "مالك"
    assert narration[1]["source"]["text"] == "مالك"
    assert narration[1]["target"]["text"] == "نافع"
    assert all(r["confidence"] == 0.9 for r in narration)


def test_book_relation_extraction() -> None:
    in_book = _by_type(
        extract_relations(["رواه", "البخاري"], ["O", "B-BOOK"], metadata={"hadith_id": "h2"}),
        "IN_BOOK",
    )
    assert len(in_book) == 1
    assert in_book[0]["target"]["text"] == "البخاري"
    assert in_book[0]["target"]["type"] == "BOOK"


def test_concept_mention_extraction() -> None:
    mentions = _by_type(
        extract_relations(
            ["حديث", "رقم", "123", "الربا"],
            ["B-HADITH_REF", "I-HADITH_REF", "I-HADITH_REF", "B-CONCEPT"],
            metadata={"hadith_id": "h3"},
        ),
        "MENTIONS_CONCEPT",
    )
    assert len(mentions) == 1
    assert mentions[0]["source"]["type"] == "HADITH_REF"
    assert mentions[0]["target"]["type"] == "CONCEPT"
    assert mentions[0]["target"]["text"] == "الربا"


def test_authorship_extraction() -> None:
    authored = _by_type(
        extract_relations(["قال", "البخاري"], ["O", "B-SCHOLAR"], metadata={"hadith_id": "h4"}),
        "AUTHORED",
    )
    assert len(authored) >= 1
    assert authored[0]["source"]["text"] == "البخاري"
    assert authored[0]["target"]["text"] == "صحيح البخاري"
    assert authored[0]["confidence"] == 1.0


def test_full_pipeline_extracts_multiple_relation_types() -> None:
    tokens = [
        "حدثنا", "عبد", "الله", "عن", "مالك", "قال", "البخاري",
        "في", "صحيح", "البخاري", "حديث", "رقم", "1", "الربا",
    ]
    labels = [
        "O", "B-SCHOLAR", "I-SCHOLAR", "O", "B-SCHOLAR", "O", "B-SCHOLAR",
        "O", "B-BOOK", "I-BOOK", "B-HADITH_REF", "I-HADITH_REF", "I-HADITH_REF", "B-CONCEPT",
    ]
    relation_types = {
        r["type"] for r in extract_relations(tokens, labels, metadata={"hadith_id": "h5"})
    }
    assert {"NARRATED_FROM", "IN_BOOK", "MENTIONS_CONCEPT", "AUTHORED"} <= relation_types


def test_dedupe_keeps_max_confidence() -> None:
    """Same entity pair reachable by two rules keeps the higher score."""
    tokens = ["حدثنا", "مالك", "نافع"]  # adjacent (0.7) vs trigger (0.7)
    labels = ["O", "B-SCHOLAR", "B-SCHOLAR"]
    relations = extract_relations(tokens, labels)
    narration = _by_type(relations, "NARRATED_FROM")
    assert len(narration) == 1
