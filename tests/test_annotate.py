"""Mention-detection parity — ports test_silver_annotator.py:38-129."""

from __future__ import annotations

from typing import List

from islamic_ner_spark.functions.annotate import (
    annotate_raw,
    annotate_sanadset,
    repair_bio,
)


def _find_subsequence(tokens: List[str], sequence: List[str]) -> int:
    for idx in range(len(tokens) - len(sequence) + 1):
        if tokens[idx : idx + len(sequence)] == sequence:
            return idx
    return -1


def _label_of(tokens: List[str], labels: List[str], token: str) -> str:
    for tok, label in zip(tokens, labels):
        if tok == token:
            return label
    raise AssertionError(f"token not found: {token}")


def test_sanadset_marks_nar_span(matcher_gazetteer) -> None:
    text = (
        "<SANAD>حدثنا <NAR>عبد الله بن يوسف</NAR> عن <NAR>مالك</NAR></SANAD>"
        "<MATN>...</MATN>"
    )
    tokens, labels = annotate_sanadset(text, matcher_gazetteer)
    start = _find_subsequence(tokens, ["عبد", "الله", "بن", "يوسف"])
    assert start >= 0
    assert labels[start : start + 4] == ["B-SCHOLAR", "I-SCHOLAR", "I-SCHOLAR", "I-SCHOLAR"]
    assert _label_of(tokens, labels, "مالك") == "B-SCHOLAR"


def test_raw_isnad_patterns(matcher_gazetteer) -> None:
    tokens, labels = annotate_raw("حدثنا محمد بن إسماعيل عن مالك", matcher_gazetteer)
    start = _find_subsequence(tokens, ["محمد", "بن", "اسماعيل"])
    assert start >= 0
    assert labels[start : start + 3] == ["B-SCHOLAR", "I-SCHOLAR", "I-SCHOLAR"]
    assert _label_of(tokens, labels, "مالك") == "B-SCHOLAR"


def test_book_disambiguation(matcher_gazetteer) -> None:
    tokens, labels = annotate_raw("في صحيح البخاري", matcher_gazetteer)
    label = _label_of(tokens, labels, "البخاري")
    assert label.endswith("BOOK")
    assert not label.endswith("SCHOLAR")


def test_concept_gazetteer_on_matn(matcher_gazetteer) -> None:
    tokens, labels = annotate_raw("نهى عن الربا", matcher_gazetteer)
    assert _label_of(tokens, labels, "الربا") == "B-CONCEPT"


def test_full_merge_scholar_and_concept(matcher_gazetteer) -> None:
    text = (
        "<SANAD>حدثنا <NAR>عبد الله بن يوسف</NAR> عن <NAR>مالك</NAR></SANAD>"
        "<MATN>نهى عن الربا</MATN>"
    )
    tokens, labels = annotate_sanadset(text, matcher_gazetteer)
    start = _find_subsequence(tokens, ["عبد", "الله", "بن", "يوسف"])
    assert start >= 0
    assert labels[start : start + 4] == ["B-SCHOLAR", "I-SCHOLAR", "I-SCHOLAR", "I-SCHOLAR"]
    assert _label_of(tokens, labels, "الربا") == "B-CONCEPT"


def test_bio_prefix_validity(matcher_gazetteer) -> None:
    tokens, labels = annotate_raw("حدثنا محمد بن إسماعيل عن مالك", matcher_gazetteer)
    mapping = dict(zip(tokens, labels))
    assert mapping["حدثنا"] == "O"
    assert mapping["محمد"] == "B-SCHOLAR"
    assert mapping["بن"] == "I-SCHOLAR"


def test_repair_bio_orphan_and_malformed() -> None:
    # orphan I-, type switch, unknown type, bad prefix (ner.py:29-70)
    assert repair_bio(["I-SCHOLAR", "I-BOOK", "X-SCHOLAR", "B-WEIRD", "I-HADITH"]) == [
        "B-SCHOLAR",
        "B-BOOK",
        "O",
        "O",
        "B-HADITH_REF",
    ]
