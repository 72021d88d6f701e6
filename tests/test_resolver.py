"""Entity-resolution parity — ports test_graph.py:277-319."""

from __future__ import annotations

from islamic_ner_spark.functions.normalize import normalize
from islamic_ner_spark.functions.resolve import resolve_mention


def test_exact_match(resolver_gazetteer) -> None:
    result = resolve_mention("البخاري", "SCHOLAR", resolver_gazetteer)
    assert result["match_type"] == "exact"
    assert result["confidence"] == 1.0
    assert result["canonical_name"] == normalize("محمد بن إسماعيل البخاري")


def test_variant_match(resolver_gazetteer) -> None:
    result = resolve_mention("الإمام البخاري", "SCHOLAR", resolver_gazetteer)
    assert result["match_type"] == "exact"
    assert result["canonical_name"] == normalize("محمد بن إسماعيل البخاري")


def test_fuzzy_match(resolver_gazetteer) -> None:
    result = resolve_mention("البخاريي", "SCHOLAR", resolver_gazetteer)
    assert result["match_type"] == "fuzzy"
    assert result["confidence"] >= 0.8


def test_new_entity(resolver_gazetteer) -> None:
    result = resolve_mention("شخص غير معروف", "SCHOLAR", resolver_gazetteer)
    assert result["match_type"] == "new"
    assert result["confidence"] == 0.5
    assert result["canonical_name"] == normalize("شخص غير معروف")


def test_type_aware(resolver_gazetteer) -> None:
    scholar = resolve_mention("مسلم", "SCHOLAR", resolver_gazetteer)
    book = resolve_mention("مسلم", "BOOK", resolver_gazetteer)
    assert scholar["canonical_name"] != book["canonical_name"]
