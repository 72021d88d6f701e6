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


def test_new_entity_blocking_caps_hot_tokens(spark) -> None:
    """10k unresolved strings all sharing one particle (بن) must NOT
    produce a quadratic candidate join: the hot block is dropped (it
    cannot discriminate), and only discriminative-token pairs survive."""
    from pyspark.sql import functions as F

    from islamic_ner_spark.operators.linking import new_entity_nodes, new_pair_edges

    n = 10_000
    rows = [(f"بن راوي{i:05d}", "SCHOLAR", f"بن راوي{i:05d}") for i in range(n)]
    # two strings sharing a RARE token — their pair must survive the cap
    rows += [("بن شريك المجرب", "SCHOLAR", "بن شريك المجرب"),
             ("بن شريك المجربب", "SCHOLAR", "بن شريك المجربب")]
    new_strings = spark.createDataFrame(
        rows, "text string, entity_type string, norm_text string"
    )
    nodes = new_entity_nodes(new_strings)
    pairs = new_pair_edges(nodes, max_block_size=100, log_dropped=False)
    got = pairs.collect()
    # without the cap the بن block alone yields ~50M candidate pairs; with
    # it, only rare-token pairs remain
    assert len(got) == 1
    assert "شريك" in got[0]["src"] and "شريك" in got[0]["dst"]


def test_new_entity_blocking_cap_preserves_small_block_semantics(spark) -> None:
    """Below the cap the capped path is byte-identical to uncapped."""
    from islamic_ner_spark.operators.linking import new_entity_nodes, new_pair_edges

    rows = [
        ("محمد بن سيرين", "SCHOLAR", "محمد بن سيرين"),
        ("محمد بن سرين", "SCHOLAR", "محمد بن سرين"),
        ("كتاب الزهد", "BOOK", "كتاب الزهد"),
        ("كتاب الزهدد", "BOOK", "كتاب الزهدد"),
    ]
    new_strings = spark.createDataFrame(
        rows, "text string, entity_type string, norm_text string"
    )
    nodes = new_entity_nodes(new_strings)
    capped = sorted(map(tuple, new_pair_edges(nodes, max_block_size=1000,
                                              log_dropped=False).collect()))
    uncapped = sorted(map(tuple, new_pair_edges(nodes, max_block_size=10**9,
                                                log_dropped=False).collect()))
    assert capped == uncapped and len(capped) >= 2
