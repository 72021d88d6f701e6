"""Hypothesis property tests for the pure label/normalize kernels.

The randomized differential suite (test_parity_reference.py) pins these
functions to the reference's behavior on realistic inputs; these
properties pin the INVARIANTS the pipeline relies on for arbitrary
inputs — BIO validity after repair, idempotence, length preservation —
so a future edit cannot trade one for the other unnoticed.  Pure
Python: no Spark session needed.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from islamic_ner_spark.functions.annotate import (
    ENTITY_TYPES,
    merge_allowed_labels,
    normalize_label,
    repair_bio,
)
from islamic_ner_spark.functions.normalize import normalize

_TYPES = sorted(ENTITY_TYPES)
_label = st.one_of(
    st.just("O"),
    st.sampled_from([f"{p}-{t}" for p in ("B", "I") for t in _TYPES]),
    # junk the model could emit: casing, unknown types, stray dashes
    st.sampled_from(["b-scholar", "I-HADITH", "X-BOOK", "B-", "-", "", "I-book"]),
    st.text(max_size=8),
)
_labels = st.lists(_label, max_size=40)

_arabic_text = st.text(
    alphabet=st.characters(
        codec="utf-8",
        categories=("L", "N", "P", "Zs", "Mn"),
    ),
    max_size=200,
)


def _is_bio_valid(labels: list[str]) -> bool:
    prev = "O"
    for label in labels:
        if label != "O" and (label[:2] not in ("B-", "I-") or label[2:] not in ENTITY_TYPES):
            return False
        if label.startswith("I-") and prev not in (f"B-{label[2:]}", f"I-{label[2:]}"):
            return False
        prev = label
    return True


@given(_labels)
def test_repair_bio_always_valid_and_length_preserving(labels) -> None:
    repaired = repair_bio(labels)
    assert len(repaired) == len(labels)
    assert _is_bio_valid(repaired), repaired


@given(_labels)
def test_repair_bio_idempotent(labels) -> None:
    once = repair_bio(labels)
    assert repair_bio(once) == once


@given(_label)
def test_normalize_label_total_and_canonical(label) -> None:
    out = normalize_label(label)
    assert out == "O" or (
        out[:2] in ("B-", "I-") and out[2:] in ENTITY_TYPES
    )
    assert normalize_label(out) == out  # idempotent


@settings(max_examples=200)
@given(_arabic_text)
def test_normalize_idempotent_and_whitespace_canonical(text) -> None:
    once = normalize(text)
    assert normalize(once) == once
    assert "  " not in once and once == once.strip()


@given(_labels)
def test_merge_allowed_labels_preserves_base_entities(candidate) -> None:
    """The protected overlay never overwrites occupied slots and never
    changes sequence length."""
    base = ["O"] * len(candidate)
    base_occupied = list(base)
    if candidate:
        base_occupied[0] = "B-SCHOLAR"
    merged = merge_allowed_labels(
        base_occupied, repair_bio(candidate), frozenset(ENTITY_TYPES)
    )
    assert len(merged) == len(candidate)
    if candidate:
        assert merged[0] == "B-SCHOLAR"  # occupied slot untouched
