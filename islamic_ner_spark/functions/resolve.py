"""Entity resolution scoring — stateless core of the linking stage.

Parity target: ``EntityResolver`` (/root/reference/src/graph/entity_resolver.py).
Match ladder per mention (text, type):

1. exact   — normalized text found in the gazetteer's (variant, type) map;
             confidence 1.0 (entity_resolver.py:34-42)
2. fuzzy   — best difflib.SequenceMatcher ratio against every same-type
             canonical and its variants; accept >= 0.8; confidence is the
             ratio rounded to 4dp (entity_resolver.py:70-100)
3. new     — canonical = own normalized text, confidence 0.5
             (entity_resolver.py:55-68)

The reference's resolver is stateful: a "new" entity is added to the
candidate pool so *later* mentions can fuzzy-match it — a sequential,
order-dependent behavior that cannot (and should not) be reproduced in a
parallel engine.  The distributed replacement is joint canonicalization of
all unmatched mentions via blocking + pairwise similarity + connected
components (see operators/linking.py + operators/components.py); the
reference's own tests never exercise the stateful path
(tests/test_graph.py:277-319 uses gazetteer-known or singleton-new
mentions only), so fixture parity is preserved.
"""

from __future__ import annotations

from difflib import SequenceMatcher
from typing import Dict, Optional, Tuple

from islamic_ner_spark.functions.normalize import normalize
from islamic_ner_spark.sources.gazetteer import Gazetteer

FUZZY_THRESHOLD = 0.8


def similarity_ratio(a: str, b: str) -> float:
    """difflib SequenceMatcher ratio — the reference's fuzzy metric."""
    return SequenceMatcher(None, a, b).ratio()


def best_fuzzy_candidate(
    norm_text: str, entity_type: str, gazetteer: Gazetteer
) -> Optional[Tuple[str, float]]:
    """Best same-type canonical by max ratio over canonical + variants.

    Ties keep the earliest canonical in gazetteer insertion order, matching
    the reference's ``max()`` over an insertion-ordered candidate list."""
    if not norm_text:
        return None
    best: Optional[Tuple[str, float]] = None
    for canonical, meta in gazetteer.entity_metadata.items():
        if str(meta.get("type")) != entity_type:
            continue
        score = similarity_ratio(norm_text, canonical)
        for variant in meta.get("variants", ()):  # type: ignore[union-attr]
            ratio = similarity_ratio(norm_text, str(variant))
            if ratio > score:
                score = ratio
        if best is None or score > best[1]:
            best = (canonical, score)
    if best is None or best[1] < FUZZY_THRESHOLD:
        return None
    return best


def resolve_mention(text: str, entity_type: str, gazetteer: Gazetteer) -> Dict[str, object]:
    """Stateless exact/fuzzy/new resolution of one mention."""
    norm_text = normalize(text or "")
    norm_type = str(entity_type or "").upper()

    canonical = gazetteer.canonical_map.get((norm_text, norm_type))
    if canonical is not None:
        return {
            "canonical_name": canonical,
            "original_text": text,
            "entity_type": norm_type,
            "confidence": 1.0,
            "match_type": "exact",
        }

    fuzzy = best_fuzzy_candidate(norm_text, norm_type, gazetteer)
    if fuzzy is not None:
        return {
            "canonical_name": fuzzy[0],
            "original_text": text,
            "entity_type": norm_type,
            "confidence": round(fuzzy[1], 4),
            "match_type": "fuzzy",
        }

    return {
        "canonical_name": norm_text,
        "original_text": text,
        "entity_type": norm_type,
        "confidence": 0.5,
        "match_type": "new",
    }
