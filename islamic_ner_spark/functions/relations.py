"""Rule-based triple extraction from BIO-labelled token sequences.

Pure-Python core executed inside Arrow UDF batches.  Parity target:
``RelationExtractor`` (/root/reference/src/relations/extract.py) — emitted
(subj, pred, obj) triples are the P/R >= 0.95 correctness gate of
BASELINE.json.  Predicates: NARRATED_FROM, IN_BOOK, MENTIONS_CONCEPT,
AUTHORED.

Confidence constants per rule (extract.py:192-207, 251, 273, 304, 360):
connector chain 0.9; adjacency / trigger chain 0.7; explicit BOOK cue 0.9;
author-inferred book 0.7; concept co-occurrence 0.6; authorship 1.0.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

from functools import lru_cache

from islamic_ner_spark.functions.normalize import normalize

# bounded memo for the per-token re-normalization the reference does in
# every extractor call (extract.py:171,232) — pure function, repetitive keys
_norm_cached = lru_cache(maxsize=1 << 16)(normalize)

# Known author -> book-title ground truth (extract.py:22-37).  Keys are
# normalized at module load; values stay in raw orthography because the
# reference emits them verbatim as inferred-entity text.
AUTHOR_BOOK_RAW: Tuple[Tuple[str, str], ...] = (
    ("البخاري", "صحيح البخاري"),
    ("مسلم", "صحيح مسلم"),
    ("أبو داود", "سنن أبي داود"),
    ("الترمذي", "سنن الترمذي"),
    ("النسائي", "سنن النسائي"),
    ("ابن ماجه", "سنن ابن ماجه"),
    ("مالك", "الموطأ"),
    ("أحمد", "المسند"),
    ("النووي", "رياض الصالحين"),
)
AUTHOR_BOOK_MAP: Dict[str, str] = {normalize(a): b for a, b in AUTHOR_BOOK_RAW}

NARRATION_TRIGGERS = frozenset(normalize(t) for t in ("حدثنا", "أخبرنا", "سمعت"))
CHAIN_CONNECTORS = frozenset(normalize(t) for t in ("عن", "أن"))
BOOK_CUES = frozenset(normalize(t) for t in ("رواه", "أخرجه", "في"))

Entity = Dict[str, object]  # {"text", "type", "start", "end"} token offsets
Relation = Dict[str, object]


def bio_to_entity_spans(tokens: Sequence[str], labels: Sequence[str]) -> List[Entity]:
    """BIO state machine -> token-span entities (M15, extract.py:67-156).

    Closes the open span on O / B- / type-change / malformed label; text is
    the space-join of covered tokens."""
    if len(tokens) != len(labels):
        raise ValueError("tokens and labels must have same length")

    spans: List[Entity] = []
    open_start: Optional[int] = None
    open_type: Optional[str] = None

    def close(idx: int) -> None:
        nonlocal open_start, open_type
        if open_type is not None and open_start is not None:
            spans.append(
                {
                    "text": " ".join(tokens[open_start:idx]),
                    "type": open_type,
                    "start": open_start,
                    "end": idx,
                }
            )
        open_start = None
        open_type = None

    for idx, label in enumerate(labels):
        if label == "O" or "-" not in label:
            close(idx)
            continue
        prefix, entity_type = label.split("-", 1)
        if prefix == "B":
            close(idx)
            open_start = idx
            open_type = entity_type
        elif prefix == "I":
            if open_type != entity_type or open_start is None:
                close(idx)
                open_start = idx
                open_type = entity_type
        else:
            close(idx)
    close(len(tokens))
    return spans


def _entity_copy(entity: Entity) -> Entity:
    return {
        "text": str(entity.get("text", "")),
        "type": str(entity.get("type", "")),
        "start": int(entity.get("start", -1)),
        "end": int(entity.get("end", -1)),
    }


def _hadith_source(metadata: Optional[Dict]) -> Entity:
    """Sentence-level HADITH_REF stand-in entity (extract.py:367-377)."""
    hadith_id = None
    if metadata:
        hadith_id = metadata.get("hadith_id") or metadata.get("id")
    return {
        "text": str(hadith_id) if hadith_id is not None else "CURRENT_HADITH",
        "type": "HADITH_REF",
        "start": -1,
        "end": -1,
    }


def narration_chain_relations(
    norm_tokens: Sequence[str], entities: Sequence[Entity]
) -> List[Relation]:
    """NARRATED_FROM over consecutive scholar pairs (R1, extract.py:158-221)."""
    scholars = sorted(
        (e for e in entities if e.get("type") == "SCHOLAR"),
        key=lambda e: (int(e["start"]), int(e["end"])),
    )
    if len(scholars) < 2:
        return []

    relations: List[Relation] = []
    for src, tgt in zip(scholars, scholars[1:]):
        between = norm_tokens[int(src["end"]) : int(tgt["start"])]
        connector = next((t for t in between if t in CHAIN_CONNECTORS), None)
        if connector is not None:
            confidence = 0.9
            evidence = f"isnad connector ({connector}) between scholars"
        elif int(src["end"]) == int(tgt["start"]):
            confidence = 0.7
            evidence = "adjacent scholar entities in narration chain"
        elif any(
            t in NARRATION_TRIGGERS
            for t in norm_tokens[max(0, int(src["start"]) - 3) : int(src["start"])]
        ):
            confidence = 0.7
            evidence = "narration trigger before scholar pair"
        else:
            continue
        relations.append(
            {
                "type": "NARRATED_FROM",
                "source": _entity_copy(src),
                "target": _entity_copy(tgt),
                "confidence": confidence,
                "evidence": evidence,
            }
        )
    return relations


def in_book_relations(
    tokens: Sequence[str],
    norm_tokens: Sequence[str],
    entities: Sequence[Entity],
    metadata: Optional[Dict],
    author_book_map: Dict[str, str],
) -> List[Relation]:
    """IN_BOOK via cue-word + BOOK / known-author (R2, extract.py:223-278)."""
    hadith = _hadith_source(metadata)
    relations: List[Relation] = []
    for entity in entities:
        start = int(entity["start"])
        if start <= 0:
            continue
        if norm_tokens[start - 1] not in BOOK_CUES:
            continue
        entity_type = entity.get("type")
        if entity_type == "BOOK":
            relations.append(
                {
                    "type": "IN_BOOK",
                    "source": hadith,
                    "target": _entity_copy(entity),
                    "confidence": 0.9,
                    "evidence": f"explicit cue ({tokens[start - 1]}) + BOOK",
                }
            )
        elif entity_type == "SCHOLAR":
            mapped = author_book_map.get(_norm_cached(str(entity["text"])))
            if mapped:
                relations.append(
                    {
                        "type": "IN_BOOK",
                        "source": hadith,
                        "target": {"text": mapped, "type": "BOOK", "start": -1, "end": -1},
                        "confidence": 0.7,
                        "evidence": f"cue ({tokens[start - 1]}) + known author inference",
                    }
                )
    return relations


def concept_relations(
    entities: Sequence[Entity], metadata: Optional[Dict]
) -> List[Relation]:
    """MENTIONS_CONCEPT co-occurrence (R3, extract.py:280-321): cross
    product HADITH_REF x CONCEPT when refs exist, else metadata-hadith x
    CONCEPT."""
    concepts = [e for e in entities if e.get("type") == "CONCEPT"]
    if not concepts:
        return []
    refs = [e for e in entities if e.get("type") == "HADITH_REF"]
    sources = [_entity_copy(r) for r in refs] if refs else [_hadith_source(metadata)]
    return [
        {
            "type": "MENTIONS_CONCEPT",
            "source": src,
            "target": _entity_copy(concept),
            "confidence": 0.6,
            "evidence": (
                "co-occurrence of HADITH_REF and CONCEPT in sentence"
                if refs
                else "concept linked to sentence-level hadith metadata"
            ),
        }
        for src in sources
        for concept in concepts
    ]


def authorship_relations(
    entities: Sequence[Entity], author_book_map: Dict[str, str]
) -> List[Relation]:
    """AUTHORED via ground-truth pairs (R4, extract.py:323-365); explicit
    BOOK mention matching the mapped title wins over the inferred entity."""
    books_by_norm = {
        _norm_cached(str(e["text"])): e for e in entities if e.get("type") == "BOOK"
    }
    relations: List[Relation] = []
    for scholar in entities:
        if scholar.get("type") != "SCHOLAR":
            continue
        mapped = author_book_map.get(_norm_cached(str(scholar["text"])))
        if not mapped:
            continue
        explicit = books_by_norm.get(_norm_cached(mapped))
        if explicit is None:
            target: Entity = {"text": mapped, "type": "BOOK", "start": -1, "end": -1}
            evidence = "known scholar-book ground truth pair (inferred)"
        else:
            target = _entity_copy(explicit)
            evidence = "known scholar-book pair with explicit BOOK mention"
        relations.append(
            {
                "type": "AUTHORED",
                "source": _entity_copy(scholar),
                "target": target,
                "confidence": 1.0,
                "evidence": evidence,
            }
        )
    return relations


def dedupe_relations(relations: Sequence[Relation]) -> List[Relation]:
    """Keep max-confidence per 9-tuple key, first-seen order (R5,
    extract.py:387-409)."""
    best: Dict[Tuple, Relation] = {}
    for rel in relations:
        src = rel.get("source", {})
        tgt = rel.get("target", {})
        key = (
            rel.get("type"),
            src.get("type"),
            src.get("text"),
            int(src.get("start", -1)),
            int(src.get("end", -1)),
            tgt.get("type"),
            tgt.get("text"),
            int(tgt.get("start", -1)),
            int(tgt.get("end", -1)),
        )
        current = best.get(key)
        if current is None or float(rel.get("confidence", 0.0)) > float(
            current.get("confidence", 0.0)
        ):
            best[key] = rel
    return list(best.values())


def extract_relations(
    tokens: Sequence[str],
    labels: Sequence[str],
    metadata: Optional[Dict] = None,
    author_book_map: Optional[Dict[str, str]] = None,
) -> List[Relation]:
    """Full R1-R6 orchestration (extract.py:49-65)."""
    abm = AUTHOR_BOOK_MAP if author_book_map is None else author_book_map
    entities = bio_to_entity_spans(tokens, labels)
    norm_tokens = [_norm_cached(t) for t in tokens]
    relations: List[Relation] = []
    relations.extend(narration_chain_relations(norm_tokens, entities))
    relations.extend(in_book_relations(tokens, norm_tokens, entities, metadata, abm))
    relations.extend(concept_relations(entities, metadata))
    relations.extend(authorship_relations(entities, abm))
    return dedupe_relations(relations)
