"""Mention detection: isnad/hadith-ref pattern rules + gazetteer labels.

Pure-Python core executed inside Arrow UDF batches (mapInPandas).  Parity
target: ``SilverAnnotator`` (/root/reference/src/ner/silver_annotator.py).
Every rule below is differentially fuzz-tested against the reference in
tests/test_parity_reference.py.

Entry points:

* :func:`annotate_raw` — raw (or pre-normalized) Arabic text -> (tokens,
  BIO labels).  This is the model-free NER path the pipeline uses
  (mirrors silver_annotator.annotate_from_raw:116-153, which is also the
  semantics of the API's gazetteer fallback).
* :func:`annotate_sanadset` — Sanadset ``<NAR>/<SANAD>/<MATN>``-tagged text
  -> (tokens, labels) (silver_annotator.annotate_from_sanadset:73-114).
* :func:`repair_bio` — orphan-I repair + label normalization
  (api/routes/ner.py:29-70, scripts/build_graph.py:280-309).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence, Tuple

from functools import lru_cache

from islamic_ner_spark.functions.normalize import normalize
from islamic_ner_spark.sources.gazetteer import Gazetteer

# Token-level normalization dominates the annotate hot path and the token
# vocabulary is heavily repetitive; normalize() is pure, so a bounded memo
# is free throughput (≈40% of annotate_raw is repeated token normalize).
norm_cached = lru_cache(maxsize=1 << 16)(normalize)

TOKEN_RE = re.compile(r"\S+")
_ARABIC_LETTER_RE = re.compile("[ء-ي]")
_XML_TAG_RE = re.compile(r"</?\s*([A-Za-z0-9_:-]+)\s*>")

ENTITY_TYPES = frozenset({"SCHOLAR", "BOOK", "CONCEPT", "PLACE", "HADITH_REF"})

# Rule lexicons (silver_annotator.py:31-64).  All entries are already in
# normalized orthography.
ISNAD_TRIGGERS = frozenset({"حدثنا", "اخبرنا", "عن", "قال", "رواه", "سمعت"})
ISNAD_STOP = frozenset(
    {"عن", "ان", "قال", "اخبرنا", "حدثنا", "سمعت", "رواه", "ثم", "في", "الى", "على"}
)
ENTITY_STOP = frozenset({"ان", "قال", "عن", "حدثنا", "اخبرنا", "رواه", "سمعت"})
NON_NAME_STARTERS = frozenset(
    {"هذا", "هذه", "ذلك", "ثم", "في", "على", "الى", "كتاب", "باب", "حديث", "رقم", "انه", "انها", "الربا"}
)
NAME_PREFIXES = frozenset({"ابو", "ابي", "بن", "ابن", "عبد"})
BOOK_CONTEXT_KEYWORDS = frozenset({"صحيح", "سنن", "مسند", "موطا"})
PUNCTUATION_CHARS = frozenset(".,،؛;:!?؟()[]{}\"'")

# HADITH_REF numeric patterns (silver_annotator.py:66-71): "حديث رقم N",
# "رقم N" with Western or Arabic-Indic digits.
_HADITH_NUM_RES = (
    re.compile("حديث\\s+رقم\\s+[0-9٠-٩]+"),
    re.compile("رقم\\s+[0-9٠-٩]+"),
)

Span = Dict[str, object]  # {"text", "start", "end", "type"} char-based
TokenSpan = Dict[str, object]  # {"text", "type", "start_token", "end_token"}


def tokenize_with_spans(text: str) -> List[Tuple[str, int, int]]:
    """Whitespace tokens with char offsets (P11)."""
    return [(m.group(0), m.start(), m.end()) for m in TOKEN_RE.finditer(text)]


def _is_pure_punct(token: str) -> bool:
    return bool(token) and all(c in PUNCTUATION_CHARS for c in token)


def _ends_with_punct(token: str) -> bool:
    return bool(token) and token[-1] in PUNCTUATION_CHARS


def _trim_right_punct(text: str, start: int, end: int) -> int:
    while end > start and text[end - 1] in PUNCTUATION_CHARS:
        end -= 1
    return end


def _dedupe_char_spans(spans: List[Span]) -> List[Span]:
    """Keep first occurrence per (start, end, type) (M11)."""
    seen = set()
    out = []
    for span in spans:
        key = (span.get("start"), span.get("end"), span.get("type"))
        if key not in seen:
            seen.add(key)
            out.append(span)
    return out


def is_probable_name(text: str) -> bool:
    """Heuristic person-name filter (M5, silver_annotator.py:608-625)."""
    tokens = norm_cached(text).split()
    if not tokens or len(tokens) > 5:
        return False
    if any(tok in ENTITY_STOP for tok in tokens):
        return False
    if any(any(ch.isdigit() for ch in tok) for tok in tokens):
        return False
    first = tokens[0]
    if first in NON_NAME_STARTERS or len(first) < 2:
        return False
    return bool(_ARABIC_LETTER_RE.search(first))



def _lookup_type(text: str, gazetteer: Gazetteer) -> Optional[str]:
    entry = gazetteer.lookup.get(norm_cached(text))
    return entry[1] if entry else None

def _starts_with_proper_name(text: str, gazetteer: Gazetteer) -> bool:
    tokens = norm_cached(text).split()
    if not tokens:
        return False
    first = tokens[0]
    if first in NON_NAME_STARTERS:
        return False
    if _lookup_type(first, gazetteer) == "SCHOLAR":
        return True
    return is_probable_name(first)


def classify_isnad_candidate(
    trigger_norm: str, candidate_text: str, gazetteer: Gazetteer
) -> Optional[str]:
    """Per-trigger candidate typing (M4, silver_annotator.py:573-606)."""
    lookup_type = _lookup_type(candidate_text, gazetteer)
    name_like = is_probable_name(candidate_text)

    if trigger_norm == "رواه":
        if lookup_type == "BOOK":
            return "BOOK"
        if lookup_type == "SCHOLAR" or name_like:
            return "SCHOLAR"
        return None

    if trigger_norm == "قال" and not _starts_with_proper_name(candidate_text, gazetteer):
        return None

    if trigger_norm == "عن":
        if lookup_type == "SCHOLAR":
            return "SCHOLAR"
        if lookup_type == "BOOK":
            return None
        tokens = norm_cached(candidate_text).split()
        if len(tokens) >= 2:
            return "SCHOLAR"
        if tokens and tokens[0] in NAME_PREFIXES:
            return "SCHOLAR"
        return None

    if lookup_type == "BOOK":
        return None
    if lookup_type == "SCHOLAR" or name_like:
        return "SCHOLAR"
    return None


def isnad_pattern_spans(
    text: str,
    gazetteer: Gazetteer,
    token_infos: Optional[List[Tuple[str, int, int]]] = None,
    norms: Optional[List[str]] = None,
) -> List[Span]:
    """Trigger-word SCHOLAR/BOOK candidates (M3, silver_annotator.py:155-232).

    ``token_infos``/``norms`` may be precomputed by the caller (the fused
    annotate pass tokenizes once for all three detectors)."""
    if token_infos is None:
        token_infos = tokenize_with_spans(text)
    if not token_infos:
        return []
    if norms is None:
        norms = [norm_cached(tok) for tok, _, _ in token_infos]
    spans: List[Span] = []

    for idx, trigger in enumerate(norms):
        if trigger not in ISNAD_TRIGGERS:
            continue
        picked: List[int] = []
        for j in range(idx + 1, min(len(token_infos), idx + 6)):
            tok = token_infos[j][0]
            norm = norms[j]
            if not picked and (norm in ISNAD_STOP or _is_pure_punct(tok)):
                break
            if picked and (norm in ENTITY_STOP or _is_pure_punct(tok)):
                break
            picked.append(j)
            if _ends_with_punct(tok):
                break
        if not picked:
            continue
        start = token_infos[picked[0]][1]
        end = _trim_right_punct(text, start, token_infos[picked[-1]][2])
        if end <= start:
            continue
        candidate = text[start:end]
        entity_type = classify_isnad_candidate(trigger, candidate, gazetteer)
        if entity_type:
            spans.append({"text": candidate, "start": start, "end": end, "type": entity_type})

    return _dedupe_char_spans(spans)


def hadith_ref_spans(
    text: str,
    token_infos: Optional[List[Tuple[str, int, int]]] = None,
    norms: Optional[List[str]] = None,
) -> List[Span]:
    """Chapter/number reference spans (M6, silver_annotator.py:234-301)."""
    if token_infos is None:
        token_infos = tokenize_with_spans(text)
    if norms is None:
        norms = [norm_cached(tok) for tok, _, _ in token_infos]
    spans: List[Span] = []

    for idx, norm in enumerate(norms):
        if norm not in ("كتاب", "باب"):
            continue
        picked = [idx]
        for j in range(idx + 1, min(len(token_infos), idx + 6)):
            tok = token_infos[j][0]
            nxt = norms[j]
            if _is_pure_punct(tok):
                break
            if nxt in ENTITY_STOP or nxt in ("كتاب", "باب", "حديث", "رقم"):
                break
            picked.append(j)
            if _ends_with_punct(tok):
                break
        if len(picked) < 2:
            continue
        start = token_infos[picked[0]][1]
        end = _trim_right_punct(text, start, token_infos[picked[-1]][2])
        if end <= start:
            continue
        spans.append({"text": text[start:end], "start": start, "end": end, "type": "HADITH_REF"})

    for pattern in _HADITH_NUM_RES:
        for m in pattern.finditer(text):
            spans.append(
                {"text": m.group(0), "start": m.start(), "end": m.end(), "type": "HADITH_REF"}
            )

    return _dedupe_char_spans(spans)


def apply_book_context(text: str, spans: List[Span], gazetteer: Gazetteer) -> List[Span]:
    """SCHOLAR -> BOOK relabel in book-title contexts (M7,
    silver_annotator.py:303-354)."""
    if not spans:
        return []
    out: List[Span] = []
    for span in spans:
        adjusted = dict(span)
        if adjusted.get("type") != "SCHOLAR":
            out.append(adjusted)
            continue
        start = int(adjusted.get("start", 0))
        prefix_tokens = norm_cached(text[max(0, start - 32) : start]).split()
        if not prefix_tokens:
            out.append(adjusted)
            continue
        last = prefix_tokens[-1]
        if last == "رواه":
            out.append(adjusted)
            continue
        known = _lookup_type(str(adjusted.get("text", "")), gazetteer) in ("SCHOLAR", "BOOK")
        if known and (last in BOOK_CONTEXT_KEYWORDS or last == "في"):
            adjusted["type"] = "BOOK"
        out.append(adjusted)
    return out


def gazetteer_spans(
    text: str,
    gazetteer: Gazetteer,
    allowed_types: Optional[frozenset] = None,
    *,
    text_is_normalized: bool = False,
) -> List[Span]:
    """Gazetteer matches as char spans (M2 filtered by type)."""
    matches = (
        gazetteer.match_normalized(text) if text_is_normalized else gazetteer.match(text)
    )
    spans = [
        {"text": m.text, "start": m.start, "end": m.end, "type": m.entity_type}
        for m in matches
        if allowed_types is None or m.entity_type in allowed_types
    ]
    return _dedupe_char_spans(spans)


def char_spans_to_token_spans(
    token_infos: List[Tuple[str, int, int]], spans: List[Span]
) -> List[TokenSpan]:
    """Char spans -> covering token ranges (M9, silver_annotator.py:506-539).

    A token overlaps iff tok.start < end and tok.end > start; the token
    range is [first overlapping, last overlapping + 1].

    Tokens come from ``\\S+`` tokenization (sorted, non-overlapping), so
    the overlap range is found by bisection instead of the reference's
    per-span linear scan — same result (diff-fuzzed), O(log n) per span."""
    if not token_infos or not spans:
        return []
    from bisect import bisect_left, bisect_right

    tok_starts = [t[1] for t in token_infos]
    tok_ends = [t[2] for t in token_infos]
    n_tokens = len(token_infos)
    out: List[TokenSpan] = []
    seen = set()
    for span in spans:
        start = int(span.get("start", -1))
        end = int(span.get("end", -1))
        entity_type = span.get("type")
        if start < 0 or end <= start or not entity_type:
            continue
        first = bisect_right(tok_ends, start)   # first token with end > start
        last = bisect_left(tok_starts, end) - 1  # last token with start < end
        if first >= n_tokens or last < first:
            continue
        key = (first, last + 1, entity_type)
        if key in seen:
            continue
        seen.add(key)
        out.append(
            {
                "text": span.get("text", ""),
                "type": entity_type,
                "start_token": first,
                "end_token": last + 1,
            }
        )
    return out


def merge_label_sources(
    n_tokens: int, *sources: Sequence[TokenSpan]
) -> List[str]:
    """Priority merge with first-writer-wins occupied mask (M10,
    silver_annotator.py:356-406).  Earlier sources take priority; within a
    source, spans are applied sorted by (start_token, -length)."""
    labels = ["O"] * n_tokens
    occupied = [False] * n_tokens
    for source in sources:
        if not source:
            continue
        ordered = sorted(
            source,
            key=lambda s: (
                s.get("start_token", 0),
                -(int(s.get("end_token", 0)) - int(s.get("start_token", 0))),
            ),
        )
        for span in ordered:
            start = span.get("start_token")
            end = span.get("end_token")
            entity_type = span.get("type")
            if start is None or end is None or not entity_type:
                continue
            start = int(start)
            end = int(end)
            if start < 0 or end <= start or start >= n_tokens:
                continue
            end = min(end, n_tokens)
            if any(occupied[start:end]):
                continue
            labels[start] = f"B-{entity_type}"
            for i in range(start + 1, end):
                labels[i] = f"I-{entity_type}"
            for i in range(start, end):
                occupied[i] = True
    return labels


def annotate_raw(
    text: str, gazetteer: Gazetteer, *, is_normalized: bool = False
) -> Tuple[List[str], List[str]]:
    """Raw text -> (tokens, BIO labels); the pipeline's model-free NER path."""
    ntext = text if is_normalized else normalize(text)
    token_infos = tokenize_with_spans(ntext)
    tokens = [tok for tok, _, _ in token_infos]
    norms = [norm_cached(tok) for tok in tokens]

    patterns = isnad_pattern_spans(ntext, gazetteer, token_infos, norms)
    patterns.extend(hadith_ref_spans(ntext, token_infos, norms))
    patterns = apply_book_context(ntext, patterns, gazetteer)

    # ntext is fully normalized, so the matcher's alignment map is the
    # identity -> fast path (sources/gazetteer.match_normalized)
    gaz = gazetteer_spans(
        ntext, gazetteer, ENTITY_TYPES - {"HADITH_REF"}, text_is_normalized=True
    )
    gaz = apply_book_context(ntext, gaz, gazetteer)

    labels = merge_label_sources(
        len(tokens),
        char_spans_to_token_spans(token_infos, patterns),
        char_spans_to_token_spans(token_infos, gaz),
    )
    return tokens, labels


def strip_tags_extract_nar(tagged_text: str) -> Tuple[str, List[Span]]:
    """Sanadset tag stripping + <NAR> span extraction (M8,
    silver_annotator.py:436-486).  Non-NAR tags become space separators so
    adjacent tokens don't fuse."""
    parts: List[str] = []
    nar_stack: List[int] = []
    nar_spans: List[Span] = []
    cursor = 0
    clean_len = 0

    for m in _XML_TAG_RE.finditer(tagged_text):
        plain = tagged_text[cursor : m.start()]
        if plain:
            parts.append(plain)
            clean_len += len(plain)
        tag = m.group(1).upper()
        closing = tagged_text[m.start() : m.start() + 2] == "</"
        if tag == "NAR":
            if closing:
                if nar_stack:
                    start = nar_stack.pop()
                    if clean_len > start:
                        nar_spans.append({"start": start, "end": clean_len, "type": "SCHOLAR"})
            else:
                nar_stack.append(clean_len)
        else:
            if parts and not (parts[-1] and parts[-1][-1].isspace()):
                parts.append(" ")
                clean_len += 1
        cursor = m.end()

    tail = tagged_text[cursor:]
    if tail:
        parts.append(tail)
    clean_text = "".join(parts)
    for span in nar_spans:
        span["text"] = clean_text[int(span["start"]) : int(span["end"])]
    return clean_text, _dedupe_char_spans(nar_spans)


def annotate_sanadset(tagged_text: str, gazetteer: Gazetteer) -> Tuple[List[str], List[str]]:
    """Sanadset-tagged text -> (tokens, labels); NAR spans take priority
    over patterns over gazetteer (annotate_from_sanadset:73-114).  Note the
    reference runs this on UN-normalized cleaned text."""
    text, nar_spans = strip_tags_extract_nar(tagged_text)
    token_infos = tokenize_with_spans(text)
    tokens = [tok for tok, _, _ in token_infos]

    patterns = isnad_pattern_spans(text, gazetteer)
    patterns.extend(hadith_ref_spans(text))
    patterns = apply_book_context(text, patterns, gazetteer)

    gaz = gazetteer_spans(text, gazetteer, frozenset({"BOOK", "CONCEPT", "PLACE"}))

    labels = merge_label_sources(
        len(tokens),
        char_spans_to_token_spans(token_infos, nar_spans),
        char_spans_to_token_spans(token_infos, patterns),
        char_spans_to_token_spans(token_infos, gaz),
    )
    return tokens, labels


# ---------------------------------------------------------------------------
# BIO repair (M14) — api/routes/ner.py:29-70
# ---------------------------------------------------------------------------


def normalize_label(label: str) -> str:
    if label == "O" or "-" not in label:
        return "O"
    prefix, entity_type = label.split("-", 1)
    prefix = prefix.upper()
    entity_type = entity_type.upper()
    if entity_type == "HADITH":
        entity_type = "HADITH_REF"
    if prefix not in ("B", "I") or entity_type not in ENTITY_TYPES:
        return "O"
    return f"{prefix}-{entity_type}"


def word_offsets(text: str, words: Sequence[str]) -> List[Tuple[int, int]]:
    """Recover char offsets of known words via cursor search (P14,
    api/routes/ner.py:73-91) — tolerant of repeated words and fallback to
    the cursor when a word is unfindable."""
    offsets: List[Tuple[int, int]] = []
    cursor = 0
    for word in words:
        while cursor < len(text) and text[cursor].isspace():
            cursor += 1
        start = text.find(word, cursor)
        if start == -1:
            start = text.find(word)
        if start == -1:
            start = cursor
        end = start + len(word)
        offsets.append((start, end))
        cursor = end
    return offsets


def merge_allowed_labels(
    base_labels: Sequence[str],
    candidate_labels: Sequence[str],
    allowed_types: frozenset | set,
) -> List[str]:
    """Protected overlay merge (A10, boost_silver_data.py:213-236):
    candidate spans of allowed types are written onto the base sequence
    only where every covered slot is still 'O'; candidates applied in
    (start, -length) order."""
    from islamic_ner_spark.functions.relations import bio_to_entity_spans

    if len(base_labels) != len(candidate_labels):
        raise ValueError("label length mismatch in protected merge")
    merged = list(base_labels)
    spans = [
        (int(s["start"]), int(s["end"]), str(s["type"]))
        for s in bio_to_entity_spans(["x"] * len(candidate_labels), list(candidate_labels))
        if s["type"] in allowed_types
    ]
    spans.sort(key=lambda s: (s[0], -(s[1] - s[0])))
    for start, end, entity_type in spans:
        if start < 0 or end <= start or end > len(merged):
            continue
        if any(label != "O" for label in merged[start:end]):
            continue
        merged[start] = f"B-{entity_type}"
        for idx in range(start + 1, end):
            merged[idx] = f"I-{entity_type}"
    return merged


def repair_bio(labels: Sequence[str]) -> List[str]:
    """Normalize labels and promote orphan I- tags to B- tags."""
    repaired: List[str] = []
    prev_type = ""
    prev_entity = False
    for raw in labels:
        label = normalize_label(raw)
        if label == "O":
            repaired.append("O")
            prev_type = ""
            prev_entity = False
            continue
        prefix, entity_type = label.split("-", 1)
        if prefix == "I" and (not prev_entity or prev_type != entity_type):
            repaired.append(f"B-{entity_type}")
        else:
            repaired.append(label)
        prev_type = entity_type
        prev_entity = True
    return repaired
