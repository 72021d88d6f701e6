"""Arabic text normalization — Python core + Spark column expressions.

Semantics-parity target: ``ArabicNormalizer`` in the reference
(/root/reference/src/preprocessing/normalize.py:28-103). The pipeline order
is load-bearing (strip_html -> tashkeel -> alif -> taa marbuta -> alif
maqsura -> tatweel -> whitespace); the per-turn text-equality gate in
BASELINE.json depends on reproducing it exactly.

Two implementations are provided:

* :func:`normalize` — pure-Python, used inside Arrow UDF batches (the hot
  path of mention detection re-normalizes candidate substrings constantly,
  so this must be allocation-light).
* :func:`normalize_col` — a Spark Column expression (JVM-side, codegen'd)
  for use in declarative plans where no Python round-trip is wanted.  The
  column version decodes HTML entities only numerically/for the common
  named set (Spark has no full HTML5 entity table); the Arrow-UDF path
  uses :func:`html.unescape` for exact parity.
"""

from __future__ import annotations

import html
import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Unicode ranges, mirrored from the reference's compiled patterns
# (normalize.py:20-26).
TASHKEEL_PATTERN = "[\u0610-\u061a\u064b-\u065f\u0670]"
ALIF_VARIANTS_PATTERN = "[\u0622\u0623\u0625]"
HTML_TAG_PATTERN = r"<[^>]+>"

_TASHKEEL_RE = re.compile(TASHKEEL_PATTERN)
_HTML_TAG_RE = re.compile(HTML_TAG_PATTERN)
_WS_RE = re.compile(r"\s+")

# Single-codepoint substitutions done with str.translate (one pass instead
# of three regex passes: alif variants -> alif, taa marbuta -> haa, alif
# maqsura -> yaa, tatweel -> deleted).
_CHAR_TABLE = {
    0x0622: 0x0627,  # alif madda
    0x0623: 0x0627,  # alif hamza above
    0x0625: 0x0627,  # alif hamza below
    0x0629: 0x0647,  # taa marbuta -> haa
    0x0649: 0x064A,  # alif maqsura -> yaa
    0x0640: None,    # tatweel deleted
}


def strip_html(text: str) -> str:
    """Decode entities, drop tags (as spaces), decode again (P1)."""
    decoded = html.unescape(text)
    untagged = _HTML_TAG_RE.sub(" ", decoded)
    return html.unescape(untagged)


def remove_tashkeel(text: str) -> str:
    """Delete Arabic diacritics (P2)."""
    return _TASHKEEL_RE.sub("", text)


def fold_letters(text: str) -> str:
    """Alif/taa-marbuta/alif-maqsura folding + tatweel removal (P3-P6)."""
    return text.translate(_CHAR_TABLE)


def collapse_whitespace(text: str) -> str:
    """Collapse runs of whitespace to single spaces and trim (P7)."""
    return _WS_RE.sub(" ", text).strip()


def normalize(text: str) -> str:
    """Full normalization pipeline in the reference's exact order (P8)."""
    return collapse_whitespace(fold_letters(remove_tashkeel(strip_html(text))))


def normalize_no_html(text: str) -> str:
    """Normalization without the HTML pass.

    Matches the alignment-preserving normalizer's character treatment
    (gazetteers.py:112-158 never strips HTML); used where spans must map
    back to the input text.
    """
    return collapse_whitespace(fold_letters(remove_tashkeel(text)))


# ---------------------------------------------------------------------------
# Spark column expressions (JVM-side)
# ---------------------------------------------------------------------------

# translate() source/target strings for the single-codepoint folds.
_TRANSLATE_SRC = "\u0622\u0623\u0625\u0629\u0649\u0640"
_TRANSLATE_DST = "\u0627\u0627\u0627\u0647\u064a"  # tatweel (6th src char) deleted

_COMMON_ENTITIES = [
    ("&nbsp;", " "),
    ("&amp;", "&"),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
]


def _unescape_common_col(col: Column) -> Column:
    for entity, char in _COMMON_ENTITIES:
        col = F.replace(col, F.lit(entity), F.lit(char))
    return col


def strip_html_col(col: Column) -> Column:
    """Column version of :func:`strip_html` (common entities only)."""
    return _unescape_common_col(
        F.regexp_replace(_unescape_common_col(col), HTML_TAG_PATTERN, " ")
    )


def fold_arabic_col(col: Column) -> Column:
    """Tashkeel removal + letter folding as a Column expression."""
    return F.translate(
        F.regexp_replace(col, TASHKEEL_PATTERN, ""), _TRANSLATE_SRC, _TRANSLATE_DST
    )


def collapse_whitespace_col(col: Column) -> Column:
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def normalize_col(col: Column, *, with_html: bool = True) -> Column:
    """Full normalization as one codegen-able Column expression.

    Used in declarative plans (e.g. gazetteer loading, oracle-checked
    queries).  Exact HTML-entity parity requires the Arrow-UDF path; with
    ``with_html=False`` this is bit-identical to :func:`normalize_no_html`.
    """
    if with_html:
        col = strip_html_col(col)
    return collapse_whitespace_col(fold_arabic_col(col))
