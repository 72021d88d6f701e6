"""PII detection and redaction as pure column expressions.

A 100 TB pretraining corpus must be scrubbed of contact data before
training; doing it with per-row Python would dominate the whole
pipeline's cost.  These are JVM-side regex expressions (whole-stage
codegen, no UDF), with patterns restricted to the syntax subset that
Java regex and RE2 (DuckDB's engine) interpret identically — no
lookarounds, no backreferences — so the DuckDB oracle can replay the
exact semantics.

Pattern scope (deliberately conservative / high-precision):

* email    — ``name@host.tld`` with the usual atom characters
* phone    — strict international form ``+`` followed by 7-15 digits
  (free-form national numbers are ambiguous against ordinary numbers;
  a production deployment would add locale-specific patterns the same
  way)
* ipv4     — four 1-3 digit octets with word boundaries
* long id  — bare 13-19 digit runs (card/account-shaped)

Replacement order matters and is fixed: email → phone → ipv4 → id
(an email's host can contain digit runs; the phone's digits would
otherwise re-match as a long id).  ``redact_pii`` applies them in that
order; ``pii_counts`` counts matches on the ORIGINAL text with the same
order simulated by counting each pattern on the text with the earlier
categories already removed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (name, pattern, replacement) in application order — identical meaning
# under Java regex and RE2
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+[0-9]{7,15}", "<PHONE>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IPV4>"),
    ("long_id", r"\b[0-9]{13,19}\b", "<ID>"),
)


def redact_pii(text: Column | str) -> Column:
    """Text with every PII category replaced by its token, in the fixed
    application order."""
    col = F.col(text) if isinstance(text, str) else text
    for _, pattern, token in PII_PATTERNS:
        col = F.regexp_replace(col, pattern, token)
    return col


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-category match counts consistent with :func:`redact_pii`:
    each pattern is counted on the text with the earlier categories
    already redacted, so overlapping matches are attributed to exactly
    one category (the earlier one), never double-counted."""
    col = F.col(text) if isinstance(text, str) else text
    counts: dict[str, Column] = {}
    for name, pattern, token in PII_PATTERNS:
        counts[f"n_{name}"] = F.regexp_count(col, F.lit(pattern)).cast("long")
        col = F.regexp_replace(col, pattern, token)
    return counts
