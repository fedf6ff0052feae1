"""PII scrubbing for training-data pipelines: redact emails, phone
numbers, IPv4 addresses, SSN-shaped ids, and long card-shaped digit runs
from a text column before the corpus reaches tokenization/training.

Everything is native ``regexp_replace`` / ``regexp_count`` column
expressions — JVM-side, whole-stage-codegen, one scan, zero shuffles —
so the scrub rides along any existing corpus pass for free. Patterns
use explicit character classes only (no \\s / \\w shorthands, whose
definitions differ across regex engines) so behavior is stable and
documentable.

This is deliberately a pattern scrubber, not an NER model: the
reference stack has no PII stage, and a learned detector would need
model assets this sandbox forbids. The pattern set is the standard
first-line filter (C4-style); swap in an NER-backed pandas UDF at the
same call site if a model becomes available.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# ordered: longer/greedier shapes first so partial overlaps (a phone
# inside a longer digit run) are consumed by the more specific rule
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"),
    ("ssn", "[0-9]{3}-[0-9]{2}-[0-9]{4}"),
    ("card", "[0-9]{13,16}"),
    ("ipv4", "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"),
    # Structured phone shape — optional country code, optional 3-digit
    # area code with optional parens, then the 3+4 exchange/line core
    # (so 7-digit locals like '555-1234' are still caught) — rather
    # than a loose separator run: a '[0-9()./ -]{6,}' class also
    # swallowed dates ('2024/01/01 10.30') and spaced number series
    # ('1 2 3 4 5 6 7 8'), silently mangling clean corpus text.
    ("phone",
     "[+]?(?:[0-9]{1,3}[ -]?)?(?:[(]?[0-9]{3}[)]?[ -]?)?"
     "[0-9]{3}[ -]?[0-9]{4}"),
)


def scrub_pii(docs: DataFrame, text_col: str = "text",
              replacement: str = "[REDACTED]",
              kinds: tuple[str, ...] | None = None) -> DataFrame:
    """Replace every PII match in ``text_col`` with ``replacement``
    (in PII_PATTERNS order). ``kinds`` restricts to a subset."""
    out = F.col(text_col)
    for kind, pat in PII_PATTERNS:
        if kinds is not None and kind not in kinds:
            continue
        out = F.regexp_replace(out, pat, replacement)
    return docs.withColumn(text_col, out)


def pii_counts(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Per-doc match counts per PII kind + total — the audit/reporting
    side (run BEFORE scrubbing; counts overlap-free per kind but a span
    can match several kinds, e.g. card ∩ phone)."""
    cols = [
        F.regexp_count(F.col(text_col), F.lit(pat)).alias(f"n_{kind}")
        for kind, pat in PII_PATTERNS
    ]
    out = docs.select(F.col(id_col), *cols)
    total = None
    for kind, _ in PII_PATTERNS:
        c = F.col(f"n_{kind}")
        total = c if total is None else total + c
    return out.withColumn("n_pii", total)
