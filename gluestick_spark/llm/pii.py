"""PII redaction for training corpora.

Standard pre-training hygiene (the FineWeb/C4 lineage): replace emails, IP
addresses, and SSN-shaped ids with fixed placeholder tokens before anything
downstream sees the text. Everything here is a built-in ``regexp_replace``
/ ``regexp_extract_all`` expression — JVM-side, whole-stage codegen, no
Python in the row path — and every pattern sticks to the regex subset that
behaves identically in Java (Spark) and RE2 (DuckDB), so redaction stays
oracle-checkable.

Patterns are deliberately high-precision/recall-bounded (an email regex
that swallows code tokens poisons a code corpus); pass custom patterns for
domain-specific ids. Order matters: patterns apply in dict order (emails
before phone-ish digit runs, so an address isn't half-eaten first).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["PII_PATTERNS", "redact_pii_expr", "pii_counts_expr"]

# name → (regex, replacement token). Portable across Java regex and RE2:
# no backrefs, no lookaround, no \b-adjacent unicode classes.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
}


def redact_pii_expr(
    col: Column, patterns: dict[str, tuple[str, str]] | None = None
) -> Column:
    """Text with every PII match replaced by its placeholder token."""
    out = col
    for regex, token in (patterns or PII_PATTERNS).values():
        out = F.regexp_replace(out, regex, token)
    return out


def pii_counts_expr(
    col: Column, patterns: dict[str, tuple[str, str]] | None = None
) -> dict[str, Column]:
    """{pattern name → match count} expressions — audit how much each
    pattern fires before committing to a redaction pass."""
    return {
        name: F.size(F.regexp_extract_all(col, F.lit(regex), F.lit(0)))
        for name, (regex, _) in (patterns or PII_PATTERNS).items()
    }
