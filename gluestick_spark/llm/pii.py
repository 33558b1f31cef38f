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

__all__ = [
    "PII_PATTERNS",
    "redact_pii_expr",
    "pii_counts_expr",
    "CARD_CANDIDATE_REGEX",
    "IBAN_CANDIDATE_REGEX",
    "luhn_valid_expr",
    "iban_valid_expr",
    "valid_cards_expr",
    "valid_ibans_expr",
    "redact_validated_expr",
]

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


# ---------------------------------------------------------------------------
# Checksum-validated structured PII (VERDICT r14 #7): card numbers gated
# by the Luhn mod-10 checksum, IBANs by ISO 7064 mod-97 — both pure
# Catalyst folds (no UDF), so a digit-run that happens to LOOK like a
# card but fails its checksum is never counted or redacted. This is the
# standard false-positive cut over regex-only detection: 9 in 10 random
# digit runs fail Luhn, ~96 in 97 fail mod-97.
# ---------------------------------------------------------------------------

# 13-19 digits, optional single space/dash separators between groups —
# the PAN shapes card networks actually issue; portable (no lookaround)
CARD_CANDIDATE_REGEX = r"\b\d(?:[ -]?\d){12,18}\b"

# ISO 13616 shape: 2 letters (country), 2 check digits, 11-30
# alphanumerics (shortest real IBAN is NO's 15, longest RU's 33)
IBAN_CANDIDATE_REGEX = r"\b[A-Z]{2}\d{2}[A-Z0-9]{11,29}\b"


def luhn_valid_expr(digits: Column) -> Column:
    """True iff a pure-digit string passes the Luhn mod-10 checksum
    (ISO/IEC 7812): doubling every second digit from the RIGHT (minus 9
    past 9), the total must divide by 10. One indexed ``transform`` +
    one integer ``aggregate`` — exact arithmetic, no UDF, replayable in
    SQL (the position-indexed sum is order-free)."""
    chars = F.split(digits, "")
    n = F.size(chars)
    terms = F.transform(
        chars,
        lambda c, i: F.when(
            ((n - i) % 2) == 0,  # i is 0-based → n-i is the 1-based
            # position from the right; even ⇒ doubled digit
            F.when(
                c.cast("int") * 2 > 9, c.cast("int") * 2 - 9
            ).otherwise(c.cast("int") * 2),
        ).otherwise(c.cast("int")),
    )
    total = F.aggregate(
        terms, F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    return (F.length(digits) >= 13) & (total % 10 == 0)


def iban_valid_expr(iban: Column) -> Column:
    """True iff an uppercase alphanumeric IBAN passes ISO 7064 mod-97:
    first four chars rotated to the end, letters expanded A=10..Z=35,
    and the resulting big decimal ≡ 1 (mod 97) — computed as an
    incremental modular fold over the characters (digit: acc·10+d,
    letter: acc·100+v, both mod 97), so the arbitrary-precision number
    never materializes. Pure Catalyst ``aggregate``; DuckDB replays it
    with ``list_reduce``."""
    rearranged = F.concat(
        F.substring(iban, 5, 2_000_000_000), F.substring(iban, 1, 4)
    )
    chars = F.split(rearranged, "")
    acc0 = F.lit(0).cast("long")
    folded = F.aggregate(
        chars,
        acc0,
        lambda acc, c: F.when(
            F.ascii(c) >= 65,
            (acc * 100 + (F.ascii(c) - 55)) % 97,
        ).otherwise((acc * 10 + (F.ascii(c) - 48)) % 97),
    )
    return (F.length(iban) >= 15) & (folded == 1)


def valid_cards_expr(col: Column) -> Column:
    """Array of the Luhn-VALID card numbers in a text column, as found
    (separators preserved, document order, duplicates kept). Candidates
    come from one ``regexp_extract_all``; each is digit-normalized and
    checksum-gated by :func:`luhn_valid_expr`."""
    cands = F.regexp_extract_all(col, F.lit(CARD_CANDIDATE_REGEX), F.lit(0))
    return F.filter(
        cands, lambda c: luhn_valid_expr(F.regexp_replace(c, r"[ -]", ""))
    )


def valid_ibans_expr(col: Column) -> Column:
    """Array of the mod-97-VALID IBANs in a text column (document
    order, duplicates kept)."""
    cands = F.regexp_extract_all(col, F.lit(IBAN_CANDIDATE_REGEX), F.lit(0))
    return F.filter(cands, iban_valid_expr)


def redact_validated_expr(
    col: Column,
    card_token: str = "<CARD>",
    iban_token: str = "<IBAN>",
) -> Column:
    """Text with every CHECKSUM-VALID card number and IBAN replaced by
    its token — invalid lookalikes (order ids, tracking numbers) are
    left untouched, the precision win over a regex-only redactor. Each
    valid match is folded through one ``regexp_replace`` whose pattern
    is the matched string itself (candidates contain only
    ``[A-Z0-9 -]`` — no regex metacharacters), so the fold is exact."""
    out = F.aggregate(
        valid_cards_expr(col),
        col,
        lambda acc, c: F.regexp_replace(acc, c, F.lit(card_token)),
    )
    return F.aggregate(
        valid_ibans_expr(col),
        out,
        lambda acc, c: F.regexp_replace(acc, c, F.lit(iban_token)),
    )
