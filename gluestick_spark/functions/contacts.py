"""Contact-field normalization: canonical emails and phone numbers —
the CRM-ETL cleaning verbs that run before identity joins and
:func:`~gluestick_spark.operators.linkage.entity_matches` (two rows
with ``J.Doe+crm@GMAIL.com`` and ``jdoe@gmail.com`` are the same
contact; raw-string equality and even edit distance miss it).

Beyond-reference operators (the pandas reference at
/root/reference/gluestick cleans types/nulls but not contact
semantics). Pure regexp/string codegen in the RE2-portable subset —
no UDF, no shuffle — so oracles replay every rule byte-for-byte.

Rule sets are DOCUMENTED CHOICES (normalization is policy, not truth):

Email (:func:`normalize_email_expr`):
* trim + lowercase;
* sub-addressing stripped: local-part ``+tag`` removed (RFC-legal,
  near-universal alias convention);
* gmail dot-insensitivity: dots removed from the local part for
  ``gmail.com``/``googlemail.com`` only, and ``googlemail.com`` is
  folded into ``gmail.com`` (documented Google equivalence — NOT
  applied to other domains, where dots are significant);
* anything not matching a pragmatic ``local@domain.tld`` shape
  normalizes to NULL (parse-failure contract, like the URL family).

Phone (:func:`normalize_phone_expr`):
* all formatting stripped (spaces, dashes, dots, parentheses);
* ``00`` international prefix folded into ``+``;
* bare national numbers of ``national_len`` digits get
  ``default_cc`` prepended; numbers already carrying ``+`` keep
  their country code;
* results are ``+<digits>`` E.164-shaped strings; too-short/too-long
  or letter-bearing inputs normalize to NULL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["normalize_email_expr", "normalize_phone_expr"]

_EMAIL_RE = r"^[a-z0-9!#$%&'*+/=?^_`{|}~.-]+@[a-z0-9-]+(\.[a-z0-9-]+)+$"


def normalize_email_expr(email: Column) -> Column:
    """Canonical email (module docstring rules); NULL when the input
    does not look like an address."""
    e = F.lower(F.trim(email))
    valid = e.rlike(_EMAIL_RE)
    local = F.regexp_extract(e, r"^([^@]+)@", 1)
    domain = F.regexp_extract(e, r"@(.+)$", 1)
    local = F.regexp_replace(local, r"\+.*$", "")
    domain = F.when(domain == "googlemail.com", F.lit("gmail.com")).otherwise(
        domain
    )
    local = F.when(
        domain == "gmail.com", F.regexp_replace(local, r"\.", "")
    ).otherwise(local)
    out = F.concat(local, F.lit("@"), domain)
    # a +tag-only local part ("+spam@x.com") strips to empty — reject
    return F.when(valid & (local != ""), out)


def normalize_phone_expr(
    phone: Column,
    default_cc: str = "1",
    national_len: int = 10,
) -> Column:
    """E.164-shaped canonical phone (module docstring rules); NULL when
    the input can't be a number (letters, or too few/many digits)."""
    raw = F.trim(phone)
    has_plus = raw.rlike(r"^\+")
    digits = F.regexp_replace(raw, r"[\s().\-]", "")
    bad = F.when(has_plus, F.substr(digits, F.lit(2))).otherwise(digits).rlike(
        r"[^0-9]"
    )
    digits = F.regexp_replace(digits, r"[^0-9]", "")
    # 00-prefix is the international call prefix — same as +
    intl = has_plus | digits.startswith("00")
    digits = F.when(digits.startswith("00"), F.substr(digits, F.lit(3))).otherwise(
        digits
    )
    n = F.length(digits)
    out = (
        F.when(intl & (n >= 8) & (n <= 15), F.concat(F.lit("+"), digits))
        .when(
            ~intl & (n == national_len),
            F.concat(F.lit("+"), F.lit(default_cc), digits),
        )
    )
    return F.when(~bad, out)
