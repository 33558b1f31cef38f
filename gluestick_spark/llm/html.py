"""HTML → text/link extraction — the step between a raw crawl record
and every text operator in this package (C4/CCNet pipelines strip
markup before quality scoring, language ID, and dedup).

Beyond-reference operators (the pandas reference at
/root/reference/gluestick is an ETL toolkit with no web-corpus
surface). Everything here is PURE regexp codegen — no UDF, no external
HTML parser — and every pattern stays inside the Java↔RE2↔DuckDB
portable subset (lazy quantifiers and inline ``(?is)`` flags only; no
backreferences, no lookaround), so the DuckDB oracles replay each
transformation byte-for-byte.

Honest-contract note: a regex is NOT an HTML parser. This module
implements the crawl-pipeline *cleaning* contract (drop script/style
blocks and comments, drop tags, unescape the common entities, collapse
whitespace), which is what C4-style corpus builders actually do — it
does not promise DOM-correct handling of pathological markup
(unclosed ``<script``, CDATA, conditional comments). Malformed inputs
degrade to extra dropped or kept text, never to an error.

Scale posture: both operators are embarrassingly parallel narrow
projections over the corpus scan — zero shuffles, fully inside
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["strip_html_expr", "extract_links_expr", "html_to_text"]

# Order matters and is part of the replay contract: blocks first (their
# inner text must not survive tag removal), then comments, then tags,
# then entities (&amp; LAST so "&amp;lt;" ends as "&lt;" not "<"), then
# whitespace collapse.
# two patterns, not one with a backreference — \1 is outside the
# RE2-portable subset the oracle contract requires
_SCRIPT_RE = r"(?is)<script\b[^>]*>.*?</script\s*>"
_STYLE_RE = r"(?is)<style\b[^>]*>.*?</style\s*>"
_COMMENT_RE = r"(?s)<!--.*?-->"
_TAG_RE = r"(?s)<[^>]*>"

_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
]


def strip_html_expr(html: Column) -> Column:
    """Visible text of an HTML string: script/style blocks and comments
    dropped, tags removed, the six ubiquitous entities unescaped
    (``&amp;`` deliberately LAST — see the ordering comment), runs of
    whitespace collapsed to single spaces, result trimmed."""
    out = F.regexp_replace(html, _SCRIPT_RE, " ")
    out = F.regexp_replace(out, _STYLE_RE, " ")
    out = F.regexp_replace(out, _COMMENT_RE, " ")
    out = F.regexp_replace(out, _TAG_RE, " ")
    for ent, rep in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def extract_links_expr(html: Column) -> Column:
    """``array<string>`` of ``href`` targets, in document order —
    double- or single-quoted attribute values, any tag. Feed the result
    through :func:`~gluestick_spark.llm.web.canonical_url_expr` /
    ``registered_domain_expr`` to build the link graph that
    ``operators/graph.py`` (PageRank/HITS) consumes."""
    dq = F.regexp_extract_all(html, F.lit(r'(?i)href="([^"]*)"'), 1)
    sq = F.regexp_extract_all(html, F.lit(r"(?i)href='([^']*)'"), 1)
    return F.concat(dq, sq)


def html_to_text(
    df: DataFrame,
    html_col: str,
    text_col: str = "text",
    links_col: str | None = "links",
) -> DataFrame:
    """Append the cleaned-text (and optionally link-array) columns —
    the standard first stage of a web-corpus build. Narrow projection;
    compose downstream with ``llm/text.py`` quality/langid/dedup."""
    out = df.withColumn(text_col, strip_html_expr(F.col(html_col)))
    if links_col is not None:
        out = out.withColumn(links_col, extract_links_expr(F.col(html_col)))
    return out
