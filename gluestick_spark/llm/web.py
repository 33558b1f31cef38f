"""Web-corpus URL operators — domain extraction, per-domain statistics,
and per-domain capping: the CCNet/C4-style web-pipeline stage between raw
crawl records and the quality/dedup family. A crawl is pathologically
skewed by host (a handful of domains contribute most documents); training
mixes cap per-domain volume and audit per-domain shares before anything
else runs.

Everything here is pure Catalyst (regexp over the URL string — whole-stage
codegen, no UDF, no shuffle for the extraction itself); the aggregate and
capping steps shuffle once on the domain key, and the regexes stay inside
the Java↔RE2↔DuckDB-portable subset (no backrefs/lookaheads) so oracles
reproduce results byte-for-byte (same portability contract as
``llm/pii.py``).

At 100 TB: extraction is embarrassingly parallel; ``domain_stats`` is one
map-side-combined aggregate whose output is domain-cardinality-bounded;
``cap_per_domain`` is one keyed window (the same seeded-hash rank as
``llm/sampling.py`` — membership is a pure function of the key, stable
across runs, partitionings, and cluster sizes). Domain skew in the window
shuffle is exactly the skew the cap REMOVES, and row_number over a
monotone rank needs no global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "parse_url_expr",
    "host_expr",
    "registered_domain_expr",
    "domain_stats",
    "cap_per_domain",
]

# authority = [userinfo@]host[:port]; host stops at /, :, ?, #
_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)"
_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)"
_QUERY_RE = r"\?([^#]*)"

# Common second-level public suffixes (a deterministic approximation of the
# Mozilla Public Suffix List's most frequent entries — the full PSL is a
# data file, not an algorithm; swap in a broadcast suffix table for exact
# PSL semantics). "bbc.co.uk" → registered domain "bbc.co.uk", not "co.uk".
_SECOND_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.kr", "co.za", "com.ar", "com.tr", "com.tw", "co.nz",
)


def parse_url_expr(url: Column) -> Column:
    """``struct(scheme, host, path, query)`` parsed from an absolute URL —
    NULL components when absent, NULL host for non-URL strings. Pure
    regexp_extract (codegen), no UDF."""
    def _nz(c: Column) -> Column:
        return F.when(c != "", c)

    return F.struct(
        _nz(F.regexp_extract(url, _SCHEME_RE, 1)).alias("scheme"),
        _nz(F.lower(F.regexp_extract(url, _HOST_RE, 1))).alias("host"),
        _nz(F.regexp_extract(url, _PATH_RE, 1)).alias("path"),
        _nz(F.regexp_extract(url, _QUERY_RE, 1)).alias("query"),
    )


def host_expr(url: Column) -> Column:
    """Lowercased host with any leading ``www.`` stripped; NULL when the
    string isn't an absolute URL."""
    h = F.lower(F.regexp_extract(url, _HOST_RE, 1))
    h = F.when(h != "", h)
    return F.when(h.startswith("www."), F.substr(h, F.lit(5))).otherwise(h)


def registered_domain_expr(url: Column) -> Column:
    """The registrable domain (site identity for capping/dedup): the last
    TWO labels of the host, or the last THREE when the 2-label tail is a
    known second-level public suffix (``co.uk`` & co. —
    :data:`_SECOND_LEVEL_SUFFIXES`). ``https://news.bbc.co.uk/x`` →
    ``bbc.co.uk``; ``http://a.b.example.com`` → ``example.com``. IPs and
    single-label hosts pass through unchanged."""
    h = host_expr(url)
    parts = F.split(h, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    last3 = F.concat_ws(
        ".", F.element_at(parts, -3), F.element_at(parts, -2), F.element_at(parts, -1)
    )
    is_ip = h.rlike(r"^[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+$")
    two_level = F.element_at(
        F.create_map(
            *[x for s in _SECOND_LEVEL_SUFFIXES for x in (F.lit(s), F.lit(True))]
        ),
        last2,
    ).isNotNull()
    return (
        F.when(h.isNull() | is_ip | (n <= 2), h)
        .when(two_level & (n >= 3), last3)
        .otherwise(last2)
    )


def domain_stats(df: DataFrame, url_col: str) -> DataFrame:
    """Per-registered-domain document counts and corpus share — the skew
    audit run before capping. One map-side-combined aggregate; output is
    domain-cardinality-bounded. NULL domains (non-URL strings) group
    together as the parse-failure bucket."""
    dom = registered_domain_expr(F.col(url_col)).alias("domain")
    counts = df.select(dom).groupBy("domain").agg(F.count(F.lit(1)).alias("n_docs"))
    # single-partition window over the domain-bounded aggregate only
    total = F.sum("n_docs").over(Window.partitionBy())
    return counts.select(
        "domain",
        "n_docs",
        (F.col("n_docs") / total).alias("share"),
    )


def cap_per_domain(
    df: DataFrame,
    url_col: str,
    key_col: str,
    max_per_domain: int,
    seed: str = "",
) -> DataFrame:
    """Keep at most ``max_per_domain`` documents per registered domain,
    chosen by the seeded portable-hash rank (deterministic, partition- and
    run-invariant — the same contract as
    :func:`~gluestick_spark.llm.sampling.stratified_sample`, which this
    delegates to). Smaller domains pass through whole. The crawl-skew
    remedy: one keyed window, and the heaviest keys are precisely the ones
    the cap truncates."""
    from .sampling import stratified_sample

    tagged = df.withColumn("__domain__", registered_domain_expr(F.col(url_col)))
    return stratified_sample(
        tagged, key_col, ["__domain__"], max_per_domain, seed=seed
    ).drop("__domain__")
