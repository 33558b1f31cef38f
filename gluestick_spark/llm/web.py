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

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "parse_url_expr",
    "host_expr",
    "registered_domain_expr",
    "with_registered_domain",
    "domain_stats",
    "cap_per_domain",
    "canonical_url_expr",
    "url_dedup",
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


def with_registered_domain(
    df: DataFrame,
    url_col: str,
    out_col: str = "domain",
    suffixes: Optional[DataFrame] = None,
) -> DataFrame:
    """Append the registrable-domain column. With ``suffixes=None`` this is
    :func:`registered_domain_expr` (pure codegen, 20-suffix approximation).
    Passing a ``suffixes`` DataFrame (single string column ``suffix``,
    e.g. the full Mozilla Public Suffix List — a data file, so it arrives
    as data) switches to exact-PSL semantics: the host's 3-label and
    2-label tails are matched against the table with two broadcast hash
    joins (longest match wins) and the registrable domain is one label
    longer than the matched public suffix. The PSL is ~10k rows — always
    broadcastable; no shuffle is added to the scan side.

    Matching depth covers 1–3-label public suffixes, which is the entire
    PSL ICANN section in practice (wildcard ``*.ck``-style rules are not
    modeled; documented limitation)."""
    if suffixes is None:
        return df.withColumn(out_col, registered_domain_expr(F.col(url_col)))

    sfx = F.broadcast(
        suffixes.select(F.lower(F.col("suffix")).alias("suffix")).distinct()
    )
    h = host_expr(F.col(url_col))
    parts = F.split(h, r"\.")
    n = F.size(parts)
    is_ip = h.rlike(r"^[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+$")

    def tail(k: int) -> Column:
        return F.when(
            n >= k, F.concat_ws(".", F.slice(parts, n - k + 1, k))
        )

    base = df.withColumn("__host__", h).withColumn(
        "__t1__", tail(1)
    ).withColumn("__t2__", tail(2)).withColumn("__t3__", tail(3))
    # longest-match: try the 3-label tail, then 2-label, then 1-label
    j3 = sfx.withColumnRenamed("suffix", "__s3__")
    j2 = sfx.withColumnRenamed("suffix", "__s2__")
    j1 = sfx.withColumnRenamed("suffix", "__s1__")
    joined = (
        base.join(j3, base["__t3__"] == j3["__s3__"], "left")
        .join(j2, base["__t2__"] == j2["__s2__"], "left")
        .join(j1, base["__t1__"] == j1["__s1__"], "left")
    )
    plen = (
        F.when(F.col("__s3__").isNotNull(), 3)
        .when(F.col("__s2__").isNotNull(), 2)
        .when(F.col("__s1__").isNotNull(), 1)
    )
    # registrable = suffix + one more label; hosts that ARE a bare public
    # suffix, IPs, and single-label hosts pass through unchanged
    reg = F.when(
        F.col("__host__").isNull() | is_ip | plen.isNull(), F.col("__host__")
    ).otherwise(
        F.when(
            n > plen,
            F.concat_ws(".", F.slice(parts, n - plen, plen + 1)),
        ).otherwise(F.col("__host__"))
    )
    return joined.withColumn(out_col, reg).drop(
        "__host__", "__t1__", "__t2__", "__t3__", "__s1__", "__s2__", "__s3__"
    )


def domain_stats(df: DataFrame, url_col: str) -> DataFrame:
    """Per-registered-domain document counts and corpus share — the skew
    audit run before capping. One map-side-combined aggregate; output is
    domain-cardinality-bounded. NULL domains (non-URL strings) group
    together as the parse-failure bucket.

    The corpus total rides a separate 1-row aggregate joined back with
    ``crossJoin(broadcast(...))`` — NOT an unpartitioned window, which
    would funnel the whole domain aggregate (tens of millions of rows on
    a real crawl) through a single task (same pattern as
    ``llm/text.py`` unigram NLL totals)."""
    dom = registered_domain_expr(F.col(url_col)).alias("domain")
    counts = df.select(dom).groupBy("domain").agg(F.count(F.lit(1)).alias("n_docs"))
    totals = counts.agg(F.sum("n_docs").alias("__total__"))
    return counts.crossJoin(F.broadcast(totals)).select(
        "domain",
        "n_docs",
        (F.col("n_docs") / F.col("__total__")).alias("share"),
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


# Tracking-parameter patterns dropped by canonicalization (matched against
# the full "name=value" token, anchored): the ubiquitous analytics/click
# identifiers that create spurious URL diversity in a crawl frontier.
_TRACKING_PARAM_RE = r"^(?:utm_[^=]*|gclid|fbclid|igshid|mc_[^=]*|ref)(=|$)"

_PORT_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?[^/:?#]+:([0-9]+)"


def canonical_url_expr(url: Column) -> Column:
    """Canonical form of an absolute URL — the dedup key that makes
    ``https://WWW.Site.com:443/p/1/?utm_source=x&id=1#top`` and
    ``https://www.site.com/p/1?id=1`` the same page. Rules (each a
    documented choice, all pure regexp/array codegen — no UDF, portable
    to any RE2/PCRE engine):

    * scheme and host lowercased; userinfo (``u@``) dropped;
    * default ports stripped (``:80`` for http, ``:443`` for https) —
      other ports kept;
    * fragment dropped;
    * tracking parameters dropped (:data:`_TRACKING_PARAM_RE` — utm_*,
      gclid, fbclid, igshid, mc_*, ref), remaining query params SORTED
      (param order never changes the resource);
    * trailing slashes stripped from the path (``/p/`` ≡ ``/p``; the
      bare-root ``/`` collapses into the empty path);
    * ``www.`` is KEPT — unlike :func:`host_expr`, canonicalization
      preserves host identity (www vs apex CAN serve different content;
      registered-domain grouping is the coarser tool for that).

    Non-URL strings canonicalize to NULL (same parse-failure contract as
    :func:`parse_url_expr`) — callers decide whether NULL rows pass
    through (see :func:`url_dedup`).
    """
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    host = F.lower(F.regexp_extract(url, _HOST_RE, 1))
    port = F.regexp_extract(url, _PORT_RE, 1)
    path = F.regexp_extract(url, _PATH_RE, 1)
    query = F.regexp_extract(url, _QUERY_RE, 1)

    path_n = F.regexp_replace(path, "/+$", "")
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_PARAM_RE),
    )
    qs = F.concat_ws("&", F.array_sort(params))
    keep_port = (port != "") & ~(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    port_part = F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit(""))
    q_part = F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit(""))
    return F.when(
        host != "",
        F.concat(scheme, F.lit("://"), host, port_part, path_n, q_part),
    )


def url_dedup(
    df: DataFrame,
    url_col: str,
    id_col: str,
    canon_col: str = "canonical_url",
) -> DataFrame:
    """Keep exactly ONE row per canonical URL — the crawl-frontier /
    corpus dedup that collapses tracking-parameter, fragment, port, case
    and slash variants of the same page. The winner is the row with the
    SMALLEST ``id_col`` (deterministic, partition-invariant). Rows whose
    URL cannot be parsed (NULL canonical) are all KEPT — a parse failure
    is not evidence of duplication (same unjudgeable-row contract as
    ``containment_pairs``).

    Output: the surviving rows plus ``canon_col``. Scale shape: one
    narrow canonicalization projection, ONE keyed aggregate on the
    canonical URL, and one keyed join back — no windows, no skew trap
    (the canonical-URL key is near-unique by construction; the NULL
    group never enters the join).
    """
    tagged = df.withColumn(canon_col, canonical_url_expr(F.col(url_col)))
    winners = (
        tagged.where(F.col(canon_col).isNotNull())
        .groupBy(canon_col)
        .agg(F.min(id_col).alias("__w__"))
    )
    kept = tagged.join(
        winners,
        (tagged[canon_col] == winners[canon_col])
        & (tagged[id_col] == winners["__w__"]),
        "left_semi",
    )
    return kept.unionByName(tagged.where(F.col(canon_col).isNull()))
