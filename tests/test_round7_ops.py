"""Round-7 additions: web-corpus URL operators (llm/web.py) — domain
extraction, per-domain stats, per-domain capping."""

from __future__ import annotations

from pyspark.sql import functions as F

from gluestick_spark.llm.web import (
    cap_per_domain,
    domain_stats,
    host_expr,
    parse_url_expr,
    registered_domain_expr,
)

# ------------------------------------------------------------- parsing ----


def test_parse_url_components(spark):
    urls = [
        "https://www.Example.COM/a/b?q=1#frag",
        "http://user:pw@host.org:8080/path",
        "ftp://files.example.net",
        "not a url at all",
        None,
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [
        (r.p.scheme, r.p.host, r.p.path, r.p.query)
        for r in df.select(parse_url_expr(F.col("url")).alias("p")).collect()
    ]
    assert got[0] == ("https", "www.example.com", "/a/b", "q=1")
    assert got[1] == ("http", "host.org", "/path", None)  # userinfo+port stripped
    assert got[2] == ("ftp", "files.example.net", None, None)
    assert got[3] == (None, None, None, None)
    assert got[4] == (None, None, None, None)


def test_host_and_registered_domain(spark):
    cases = [
        ("https://www.example.com/x", "example.com", "example.com"),
        ("https://a.b.news.example.com/x", "a.b.news.example.com", "example.com"),
        ("https://news.bbc.co.uk/story", "news.bbc.co.uk", "bbc.co.uk"),
        ("https://bbc.co.uk/", "bbc.co.uk", "bbc.co.uk"),
        ("https://localhost/x", "localhost", "localhost"),
        ("https://192.168.0.1/raw", "192.168.0.1", "192.168.0.1"),
        ("junk", None, None),
    ]
    df = spark.createDataFrame([(u,) for u, _, _ in cases], "url string")
    got = df.select(
        host_expr(F.col("url")).alias("h"),
        registered_domain_expr(F.col("url")).alias("d"),
    ).collect()
    for (url, want_h, want_d), r in zip(cases, got):
        assert r.h == want_h, url
        assert r.d == want_d, url


# --------------------------------------------------------------- stats ----


def test_domain_stats_counts_and_share(spark):
    urls = (
        ["https://www.a.com/%d" % i for i in range(6)]
        + ["https://sub.b.co.uk/%d" % i for i in range(3)]
        + ["bogus"]
    )
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {r.domain: (r.n_docs, r.share) for r in domain_stats(df, "url").collect()}
    assert got["a.com"][0] == 6 and got["b.co.uk"][0] == 3 and got[None][0] == 1
    assert abs(sum(s for _, s in got.values()) - 1.0) < 1e-12


# ------------------------------------------------------------- capping ----


def test_cap_per_domain_caps_and_is_deterministic(spark):
    rows = [
        (i, f"https://big.com/{i}") for i in range(40)
    ] + [(100 + i, f"https://small.org/{i}") for i in range(3)]
    df = spark.createDataFrame(rows, "id long, url string")
    out = cap_per_domain(df, "url", "id", max_per_domain=10)
    got = sorted(r.id for r in out.collect())
    assert len([i for i in got if i < 100]) == 10  # big.com capped
    assert [i for i in got if i >= 100] == [100, 101, 102]  # small intact
    # deterministic + partition-invariant
    again = sorted(r.id for r in cap_per_domain(df.repartition(7), "url", "id", 10).collect())
    assert again == got
    # different seed draws a different (but equally sized) subset
    other = sorted(r.id for r in cap_per_domain(df, "url", "id", 10, seed="s2").collect())
    assert len(other) == len(got) and other != got


def test_cap_per_domain_keeps_schema(spark):
    df = spark.createDataFrame([(1, "https://x.com/1", "p")], "id long, url string, x string")
    out = cap_per_domain(df, "url", "id", 5)
    assert out.columns == ["id", "url", "x"]
