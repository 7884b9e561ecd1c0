"""URL canonicalization (functions/urls.py) — unit + oracle certification.

Web-corpus URL-level dedup precursor: canonicalize crawl-URL variants
before grouping. Reference analog: the reference keys features by stable
ids before dedup (planet-vector-tile src/manifest.rs); here the stable
key for a web page is its canonical URL.
"""

import pytest

from pvt_spark.functions.urls import canonical_url


CASES = [
    # (raw, canonical)
    ("HTTPS://WWW.Site.COM:443/p/?utm_source=x", "https://site.com/p"),
    ("https://site.com/p", "https://site.com/p"),
    ("http://Example.org:80/a/b/", "http://example.org/a/b"),
    ("https://example.org/a?q=1&utm_medium=mail", "https://example.org/a?q=1"),
    ("https://example.org/a?utm_source=f&q=1", "https://example.org/a?q=1"),
    ("https://example.org/a#frag", "https://example.org/a"),
    ("https://example.org/", "https://example.org"),
    # non-default port survives; path case is significant
    ("https://example.org:8080/Path", "https://example.org:8080/Path"),
    # utm stripping is boundary-anchored: a utm_ substring mid-path or
    # inside another parameter's name/value is never touched
    ("https://example.org/a?xutm_a=1&b=2", "https://example.org/a?xutm_a=1&b=2"),
    ("https://example.org/fooutm_bar/a", "https://example.org/fooutm_bar/a"),
    ("https://example.org/a?k=vutm_x&b=2", "https://example.org/a?k=vutm_x&b=2"),
    # consecutive utm runs collapse in one pass; all-utm query vanishes
    ("https://example.org/a?utm_a=1&utm_b=2&c=3", "https://example.org/a?c=3"),
    ("https://example.org/a?utm_a=1&utm_b=2", "https://example.org/a"),
    ("https://example.org/a?c=3&utm_a=1&utm_b=2", "https://example.org/a?c=3"),
]


def test_canonical_url_cases(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], ["url"])
    out = [
        r.c for r in df.select(canonical_url(df.url).alias("c")).collect()
    ]
    assert out == [c for _, c in CASES]


def test_canonical_url_idempotent(spark):
    df = spark.createDataFrame([(c,) for _, c in CASES], ["url"])
    out = [
        r.c for r in df.select(canonical_url(df.url).alias("c")).collect()
    ]
    assert out == [c for _, c in CASES]


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001"])
def test_q38_matches_duckdb_oracle(spark, sf_dir):
    from pvt_spark.queries import compare_against_oracle

    res = compare_against_oracle(spark, sf_dir, names={"q38_url_canonical"})
    assert res["q38_url_canonical"].get("match") is True, res


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001"])
def test_q45_host_stats_matches_duckdb_oracle(spark, sf_dir):
    """Domain-level rollup over the canonical-URL chain (q45)."""
    from pvt_spark.queries import compare_against_oracle, q45_host_stats

    res = compare_against_oracle(spark, sf_dir, names={"q45_host_stats"})
    assert res["q45_host_stats"].get("match") is True, res
    # host extraction drops ports/paths: every host is siteN.example.com
    hosts = [r.host for r in q45_host_stats(spark, sf_dir).collect()]
    assert all(h.startswith("site") and h.endswith(".example.com") for h in hosts)


# -- property: canonical_url is a PROJECTION on well-formed crawl URLs
# (f(f(u)) == f(u)) — the contract that makes it safe as a dedup key.
# Labels may contain 'utm' lookalikes (the stripper is anchored to a
# [?&]utm_ boundary and generated labels carry no underscore, so only
# the designated utm_* keys are ever stripped); 'www' stays excluded —
# a www.www.x host legitimately canonicalizes in two steps.

from hypothesis import given, settings
from hypothesis import strategies as st

_label = st.from_regex(r"[a-zA-Z][a-zA-Z0-9]{0,8}", fullmatch=True).filter(
    lambda s: "www" not in s.lower()
)


@st.composite
def _urls(draw):
    scheme = draw(st.sampled_from(["http", "https", "HTTP", "HTTPS", "hTtPs"]))
    www = draw(st.sampled_from(["", "www.", "WWW."]))
    host = ".".join(draw(st.lists(_label, min_size=1, max_size=3)))
    port = draw(st.sampled_from(["", ":80", ":443", ":8080", ":81"]))
    path = "".join("/" + draw(_label) for _ in range(draw(st.integers(0, 3))))
    slash = draw(st.sampled_from(["", "/"]))
    n_params = draw(st.integers(0, 4))
    params = []
    for _ in range(n_params):
        key = draw(
            st.one_of(
                _label,
                st.sampled_from(["utm_source", "utm_medium", "utm_campaign"]),
            )
        )
        params.append(f"{key}={draw(_label)}")
    query = "?" + "&".join(params) if params else draw(st.sampled_from(["", "?"]))
    frag = draw(st.sampled_from(["", "#x", "#frag1"]))
    return f"{scheme}://{www}{host}{port}{path}{slash}{query}{frag}"


@settings(max_examples=5, deadline=None)
@given(st.lists(_urls(), min_size=40, max_size=40))
def test_canonical_url_idempotent_on_crawl_urls(spark, urls):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    out = df.select(
        "url",
        canonical_url(F.col("url")).alias("c1"),
        canonical_url(canonical_url(F.col("url"))).alias("c2"),
    ).collect()
    bad = [(r.url, r.c1, r.c2) for r in out if r.c1 != r.c2]
    assert not bad, bad[:5]
