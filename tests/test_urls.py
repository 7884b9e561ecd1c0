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
