"""Gopher-style repetition filters (q42) and cross-document duplicated
8-gram spans (q43) — hand-computed unit cases + DuckDB oracle
certification.

Reference analog: the reference dedups tag strings per tile
(planet-vector-tile src/tile/mod.rs interner); here the repetition
signals operate on the web-corpus text column, the standard
quality-filter pass of a training-data pipeline (Rae et al. 2021 App. A;
Lee et al. 2022 for the cross-document span shape).
"""

import pytest

from pvt_spark.queries import q42_repetition_quality, q43_crossdoc_ngrams


@pytest.fixture()
def docs_dir(spark, tmp_path):
    rows = [
        # "a b" x3: 2-grams {a b:3, b a:2} -> top 600, dup 1000;
        # 5-grams two singletons -> top 500, dup 0
        (0, "a b a b a b", "en", "src0", 11),
        # short doc: one bigram, no 5-grams
        (1, "x y", "en", "src0", 3),
        # 2 and 3 share exactly one 8-gram span; 4 shares none
        (2, "w1 w2 w3 w4 w5 w6 w7 w8 tail2", "en", "src0", 29),
        (3, "head3 w1 w2 w3 w4 w5 w6 w7 w8", "en", "src0", 29),
        (4, "u1 u2 u3 u4 u5 u6 u7 u8 u9", "en", "src0", 26),
    ]
    df = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_q42_hand_computed(spark, docs_dir):
    out = {
        r["doc_id"]: r.asDict()
        for r in q42_repetition_quality(spark, docs_dir).collect()
    }
    assert out[0] == {
        "doc_id": 0,
        "top_bigram_milli": 600,
        "dup_bigram_milli": 1000,
        "top_5gram_milli": 500,
        "dup_5gram_milli": 0,
    }
    # single bigram occurs once: top 1000, nothing duplicated, no 5-grams
    assert out[1] == {
        "doc_id": 1,
        "top_bigram_milli": 1000,
        "dup_bigram_milli": 0,
        "top_5gram_milli": 0,
        "dup_5gram_milli": 0,
    }
    assert set(out) == {0, 1, 2, 3, 4}


def test_q43_hand_computed(spark, docs_dir):
    out = {
        r["doc_id"]: r.asDict()
        for r in q43_crossdoc_ngrams(spark, docs_dir).collect()
    }
    # docs 2 and 3 each have two distinct 8-grams, exactly one shared
    assert out == {
        2: {"doc_id": 2, "n_grams": 2, "shared_grams": 1, "shared_milli": 500},
        3: {"doc_id": 3, "n_grams": 2, "shared_grams": 1, "shared_milli": 500},
    }


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001"])
def test_q42_q43_match_duckdb_oracle(spark, sf_dir):
    from pvt_spark.queries import compare_against_oracle

    res = compare_against_oracle(
        spark, sf_dir, names={"q42_repetition_quality", "q43_crossdoc_ngrams"}
    )
    for name, rec in res.items():
        assert rec.get("match") is True, (name, rec)


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001"])
def test_q47_stratified_sample(spark, sf_dir):
    """Deterministic stratified sampling: oracle parity + invariants."""
    from pvt_spark.queries import (
        _Q47_RATES,
        compare_against_oracle,
        q47_stratified_sample,
    )

    res = compare_against_oracle(spark, sf_dir, names={"q47_stratified_sample"})
    assert res["q47_stratified_sample"].get("match") is True, res
    rows = {r.lang: r for r in q47_stratified_sample(spark, sf_dir).collect()}
    for lang, r in rows.items():
        assert 0 <= r.n_kept <= r.n_docs
        assert r.rate_milli == _Q47_RATES.get(lang, 0)
        # rate 1000 keeps everything; rate 0 keeps nothing
        if r.rate_milli == 1000:
            assert r.n_kept == r.n_docs
    # determinism: a second run returns the identical table
    again = {r.lang: r for r in q47_stratified_sample(spark, sf_dir).collect()}
    assert {k: tuple(v) for k, v in rows.items()} == {
        k: tuple(v) for k, v in again.items()
    }
