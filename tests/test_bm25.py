"""BM25-style retrieval (q44) — hand-computed unit case + DuckDB
oracle certification.

Exact-integer BM25 variant (k1=1.2, b=0.75; rational rarity weight in
place of the log idf — documented in the query docstring) over the
web-corpus documents table: the inverted-index posting-fetch shape of
a training-data retrieval/curation pass.
"""

import pytest

from pvt_spark.queries import _Q44_TERMS, q44_bm25_topk


@pytest.fixture()
def docs_dir(spark, tmp_path):
    rows = [
        # doc 0: 'spark' twice in 4 words; doc 1: one hit in 8 words;
        # doc 2: no query terms; doc 3: all three terms in 6 words
        (0, "spark x spark y", "en", "src0", 15),
        (1, "a b c d hash e f g", "en", "src0", 17),
        (2, "nothing relevant here at all", "en", "src0", 28),
        (3, "spark hash window pad pad pad", "en", "src0", 29),
    ]
    df = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def _score(tf: int, dl: int, df_t: int, n_docs: int, avgdl_milli: int) -> int:
    idf_milli = (n_docs - df_t + 1) * 1000 // (df_t + 1)
    l_milli = dl * 1_000_000 // avgdl_milli
    denom = tf * 1000 + (1200 * (250 + (750 * l_milli) // 1000)) // 1000
    return idf_milli * ((tf * 2200 * 1000) // denom) // 1000


def test_q44_hand_computed(spark, docs_dir):
    assert _Q44_TERMS == ("spark", "hash", "window")
    out = [r.asDict() for r in q44_bm25_topk(spark, docs_dir).collect()]
    n_docs, avgdl_milli = 4, (4 + 8 + 5 + 6) * 1000 // 4
    want = {
        0: _score(2, 4, 2, n_docs, avgdl_milli),
        1: _score(1, 8, 2, n_docs, avgdl_milli),
        3: (
            _score(1, 6, 2, n_docs, avgdl_milli)  # spark
            + _score(1, 6, 2, n_docs, avgdl_milli)  # hash
            + _score(1, 6, 1, n_docs, avgdl_milli)  # window
        ),
    }
    got = {r["doc_id"]: r["score_milli"] for r in out}
    assert got == want
    # doc 2 never scores; ranks are dense and ordered by score desc
    assert [r["doc_id"] for r in out] == sorted(
        want, key=lambda d: (-want[d], d)
    )
    assert [r["rank"] for r in out] == [1, 2, 3]
    assert {r["doc_id"]: r["matched_terms"] for r in out} == {0: 1, 1: 1, 3: 3}


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001"])
def test_q44_matches_duckdb_oracle(spark, sf_dir):
    from pvt_spark.queries import compare_against_oracle

    res = compare_against_oracle(spark, sf_dir, names={"q44_bm25_topk"})
    assert res["q44_bm25_topk"].get("match") is True, res
