"""Integer bigram LM surprise (q65): hand-computed golden on a tiny
corpus, OOV behavior, short-doc guard, and the oracle at both scales."""

import pytest
from pyspark.sql import functions as F


def test_lm_surprise_hand_golden(spark, tmp_path):
    """Train on docs 0-1, score all. Counts verified by hand."""
    import os

    rows = [
        (0, "a b a b"),      # train: bigrams ab, ba, ab
        (1, "a c"),          # train: bigram ac
        (200, "a b"),        # test: in-LM bigram
        (201, "z z"),        # test: fully OOV
        (202, "a"),          # test: too short -> 0 bigrams
    ]
    # write a fake sf dir so the query's doc_id<200 train split applies
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{sf}/documents.parquet"
    )
    from pvt_spark.queries import q65_lm_surprise

    out = {
        r.doc_id: (r.n_bigrams, r.avg_surprise_milli)
        for r in q65_lm_surprise(spark, sf).collect()
    }
    # train stats: uni a=3, b=2, c=1 -> V=3; bi: 'a b'=2, 'b a'=1, 'a c'=1
    # doc 200 'a b': (c1(a)=3 + 3) * 1000 // (c12=2 + 1) = 2000
    assert out[200] == (1, 2000)
    # doc 201 'z z': (0 + 3) * 1000 // (0 + 1) = 3000
    assert out[201] == (1, 3000)
    # doc 202: no bigram
    assert out[202] == (0, 0)
    # train docs are scored too (they are part of the corpus):
    # doc 0: bigrams ab,ba,ab -> (6000//3 + 5000//2 + 6000//3) // 3 = 2166
    assert out[0] == (3, (2000 + 2500 + 2000) // 3)
    # doc 1: ac -> (3+3)*1000 // (1+1) = 3000
    assert out[1] == (1, 3000)


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_q65_oracle(spark, sf_dir):
    from pvt_spark.queries import compare_against_oracle

    res = compare_against_oracle(spark, sf_dir, names={"q65_lm_surprise"})
    assert res["q65_lm_surprise"].get("match") is True, res
