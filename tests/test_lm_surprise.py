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


def test_vocab_cap_on_high_entropy_corpus(spark):
    """VERDICT r5 item 5: the broadcast vocabulary caps. A synthetic
    high-entropy corpus (every word unique hex) would make the count
    tables corpus-sized; with caps the tables stay K-sized and capped-
    out grams count as unseen -> maximum surprise (the conservative
    quality-filter direction)."""
    from pvt_spark.queries import lm_surprise_scores
    import pyspark.sql.functions as F

    docs = spark.range(300).selectExpr(
        "id as doc_id",
        # 12 unique hex 'words' per doc: vocabulary ~ corpus size
        "concat_ws(' ', transform(sequence(0, 11),"
        " i -> hex(xxhash64(id, i)))) as text",
    )
    capped = lm_surprise_scores(
        docs, max_unigrams=100, max_bigrams=100
    ).collect()
    assert len(capped) == 300
    # V is the CAPPED vocab; every scored bigram is unseen under the
    # capped tables except the top-100, so surprise is at its unseen
    # ceiling (c1=0, c12=0 -> V * 1000) for out-of-cap docs
    by_doc = {r.doc_id: r for r in capped}
    assert all(r.n_bigrams == 11 for r in capped)
    assert max(r.avg_surprise_milli for r in capped) <= 100_000 + 100
    # uncapped == declared q65 semantics on the same frame
    uncapped = lm_surprise_scores(docs).collect()
    assert len(uncapped) == 300
    # caps change scores only via V and unseen fallback, never row count
    assert {r.doc_id for r in uncapped} == set(by_doc)
