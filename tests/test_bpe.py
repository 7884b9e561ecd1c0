"""Learned BPE tokenizer: hand-computed merge goldens, encode kernel
goldens, losslessness, DataFrame path parity, and the q59 oracle."""

import pytest
from pyspark.sql import functions as F

from pvt_spark.functions.bpe import (
    bpe_encode,
    bpe_learn,
    encode_word,
    learn_merges_from_counts,
)

# the classic BPE teaching corpus — pair counts verified by hand:
# (e,s)=9 and (s,t)=9 tie, lex break picks (e,s); then (es,t)=9 wins
_WF = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_learn_merges_hand_golden():
    merges = learn_merges_from_counts(_WF, 2)
    assert merges == [("e", "s"), ("es", "t")]
    # full run saturates and stops at min_count, deterministically
    a = learn_merges_from_counts(_WF, 100)
    b = learn_merges_from_counts(_WF, 100)
    assert a == b and a[:2] == merges


def test_encode_word_golden_and_lossless():
    merges = learn_merges_from_counts(_WF, 2)
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_word("newest", ranks) == ["n", "e", "w", "est"]
    assert encode_word("lowest", ranks) == ["l", "o", "w", "est"]
    assert encode_word("", ranks) == []
    # unknown characters pass through untouched; concatenation is
    # always lossless
    for w in ("newest", "zzz", "estest", "wetsuit"):
        assert "".join(encode_word(w, ranks)) == w


def test_encode_overlapping_occurrences():
    # "aaaa" with merge (a,a): non-overlapping left-to-right -> [aa, aa]
    assert encode_word("aaaa", {("a", "a"): 0}) == ["aa", "aa"]
    assert encode_word("aaa", {("a", "a"): 0}) == ["aa", "a"]
    # a later merge over the created symbol applies next
    assert encode_word("aaaa", {("a", "a"): 0, ("aa", "aa"): 1}) == ["aaaa"]


def test_bpe_dataframe_path_matches_kernel(spark):
    docs = spark.createDataFrame(
        [
            (0, "low lower newest"),
            (1, "widest low low newest"),
            (2, None),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    merges = bpe_learn(docs, 6)
    # distributed word-count learning == driver-side learning on the
    # same frequencies
    wf = {"low": 3, "lower": 1, "newest": 2, "widest": 1}
    assert merges == learn_merges_from_counts(wf, 6)

    ranks = {p: i for i, p in enumerate(merges)}
    got = {r.doc_id: r.toks for r in bpe_encode(docs, merges, out_col="toks").collect()}
    for doc_id, text in [(0, "low lower newest"), (1, "widest low low newest")]:
        want = [s for w in text.split() for s in encode_word(w, ranks)]
        assert got[doc_id] == want
    assert got[2] == [] and got[3] == []


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_q59_oracle(spark, sf_dir):
    """The engine path (merge-all pandas kernel) matches the
    independent scalar replay (leftmost-single-occurrence) exactly."""
    from pvt_spark.queries import compare_against_oracle

    res = compare_against_oracle(spark, sf_dir, names={"q59_bpe_subword"})
    assert res["q59_bpe_subword"].get("match") is True, res


def test_unicode_whitespace_parity(spark):
    """ADVICE r5: the learn-side JVM splitter and the encode-side Python
    str.split() must tokenize identically — including non-ASCII
    whitespace (NBSP, EM SPACE, NEL, file separators)."""
    from pvt_spark.functions.bpe import bpe_encode, bpe_learn

    texts = [
        "aa\xa0bb aa bb　aa",      # nbsp, em space, ideographic
        "cc\x85dd\x1ccc\x1fdd",              # NEL + file/unit separators
        "aa bb aa bb cc dd cc",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    merges = bpe_learn(df, n_merges=4, min_count=2)
    # driver-side replay with Python split on the SAME corpus
    from pvt_spark.functions.bpe import learn_merges_from_counts

    counts: dict = {}
    for t in texts:
        for w in t.lower().split():
            counts[w] = counts.get(w, 0) + 1
    assert merges == learn_merges_from_counts(counts, 4, min_count=2)
    # encode agrees with a scalar replay token-for-token
    enc = {r.doc_id: r.bpe for r in bpe_encode(df, merges).collect()}
    from pvt_spark.functions.bpe import encode_word

    ranks = {p: i for i, p in enumerate(merges)}
    for i, t in enumerate(texts):
        want = []
        for w in t.lower().split():
            want.extend(encode_word(w, ranks))
        assert enc[i] == want, i
