"""Property tests for the BPE kernel and the Bloom filter core — pure
driver-side (no Spark), so hypothesis can run hundreds of cases."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pvt_spark.functions.bpe import (
    _merge_once,
    encode_word,
    learn_merges_from_counts,
)
from pvt_spark.operators.bloom import BloomFilter, _positions

words = st.text(alphabet="abcd", min_size=0, max_size=12)


@settings(max_examples=300, deadline=None)
@given(st.dictionaries(words.filter(lambda w: w), st.integers(1, 50),
                       min_size=1, max_size=8),
       st.integers(0, 30))
def test_bpe_lossless_and_deterministic(freqs, n_merges):
    merges = learn_merges_from_counts(freqs, n_merges)
    assert merges == learn_merges_from_counts(freqs, n_merges)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in list(freqs) + ["dcba", "aaaaaaa", ""]:
        toks = encode_word(w, ranks)
        # losslessness: concatenation always reconstructs the word
        assert "".join(toks) == w
        # every token is either a single char or a learned merge result
        vocab = {"a", "b", "c", "d"}
        for a, b in merges:
            vocab.add(a + b)
        assert all(t in vocab for t in toks)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(alphabet="ab", min_size=1, max_size=6),
                min_size=1, max_size=20),
       st.integers(1, 40))
def test_bpe_rank_monotonicity_invariant(ws, n_merges):
    """A pair containing a merged symbol always ranks AFTER the merge
    that created it — the invariant the q59 oracle-equivalence proof
    rests on."""
    freqs = {}
    for w in ws:
        freqs[w] = freqs.get(w, 0) + 1
    merges = learn_merges_from_counts(freqs, n_merges)
    created_at = {}
    for i, (a, b) in enumerate(merges):
        created_at[a + b] = i
        assert created_at.get(a, -1) < i and created_at.get(b, -1) < i


def test_merge_once_overlaps():
    assert _merge_once(tuple("aaa"), "a", "a") == ("aa", "a")
    assert _merge_once(tuple("aaaa"), "a", "a") == ("aa", "aa")
    assert _merge_once(tuple("bab"), "a", "b") == ("b", "ab")


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(-2**62, 2**62), min_size=1, max_size=200,
                unique=True),
       st.integers(1, 8))
def test_bloom_bitmap_no_false_negative_property(hashes, k):
    """Core bitmap property, independent of Spark: every inserted
    (h1, h2) probes positive after build."""
    m = 1024
    h1 = np.array(hashes, dtype=np.int64)
    h2 = (h1 * np.int64(2654435761)) ^ np.int64(7)
    bitmap = np.zeros(m // 64, dtype=np.uint64)
    pos = _positions(h1, h2, k, m).ravel()
    np.bitwise_or.at(bitmap, (pos >> np.uint64(6)).astype(np.int64),
                     np.uint64(1) << (pos & np.uint64(63)))
    bf = BloomFilter(bitmap=bitmap, n_bits=m, n_hashes=k)
    pos2 = _positions(h1, h2, k, m)
    bits = (bf.bitmap[(pos2 >> np.uint64(6)).astype(np.int64)]
            >> (pos2 & np.uint64(63))) & np.uint64(1)
    assert bool(bits.all())
    # and serialization preserves every answer
    back = BloomFilter.from_bytes(bf.to_bytes())
    assert np.array_equal(back.bitmap, bf.bitmap)
