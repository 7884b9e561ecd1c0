"""Learned byte-pair-encoding subword tokenizer as distributed operators.

The reference engine has no tokenizer (planet-vector-tile is a tile
builder); this module is part of the training-data surface the graft
adds on top (SURVEY.md §2.9): token counting that matches what a real
training pipeline measures requires a *learned merge table*, not a
regex class splitter (q32 keeps the regex splitter; q59 certifies this
module against a DuckDB/Python replay of the same merge table by an
independently-written scalar implementation).

Scale design — why this survives 100 TB:

- **Learning reads the word-frequency table, not the corpus.** Classic
  BPE statistics factor through word counts: ONE groupBy shuffle builds
  ``(word, freq)``; by Heaps' law the distinct vocabulary is tiny
  relative to the corpus, so the merge loop runs driver-side over that
  table (bounded by ``max_words``, deterministic top-by-frequency). At
  planet scale you additionally learn on a document sample — pass a
  pre-sampled DataFrame.
- **Encoding is embarrassingly parallel.** The merge-rank table (a few
  hundred entries) broadcasts; one Arrow-batched pandas UDF pass
  encodes, memoizing per distinct word (the same Heaps'-law skew means
  most batch rows hit the cache). No shuffle, no driver round-trips.

Determinism: merge selection ties break on ``(-count, pair)``; no RNG
anywhere, so learn + encode replay bit-identically across runs and
partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

# The learn-side (JVM regex) splitter must agree with the encode-side
# Python ``str.split()`` on EVERY input, or a document with exotic
# whitespace tokenizes differently at learn vs encode time (ADVICE r5).
# Java's \s is ASCII-only, and even (?U)\s misses U+001C-001F, so the
# class below enumerates exactly the characters Python str.isspace()
# accepts for str (tested: test_bpe.py::test_unicode_whitespace_parity).
_WORD_SPLIT = (
    "[\\t\\n\\x0B\\f\\r\\x1C-\\x1F \\x85\\xA0\\u1680\\u2000-\\u200A"
    "\\u2028\\u2029\\u202F\\u205F\\u3000]+"
)


def _merge_once(syms: tuple, a: str, b: str) -> tuple:
    """Merge every non-overlapping (a, b) occurrence left-to-right."""
    out = []
    i = 0
    n = len(syms)
    while i < n:
        if i < n - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def learn_merges_from_counts(
    word_freq: dict[str, int], n_merges: int, min_count: int = 2
) -> list[tuple[str, str]]:
    """Driver-side merge learning over a word-frequency table: repeat
    ``n_merges`` times — count adjacent symbol pairs weighted by word
    frequency, merge the most frequent pair (ties break to the
    lexicographically smallest pair). Stops early when no pair reaches
    ``min_count``. Words never merge across their boundaries."""
    vocab: dict[tuple, int] = {}
    for w, f in word_freq.items():
        if w:
            syms = tuple(w)
            vocab[syms] = vocab.get(syms, 0) + f
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + f
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_count:
            break
        merges.append((a, b))
        new_vocab: dict[tuple, int] = {}
        for syms, f in vocab.items():
            m = _merge_once(syms, a, b)
            new_vocab[m] = new_vocab.get(m, 0) + f
        vocab = new_vocab
    return merges


def bpe_learn(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    max_words: int | None = None,
    min_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn a BPE merge table from a document DataFrame. The corpus
    pass is ONE distributed word-count (explode + groupBy); the merge
    loop then runs driver-side over the (small) frequency table.
    ``max_words`` caps the table at the top-frequency words
    (deterministic ``(-freq, word)`` order) for open-vocabulary
    corpora."""
    wf = (
        df.select(
            F.explode(F.split(F.lower(F.col(text_col)), _WORD_SPLIT)).alias("w")
        )
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("f"))
    )
    if max_words is not None:
        wf = wf.orderBy(F.desc("f"), F.asc("w")).limit(max_words)
    counts = {r.w: r.f for r in wf.collect()}
    return learn_merges_from_counts(counts, n_merges, min_count=min_count)


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode one word with a learned rank table: repeatedly merge ALL
    non-overlapping occurrences of the present pair with the lowest
    merge rank, until no ranked pair remains. The executor-side kernel
    (the oracle replays the same semantics one occurrence at a time —
    an equivalent but independently-written path)."""
    parts: tuple = tuple(word)
    while len(parts) > 1:
        best_rank = None
        best_pair = None
        for i in range(len(parts) - 1):
            r = ranks.get((parts[i], parts[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (parts[i], parts[i + 1])
        if best_pair is None:
            break
        parts = _merge_once(parts, *best_pair)
    return list(parts)


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe",
) -> DataFrame:
    """Append ``out_col array<string>``: the document's BPE subword
    sequence (lowercased, whitespace-split words encoded independently,
    concatenated in order). Map-side only: the rank table rides the UDF
    closure (broadcast by Spark's task serializer — it is a few KB) and
    distinct words memoize within each Python worker."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    @F.pandas_udf(ArrayType(StringType()))
    def enc(texts):
        import pandas as pd

        cache: dict[str, list[str]] = {}

        def enc_one(t):
            if t is None:
                return []
            out: list[str] = []
            for w in t.lower().split():
                got = cache.get(w)
                if got is None:
                    got = encode_word(w, ranks)
                    cache[w] = got
                out.extend(got)
            return out

        return pd.Series([enc_one(t) for t in texts])

    return df.withColumn(out_col, enc(F.col(text_col)))
