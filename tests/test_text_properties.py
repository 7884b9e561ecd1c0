"""Property test for the word n-gram expression behind q42/q43:
`_grams_expr_spark(n)` must agree with the obvious Python n-gram
construction for ANY document length — in particular lengths < n,
where Spark's descending `sequence(1, 0)` would silently produce
garbage without the expression's CASE guard.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from pvt_spark.queries import _grams_expr_spark

_VOCAB = ["a", "b", "cc", "dd", "e1", "f2", "gg", "h"]


def _py_grams(words: list[str], n: int) -> list[str]:
    return [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]


@settings(max_examples=4, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(_VOCAB), min_size=1, max_size=12),
        min_size=30,
        max_size=30,
    )
)
def test_gram_expr_matches_python(spark, word_lists):
    texts = [" ".join(ws) for ws in word_lists]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    exprs = {n: _grams_expr_spark(n) for n in (2, 5, 8)}
    rows = df.selectExpr(
        "doc_id",
        *[f"{e} AS g{n}" for n, e in exprs.items()],
    ).collect()
    for r in rows:
        words = texts[r.doc_id].split(" ")
        for n in (2, 5, 8):
            assert list(getattr(r, f"g{n}")) == _py_grams(words, n), (
                r.doc_id,
                n,
                texts[r.doc_id],
            )
