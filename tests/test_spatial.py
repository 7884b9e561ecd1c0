"""mbr_overlap_join: reference-point dedup semantics on hand-built rects.

q54 certifies the operator against the quadratic oracle; here we pin
the edges a random fixture may miss: pairs spanning many shared cells
are emitted exactly once, closed-interval touching counts as overlap,
bipartite (a != b) mode, and the intersection rectangle itself.
"""

import pytest

from pvt_spark.operators.spatial import mbr_overlap_join

SCHEMA = "id long, x_lo long, y_lo long, x_hi long, y_hi long"


def _pairs(spark, ra, rb, cell, **kw):
    a = spark.createDataFrame(ra, SCHEMA)
    b = spark.createDataFrame(rb, SCHEMA)
    out = mbr_overlap_join(a, b, cell=cell, **kw).collect()
    return sorted((r["a_id"], r["b_id"]) for r in out), out


def test_many_shared_cells_exactly_once(spark):
    # two big rects sharing a 4x4 block of cells (cell=100): one output row
    ra = [(1, 0, 0, 399, 399)]
    rb = [(2, 50, 50, 449, 449)]
    pairs, rows = _pairs(spark, ra, rb, cell=100)
    assert pairs == [(1, 2)]
    r = rows[0]
    assert (r["ix_lo"], r["iy_lo"], r["ix_hi"], r["iy_hi"]) == (50, 50, 399, 399)


def test_touching_edges_inclusive_and_disjoint_excluded(spark):
    # b touches a's right edge exactly (closed intervals overlap at x=99);
    # c is one unit away (disjoint)
    ra = [(1, 0, 0, 99, 99)]
    rb = [(2, 99, 0, 150, 99), (3, 101, 0, 150, 99)]
    pairs, rows = _pairs(spark, ra, rb, cell=64)
    assert pairs == [(1, 2)]
    r = rows[0]
    assert (r["ix_lo"], r["ix_hi"]) == (99, 99)


def test_self_join_anti_reflexive_quadratic_parity(spark):
    # dense clump of rects + one far away; compare to the quadratic answer
    rects = [
        (i, 13 * i % 500, 29 * i % 500, 13 * i % 500 + 120, 29 * i % 500 + 90)
        for i in range(30)
    ] + [(99, 100_000, 100_000, 100_100, 100_100)]
    got, _ = _pairs(spark, rects, rects, cell=128, anti_reflexive=True)
    expect = sorted(
        (a[0], b[0])
        for a in rects
        for b in rects
        if b[0] > a[0]
        and a[1] <= b[3] and b[1] <= a[3]
        and a[2] <= b[4] and b[2] <= a[4]
    )
    assert got == expect and len(got) == len(set(got)) and len(got) > 10


def test_reference_cell_never_outside_either_rect(spark):
    # regression shape: reference corner on an exact cell boundary
    ra = [(1, 128, 128, 300, 300)]
    rb = [(2, 128, 128, 200, 200)]
    pairs, _ = _pairs(spark, ra, rb, cell=128)
    assert pairs == [(1, 2)]


def test_cell_validation(spark):
    a = spark.createDataFrame([(1, 0, 0, 1, 1)], SCHEMA)
    with pytest.raises(ValueError):
        mbr_overlap_join(a, a, cell=0)


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=4, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 2000),  # x_lo
            st.integers(0, 2000),  # y_lo
            st.integers(0, 700),   # width
            st.integers(0, 700),   # height
        ),
        min_size=2,
        max_size=40,
    ),
    st.sampled_from([64, 100, 333, 1024]),
)
def test_mbr_overlap_matches_quadratic(spark, raw, cell):
    rects = [(i, x, y, x + w, y + h) for i, (x, y, w, h) in enumerate(raw)]
    df = spark.createDataFrame(rects, SCHEMA)
    got = sorted(
        (r["a_id"], r["b_id"], r["ix_lo"], r["iy_lo"], r["ix_hi"], r["iy_hi"])
        for r in mbr_overlap_join(df, df, cell=cell, anti_reflexive=True).collect()
    )
    expect = sorted(
        (a[0], b[0], max(a[1], b[1]), max(a[2], b[2]), min(a[3], b[3]), min(a[4], b[4]))
        for a in rects
        for b in rects
        if b[0] > a[0]
        and a[1] <= b[3] and b[1] <= a[3]
        and a[2] <= b[4] and b[2] <= a[4]
    )
    assert got == expect


def test_huge_coordinates_beyond_double_precision(spark):
    # coordinates above 2^53: float division would misplace the reference
    # cell and silently drop the pair; integer div must keep it
    base = (1 << 53) + 12345
    cell = 1 << 40
    ra = [(1, base, base, base + 2 * cell, base + 2 * cell)]
    rb = [(2, base + cell, base + cell, base + 3 * cell, base + 3 * cell)]
    pairs, rows = _pairs(spark, ra, rb, cell=cell)
    assert pairs == [(1, 2)]
    r = rows[0]
    assert (r["ix_lo"], r["iy_lo"]) == (base + cell, base + cell)


def test_plan_shape_mbr_no_nested_loop(spark):
    """q54's cell banding must compile to an equi-join with no nested
    loop and no forced broadcast hint (both sides corpus-sized)."""
    from pvt_spark.queries import q54_mbr_overlap

    df = q54_mbr_overlap(spark, "/root/testdata/sf0.001")
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p
    lp = df._jdf.queryExecution().optimizedPlan().toString()
    assert "ResolvedHint" not in lp
