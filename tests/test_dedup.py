"""Connected-components dedup grouping (operators/dedup.py, q36)."""

import pytest


def _cc(spark, edges):
    from pvt_spark.operators.dedup import connected_components

    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    rows = connected_components(df).collect()
    return {r.doc_id: r.group_id for r in rows}


def test_cc_chain_star_and_separate_components(spark):
    # chain 1-2-3-4 (diameter > 1 forces multiple supersteps),
    # star 10-{11,12,13}, isolated pair (20, 21)
    edges = [
        (2, 1), (2, 3), (3, 4),
        (10, 11), (10, 12), (13, 10),
        (21, 20),
    ]
    got = _cc(spark, edges)
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10, 12: 10, 13: 10,
        20: 20, 21: 20,
    }


def test_cc_duplicate_and_reversed_edges_are_harmless(spark):
    got = _cc(spark, [(1, 2), (2, 1), (1, 2), (5, 6)])
    assert got == {1: 1, 2: 1, 5: 5, 6: 5}


def test_dedup_groups_sizes_and_canonical_flags(spark):
    from pvt_spark.operators.dedup import dedup_groups

    df = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (21, 20)], "doc_a long, doc_b long"
    )
    rows = {r.doc_id: r for r in dedup_groups(df).collect()}
    assert rows[1].group_size == 4 and rows[1].is_canonical == 1
    for d in (2, 3, 4):
        assert rows[d].group_id == 1
        assert rows[d].group_size == 4
        assert rows[d].is_canonical == 0
    assert rows[20].group_size == 2 and rows[20].is_canonical == 1
    assert rows[21].group_id == 20 and rows[21].is_canonical == 0
    # survivor set = exactly one per group
    canon = [r for r in rows.values() if r.is_canonical == 1]
    assert sorted(r.doc_id for r in canon) == [1, 20]


def test_cc_leaves_only_the_result_checkpoint(spark):
    """Superseded per-superstep label snapshots are unpersisted as soon
    as their successor materializes; the call leaves exactly the
    returned checkpoint behind (kNN hygiene convention)."""
    from pvt_spark.operators.dedup import connected_components

    def persisted_ids():
        m = spark.sparkContext._jsc.getPersistentRDDs()
        return {int(k) for k in m.keySet().toArray()}

    before = persisted_ids()
    # chain of diameter 3 -> several supersteps -> several snapshots
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "doc_a long, doc_b long"
    )
    out = connected_components(df)
    assert {r.group_id for r in out.collect()} == {1}
    after = persisted_ids()
    assert len(after - before) == 1


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001"])
def test_q36_matches_duckdb_oracle(spark, sf_dir):
    from pvt_spark.queries import compare_against_oracle

    res = compare_against_oracle(spark, sf_dir, names={"q36_dedup_groups"})
    assert res["q36_dedup_groups"].get("match") is True, res
