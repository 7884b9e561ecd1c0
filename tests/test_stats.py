"""group_quantiles: discrete-rank semantics pinned on hand-built groups.

The certified q53 entry checks the operator against the identical
integer formulation in DuckDB; here we pin the edges: tie-heavy
histograms, rank-1 and rank-n selection, single-element groups, and the
qs validation contract.
"""

import pytest

from pvt_spark.operators.stats import group_quantiles


def _run(spark, rows, qs):
    df = spark.createDataFrame(rows, "k string, v long")
    out = group_quantiles(df, key="k", value="v", qs_milli=qs)
    return {(r["k"], r["q_milli"]): r["value"] for r in out.collect()}


def test_quantiles_hand_computed(spark):
    # group a: [1,2,3,4,5,6,7,8,9,10]; rank(ceil(q*n)): p250->3 (rank 3),
    # p500->5, p750->8, p1000->10
    rows = [("a", v) for v in range(1, 11)]
    got = _run(spark, rows, [250, 500, 750, 1000])
    assert got == {
        ("a", 250): 3, ("a", 500): 5, ("a", 750): 8, ("a", 1000): 10
    }


def test_quantiles_tie_heavy_and_rank1(spark):
    # [5,5,5,5,9]: n=5; p1 -> rank ceil(0.001*5)=1 -> 5; p500 -> rank 3 -> 5;
    # p800 -> rank 4 -> 5; p801 -> rank ceil(4.005)=5 -> 9
    rows = [("t", 5)] * 4 + [("t", 9)]
    got = _run(spark, rows, [1, 500, 800, 801])
    assert got == {("t", 1): 5, ("t", 500): 5, ("t", 800): 5, ("t", 801): 9}


def test_quantiles_groups_independent_and_singleton(spark):
    rows = [("a", 1), ("a", 100), ("b", 7)]
    got = _run(spark, rows, [500, 1000])
    assert got == {
        ("a", 500): 1, ("a", 1000): 100, ("b", 500): 7, ("b", 1000): 7
    }


def test_quantiles_validation(spark):
    df = spark.createDataFrame([("a", 1)], "k string, v long")
    for bad in ([], [0], [1001]):
        with pytest.raises(ValueError):
            group_quantiles(df, key="k", value="v", qs_milli=bad)


def test_topk_hand_computed_with_ties_and_small_groups(spark):
    from pvt_spark.operators.stats import topk_per_group

    rows = [
        ("a", 10, 1), ("a", 10, 2), ("a", 9, 3), ("a", 11, 4),
        ("b", 5, 7),  # group smaller than k
    ]
    df = spark.createDataFrame(rows, "k string, v long, id long")
    got = sorted(
        (r["k"], r["rank"], r["v"], r["id"])
        for r in topk_per_group(df, key="k", order="v", tie="id", k=3).collect()
    )
    # a: v DESC, id ASC -> (11,4), (10,1), (10,2); b: all 1 row
    assert got == [
        ("a", 1, 11, 4), ("a", 2, 10, 1), ("a", 3, 10, 2), ("b", 1, 5, 7)
    ]


def test_topk_salted_matches_window_on_hot_group(spark):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from pvt_spark.operators.stats import topk_per_group

    # one hot group (1000 rows over many salts) + negatives in play
    df = spark.range(1000).select(
        F.lit("hot").alias("k"),
        ((F.col("id") * 37) % 101 - 50).alias("v"),
        F.col("id").alias("id"),
    )
    got = sorted(
        (r["rank"], r["v"], r["id"])
        for r in topk_per_group(df, key="k", order="v", tie="id", k=7).collect()
    )
    w = Window.partitionBy("k").orderBy(F.desc("v"), F.asc("id"))
    exp = sorted(
        (r["rank"], r["v"], r["id"])
        for r in df.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 7)
        .collect()
    )
    assert got == exp


def test_topk_validation(spark):
    import pytest

    from pvt_spark.operators.stats import topk_per_group

    df = spark.createDataFrame([("a", 1, 1)], "k string, v long, id long")
    with pytest.raises(ValueError):
        topk_per_group(df, key="k", order="v", tie="id", k=0)


def test_quantiles_nulls_excluded(spark):
    from pyspark.sql import Row

    # [NULL, NULL, 5, 9]: n counts only non-null -> n=2; p250 -> rank 1 -> 5;
    # p1000 -> rank 2 -> 9; an all-NULL group emits nothing
    df = spark.createDataFrame(
        [Row(k="a", v=None), Row(k="a", v=None), Row(k="a", v=5), Row(k="a", v=9),
         Row(k="b", v=None)]
    )
    out = group_quantiles(df, key="k", value="v", qs_milli=[250, 1000])
    got = {(r["k"], r["q_milli"]): r["value"] for r in out.collect()}
    assert got == {("a", 250): 5, ("a", 1000): 9}


def test_plan_shapes_quantiles_and_topk(spark):
    """Scale-shape pins: q53's window must scan the histogram aggregate
    (no raw-row row_number anywhere); q55 must compile to salted
    aggregates with NO window at all."""
    from pvt_spark.queries import q53_group_quantiles, q55_topk_per_group

    p53 = (
        q53_group_quantiles(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "row_number" not in p53
    iwin = p53.find("Window")
    assert iwin != -1 and p53.find("HashAggregate", iwin) != -1

    p55 = (
        q55_topk_per_group(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in p55 and "row_number" not in p55
