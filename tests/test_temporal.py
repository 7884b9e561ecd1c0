"""As-of join and banded range join: semantics pinned on hand-built rows.

The certified q50/q51 entries check these operators against independent
quadratic DuckDB formulations at sf0.001/sf0.01; here we pin the edge
semantics a random fixture may never hit: inclusive equal-ts match,
largest-tie wins, tolerance cutoff at exactly the boundary, all payload
columns sourced from the SAME matched row, and band-boundary inclusivity.
"""

from pyspark.sql import Row

from pvt_spark.operators.temporal import asof_join, range_join_points


def _asof(spark, left_rows, right_rows, **kw):
    left = spark.createDataFrame(left_rows, "k long, lid long, lus long")
    right = spark.createDataFrame(right_rows, "k long, rid long, rus long, val string")
    defaults = dict(
        on=["k"], left_ts="lus", right_ts="rus", right_cols=["rid", "val"], tie="rid"
    )
    defaults.update(kw)
    out = asof_join(left, right, **defaults)
    return {r["lid"]: r for r in out.collect()}


def test_asof_basic_inclusive_and_tiebreak(spark):
    rows = _asof(
        spark,
        [(1, 10, 100), (1, 11, 55), (1, 12, 52), (1, 13, 40)],
        [
            (1, 1, 50, "a"),
            (1, 3, 55, "c"),  # equal-ts with lid=11: inclusive, and ...
            (1, 2, 55, "b"),  # ... rid=3 > rid=2 wins the tie
            (1, 4, 99, "d"),
        ],
    )
    assert rows[10]["matched_rid"] == 4 and rows[10]["matched_val"] == "d"
    assert rows[11]["matched_rid"] == 3 and rows[11]["matched_val"] == "c"
    # ts strictly between right rows picks the earlier one; ts before the
    # first right row matches nothing (backward-only).
    assert rows[12]["matched_rid"] == 1 and rows[12]["matched_val"] == "a"
    assert rows[13]["matched_rid"] is None and rows[13]["matched_val"] is None


def test_asof_no_match_and_key_isolation(spark):
    rows = _asof(
        spark,
        [(1, 10, 30), (2, 20, 500)],
        [(1, 1, 40, "late"), (2, 2, 400, "ok")],
    )
    assert rows[10]["matched_rid"] is None and rows[10]["matched_val"] is None
    assert rows[20]["matched_rid"] == 2  # key 2 never sees key 1's rows


def test_asof_tolerance_boundary(spark):
    # match age exactly == tolerance stays; one microsecond older drops
    rows = _asof(
        spark,
        [(1, 10, 100), (1, 11, 101)],
        [(1, 1, 90, "x")],
        tolerance_us=10,
    )
    assert rows[10]["matched_rid"] == 1
    assert rows[11]["matched_rid"] is None


def test_asof_payload_from_same_row_with_null_field(spark):
    # rid=2 is the latest and its val is NULL: matched_val must be the
    # matched row's null, NOT an earlier row's non-null value.
    left = spark.createDataFrame([(1, 10, 100)], "k long, lid long, lus long")
    right = spark.createDataFrame(
        [Row(k=1, rid=1, rus=50, val="old"), Row(k=1, rid=2, rus=60, val=None)]
    )
    out = asof_join(
        left, right, on=["k"], left_ts="lus", right_ts="rus",
        right_cols=["rid", "val"], tie="rid",
    ).collect()[0]
    assert out["matched_rid"] == 2 and out["matched_val"] is None


def _range(spark, points, intervals, band_us):
    pts = spark.createDataFrame(points, "k long, pid long, pus long")
    ivs = spark.createDataFrame(intervals, "k long, iid long, lo long, hi long")
    out = range_join_points(
        pts, ivs, on=["k"], point_ts="pus", lo="lo", hi="hi", band_us=band_us
    )
    return sorted((r["iid"], r["pid"]) for r in out.collect())


def test_range_join_boundaries_inclusive(spark):
    pairs = _range(
        spark,
        [(1, 1, 100), (1, 2, 200), (1, 3, 99), (1, 4, 201)],
        [(1, 7, 100, 200)],
        band_us=30,
    )
    assert pairs == [(7, 1), (7, 2)]


def test_range_join_exactly_once_across_bands(spark):
    # interval spans many bands; each point still appears exactly once
    pairs = _range(
        spark,
        [(1, i, 10 * i) for i in range(1, 40)],
        [(1, 7, 55, 333), (1, 8, 0, 9)],
        band_us=7,
    )
    # iid=8 covers [0,9]; the smallest point is 10, so it matches nothing
    in7 = [(7, i) for i in range(1, 40) if 55 <= 10 * i <= 333]
    assert pairs == in7


def test_range_join_key_isolation_and_short_interval(spark):
    pairs = _range(
        spark,
        [(1, 1, 100), (2, 2, 100)],
        [(1, 7, 100, 100), (2, 8, 50, 60)],
        band_us=1000,
    )
    assert pairs == [(7, 1)]


def test_asof_null_keys_never_match(spark):
    from pyspark.sql import Row

    left = spark.createDataFrame(
        [Row(k=None, lid=10, lus=100), Row(k=1, lid=11, lus=100)]
    )
    right = spark.createDataFrame(
        [Row(k=None, rid=1, rus=50, val="nullkey"), Row(k=1, rid=2, rus=50, val="ok")]
    )
    out = asof_join(
        left, right, on=["k"], left_ts="lus", right_ts="rus",
        right_cols=["rid", "val"], tie="rid",
    )
    rows = {r["lid"]: r for r in out.collect()}
    # SQL equi-join semantics: NULL keys never match, in either direction
    assert rows[10]["matched_rid"] is None and rows[10]["matched_val"] is None
    assert rows[11]["matched_rid"] == 2 and rows[11]["matched_val"] == "ok"


def test_plan_shapes_temporal(spark):
    """Scale-shape pins: q50 is one window plan with no nested-loop join;
    q51's banding compiles to an equi-join, never a nested loop."""
    from pvt_spark.queries import q50_asof_join, q51_range_join

    p50 = (
        q50_asof_join(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in p50 and "CartesianProduct" not in p50
    assert "Window" in p50

    p51 = (
        q51_range_join(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in p51 and "CartesianProduct" not in p51
    assert any(j in p51 for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin"))


# -- hot-key pre-split (split_threshold): value parity with the plain
# plan, boundary-carry correctness, and the parallelized window shape.


def test_asof_split_parity_all_edge_semantics(spark):
    """Every hand-built edge case above must survive the split path:
    run the same rows with split_threshold=0 (every key hot) and tiny
    buckets so matches routinely cross bucket boundaries."""
    left = [(1, 10, 100), (1, 11, 55), (1, 12, 52), (1, 13, 40), (2, 20, 60)]
    right = [
        (1, 1, 50, "a"), (1, 3, 55, "c"), (1, 2, 55, "b"), (1, 4, 99, "d"),
        (2, 9, 10, "z"),
    ]
    plain = _asof(spark, left, right)
    split = _asof(spark, left, right, split_threshold=0, n_buckets=5)
    assert {k: tuple(v) for k, v in split.items()} == {
        k: tuple(v) for k, v in plain.items()
    }
    # tolerance interacts with the carry (match found in an earlier
    # bucket, then aged out)
    plain_t = _asof(spark, left, right, tolerance_us=3)
    split_t = _asof(spark, left, right, tolerance_us=3, split_threshold=0, n_buckets=7)
    assert {k: tuple(v) for k, v in split_t.items()} == {
        k: tuple(v) for k, v in plain_t.items()
    }


def test_asof_split_one_hot_key_parity_and_plan(spark):
    """One pathological key (50k rows, everything else cold): the split
    path must (a) reproduce the unsplit values exactly and (b) window on
    (key, bucket) — the hot key's scan spreads across buckets instead of
    pinning one task."""
    from pyspark.sql import functions as F

    n = 50_000
    ev = spark.range(n).select(
        F.lit(7).alias("k"),
        F.col("id").alias("lid"),
        (F.col("id") * 11 % 1_000_003).alias("lus"),
    )
    clicks = spark.range(n // 5).select(
        F.lit(7).alias("k"),
        F.col("id").alias("rid"),
        (F.col("id") * 53 % 1_000_003).alias("rus"),
        F.lit("x").alias("val"),
    )
    cold_l = spark.createDataFrame([(8, 900_001, 77)], "k long, lid long, lus long")
    cold_r = spark.createDataFrame(
        [(8, 5, 70, "w")], "k long, rid long, rus long, val string"
    )
    left, right = ev.unionByName(cold_l), clicks.unionByName(cold_r)
    kw = dict(
        on=["k"], left_ts="lus", right_ts="rus", right_cols=["rid", "val"], tie="rid"
    )
    plain = asof_join(left, right, **kw)
    split = asof_join(left, right, split_threshold=1000, n_buckets=32, **kw)
    assert split.exceptAll(plain).count() == 0
    assert plain.exceptAll(split).count() == 0
    assert split.count() == n + 1
    plan = split._jdf.queryExecution().executedPlan().toString()
    assert "__bkt" in plan and "Window" in plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
