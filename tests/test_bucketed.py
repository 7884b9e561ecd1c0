"""Bucketed layout: co-located equi-join plans with no Exchange (and
no Sort when written sorted), values identical to the plain join."""

from pyspark.sql import functions as F

from pvt_spark.sources.bucketed import read_bucketed, write_bucketed


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    left = spark.range(5000).selectExpr(
        "id as feature_id", "id * 3 as a"
    )
    right = spark.range(4000).selectExpr(
        "id as feature_id", "concat('t_', id % 7) as tag"
    )
    write_bucketed(left, "bk_left", "feature_id", 16, path=str(tmp_path / "l"))
    write_bucketed(right, "bk_right", "feature_id", 16, path=str(tmp_path / "r"))
    try:
        # force the SMJ path (the tables are tiny; a broadcast would
        # hide the property under test)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        # sorted-bucket ordering metadata is only consumed behind this
        # flag since 3.0 (single-file buckets make it safe — the writer
        # guarantees that)
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", "true"
        )
        bl, br = read_bucketed(spark, "bk_left"), read_bucketed(spark, "bk_right")
        joined = bl.join(br, "feature_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan[:1200]
        assert "Exchange" not in plan, plan[:1200]
        # sorted single-file buckets: the per-side Sort is elided too
        assert "Sort " not in plan.replace("SortMergeJoin", ""), plan[:1200]

        got = {(r.feature_id, r.a, r.tag) for r in joined.collect()}
        want = {
            (r.feature_id, r.a, r.tag)
            for r in left.join(right, "feature_id").collect()
        }
        assert got == want and len(got) == 4000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
        spark.sql("DROP TABLE IF EXISTS bk_left")
        spark.sql("DROP TABLE IF EXISTS bk_right")


def test_bucketed_groupby_skips_shuffle(spark, tmp_path):
    df = spark.range(3000).selectExpr("id % 97 as k", "id as v")
    write_bucketed(df, "bk_agg", "k", 8, path=str(tmp_path / "g"))
    try:
        agg = read_bucketed(spark, "bk_agg").groupBy("k").agg(F.sum("v").alias("s"))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:1200]
        got = {(r.k, r.s) for r in agg.collect()}
        want = {(r.k, r.s) for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()}
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_agg")
