"""Streaming as-of join (streaming/asof.py).

Same deterministic availableNow + checkpoint protocol as the
sessionization tests. The property under test is FINALITY: a left row
is emitted only once the watermark passes its timestamp, so a right
row arriving in a LATER micro-batch (but with an earlier event time)
still becomes the match — and the emitted stream equals the batch
asof_join over the union of all batches.
"""

import datetime as dt

from pvt_spark.streaming.asof import asof_join_stream

T0 = dt.datetime(2024, 3, 1, 10, 0, 0)


def _us(minutes):
    return int((T0 + dt.timedelta(minutes=minutes)).timestamp() * 1_000_000)


def _mk(spark, rows):
    # rows: (key, tag, minutes, id)
    return spark.createDataFrame(
        [(k, g, T0 + dt.timedelta(minutes=m), i) for k, g, m, i in rows],
        "key string, tag int, ts timestamp, id long",
    )


def _run(spark, events_dir, out_dir, ckpt, **kw):
    stream = spark.readStream.schema(
        "key string, tag int, ts timestamp, id long"
    ).parquet(events_dir)
    out = asof_join_stream(stream, watermark="10 minutes", **kw)
    q = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _read(spark, out_dir):
    import os

    # only the empty-sink case maps to "no rows"; any real read failure
    # must surface, or the run-1 nothing-emitted assertion is vacuous
    if not any(f.endswith(".parquet") for f in os.listdir(out_dir)):
        return set()
    return {
        (r.key, r.left_id, r.left_us, r.matched_tie, r.matched_us)
        for r in spark.read.parquet(out_dir).collect()
    }


def test_streaming_asof_finality_and_floor(spark, tmp_path):
    events_dir = str(tmp_path / "events")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # run 1: rights u@5(tie 1), u@10(tie 2); lefts u L1@12, L2@3.
    # watermark starts at 0 -> everything stays pending, nothing emits.
    _mk(
        spark,
        [("u", 0, 5, 1), ("u", 0, 10, 2), ("u", 1, 12, 101), ("u", 1, 3, 102)],
    ).write.mode("append").parquet(events_dir)
    _run(spark, events_dir, out_dir, ckpt)
    assert _read(spark, out_dir) == set()

    # run 2: a LATER-arriving right u@11 (tie 3) — event time before L1 —
    # plus a clock row pushing the watermark to 30m. Both lefts finalize
    # in this run: L1@12 matches the late right (finality: emission
    # waited for the watermark), L2@3 has no right at-or-before it.
    _mk(spark, [("u", 0, 11, 3), ("z", 1, 40, 999)]).write.mode("append").parquet(
        events_dir
    )
    _run(spark, events_dir, out_dir, ckpt)
    got = _read(spark, out_dir)
    assert ("u", 101, _us(12), 3, _us(11)) in got
    assert ("u", 102, _us(3), None, None) in got
    assert len([g for g in got if g[0] == "u"]) == 2

    # run 3: left u@35 while the right buffer's newest row (11m) is far
    # below the watermark — the FLOOR row must have been retained, so
    # the match is tie 3 @ 11m. Clock to 60m finalizes it (wm 50m).
    _mk(spark, [("u", 1, 35, 103), ("z", 1, 60, 998)]).write.mode("append").parquet(
        events_dir
    )
    _run(spark, events_dir, out_dir, ckpt)
    got = _read(spark, out_dir)
    assert ("u", 103, _us(35), 3, _us(11)) in got

    # batch parity: the emitted u-rows equal the batch asof_join over
    # the union of every micro-batch's u events
    from pyspark.sql import functions as F

    from pvt_spark.operators.temporal import asof_join

    ev = spark.read.parquet(events_dir).where(F.col("key") == "u")
    ev = ev.withColumn("us", F.unix_micros("ts"))
    lefts = ev.where("tag = 1").select("key", F.col("id").alias("left_id"), "us")
    rights = ev.where("tag = 0").select("key", F.col("id").alias("tie_id"), "us")
    batch = asof_join(
        lefts, rights, on=["key"], left_ts="us", right_ts="us",
        right_cols=["tie_id"], tie="tie_id",
    )
    expect = {
        ("u", r.left_id, r.us, r.matched_tie_id, r.matched_us)
        for r in batch.collect()
    }
    assert {g for g in got if g[0] == "u"} == expect


def test_streaming_asof_tolerance(spark, tmp_path):
    events_dir = str(tmp_path / "events")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # right @0, lefts @4 (within 5-min tolerance) and @6 (outside)
    _mk(
        spark,
        [("u", 0, 0, 1), ("u", 1, 4, 201), ("u", 1, 6, 202)],
    ).write.mode("append").parquet(events_dir)
    _run(spark, events_dir, out_dir, ckpt, tolerance_us=5 * 60 * 1_000_000)
    _mk(spark, [("z", 1, 40, 999)]).write.mode("append").parquet(events_dir)
    _run(spark, events_dir, out_dir, ckpt, tolerance_us=5 * 60 * 1_000_000)
    got = _read(spark, out_dir)
    assert ("u", 201, _us(4), 1, _us(0)) in got
    assert ("u", 202, _us(6), None, None) in got


def test_streaming_asof_null_keys_and_ms_boundary(spark, tmp_path):
    events_dir = str(tmp_path / "events")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # NULL-keyed right must be inert; NULL-keyed left emits unmatched.
    # The boundary left bl@20m must finalize as soon as the watermark is
    # ONE MILLISECOND past it (clock at 20m + 10min watermark + 1ms) —
    # regression for the timeout being armed 1ms too late and the left
    # never emitting.
    rows = [
        (None, 0, dt.timedelta(minutes=1), 1),     # null-key right: inert
        (None, 1, dt.timedelta(minutes=2), 301),   # null-key left: unmatched
        ("u", 0, dt.timedelta(minutes=3), 2),
        ("u", 1, dt.timedelta(minutes=20), 302),   # boundary left
    ]
    spark.createDataFrame(
        [(k, g, T0 + d, i) for k, g, d, i in rows],
        "key string, tag int, ts timestamp, id long",
    ).write.mode("append").parquet(events_dir)
    _run(spark, events_dir, out_dir, ckpt)

    clock = T0 + dt.timedelta(minutes=30, milliseconds=1)
    spark.createDataFrame(
        [("z", 0, clock, 9)], "key string, tag int, ts timestamp, id long"
    ).write.mode("append").parquet(events_dir)
    _run(spark, events_dir, out_dir, ckpt)
    got = _read(spark, out_dir)
    assert (None, 301, _us(2), None, None) in got  # null key never matches
    assert ("u", 302, _us(20), 2, _us(3)) in got   # 1ms-past-boundary emits
