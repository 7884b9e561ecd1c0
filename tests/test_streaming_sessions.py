"""Stateful streaming sessionization (streaming/sessions.py).

Deterministic three-run protocol: the file source + checkpoint recover
state and watermark across restarts, so each ``availableNow`` run is a
reproducible micro-batch sequence — watermark-driven timeouts fire at
exactly the run boundaries the comments claim.
"""

import datetime as dt

from pvt_spark.streaming.sessions import sessionize_stream

T0 = dt.datetime(2024, 3, 1, 10, 0, 0)


def _mk(spark, rows):
    return spark.createDataFrame(
        [(k, T0 + dt.timedelta(minutes=m)) for k, m in rows],
        "key string, ts timestamp",
    )


def _run(spark, events_dir, out_dir, ckpt):
    stream = (
        spark.readStream.schema("key string, ts timestamp").parquet(events_dir)
    )
    sessions = sessionize_stream(
        stream, "key", "ts", gap_sec=1800, watermark="1 hour"
    )
    q = (
        sessions.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _read(spark, out_dir):
    try:
        return {
            (r.key, r.session_start, r.session_end, r.n_events)
            for r in spark.read.parquet(out_dir).collect()
        }
    except Exception:
        return set()


def test_sessionize_stream_gap_and_timeout_closure(spark, tmp_path):
    events_dir = str(tmp_path / "events")
    out_dir = str(tmp_path / "sessions")
    ckpt = str(tmp_path / "ckpt")

    # run 1: a at 0/5/10 min (one open session), b at 0; in-batch
    # multi-session key d: 0 min and 90 min (gap > 30 min) -> d's first
    # session is gap-closed in-batch but NOT emitted: the watermark has
    # not passed its end + gap yet, so a later above-watermark event
    # could still extend it (watermark-finality discipline)
    _mk(spark, [("a", 0), ("a", 5), ("a", 10), ("b", 0), ("d", 0), ("d", 90)]).write.mode(
        "append"
    ).parquet(events_dir)
    _run(spark, events_dir, out_dir, ckpt)
    got = _read(spark, out_dir)
    assert got == set(), got

    # run 2: clock event at +185 min advances the watermark to +125;
    # availableNow then executes a trailing no-data micro-batch against
    # the advanced watermark, so every open session whose end + gap is
    # STRICTLY behind it (a: 10+30, b: 0+30, d: 90+30) times out IN
    # THIS RUN (a +120 clock would leave d's second session at the
    # boundary: timeouts need watermark > timeout, not >=)
    want = {
        ("d", T0, T0, 1),
        ("a", T0, T0 + dt.timedelta(minutes=10), 3),
        ("b", T0, T0, 1),
        ("d", T0 + dt.timedelta(minutes=90), T0 + dt.timedelta(minutes=90), 1),
    }
    _mk(spark, [("clock", 185)]).write.mode("append").parquet(events_dir)
    _run(spark, events_dir, out_dir, ckpt)
    got = _read(spark, out_dir)
    assert got == want, got

    # run 3: another clock tick re-processes nothing — closed sessions
    # are emitted exactly once (state was removed on timeout)
    _mk(spark, [("clock", 186)]).write.mode("append").parquet(events_dir)
    _run(spark, events_dir, out_dir, ckpt)
    rows = [
        t
        for t in spark.read.parquet(out_dir).collect()
        if not t.key.startswith("clock")
    ]
    assert len(rows) == len(want), rows


def test_sessionize_stream_cross_batch_out_of_order(spark, tmp_path):
    """Above-watermark events arriving in a LATER micro-batch must
    bridge buffered sessions and min-update session_start — the two
    failure modes of eager in-batch emission."""
    events_dir = str(tmp_path / "events")
    out_dir = str(tmp_path / "sessions")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: x at 60 and 100 min — gap 40 > 30, so two buffered
    # sessions [60,60] and [100,100]; watermark advances to 100-60=40
    _mk(spark, [("x", 60), ("x", 100)]).write.mode("append").parquet(events_dir)
    _run(spark, events_dir, out_dir, ckpt)
    assert _read(spark, out_dir) == set()

    # batch 2: out-of-order but above-watermark events: 75 bridges the
    # two buffered sessions (75-60=15 <= 30 and 100-75=25 <= 30), and
    # 55 extends the merged session backwards (60-55=5 <= 30), so
    # session_start must min-update to 55
    _mk(spark, [("x", 75), ("x", 55)]).write.mode("append").parquet(events_dir)
    _run(spark, events_dir, out_dir, ckpt)
    assert _read(spark, out_dir) == set()

    # batch 3: clock at 300 -> watermark 240 > 100+30: the ONE merged
    # session emits, exactly matching batch q08 on {55,60,75,100}
    want = {
        (
            "x",
            T0 + dt.timedelta(minutes=55),
            T0 + dt.timedelta(minutes=100),
            4,
        )
    }
    _mk(spark, [("clock", 300)]).write.mode("append").parquet(events_dir)
    _run(spark, events_dir, out_dir, ckpt)
    got = {t for t in _read(spark, out_dir) if t[0] == "x"}
    assert got == want, got

    # batch 4: exactly-once — nothing re-emits
    _mk(spark, [("clock", 301)]).write.mode("append").parquet(events_dir)
    _run(spark, events_dir, out_dir, ckpt)
    got = {t for t in _read(spark, out_dir) if t[0] == "x"}
    assert got == want, got


def test_sessionize_stream_matches_batch_q08_semantics(spark, tmp_path):
    """Closed streaming sessions == the batch lag/cumsum sessionizer
    (q08 semantics) on the same rows, for keys conclusively closed."""
    import numpy as np

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    rng = np.random.default_rng(7)
    rows = []
    for k in range(20):
        t = 0.0
        for _ in range(int(rng.integers(1, 12))):
            t += float(rng.integers(1, 70))  # minutes; gaps straddle 30
            rows.append((f"k{k}", t))
    events_dir = str(tmp_path / "events")
    out_dir = str(tmp_path / "sessions")
    ckpt = str(tmp_path / "ckpt")
    _mk(spark, rows).write.mode("append").parquet(events_dir)
    _run(spark, events_dir, out_dir, ckpt)
    # clock far past everything closes every session
    _mk(spark, [("clock", 10_000)]).write.mode("append").parquet(events_dir)
    _run(spark, events_dir, out_dir, ckpt)
    _mk(spark, [("clock", 10_001)]).write.mode("append").parquet(events_dir)
    _run(spark, events_dir, out_dir, ckpt)
    got = {
        t for t in _read(spark, out_dir) if not t[0].startswith("clock")
    }

    ev = _mk(spark, rows)
    w = Window.partitionBy("key").orderBy("ts")
    epoch = F.unix_timestamp("ts")
    batch = (
        ev.withColumn(
            "new_s",
            F.when(epoch - F.lag(epoch).over(w) > 1800, 1).otherwise(
                F.when(F.lag(epoch).over(w).isNull(), 1).otherwise(0)
            ),
        )
        .withColumn("sid", F.sum("new_s").over(w))
        .groupBy("key", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    want = {
        (r.key, r.session_start, r.session_end, r.n_events)
        for r in batch.collect()
    }
    assert got == want and len(want) > 20
