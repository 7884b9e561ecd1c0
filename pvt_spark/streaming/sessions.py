"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (event-time timeout).

The batch engine sessionizes with lag + cumulative flag sum (q08); a
stream cannot, because a session is only known CLOSED once the
watermark passes its last event + gap. That makes this the canonical
custom stateful operator (reference analog: the reference has no
streaming surface at all — SURVEY §2.9; this extends the engine the
way Structured Streaming intends):

- per-key state = the one OPEN session's (start, end, count), microsec
  precision;
- each micro-batch merges its (event-time-sorted) rows into state;
  any in-batch gap > ``gap_sec`` closes the older session and emits it
  right there;
- the still-open session re-arms an event-time timeout at
  ``end + gap``; when the watermark crosses that, the timed-out
  callback emits it exactly once and clears state.

Scale shape (100 TB of crawl events): state is O(open keys) and
bounded by watermark eviction; each micro-batch shuffles only its own
rows, hash-partitioned by key — the same exchange any streaming
aggregation pays; the per-group work is Arrow-batched pandas, no
per-row Python. Emission is append-mode and exactly-once under the
checkpoint (sink dedup by (key, session_start)).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n", LongType()),
    ]
)


def sessionize_stream(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    gap_sec: int = 1800,
    watermark: str = "2 hours",
) -> DataFrame:
    """events stream -> closed-session stream (append mode).

    Emits (key, session_start, session_end, n_events) once per closed
    session: either when a later in-batch event opens the next session,
    or when the event-time watermark passes session_end + gap. Matches
    q08's gap semantics (new session iff ts - prev_ts > gap_sec).
    """
    gap_us = int(gap_sec) * 1_000_000
    gap_ms = int(gap_sec) * 1_000

    def fn(
        key: Tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        def out(rows):
            return pd.DataFrame(
                {
                    "key": [key[0] for _ in rows],
                    "session_start": [
                        pd.to_datetime(s, unit="us") for s, _, _ in rows
                    ],
                    "session_end": [
                        pd.to_datetime(e, unit="us") for _, e, _ in rows
                    ],
                    "n_events": [n for _, _, n in rows],
                }
            )

        if state.hasTimedOut:
            s, e, n = state.get
            state.remove()
            yield out([(s, e, n)])
            return

        us = (
            pd.concat([p["ts"] for p in pdfs])
            .sort_values()
            .astype("int64")
            .floordiv(1000)
            .to_numpy()
        )
        sessions = []
        if state.exists:
            cur = list(state.get)
        else:
            cur = None
        for t in us:
            t = int(t)
            if cur is None:
                cur = [t, t, 0]
            elif t - cur[1] > gap_us:
                sessions.append(tuple(cur))
                cur = [t, t, 0]
            cur[1] = max(cur[1], t)
            cur[2] += 1
        state.update(tuple(cur))
        # close when the watermark passes end + gap; if the watermark
        # already overtook that (burst after a long quiet spell), the
        # earliest legal timeout is just past the current watermark
        timeout_ms = max(cur[1] // 1000 + gap_ms, state.getCurrentWatermarkMs() + 1)
        state.setTimeoutTimestamp(timeout_ms)
        if sessions:
            yield out(sessions)

    keyed = events.withWatermark(ts_col, watermark).select(
        F.col(key_col).cast("string").alias("key"), F.col(ts_col).alias("ts")
    )
    return keyed.groupBy("key").applyInPandasWithState(
        fn,
        SESSION_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def sessionize_crawl_hosts(
    pages_stream: DataFrame, gap_sec: int = 1800, watermark: str = "2 hours"
) -> DataFrame:
    """Crawl-host sessions over the pages stream: key = url host
    (lowercased authority), ts = warc_ts — per-host crawl bursts, the
    politeness/scheduling unit a crawler reasons about."""
    hosts = pages_stream.withColumn(
        "host", F.lower(F.regexp_extract(F.col("url"), "^[a-zA-Z]+://([^/?]*)", 1))
    )
    return sessionize_stream(
        hosts, "host", "warc_ts", gap_sec=gap_sec, watermark=watermark
    )
