"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (event-time timeout), watermark-final.

The batch engine sessionizes with lag + cumulative flag sum (q08); a
stream cannot, because a session is only known CLOSED once the
watermark passes its last event + gap. That makes this the canonical
custom stateful operator (reference analog: the reference has no
streaming surface at all — SURVEY §2.9; this extends the engine the
way Structured Streaming intends):

- per-key state = ALL not-yet-final sessions as (start, end, count)
  interval triples, microsec precision;
- each micro-batch interval-merges its rows into the buffer: an event
  within ``gap`` of a buffered session extends it (min-updating
  session_start for earlier-timestamped arrivals) and may BRIDGE two
  buffered sessions into one — so out-of-order events that land in a
  later micro-batch but above the watermark still produce exactly the
  batch (q08) sessions;
- a session is emitted exactly when the event-time watermark passes
  ``session_end + gap``: only then can no admissible event (every
  accepted event has ts >= watermark) still extend or bridge it — the
  same watermark-finality discipline streaming/asof.py uses. In-batch
  gaps alone never emit.

Scale shape (100 TB of crawl events): state is O(sessions still inside
the watermark horizon per key) and bounded by watermark eviction; each
micro-batch shuffles only its own rows, hash-partitioned by key — the
same exchange any streaming aggregation pays; the per-group work is
Arrow-batched pandas, no per-row Python. Emission is append-mode and
exactly-once under the checkpoint (sink dedup by (key, session_start)).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
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
        StructField("starts", ArrayType(LongType())),
        StructField("ends", ArrayType(LongType())),
        StructField("ns", ArrayType(LongType())),
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

    Emits (key, session_start, session_end, n_events) exactly once per
    session, when the event-time watermark passes session_end + gap —
    never earlier, so above-watermark out-of-order events can still
    extend, bridge, or min-update buffered sessions. Matches q08's gap
    semantics (new session iff ts - prev_ts > gap_sec).
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
                    "key": [key[0]] * len(rows),
                    "session_start": pd.to_datetime(
                        [s for s, _, _ in rows], unit="us"
                    ),
                    "session_end": pd.to_datetime(
                        [e for _, e, _ in rows], unit="us"
                    ),
                    "n_events": [n for _, _, n in rows],
                }
            )

        def split_final(sessions):
            """Partition buffered sessions into (final, still-open) by
            the CURRENT watermark; final = watermark passed end+gap."""
            wm_us = state.getCurrentWatermarkMs() * 1000
            done = [s for s in sessions if s[1] + gap_us < wm_us]
            keep = [s for s in sessions if s[1] + gap_us >= wm_us]
            return done, keep

        def settle(done, keep):
            if keep:
                state.update(
                    (
                        [s for s, _, _ in keep],
                        [e for _, e, _ in keep],
                        [n for _, _, n in keep],
                    )
                )
                # fire when the watermark passes the OLDEST open
                # session's end + gap; if the watermark already
                # overtook that instant (burst after a quiet spell),
                # the earliest legal timeout is just past it
                state.setTimeoutTimestamp(
                    max(
                        min(e for _, e, _ in keep) // 1000 + gap_ms,
                        state.getCurrentWatermarkMs() + 1,
                    )
                )
            else:
                state.remove()

        if state.hasTimedOut:
            starts, ends, ns = state.get
            done, keep = split_final(list(zip(starts, ends, ns)))
            settle(done, keep)
            if done:
                yield out(done)
            return

        import numpy as np

        batches = list(pdfs)
        ts = (
            batches[0]["ts"]
            if len(batches) == 1
            else pd.concat([p["ts"] for p in batches])
        )
        us = np.sort(ts.astype("int64").to_numpy() // 1000)
        if state.exists:
            starts, ends, ns = state.get
            ivals = [[int(s), int(e), int(n)] for s, e, n in zip(starts, ends, ns)]
        else:
            ivals = []
        # interval-merge: buffered sessions and the batch's own events
        # pre-coalesced into maximal gap-runs (numpy boundary split —
        # identical to feeding single-event intervals one by one, since
        # the merge below is a gap-union with counts summed), sorted by
        # start; gap-adjacent intervals coalesce (this is exactly
        # event-level gap sessionization because every buffered interval
        # already has all internal gaps <= gap)
        if len(us):
            brk = np.flatnonzero(np.diff(us) > gap_us)
            a_idx = np.concatenate([[0], brk + 1])
            b_idx = np.concatenate([brk, [len(us) - 1]])
            ivals += [
                [int(us[a]), int(us[b]), int(b - a + 1)]
                for a, b in zip(a_idx, b_idx)
            ]
        ivals.sort()
        merged = []
        for iv in ivals:
            if merged and iv[0] - merged[-1][1] <= gap_us:
                merged[-1][1] = max(merged[-1][1], iv[1])
                merged[-1][2] += iv[2]
            else:
                merged.append(iv)
        done, keep = split_final([tuple(iv) for iv in merged])
        settle(done, keep)
        if done:
            yield out(done)

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
