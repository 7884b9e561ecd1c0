"""Streaming backward as-of join — watermark-exact, bounded state.

The batch operator (operators/temporal.asof_join) scans a union of both
sides under one ordered window; a stream cannot, because a left row's
match is only FINAL once no earlier-timestamped right row can still
arrive. This operator makes that precise with the watermark:

- both sides arrive as ONE tagged stream (tag 0 = right, 1 = left) —
  the same union the batch plan starts from;
- per-key state buffers pending left rows and a right-row buffer;
- a left row is emitted exactly when the event-time watermark passes
  its timestamp: every right row the engine will still accept has
  ts >= watermark > left_ts, so it cannot change a backward match —
  the emitted match is final, not best-effort;
- the right buffer evicts rows older than ``watermark - tolerance``;
  with no tolerance it additionally keeps the single newest evicted
  row (the "floor") because that row is the match for any future left
  until a newer right arrives. State is therefore bounded by the
  in-flight (above-watermark) rows per key plus at most one floor row;
  keys left holding retirable rows re-arm an event-time timeout at the
  instant their oldest right crosses the horizon, so idle keys shrink
  to the floor (or to nothing, in tolerance mode) as the watermark
  advances — no key needs fresh data to release state.

Emission matches the batch semantics exactly: latest right with
right_ts <= left_ts (ties to the largest tie id), NULL when nothing
qualifies or the match is older than ``tolerance_us``. Late rows below
the watermark follow the standard Structured Streaming contract (they
may be dropped). Scale shape: one hash exchange on the key per
micro-batch, Arrow-batched pandas per group, no per-row Python.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
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
)

ASOF_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("left_id", LongType()),
        StructField("left_us", LongType()),
        StructField("matched_tie", LongType()),
        StructField("matched_us", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("l_ts", ArrayType(LongType())),
        StructField("l_id", ArrayType(LongType())),
        StructField("r_ts", ArrayType(LongType())),
        StructField("r_tie", ArrayType(LongType())),
    ]
)


def asof_join_stream(
    tagged: DataFrame,
    watermark: str = "1 hour",
    tolerance_us: int | None = None,
) -> DataFrame:
    """Tagged event stream -> final as-of matches (append mode).

    ``tagged`` columns: key (string), tag (int: 0 = right side, 1 =
    left side), ts (timestamp, event time), id (long: the left row id
    for tag 1; the right tie/payload id for tag 0 — join the right
    payload back by this id downstream). Output: one row per left
    event, emitted exactly once when the watermark passes its
    timestamp, with the final backward match (NULLs when unmatched).
    """
    tol = None if tolerance_us is None else int(tolerance_us)

    _empty = np.empty(0, np.int64)

    def _emit(key, state: GroupState, nl_ts, nl_id, nr_ts, nr_tie):
        # array-native per-group path: the per-batch cost of this
        # operator is ~(groups x Python glue), so the glue builds no
        # intermediate row tuples — state lists concatenate straight
        # into int64 arrays
        if state.exists:
            st = state.get
            l_ts = np.concatenate([np.asarray(st[0], np.int64), nl_ts])
            l_id = np.concatenate([np.asarray(st[1], np.int64), nl_id])
            r_ts = np.concatenate([np.asarray(st[2], np.int64), nr_ts])
            r_tie = np.concatenate([np.asarray(st[3], np.int64), nr_tie])
        else:
            l_ts, l_id, r_ts, r_tie = nl_ts, nl_id, nr_ts, nr_tie
        wm_ms = state.getCurrentWatermarkMs()
        wm_us = wm_ms * 1000
        # rights sorted by (ts, tie): the match scan and the floor pick
        # both want that order
        order = np.lexsort((r_tie, r_ts))  # (ts, tie) ascending: match scan + floor
        r_ts = r_ts[order]
        r_tie = r_tie[order]
        # final lefts: no future right can have ts <= lt once wm passed lt
        fin = l_ts < wm_us
        keep_l_ts = l_ts[~fin].tolist()
        keep_l_id = l_id[~fin].tolist()
        out = None
        if fin.any():
            flt = l_ts[fin]
            if len(r_ts):
                # vectorized backward match: last right at-or-before each
                # left; equal-ts rights are tie-ascending so the last one
                # wins ties
                j = np.searchsorted(r_ts, flt, side="right") - 1
                ok = j >= 0
                jj = np.clip(j, 0, len(r_ts) - 1)
                if tol is not None:
                    ok &= r_ts[jj] >= flt - tol
                m_ts = np.where(ok, r_ts[jj], 0)
                m_tie = np.where(ok, r_tie[jj], 0)
            else:
                ok = np.zeros(len(flt), bool)
                m_ts = m_tie = np.zeros(len(flt), np.int64)
            miss = ~np.asarray(ok, bool)
            out = pd.DataFrame(
                {
                    "key": [key[0]] * len(flt),
                    "left_id": l_id[fin],
                    "left_us": flt,
                    "matched_tie": pd.arrays.IntegerArray(
                        np.asarray(m_tie, np.int64), mask=miss.copy()
                    ),
                    "matched_us": pd.arrays.IntegerArray(
                        np.asarray(m_ts, np.int64), mask=miss.copy()
                    ),
                }
            )
        # evict rights the watermark has retired; keep the newest evicted
        # one as the floor when lookback is unbounded
        horizon = wm_us - (tol if tol is not None else 0)
        cut = int(np.searchsorted(r_ts, horizon, side="left"))
        keep_from = cut if tol is not None or cut == 0 else cut - 1  # floor row
        r_ts = r_ts[keep_from:].tolist()
        r_tie = r_tie[keep_from:].tolist()
        if keep_l_ts or r_ts:
            state.update((keep_l_ts, keep_l_id, r_ts, r_tie))
            # earliest instant the watermark can make a pending left final
            # (timeout T fires when wm > T, so T = lt_ms suffices) ...
            cands = [min(keep_l_ts) // 1000] if keep_l_ts else []
            # ... or retire more rights: in tolerance mode the oldest right
            # dies at r_ts[0] + tol; in floor mode r_ts[0] dies once the
            # watermark passes r_ts[1] (a newer floor takes over)
            if tol is not None and r_ts:
                cands.append(r_ts[0] // 1000 + tol // 1000 + 1)
            elif tol is None and len(r_ts) > 1:
                cands.append(r_ts[1] // 1000)
            if cands:
                state.setTimeoutTimestamp(max(min(cands), wm_ms + 1))
        elif state.exists:
            state.remove()
        if out is not None:
            yield out

    def fn(
        key: Tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            yield from _emit(key, state, _empty, _empty, _empty, _empty)
            return
        batches = list(pdfs)
        rows = batches[0] if len(batches) == 1 else pd.concat(batches)
        if rows[["tag", "ts", "id"]].isnull().any().any():
            raise ValueError(
                "asof_join_stream: tag/ts/id must be non-null "
                "(contract: tag in {0, 1}, id is the row/tie id)"
            )
        us = rows["ts"].astype("int64").floordiv(1000).to_numpy()
        left = rows["tag"].to_numpy().astype(np.int64) == 1
        ids = rows["id"].to_numpy().astype(np.int64)
        yield from _emit(
            key, state, us[left], ids[left], us[~left], ids[~left]
        )

    # event micros inside the pandas UDF come from session-timezone-naive
    # timestamps, while getCurrentWatermarkMs() is true UTC epoch — the
    # finality comparison is only sound when the session clock IS UTC
    tz = tagged.sparkSession.conf.get("spark.sql.session.timeZone")
    if tz not in ("UTC", "Etc/UTC", "GMT"):
        raise ValueError(
            f"asof_join_stream requires spark.sql.session.timeZone=UTC "
            f"(got {tz!r}): event-time vs watermark comparison would be "
            f"offset by the session zone"
        )
    keyed = tagged.withWatermark("ts", watermark).select(
        F.col("key").cast("string").alias("key"),
        F.col("tag").cast("int").alias("tag"),
        F.col("ts"),
        F.col("id").cast("long").alias("id"),
    )
    # SQL equi-join semantics (same contract as operators/temporal):
    # NULL-keyed right rows can never match — drop them; NULL-keyed left
    # rows pass through and emit unmatched from their own NULL group
    keyed = keyed.where((F.col("tag") == 1) | F.col("key").isNotNull())
    return keyed.groupBy("key").applyInPandasWithState(
        fn,
        ASOF_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
