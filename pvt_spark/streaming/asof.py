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
  in-flight (above-watermark) rows per key plus at most one floor row.

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

    def _emit(key, state: GroupState, new_l, new_r):
        st = list(state.get) if state.exists else [[], [], [], []]
        l_ts = list(st[0]) + [t for t, _ in new_l]
        l_id = list(st[1]) + [i for _, i in new_l]
        r_ts = list(st[2]) + [t for t, _ in new_r]
        r_tie = list(st[3]) + [i for _, i in new_r]
        wm_ms = state.getCurrentWatermarkMs()
        wm_us = wm_ms * 1000
        # rights sorted by (ts, tie): the match scan and the floor pick
        # both want that order
        order = np.lexsort((np.array(r_tie, np.int64), np.array(r_ts, np.int64))) if r_ts else []
        r_ts = [r_ts[j] for j in order]
        r_tie = [r_tie[j] for j in order]
        out_rows = []
        keep_l_ts, keep_l_id = [], []
        for lt, li in zip(l_ts, l_id):
            if lt < wm_us:
                # final: no future right can have ts <= lt
                m_tie = m_ts = None
                for rt, ri in zip(r_ts, r_tie):
                    if rt <= lt and (tol is None or rt >= lt - tol):
                        m_tie, m_ts = ri, rt
                    elif rt > lt:
                        break
                out_rows.append((li, lt, m_tie, m_ts))
            else:
                keep_l_ts.append(lt)
                keep_l_id.append(li)
        # evict rights the watermark has retired; keep the newest evicted
        # one as the floor when lookback is unbounded
        horizon = wm_us - (tol if tol is not None else 0)
        idx = [j for j, rt in enumerate(r_ts) if rt >= horizon]
        if tol is None:
            older = [j for j, rt in enumerate(r_ts) if rt < horizon]
            if older:
                idx = [older[-1]] + idx  # sorted order puts the newest last
        r_ts = [r_ts[j] for j in idx]
        r_tie = [r_tie[j] for j in idx]
        if keep_l_ts or r_ts:
            state.update((keep_l_ts, keep_l_id, r_ts, r_tie))
            if keep_l_ts:
                # re-examine as soon as the watermark can pass a pending left
                state.setTimeoutTimestamp(
                    max(min(keep_l_ts) // 1000 + 1, wm_ms + 1)
                )
        elif state.exists:
            state.remove()
        if out_rows:
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(out_rows),
                    "left_id": [r[0] for r in out_rows],
                    "left_us": [r[1] for r in out_rows],
                    "matched_tie": [r[2] for r in out_rows],
                    "matched_us": [r[3] for r in out_rows],
                }
            )

    def fn(
        key: Tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            yield from _emit(key, state, [], [])
            return
        rows = pd.concat(list(pdfs))
        us = rows["ts"].astype("int64").floordiv(1000).to_numpy()
        tags = rows["tag"].to_numpy()
        ids = rows["id"].to_numpy()
        new_l = [(int(t), int(i)) for t, g, i in zip(us, tags, ids) if g == 1]
        new_r = [(int(t), int(i)) for t, g, i in zip(us, tags, ids) if g == 0]
        yield from _emit(key, state, new_l, new_r)

    keyed = tagged.withWatermark("ts", watermark).select(
        F.col("key").cast("string").alias("key"),
        F.col("tag").cast("int").alias("tag"),
        F.col("ts"),
        F.col("id").cast("long").alias("id"),
    )
    return keyed.groupBy("key").applyInPandasWithState(
        fn,
        ASOF_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
