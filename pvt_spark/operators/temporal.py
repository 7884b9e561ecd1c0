"""Temporal joins Spark lacks natively: backward as-of join and banded
interval (range) join, both expressed as shuffle-bounded DataFrame plans.

``asof_join`` — for each left row, the latest right row with the same key
and right_ts <= left_ts (optionally within a lookback tolerance). The naive
formulation is an inequality join (quadratic per key); here it is the
classic union + ordered-window scan: tag both sides, union, one window
ordered by (ts, tag, tie) per key, ``last(payload_struct, ignorenulls)``
carries the most recent right row forward onto every left row. Cost: ONE
shuffle on the key plus a per-partition sort — linear, and the same plan a
stream-table join would compile to. At 100 TB the unit of parallelism is
the key; a single pathological key (one user with 10^9 events) would pin a
task. ``split_threshold`` is the escape hatch: keys whose combined row
count exceeds it are pre-split on ``n_buckets`` coarse ts buckets — the
window partitions on (key, bucket), and bucket boundaries are stitched
with a per-(key, bucket) "last right row so far" carry table (one row per
occupied bucket, carried by a tiny per-key window and equi-joined back).
Cold keys keep the plain single-window plan inside the SAME job; the two
paths differ only in the computed bucket id (cold = constant 0), so the
result is one plan with no union. Value-identical to the unsplit plan by
construction (the carry is exactly the latest right payload from any
earlier bucket) and pinned by tests + the q58 gate entry against q50's
independent quadratic oracle.

``range_join_points`` — join points to intervals of the same key with
lo <= ts <= hi. The scalable form bands time into fixed-width buckets:
intervals explode to the buckets they cover (bounded fan-out of
``len/band + 1``), points map to exactly one bucket, and the join becomes
an equi-join on (key, band) with a residual BETWEEN filter. Each matching
pair is produced exactly once (the point's single band), so no dedup pass.
Pick ``band_us`` near the typical interval length: fan-out stays O(1) and
the shuffle keys stay fine-grained enough for AQE to balance.

Both run entirely on built-in expressions — no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tie: str,
    tolerance_us: int | None = None,
    split_threshold: int | None = None,
    n_buckets: int = 64,
) -> DataFrame:
    """Backward as-of join: attach the latest right row per key at-or-before
    each left row's timestamp.

    ``split_threshold``: when set, keys whose combined (left + right) row
    count exceeds it are windowed per (key, ts-bucket) instead of per key
    — ``n_buckets`` buckets spanning the key's own ts range — with the
    bucket boundaries stitched by a carry table, so one 10^9-row key
    parallelizes across ``n_buckets`` tasks instead of pinning one.
    Detection costs one count aggregate over the tagged union; leave it
    None (default) for the single-shuffle plan.

    ``left_ts`` / ``right_ts`` are bigint epoch-microsecond columns (cast
    with ``F.unix_micros`` upstream). ``tie`` is a unique bigint on the
    right that breaks equal-timestamp ties deterministically (largest
    wins). ``right_cols`` are the right payload columns to attach; they
    arrive packed through one struct so all of them come from the SAME
    matched row even if individually null. Left columns pass through
    unchanged; matched columns are null where no right row qualifies
    (or the match is older than ``tolerance_us``). NULL join keys follow
    SQL equi-join semantics: they never match — NULL-keyed left rows
    come back unmatched, NULL-keyed right rows match nothing.
    """
    payload = F.struct(
        F.col(right_ts).alias("__ts"),
        F.col(tie).alias("__tie"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    left_rest = [c for c in left.columns if c not in on]
    # SQL equi-join semantics: a NULL key never matches. The window
    # partition would otherwise group NULL keys together and match
    # across them — drop NULL-keyed right rows (inert under SQL
    # semantics); NULL-keyed left rows pass through unmatched because
    # their partition then contains no payload to carry.
    for k in on:
        right = right.filter(F.col(k).isNotNull())
    r = right.select(
        *[F.col(k) for k in on],
        F.col(right_ts).alias("__ots"),
        F.col(tie).alias("__otie"),
        F.lit(0).alias("__tag"),
        payload.alias("__pay"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_rest],
    )
    l = left.select(
        *[F.col(k) for k in on],
        F.col(left_ts).alias("__ots"),
        F.lit(None).cast("long").alias("__otie"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(r.schema["__pay"].dataType).alias("__pay"),
        *left_rest,
    )
    # Right rows sort before left rows at equal ts (tag 0 < 1): the match
    # is inclusive. Within equal-ts right rows, larger tie sorts last and
    # wins the last().
    u = r.unionByName(l)
    if split_threshold is None:
        w = (
            Window.partitionBy(*on)
            .orderBy("__ots", "__tag", "__otie")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = u.withColumn("__m", F.last("__pay", ignorenulls=True).over(w)).filter(
            F.col("__tag") == 1
        )
    else:
        # hot-key pre-split: per-key stats gate the bucketing; the stats
        # table holds ONLY keys above the threshold, so it broadcasts
        stats = (
            u.groupBy(*on)
            .agg(
                F.count(F.lit(1)).alias("__cnt"),
                F.min("__ots").alias("__kmin"),
                F.max("__ots").alias("__kmax"),
            )
            .where(F.col("__cnt") > int(split_threshold))
            .select(
                *on,
                "__kmin",
                (
                    F.floor(
                        (F.col("__kmax") - F.col("__kmin")) / F.lit(int(n_buckets))
                    )
                    + 1
                ).alias("__width"),
            )
        )
        u2 = u.join(F.broadcast(stats), on, "left").withColumn(
            "__bkt",
            F.when(
                F.col("__width").isNotNull(),
                F.floor((F.col("__ots") - F.col("__kmin")) / F.col("__width")),
            ).otherwise(F.lit(0)),
        )
        w = (
            Window.partitionBy(*on, "__bkt")
            .orderBy("__ots", "__tag", "__otie")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        u3 = u2.withColumn("__m_local", F.last("__pay", ignorenulls=True).over(w))
        # boundary carry: per occupied (hot key, bucket), the latest right
        # payload in that bucket (max_by ignores left rows via the NULL
        # ordering key), then "latest from any EARLIER bucket" via a
        # per-key window over <= n_buckets rows
        wc = (
            Window.partitionBy(*on)
            .orderBy("__bkt")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry = (
            u2.where(F.col("__width").isNotNull())
            .groupBy(*on, "__bkt")
            .agg(
                F.max_by(
                    "__pay",
                    F.when(
                        F.col("__tag") == 0, F.struct(F.col("__ots"), F.col("__otie"))
                    ),
                ).alias("__last_pay")
            )
            .withColumn("__carry", F.last("__last_pay", ignorenulls=True).over(wc))
            .select(*on, "__bkt", "__carry")
        )
        out = (
            u3.join(carry, [*on, "__bkt"], "left")
            .withColumn("__m", F.coalesce("__m_local", "__carry"))
            .filter(F.col("__tag") == 1)
        )
    if tolerance_us is not None:
        out = out.withColumn(
            "__m",
            F.when(
                F.col("__m.__ts") >= F.col("__ots") - F.lit(int(tolerance_us)), F.col("__m")
            ),
        )
    matched = [F.col("__m.__ts").alias(f"matched_{right_ts}")] + [
        F.col(f"__m.{c}").alias(f"matched_{c}") for c in right_cols
    ]
    return out.select(*left.columns, *matched)


def range_join_points(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    point_ts: str,
    lo: str,
    hi: str,
    band_us: int,
) -> DataFrame:
    """Interval-overlap join via time banding: every (interval, point) pair
    of the same key with ``lo <= point_ts <= hi``, each produced exactly
    once. All columns of both inputs survive (point columns must not
    collide with interval columns). ``point_ts``/``lo``/``hi`` are bigint
    epoch micros.
    """
    band = F.lit(int(band_us))
    iv = intervals.withColumn(
        "__band",
        F.explode(F.sequence(F.floor(F.col(lo) / band), F.floor(F.col(hi) / band))),
    )
    pt = points.withColumn("__band", F.floor(F.col(point_ts) / band))
    cond = [iv["__band"] == pt["__band"]] + [iv[k] == pt[k] for k in on]
    joined = iv.join(pt, cond, "inner").filter(
        (pt[point_ts] >= iv[lo]) & (pt[point_ts] <= iv[hi])
    )
    keep = [iv[c] for c in intervals.columns] + [
        pt[c] for c in points.columns if c not in on
    ]
    return joined.select(*keep)


def resample_daily(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Per-key DAILY resample with gap filling and forward fill:
    (key, day, n_events, sum_value_milli, filled_sum_milli) for EVERY
    day of the table's global [min, max] span — empty days appear with
    n_events = 0 and carry the most recent non-empty day's sum
    (0 before the first observation).

    Scale shape: the heavy pass is ONE groupBy(key, day) with map-side
    partials over the event table; the day grid is keys x days — built
    from a single-row min/max aggregate exploded through ``sequence``,
    never from the data rows — so grid size is bounded by the key
    cardinality and the calendar, not the corpus. The forward fill
    avoids engine-specific IGNORE NULLS: a cumulative non-empty-day
    counter forms carry groups, and the carried value is the single
    non-empty day's sum within each (key, group) — two window passes
    over the (small) grid, expressible identically in any SQL engine
    (the q63 oracle runs the same ladder in DuckDB). Values aggregate
    as exact milli integers (the certified idiom).
    """
    day = F.to_date(F.col(ts_col))
    per_day = (
        events.select(
            F.col(key_col).alias("key"),
            day.alias("day"),
            F.expr(f"cast(round({value_col} * 1000) as bigint)").alias("_vm"),
        )
        .groupBy("key", "day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("_vm").alias("sum_value_milli"),
        )
    )
    span = events.agg(
        F.to_date(F.min(ts_col)).alias("d0"), F.to_date(F.max(ts_col)).alias("d1")
    )
    grid = (
        events.select(F.col(key_col).alias("key"))
        .distinct()
        .crossJoin(F.broadcast(span))
        .select(
            "key",
            F.explode(
                F.expr("sequence(d0, d1, interval 1 day)")
            ).alias("day"),
        )
    )
    filled = (
        grid.join(per_day, ["key", "day"], "left")
        .select(
            "key",
            "day",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("sum_value_milli", F.lit(0)).alias("sum_value_milli"),
        )
    )
    w_cum = (
        Window.partitionBy("key")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_grp = filled.withColumn(
        "_grp",
        F.sum(F.when(F.col("n_events") > 0, 1).otherwise(0)).over(w_cum),
    )
    w_grp = Window.partitionBy("key", "_grp")
    return (
        with_grp.withColumn(
            "filled_sum_milli",
            F.coalesce(
                F.max(
                    F.when(F.col("n_events") > 0, F.col("sum_value_milli"))
                ).over(w_grp),
                F.lit(0),
            ),
        )
        .drop("_grp")
    )


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Strict-order funnel: per key, the earliest completion chain of
    ``steps`` — step k's timestamp is the MINIMUM event of that type
    strictly after step k-1's timestamp (step 1: the global minimum of
    its type). Output: one row per key that reached step 1, with
    ``step_1_us .. step_n_us`` (micros; NULL from the first missed step
    onward) — the canonical conversion-funnel semantics (earliest-
    possible chain, which maximizes completion).

    Scale shape: no per-key ordered scan over raw events. Each phase
    filters events to ONE step type (pushed to the scan), joins the
    per-key frontier table (|keys| rows, broadcastable against the
    event table) and takes a min aggregate — k-1 equi-joins on the key,
    each moving only per-key rows plus one filtered event subset.
    """
    if not steps:
        raise ValueError("funnel_steps needs at least one step")
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    base = events.select(
        F.col(key_col).alias("key"),
        F.col(type_col).alias("t"),
        us.alias("us"),
    )
    frontier = (
        base.where(F.col("t") == steps[0])
        .groupBy("key")
        .agg(F.min("us").alias("step_1_us"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            base.where(F.col("t") == step)
            .join(
                frontier.select("key", F.col(f"step_{i-1}_us").alias("_prev")),
                "key",
            )
            .where(F.col("us") > F.col("_prev"))
            .groupBy("key")
            .agg(F.min("us").alias(f"step_{i}_us"))
        )
        frontier = frontier.join(nxt, "key", "left")
    return frontier
