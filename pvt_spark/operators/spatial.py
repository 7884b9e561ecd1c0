"""Rectangle (MBR) overlap join via grid banding + reference-point dedup.

The classic distributed spatial-join shape (PBSM / Spatial Hash Join
family): partition space into fixed CxC grid cells, explode each
rectangle to every cell its extent covers (bounded fan-out of
``(w/C + 1) * (h/C + 1)`` — pick C near the typical rectangle size),
equi-join on the cell, then apply the exact closed-interval overlap
test as a residual.

A pair of overlapping rectangles shares SEVERAL cells, so the naive
banding emits duplicates. Instead of a distinct (a full extra shuffle
over the pair set), each pair is emitted only in its REFERENCE CELL —
the cell containing the intersection rectangle's lower-left corner
``(max(a.x_lo, b.x_lo), max(a.y_lo, b.y_lo))``. That corner lies in
exactly one cell, and both rectangles provably cover that cell, so
every overlapping pair survives exactly once with NO dedup pass — the
standard duplicate-avoidance trick from the spatial-join literature
(Patel & DeWitt, SIGMOD'96).

Scale shape: one shuffle per side on (cx, cy); AQE splits dense cells;
no broadcast (both sides may be corpus-sized); the residual + reference
test are whole-stage-codegen row expressions. Coordinates must be
non-negative integers (the engine's u32 grid) — integer ``div`` then
matches mathematical floor everywhere it is used.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_RECT_COLS = ("id", "x_lo", "y_lo", "x_hi", "y_hi")


def _cells(df: DataFrame, cell: int, prefix: str) -> DataFrame:
    out = df.select(*[F.col(k).alias(f"{prefix}_{k}") for k in _RECT_COLS])
    return out.withColumn(
        "cx",
        F.explode(
            F.sequence(
                F.expr(f"{prefix}_x_lo div {int(cell)}"),
                F.expr(f"{prefix}_x_hi div {int(cell)}"),
            )
        ),
    ).withColumn(
        "cy",
        F.explode(
            F.sequence(
                F.expr(f"{prefix}_y_lo div {int(cell)}"),
                F.expr(f"{prefix}_y_hi div {int(cell)}"),
            )
        ),
    )


def mbr_overlap_join(
    rects_a: DataFrame,
    rects_b: DataFrame,
    cell: int,
    anti_reflexive: bool = False,
) -> DataFrame:
    """All pairs of overlapping rectangles (closed intervals, integer
    coords >= 0) between ``rects_a`` and ``rects_b``.

    Inputs carry columns (id, x_lo, y_lo, x_hi, y_hi). Output:
    (a_id, b_id, ix_lo, iy_lo, ix_hi, iy_hi) — the intersection
    rectangle. Each overlapping pair appears exactly once.
    ``anti_reflexive``: keep only b_id > a_id (self-join mode: one row
    per unordered pair, no self-pairs).
    """
    if cell <= 0:
        raise ValueError("cell must be a positive integer")
    a = _cells(rects_a, cell, "a")
    b = _cells(rects_b, cell, "b")
    joined = a.join(b, ["cx", "cy"])
    overlap = (
        (F.col("a_x_lo") <= F.col("b_x_hi"))
        & (F.col("b_x_lo") <= F.col("a_x_hi"))
        & (F.col("a_y_lo") <= F.col("b_y_hi"))
        & (F.col("b_y_lo") <= F.col("a_y_hi"))
    )
    rx = F.greatest("a_x_lo", "b_x_lo")
    ry = F.greatest("a_y_lo", "b_y_lo")
    # integer div, matching _cells: double division would round for
    # coordinates at/above 2^53 and silently drop the pair
    reference = (
        F.col("cx") == F.expr(f"greatest(a_x_lo, b_x_lo) div {int(cell)}")
    ) & (F.col("cy") == F.expr(f"greatest(a_y_lo, b_y_lo) div {int(cell)}"))
    out = joined.where(overlap & reference)
    if anti_reflexive:
        out = out.where(F.col("b_id") > F.col("a_id"))
    return out.select(
        "a_id",
        "b_id",
        rx.alias("ix_lo"),
        ry.alias("iy_lo"),
        F.least("a_x_hi", "b_x_hi").alias("ix_hi"),
        F.least("a_y_hi", "b_y_hi").alias("iy_hi"),
    )
