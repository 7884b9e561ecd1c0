"""A3: leaf construction — one row per non-empty leaf tile.

The reference merge-scans h-sorted node/way streams emitting a ``Leaf``
with the *starting index* of each entity class per leaf tile
(reference src/hilbert/leaf.rs:41-212). Start indexes are an artifact
of the flat-array model; relationally a leaf is its tile id + per-class
counts + h extent, computed as ONE map-side-combinable aggregation over
the sorted points (no extra shuffle beyond the groupBy, and with AQE
the partial aggregation happens within the Hilbert-sorted partitions).

Leaf zoom must be even and <= 14 (reference src/manifest.rs:90-105).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.geo import zoom_h


def validate_leaf_zoom(leaf_zoom: int) -> None:
    if leaf_zoom % 2 != 0 or not (0 < leaf_zoom <= 14):
        raise ValueError(f"leaf zoom must be even and in (0, 14], got {leaf_zoom}")


def with_leaf_h(df: DataFrame, leaf_zoom: int, h_col: str = "h") -> DataFrame:
    return df.withColumn("leaf_h", zoom_h(F.col(h_col), leaf_zoom))


def build_leaves(
    points: DataFrame, leaf_zoom: int = 12, entity_col: str | None = None
) -> DataFrame:
    """points(h, ...) -> leaves(leaf_h, n_count[, w_count, r_count], h_min, h_max).

    If ``entity_col`` is given (values 'n'/'w'/'r' like the reference's
    node/way/relation classes) the counts are pivoted per class.
    """
    validate_leaf_zoom(leaf_zoom)
    keyed = with_leaf_h(points, leaf_zoom)
    if entity_col is None:
        return keyed.groupBy("leaf_h").agg(
            F.count(F.lit(1)).alias("n_count"),
            F.min("h").alias("h_min"),
            F.max("h").alias("h_max"),
        )
    return keyed.groupBy("leaf_h").agg(
        F.count(F.when(F.col(entity_col) == "n", 1)).alias("n_count"),
        F.count(F.when(F.col(entity_col) == "w", 1)).alias("w_count"),
        F.count(F.when(F.col(entity_col) == "r", 1)).alias("r_count"),
        F.min("h").alias("h_min"),
        F.max("h").alias("h_max"),
    )
