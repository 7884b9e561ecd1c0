"""S12/J7: ad-hoc tile lookup over the built tiles table.

The reference serves ``planet.tile(z, x, y)`` by descending the Hilbert
tree to an index range (src/lib.rs:84-115, src/hilbert/tree.rs:146-214).
Relationally the whole descent is a predicate: the tiles table is
partitioned by zoom and Hilbert-sorted, so the lookup prunes to one
file/row-group via parquet min/max stats — batch-friendly, and the same
predicate answers ad-hoc composition against the content index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.geo import zoom_h_range
from ..tile import Tile


def tile_lookup(tiles: DataFrame, z: int, x: int, y: int) -> DataFrame:
    """tiles table -> the one payload row for tile (z, x, y).

    Odd zooms / zooms above the built pyramid simply return empty (F6,
    reference src/hilbert/tree.rs:146-152 returns None).
    """
    t = Tile.from_zxy(z, x, y)
    return tiles.where((F.col("zoom") == z) & (F.col("tile_h") == t.h))


def features_in_tile(
    points_sorted: DataFrame, z: int, x: int, y: int, h_col: str = "h"
) -> DataFrame:
    """Ad-hoc composition source: all features whose zoom-32 h falls in the
    tile's range — a pure range predicate on the sort key, answered by
    partition pruning (the Spark analog of the reference's tree find)."""
    t = Tile.from_zxy(z, x, y)
    lo, hi = zoom_h_range(t.h, z)
    if hi == (1 << 63) - 1:  # last tile on the curve: closed range
        return points_sorted.where(F.col(h_col) >= lo)
    return points_sorted.where((F.col(h_col) >= lo) & (F.col(h_col) < hi))


def open_planet(spark: SparkSession, planet_dir: str) -> dict[str, DataFrame]:
    """Open a built planet's stage tables (the loadPlanet analog).

    ``tiles`` resolves through the compaction generation view when
    un-materialized ``tiles_delta`` generations exist (plans/compaction)
    so a compacted planet never serves stale payloads; with no
    generations it is the plain base scan — same plan as before.
    """
    import os

    out = {}
    for name in ["points_sorted", "leaves", "tile_tree", "content", "tiles"]:
        try:
            if name == "tiles" and os.path.isdir(
                os.path.join(planet_dir, "tiles_delta")
            ):
                from ..plans.compaction import read_tiles

                out[name] = read_tiles(spark, planet_dir)
            else:
                out[name] = spark.read.parquet(f"{planet_dir}/{name}")
        except Exception:
            pass
    return out
