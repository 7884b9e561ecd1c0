"""A4: the Hilbert tile tree — bottom-up even-zoom rollup with child masks.

The reference builds interior tiles per even zoom, each storing a u16
mask of which of its 16 possible grandchildren exist plus a pointer to
the first child (reference src/hilbert/hilbert_tile.rs:23-123). In a
relational model the pointer is unnecessary; the tree IS the table

    tile_tree(zoom int, tile_h long, child_mask int,
              n_count long, leaf_count long, h_min long, h_max long)

built by a ~7-iteration driver loop (leaf_zoom .. 0 step -2), each
iteration one small groupBy on ``tile_h >> 4`` with
``bit_or(shiftleft(1, tile_h & 15))`` — a 16x row reduction per level,
so cost is dominated by the first level and the loop adds no full-data
shuffles.

Tile-existence semantics (F6): only even zooms <= leaf_zoom exist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_tile_tree(leaves: DataFrame, leaf_zoom: int) -> DataFrame:
    """leaves(leaf_h, n_count, h_min, h_max, ...) -> full even-zoom tree.

    ONE explode + ONE shuffle (the same single-pass trick as the content
    pyramid): each leaf emits one row per ancestor zoom carrying the
    mask bit of the z+2 child that contains it; a single groupBy(zoom,
    tile_h) with bit_or/sums/min/max then produces every interior level
    at once. The previous per-level rollup loop paid 6 sequential
    shuffle+checkpoint barriers (~1s scheduling each) for a 16x-shrinking
    aggregate — measured 9.6s -> ~2s on a 535k-leaf build. bit_or over
    per-leaf bits equals bit_or over existing children (a child's bit is
    set iff at least one leaf lives under it).
    """
    count_cols = [c for c in leaves.columns if c.endswith("_count")]
    leaf_level = leaves.select(
        F.lit(leaf_zoom).alias("zoom"),
        F.col("leaf_h").alias("tile_h"),
        F.lit(0).alias("child_mask"),  # leaves have no children in-tree
        *[F.col(c) for c in count_cols],
        F.lit(1).alias("leaf_count"),
        F.col("h_min"),
        F.col("h_max"),
    )
    zooms = list(range(leaf_zoom - 2, -1, -2))
    if not zooms:
        return leaf_level
    anc = F.array(
        *[
            F.struct(
                F.lit(z).alias("zoom"),
                F.shiftrightunsigned(
                    F.col("leaf_h"), 2 * (leaf_zoom - z)
                ).alias("tile_h"),
                F.expr(
                    f"shiftleft(1, cast(shiftrightunsigned(leaf_h, "
                    f"{2 * (leaf_zoom - z - 2)}) & 15 as int))"
                ).alias("mask_bit"),
            )
            for z in zooms
        ]
    )
    exploded = leaves.select(
        F.explode(anc).alias("a"), *count_cols, F.col("h_min"), F.col("h_max")
    )
    interior = (
        exploded.groupBy(F.col("a.zoom").alias("zoom"), F.col("a.tile_h").alias("tile_h"))
        .agg(
            F.expr("bit_or(a.mask_bit)").cast("int").alias("child_mask"),
            *[F.sum(c).alias(c) for c in count_cols],
            F.count(F.lit(1)).alias("leaf_count"),
            F.min("h_min").alias("h_min"),
            F.max("h_max").alias("h_max"),
        )
        .select(
            "zoom", "tile_h", "child_mask", *count_cols, "leaf_count",
            "h_min", "h_max",
        )
    )
    return leaf_level.unionByName(interior)


def count_children(tree: DataFrame) -> DataFrame:
    """A7: popcount of the child mask per interior tile."""
    return tree.withColumn("n_children", F.bit_count(F.col("child_mask")))


def find_tile(tree: DataFrame, zoom: int, tile_h: int) -> DataFrame:
    """J7: tile lookup = equi predicate; Catalyst prunes via min/max stats."""
    return tree.where((F.col("zoom") == zoom) & (F.col("tile_h") == tile_h))
