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

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_tile_tree(leaves: DataFrame, leaf_zoom: int) -> DataFrame:
    """leaves(leaf_h, n_count, h_min, h_max, ...) -> full even-zoom tree."""
    count_cols = [c for c in leaves.columns if c.endswith("_count")]
    cur = leaves.select(
        F.lit(leaf_zoom).alias("zoom"),
        F.col("leaf_h").alias("tile_h"),
        F.lit(0).alias("child_mask"),  # leaves have no children in-tree
        *[F.col(c) for c in count_cols],
        F.lit(1).alias("leaf_count"),
        F.col("h_min"),
        F.col("h_max"),
    )
    levels = [cur]
    for z in range(leaf_zoom - 2, -1, -2):
        child = cur.select(
            F.shiftrightunsigned(F.col("tile_h"), 4).alias("parent_h"),
            F.expr("shiftleft(1, cast(tile_h & 15 as int))").alias("mask_bit"),
            *count_cols,
            "leaf_count",
            "h_min",
            "h_max",
        )
        cur = (
            child.groupBy("parent_h")
            .agg(
                F.expr("bit_or(mask_bit)").alias("child_mask"),
                *[F.sum(c).alias(c) for c in count_cols],
                F.sum("leaf_count").alias("leaf_count"),
                F.min("h_min").alias("h_min"),
                F.max("h_max").alias("h_max"),
            )
            .select(
                F.lit(z).alias("zoom"),
                F.col("parent_h").alias("tile_h"),
                F.col("child_mask").cast("int").alias("child_mask"),
                *count_cols,
                "leaf_count",
                "h_min",
                "h_max",
            )
        )
        # each level is 16x smaller; persist so the union doesn't recompute
        cur = cur.localCheckpoint(eager=False)
        levels.append(cur)
    return reduce(DataFrame.unionByName, levels)


def count_children(tree: DataFrame) -> DataFrame:
    """A7: popcount of the child mask per interior tile."""
    return tree.withColumn("n_children", F.bit_count(F.col("child_mask")))


def find_tile(tree: DataFrame, zoom: int, tile_h: int) -> DataFrame:
    """J7: tile lookup = equi predicate; Catalyst prunes via min/max stats."""
    return tree.where((F.col("zoom") == zoom) & (F.col("tile_h") == tile_h))
