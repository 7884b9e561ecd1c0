"""J5/J6: external leaf membership for multi-point features.

A way/relation lives at ONE Hilbert location (its interior point), but
its geometry can enter other leaf tiles. The reference records, per
leaf, the set of ways/relations whose geometry enters it but whose own
h lives elsewhere (src/hilbert/leaf.rs:214-380, BTreeSet per tile under
a DashMap). Relationally this is a shuffle aggregation — no self-join:

    way_nodes -> node_tile != way_home_tile -> distinct -> collect_set

We replicate the FIXED semantics (both ways and relations contribute;
the reference ships with relations disabled due to a known bug,
src/hilbert/leaf.rs:155-166 — divergence documented per SURVEY §7.3).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from .. import hilbert as hb
from ..functions.geo import zoom_h


def external_members(
    features: DataFrame,
    nodes: DataFrame,
    leaf_zoom: int = 12,
    refs_col: str = "refs",
    id_col: str = "feature_id",
) -> DataFrame:
    """features(id, refs array<node_id>, h) x nodes(feature_id, h) ->
    (leaf_h, external array<feature_id>) for leaves entered by a
    feature's geometry outside its home leaf.

    Sorted ascending + deduped, matching the reference's BTreeSet
    semantics (O4, src/hilbert/leaf.rs:250-284).
    """
    home = features.select(
        F.col(id_col).alias("_fid"), zoom_h(F.col("h"), leaf_zoom).alias("home_leaf")
    )
    refs = features.select(
        F.col(id_col).alias("_fid"), F.explode(F.col(refs_col)).alias("ref_id")
    )
    node_leaf = nodes.select(
        F.col(id_col).alias("ref_id"), zoom_h(F.col("h"), leaf_zoom).alias("node_leaf")
    )
    entered = (
        refs.join(node_leaf, "ref_id")
        .join(home, "_fid")
        .where(F.col("node_leaf") != F.col("home_leaf"))
        .select(F.col("node_leaf").alias("leaf_h"), "_fid")
        .distinct()
    )
    return entered.groupBy("leaf_h").agg(
        F.sort_array(F.collect_set("_fid")).alias("external")
    )


def external_members_from_geometry(
    features: DataFrame,
    leaf_zoom: int = 12,
    id_col: str = "feature_id",
) -> DataFrame:
    """J5 off the feature's OWN u32-grid geometry arrays — no join
    against the (planet-sized) nodes table: the zoom-z tile of a vertex
    is the z-prefix of its h (Hilbert recursion), so
    ``xy2h(gx >> shift, gy >> shift, z)`` equals the node-h path
    bit-for-bit, and way_features already carries the arrays.

    Features whose geometry spans a single leaf tile are dropped
    MAP-SIDE by an array min/max span test before any encode or
    shuffle — when no way crosses a leaf boundary, the stage's jobs
    run over (near-)empty inputs instead of re-joining the planet
    (VERDICT r3 item 5)."""
    d = 1 << (32 - leaf_zoom)
    span = (
        f"array_min(transform(geom_x, v -> v div {d}))"
        f" != array_max(transform(geom_x, v -> v div {d}))"
        f" or array_min(transform(geom_y, v -> v div {d}))"
        f" != array_max(transform(geom_y, v -> v div {d}))"
    )
    tiles = (
        features.where(F.expr(span))
        .select(
            F.col(id_col).alias("_fid"),
            zoom_h(F.col("h"), leaf_zoom).alias("home_leaf"),
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(geom_x)), i -> struct("
                    f"element_at(geom_x, i) div {d} as tx,"
                    f" element_at(geom_y, i) div {d} as ty))"
                )
            ).alias("t"),
        )
        .select("_fid", "home_leaf", F.col("t.tx").alias("tx"), F.col("t.ty").alias("ty"))
        .distinct()
    )

    @F.pandas_udf(LongType())
    def leaf_of(tx: pd.Series, ty: pd.Series) -> pd.Series:
        hs = hb.xy2h(
            tx.to_numpy(dtype=np.uint64), ty.to_numpy(dtype=np.uint64), leaf_zoom
        )
        return pd.Series(hs.astype(np.int64))

    entered = (
        tiles.withColumn("leaf_h", leaf_of(F.col("tx"), F.col("ty")))
        .where(F.col("leaf_h") != F.col("home_leaf"))
        .select("leaf_h", "_fid")
    )
    return entered.groupBy("leaf_h").agg(
        F.sort_array(F.collect_set("_fid")).alias("external")
    )


def external_relation_members(
    relations: DataFrame,
    nodes: DataFrame,
    ways: DataFrame,
    leaf_zoom: int = 12,
) -> DataFrame:
    """J6: same for relations; members are typed (n/w/r) and resolved
    against the matching entity's h (3-way union of typed joins)."""
    mem = relations.select(
        F.col("feature_id").alias("_fid"),
        zoom_h(F.col("h"), leaf_zoom).alias("home_leaf"),
        F.explode("members").alias("m"),
    ).select(
        "_fid",
        "home_leaf",
        F.col("m.etype").alias("etype"),
        F.col("m.ref").alias("ref_id"),
    )
    unions = []
    for etype, tbl in (("n", nodes), ("w", ways), ("r", relations)):
        side = tbl.select(
            F.col("feature_id").alias("ref_id"),
            zoom_h(F.col("h"), leaf_zoom).alias("member_leaf"),
        )
        unions.append(mem.where(F.col("etype") == etype).join(side, "ref_id"))
    from functools import reduce

    resolved = reduce(DataFrame.unionByName, unions)
    entered = (
        resolved.where(F.col("member_leaf") != F.col("home_leaf"))
        .select(F.col("member_leaf").alias("leaf_h"), "_fid")
        .distinct()
    )
    return entered.groupBy("leaf_h").agg(
        F.sort_array(F.collect_set("_fid")).alias("external")
    )


def candidates_with_external(
    inner: DataFrame, external: DataFrame, leaf_h_col: str = "leaf_h"
) -> DataFrame:
    """U1/F5: union a leaf's own features with its external list, deduped
    first-seen (reference DashSet guard, src/filter.rs:51-57)."""
    ext = external.select(
        F.col(leaf_h_col), F.explode("external").alias("feature_id")
    )
    own = inner.select(leaf_h_col, "feature_id")
    return own.unionByName(ext).dropDuplicates([leaf_h_col, "feature_id"])
