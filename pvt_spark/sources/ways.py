"""Deterministic distributed way/relation derivation from a points table.

The production engine ingests real way/relation tables (OSM-derived
roads/boundaries keyed to node ids). For benchmarks and the staged
pipeline's mixed-build mode this module derives them FROM the extracted
points, hash-deterministically (same points -> same ways regardless of
partitioning), so a mixed build needs no external data.

Construction: each point hashes into one of ``n_ways`` groups; a way's
refs are its group's points in Hilbert order (spatially coherent lines);
even groups with >= 4 refs close into rings. Everything is JVM-side
(hash, groupBy, collect_list) — no driver loops, scales with the points
table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_WAY_KINDS = ["highway", "building", "natural", "power"]
_WAY_VALS = ["primary", "yes", "wood", "line"]


def synthesize_ways(
    points: DataFrame, n_ways: int, seed: int = 7, grp=None
) -> DataFrame:
    """points(feature_id, h) -> ways(feature_id, refs array<long>,
    tags map<string,string>) with ring/line mix.

    ``grp``: optional Column overriding the group assignment (default
    xxhash64) — lets oracle-checked queries use a grouping both Spark
    and an external SQL engine can reproduce exactly."""
    if grp is None:
        grp = F.pmod(F.xxhash64(F.col("feature_id"), F.lit(seed)), F.lit(n_ways))
    members = points.select(
        F.col("feature_id").alias("ref_id"), grp.alias("g"), "h"
    )
    ways = (
        members.groupBy("g")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(h, ref_id))), s -> s.ref_id)"
            ).alias("refs")
        )
        .where(F.size("refs") >= 2)
    )
    closed = (F.pmod(F.col("g"), F.lit(2)) == 0) & (F.size("refs") >= 4)
    refs = F.when(closed, F.concat("refs", F.slice("refs", 1, 1))).otherwise(
        F.col("refs")
    )
    kind = F.element_at(
        F.array(*[F.lit(k) for k in _WAY_KINDS]),
        F.pmod(F.col("g"), F.lit(len(_WAY_KINDS))).cast("int") + 1,
    )
    val = F.element_at(
        F.array(*[F.lit(v) for v in _WAY_VALS]),
        F.pmod(F.col("g"), F.lit(len(_WAY_VALS))).cast("int") + 1,
    )
    return ways.select(
        F.xxhash64(F.lit("way"), F.col("g")).alias("feature_id"),
        refs.alias("refs"),
        F.map_from_arrays(F.array(kind), F.array(val)).alias("tags"),
    )


def synthesize_relations(ways: DataFrame, n_relations: int, seed: int = 11) -> DataFrame:
    """ways(feature_id) -> relations(feature_id, members
    array<struct<etype,ref>>, tags): each way hashes into one relation."""
    grp = F.pmod(F.xxhash64(F.col("feature_id"), F.lit(seed)), F.lit(n_relations))
    return (
        ways.select(grp.alias("g"), F.col("feature_id").alias("ref"))
        .groupBy("g")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(ref)), r -> struct('w' as etype, r as ref))"
            ).alias("members")
        )
        .select(
            F.xxhash64(F.lit("rel"), F.col("g")).alias("feature_id"),
            "members",
            F.map_from_arrays(
                F.array(F.lit("place")), F.array(F.lit("region"))
            ).alias("tags"),
        )
    )
