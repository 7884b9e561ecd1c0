"""End-to-end Spark tests: pages -> extract -> geotag -> sort -> leaves -> tree.

Golden invariants come from the reference's own unit tests
(3 leaf tiles at z12 for nodes4, reference src/hilbert/leaf.rs:424-454).
"""

import numpy as np
from pyspark.sql import functions as F

from pvt_spark import hilbert as hb
from pvt_spark.functions.geo import zoom_h, zoom_h_range
from pvt_spark.operators.extract import extract_pages, verify_extraction
from pvt_spark.operators.geotag import geotag
from pvt_spark.operators.hilbert_sort import hilbert_sort
from pvt_spark.operators.leaves import build_leaves
from pvt_spark.operators.tree import build_tile_tree, count_children
from pvt_spark.sources.fixtures import nodes4
from pvt_spark.sources.pages import synthesize_pages


def test_nodes4_three_leaves_at_z12(spark):
    # reference src/hilbert/leaf.rs:424-454: 4 nodes -> 3 leaf tiles at z12
    n4 = nodes4(spark)
    leaves = build_leaves(n4, leaf_zoom=12)
    assert leaves.count() == 3
    total = leaves.agg(F.sum("n_count")).first()[0]
    assert total == 4


def test_nodes4_cavallero_h(spark):
    n4 = nodes4(spark).where(F.col("feature_id") == 137747).first()
    assert hb.signed_to_h(np.array([n4.h]))[0] == 3660422102463285814
    # Scotts Valley-area z12 tile id golden (src/hilbert/tree.rs:227)
    z12 = (
        nodes4(spark)
        .select(zoom_h(F.col("h"), 12).alias("t"))
        .where(F.col("feature_id").isNull() | F.lit(True))
        .collect()
    )
    assert 3329134 in {r.t for r in z12}


def test_extraction_invariant(spark):
    pages = synthesize_pages(spark, 300, seed=42, partitions=4)
    assert verify_extraction(pages).count() == 0
    # determinism across partitioning: same rows at different parallelism
    again = synthesize_pages(spark, 300, seed=42, partitions=7)
    a = {r.url: r.text for r in pages.select("url", "text").collect()}
    b = {r.url: r.text for r in again.select("url", "text").collect()}
    assert a == b


def test_geotag_h_matches_kernel(spark):
    pages = extract_pages(synthesize_pages(spark, 200, seed=42, partitions=4))
    pts = geotag(pages).collect()
    assert len(pts) > 100  # expect ~1.5 mentions/page
    lon = np.array([r.lon_dm7 for r in pts], dtype=np.int64)
    lat = np.array([r.lat_dm7 for r in pts], dtype=np.int64)
    expect = hb.lonlat_to_signed_h(lon, lat)
    got = np.array([r.h for r in pts], dtype=np.int64)
    assert np.array_equal(expect, got)


def test_sort_and_tree_invariants(spark):
    pages = extract_pages(synthesize_pages(spark, 400, seed=42, partitions=4))
    pts = hilbert_sort(geotag(pages), num_partitions=8)
    n_points = pts.count()
    leaves = build_leaves(pts, leaf_zoom=12)
    tree = build_tile_tree(leaves, leaf_zoom=12)

    # per-level totals all equal the point count
    per_zoom = {r.zoom: r.total for r in tree.groupBy("zoom").agg(F.sum("n_count").alias("total")).collect()}
    assert set(per_zoom) == {0, 2, 4, 6, 8, 10, 12}
    assert all(v == n_points for v in per_zoom.values())

    # root exists and is unique
    root = tree.where(F.col("zoom") == 0).collect()
    assert len(root) == 1 and root[0].tile_h == 0

    # child mask popcount == number of distinct children per parent
    t = count_children(tree)
    interior = t.where(F.col("zoom") < 12)
    kids = (
        tree.where(F.col("zoom") > 0)
        .select(
            (F.col("zoom") - 2).alias("pz"),
            F.shiftrightunsigned("tile_h", 4).alias("ph"),
            "tile_h",
        )
        .groupBy("pz", "ph")
        .agg(F.countDistinct("tile_h").alias("n_kids"))
    )
    joined = interior.join(
        kids, (interior.zoom == kids.pz) & (interior.tile_h == kids.ph), "inner"
    )
    bad = joined.where(F.col("n_children") != F.col("n_kids")).count()
    assert bad == 0

    # h range containment: every leaf's h extent inside its tile range
    leaf_rows = leaves.collect()
    for r in leaf_rows[:50]:
        lo, hi = zoom_h_range(r.leaf_h, 12)
        assert lo <= r.h_min <= r.h_max
        assert r.h_max < hi or hi == (1 << 63) - 1


def test_hilbert_sort_partition_ordering(spark):
    pages = extract_pages(synthesize_pages(spark, 200, seed=1, partitions=4))
    pts = hilbert_sort(geotag(pages), num_partitions=4)

    def check(it):
        prev = None
        for row in it:
            if prev is not None:
                assert row.h >= prev
            prev = row.h
        return iter(())

    pts.rdd.mapPartitions(lambda it: check(it)).count()
    # cross-partition: max(h) of partition i <= min(h) of partition i+1
    import pandas as pd

    bounds = pts.withColumn("pid", F.spark_partition_id()).groupBy("pid").agg(
        F.min("h").alias("lo"), F.max("h").alias("hi")
    ).orderBy("pid").toPandas()
    for i in range(len(bounds) - 1):
        assert bounds.hi[i] <= bounds.lo[i + 1]


def test_fused_pages_to_points_equals_chain(spark):
    from pvt_spark.operators.geotag import pages_to_points

    pages = synthesize_pages(spark, 150, seed=42, partitions=3)
    chained = geotag(extract_pages(pages)).collect()
    fused = pages_to_points(pages).collect()
    key = lambda r: (r.url, r.mention_idx)  # noqa: E731
    a = {key(r): (r.lon_dm7, r.lat_dm7, r.h) for r in chained}
    b = {key(r): (r.lon_dm7, r.lat_dm7, r.h) for r in fused}
    assert a == b
