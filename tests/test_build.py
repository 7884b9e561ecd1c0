"""Full build + resume test on a small synthetic pages table."""

import json
import os

from pyspark.sql import functions as F

from pvt_spark.functions.pvt_codec import decode_tile
from pvt_spark.plans.pipeline import BuildConfig, build_planet
from pvt_spark.sources.pages import synthesize_pages


def test_build_planet_end_to_end(spark, tmp_path):
    planet = str(tmp_path / "planet")
    pages = synthesize_pages(spark, 300, seed=42, partitions=4)
    out = build_planet(spark, pages, planet, BuildConfig(leaf_zoom=12, sort_partitions=4))

    n_points = out["points"].count()
    assert n_points > 100
    assert out["points_sorted"].count() == n_points

    # tree root counts every point
    root = out["tree"].where(F.col("zoom") == 0).collect()
    assert len(root) == 1 and root[0].n_count == n_points

    # content zooms are even, <= leaf
    zooms = {r.zoom for r in out["content"].select("zoom").distinct().collect()}
    assert zooms and all(z % 2 == 0 and z <= 12 for z in zooms)

    # leaf-zoom content includes EVERY tagged feature (no_rule fallback)
    leaf_content = out["content"].where(F.col("zoom") == 12).count()
    assert leaf_content == n_points

    # tiles decode and agree with the content index
    tiles = out["tiles"].collect()
    assert tiles
    by_key = {(t.zoom, t.tile_h): t for t in tiles}
    sample = out["content"].groupBy("zoom", "tile_h").count().limit(20).collect()
    for r in sample:
        t = by_key[(r.zoom, r.tile_h)]
        decoded = decode_tile(bytes(t.payload))
        assert decoded["zoom"] == r.zoom and decoded["tile_h"] == r.tile_h
        n_feats = sum(len(l["features"]) for l in decoded["layers"])
        assert n_feats == t.feature_count

    # lineage sidecars exist with row counts
    lin_path = os.path.join(planet, "points_sorted", "_lineage.json")
    with open(lin_path) as f:
        lin = json.load(f)
    assert lin["row_count"] == n_points and lin["partitions"]

    # tile manifest row count == distinct (zoom, tile_h) of content
    assert (
        out["tile_manifest"].count()
        == out["content"].select("zoom", "tile_h").distinct().count()
    )


def test_build_resume_skips_completed_stages(spark, tmp_path):
    planet = str(tmp_path / "planet")
    pages = synthesize_pages(spark, 120, seed=7, partitions=2)
    cfg = BuildConfig(leaf_zoom=10, sort_partitions=2)
    first = build_planet(spark, pages, planet, cfg)
    mtime = os.path.getmtime(os.path.join(planet, "points_sorted", "_lineage.json"))
    again = build_planet(spark, pages, planet, cfg)
    assert os.path.getmtime(os.path.join(planet, "points_sorted", "_lineage.json")) == mtime
    assert again["points"].count() == first["points"].count()

    # changing config fingerprint forces recompute
    cfg2 = BuildConfig(leaf_zoom=12, sort_partitions=2)
    build_planet(spark, pages, planet, cfg2)
    assert os.path.getmtime(os.path.join(planet, "points_sorted", "_lineage.json")) > mtime
