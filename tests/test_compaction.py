"""Incremental compaction == full rebuild, byte-for-byte.

Base build over P0, then two delta compactions (P1, P2) must produce
md5-identical tile payloads, an identical tree, and an identical
manifest to ONE full build over P0+P1+P2 — and folding the delta
generations back into the base (materialize) must change nothing.
"""

from pyspark.sql import functions as F

from pvt_spark.plans.compaction import (
    compact_planet,
    materialize_tiles,
    read_tiles,
)
from pvt_spark.plans.pipeline import BuildConfig, build_planet
from pvt_spark.sources.pages import synthesize_pages


def _tile_map(df):
    return {
        (r.zoom, r.tile_h): (r.m, r.feature_count, r.layer_count)
        for r in df.select(
            "zoom",
            "tile_h",
            F.md5(F.col("payload")).alias("m"),
            "feature_count",
            "layer_count",
        ).collect()
    }


def _rows(df):
    cols = sorted(df.columns)
    return {tuple(r[c] for c in cols) for r in df.select(*cols).collect()}


def test_compaction_equals_full_rebuild(spark, tmp_path):
    cfg = BuildConfig()
    p0 = synthesize_pages(spark, 150, seed=1, partitions=2)
    d1 = synthesize_pages(spark, 60, seed=2, partitions=1)
    d2 = synthesize_pages(spark, 40, seed=3, partitions=1)
    inc_dir = str(tmp_path / "inc")
    full_dir = str(tmp_path / "full")

    build_planet(spark, p0, inc_dir, cfg)
    s1 = compact_planet(spark, inc_dir, d1, cfg)
    s2 = compact_planet(spark, inc_dir, d2, cfg)
    assert s1["gen"] == 1 and s2["gen"] == 2
    assert s1["dirty_tiles"] > 0 and s1["delta_rows"] > 0

    build_planet(
        spark, p0.unionByName(d1).unionByName(d2), full_dir, cfg
    )

    full_tiles = _tile_map(spark.read.parquet(full_dir + "/tiles"))
    inc_tiles = _tile_map(read_tiles(spark, inc_dir))
    assert inc_tiles == full_tiles and full_tiles

    # compaction only rebuilt the dirty subset, not the world
    n_recomposed = sum(
        1
        for _ in spark.read.parquet(inc_dir + "/tiles_delta/gen=1").collect()
    )
    assert 0 < n_recomposed < len(full_tiles)

    assert _rows(spark.read.parquet(inc_dir + "/tile_tree")) == _rows(
        spark.read.parquet(full_dir + "/tile_tree")
    )
    assert _rows(spark.read.parquet(inc_dir + "/tile_manifest")) == _rows(
        spark.read.parquet(full_dir + "/tile_manifest")
    )
    assert _rows(spark.read.parquet(inc_dir + "/zoom_metrics")) == _rows(
        spark.read.parquet(full_dir + "/zoom_metrics")
    )
    # appended points match the full build's point set exactly
    keys = ["feature_id", "h"]
    assert _rows(spark.read.parquet(inc_dir + "/points_sorted").select(*keys)) == _rows(
        spark.read.parquet(full_dir + "/points_sorted").select(*keys)
    )

    # serve path resolves through the generation view pre-materialize
    from pvt_spark.operators.serve import open_planet

    assert _tile_map(open_planet(spark, inc_dir)["tiles"]) == full_tiles

    # major compaction folds generations, payloads unchanged
    assert materialize_tiles(spark, inc_dir) == 2
    assert _tile_map(spark.read.parquet(inc_dir + "/tiles")) == full_tiles
    assert materialize_tiles(spark, inc_dir) == 0


def test_compaction_rejects_config_mismatch(spark, tmp_path):
    import pytest

    cfg = BuildConfig()
    p0 = synthesize_pages(spark, 50, seed=4, partitions=1)
    d = synthesize_pages(spark, 10, seed=5, partitions=1)
    planet = str(tmp_path / "p")
    build_planet(spark, p0, planet, cfg)
    other = BuildConfig(leaf_zoom=10)
    with pytest.raises(ValueError, match="fingerprint"):
        compact_planet(spark, planet, d, other)


def test_compaction_mixed_planet_point_delta(spark, tmp_path):
    """A page (point) delta folds into a MIXED planet: the dirty
    recompose re-merges the unchanged way geometry chunks with the
    refreshed point chunks — byte-identical to a full mixed rebuild
    over the union (same explicit ways table on both sides; synthesized
    ways would differ because they derive from the point set)."""
    from pvt_spark.operators.geotag import pages_to_points
    from pvt_spark.operators.hilbert_sort import hilbert_sort
    from pvt_spark.plans.compaction import read_tiles
    from pvt_spark.plans.pipeline import _featureize
    from pvt_spark.sources.ways import synthesize_ways

    cfg = BuildConfig()
    p0 = synthesize_pages(spark, 120, seed=6, partitions=1)
    # a NEW crawl batch (disjoint url/id range): way refs resolve by
    # node id, so a re-crawl delta (same urls, new content) would give
    # the full rebuild duplicate nodes per ref while the incremental
    # path keeps the base resolution — disjointness is the documented
    # mixed-compaction contract
    d1 = synthesize_pages(spark, 50, seed=7, partitions=1, start=120)
    pts0 = hilbert_sort(_featureize(pages_to_points(p0), cfg.tags_from_url))
    ways = synthesize_ways(pts0, 25).persist()
    ways.count()

    inc_dir = str(tmp_path / "minc")
    full_dir = str(tmp_path / "mfull")
    build_planet(spark, p0, inc_dir, cfg, ways=ways)
    s = compact_planet(spark, inc_dir, d1, cfg)
    assert s["dirty_tiles"] > 0
    build_planet(spark, p0.unionByName(d1), full_dir, cfg, ways=ways)

    full_tiles = _tile_map(spark.read.parquet(full_dir + "/tiles"))
    assert _tile_map(read_tiles(spark, inc_dir)) == full_tiles and full_tiles
    assert _rows(spark.read.parquet(inc_dir + "/tile_tree")) == _rows(
        spark.read.parquet(full_dir + "/tile_tree")
    )
    assert _rows(spark.read.parquet(inc_dir + "/tile_manifest")) == _rows(
        spark.read.parquet(full_dir + "/tile_manifest")
    )
    ways.unpersist()


def test_compaction_deferred_low_zoom_flush(spark, tmp_path):
    """defer_zoom_below: per-batch recompose skips the always-dirty
    low-zoom overview tiles (stale until flush); flush_deferred folds
    the accumulated set and restores exact equality with a full
    rebuild."""
    from pvt_spark.plans.compaction import flush_deferred

    cfg = BuildConfig()
    p0 = synthesize_pages(spark, 150, seed=81, partitions=2)
    d1 = synthesize_pages(spark, 50, seed=82, partitions=1, start=150)
    d2 = synthesize_pages(spark, 40, seed=83, partitions=1, start=200)
    inc_dir = str(tmp_path / "inc")
    full_dir = str(tmp_path / "full")

    build_planet(spark, p0, inc_dir, cfg)
    base_tiles = _tile_map(spark.read.parquet(inc_dir + "/tiles"))
    s1 = compact_planet(spark, inc_dir, d1, cfg, defer_zoom_below=8)
    s2 = compact_planet(spark, inc_dir, d2, cfg, defer_zoom_below=8)
    assert s1["deferred_tiles"] > 0 and s2["deferred_tiles"] > 0
    # nothing below zoom 8 in the per-batch generations
    for g in (1, 2):
        zooms = {
            r.zoom
            for r in spark.read.parquet(
                f"{inc_dir}/tiles_delta/gen={g}"
            ).select("zoom").distinct().collect()
        }
        assert zooms and min(zooms) >= 8

    build_planet(spark, p0.unionByName(d1).unionByName(d2), full_dir, cfg)
    full_tiles = _tile_map(spark.read.parquet(full_dir + "/tiles"))

    pre = _tile_map(read_tiles(spark, inc_dir))
    hi_pre = {k: v for k, v in pre.items() if k[0] >= 8}
    hi_full = {k: v for k, v in full_tiles.items() if k[0] >= 8}
    assert hi_pre == hi_full
    # low zooms are stale = the base build's payloads
    lo_pre = {k: v for k, v in pre.items() if k[0] < 8}
    assert lo_pre == {k: v for k, v in base_tiles.items() if k[0] < 8}

    n = flush_deferred(spark, inc_dir, cfg)
    # every low-zoom tile key is in the flushed set (the set also holds
    # z0/z2 ancestor keys where the rules render no content, so no tile
    # materializes — key count >= tile count)
    assert n >= len({k for k in full_tiles if k[0] < 8})
    assert _tile_map(read_tiles(spark, inc_dir)) == full_tiles

    # flush is idempotent-empty afterwards; materialize folds everything
    assert flush_deferred(spark, inc_dir, cfg) == 0
    from pvt_spark.plans.compaction import materialize_tiles

    assert materialize_tiles(spark, inc_dir, cfg) == 3
    assert _tile_map(spark.read.parquet(inc_dir + "/tiles")) == full_tiles


def test_dirty_content_pushes_range_predicates(spark, tmp_path):
    """The coarse per-zoom tile_h ranges must reach the parquet scan as
    pushed filters (row-group skipping for spatially clustered deltas);
    the exact dirty-key restriction rides a broadcast semi-join above."""
    from pvt_spark.plans.compaction import _dirty_content

    cfg = BuildConfig()
    p0 = synthesize_pages(spark, 60, seed=44, partitions=1)
    planet = str(tmp_path / "p")
    build_planet(spark, p0, planet, cfg)

    dirty = spark.createDataFrame(
        [(12, 100), (12, 200), (10, 50)], "zoom int, tile_h long"
    )
    df = _dirty_content(spark, planet + "/content", dirty)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThanOrEqual(tile_h" in plan, plan[:2000]
    assert "LessThanOrEqual(tile_h" in plan
    # and the exact restriction is a broadcast semi-join, not a shuffle
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_merge_intervals_unit():
    from pvt_spark.plans.compaction import _merge_intervals

    assert _merge_intervals([], 4) == []
    assert _merge_intervals([5], 4) == [(5, 5)]
    # splits at the two largest gaps
    assert _merge_intervals([1, 2, 3, 100, 101, 500], 3) == [
        (1, 3), (100, 101), (500, 500),
    ]
    # cap 1 collapses to the full range
    assert _merge_intervals([1, 2, 3, 100, 101, 500], 1) == [(1, 500)]
    # more budget than gaps: every point its own interval
    assert _merge_intervals([1, 5, 9], 10) == [(1, 1), (5, 5), (9, 9)]


def test_dirty_content_interval_pruning(spark, tmp_path):
    """Clustered dirt produces a multi-interval pushed predicate; the
    semi-join result is exactly the dirty keys' rows either way."""
    from pvt_spark.plans.compaction import _dirty_content

    content = spark.range(10_000).selectExpr(
        "cast(12 as int) as zoom", "id as tile_h", "id as feature_id"
    )
    path = str(tmp_path / "content")
    content.write.partitionBy("zoom").parquet(path)
    # two tight clusters far apart
    dirty = spark.createDataFrame(
        [(12, h) for h in list(range(100, 110)) + list(range(9000, 9010))],
        "zoom int, tile_h long",
    )
    got = _dirty_content(spark, path, dirty)
    plan = got._jdf.queryExecution().executedPlan().toString()
    # the pushed filter carries BOTH interval bounds, not one world range
    assert "9000" in plan and "109" in plan, plan[:1500]
    rows = {r.tile_h for r in got.collect()}
    assert rows == set(range(100, 110)) | set(range(9000, 9010))


def test_resolve_manifest_latest_wins_and_idempotent(spark, tmp_path):
    """The deferred-manifest log folds latest-generation-wins, tolerates
    duplicate appends (crash-replayed folds rewrite identical rows), and
    resolving twice is a no-op."""
    import os

    from pvt_spark.plans.compaction import resolve_manifest

    planet = str(tmp_path / "planet")
    os.makedirs(planet)
    base = spark.createDataFrame(
        [(12, 1, 5, 5), (12, 2, 7, 7), (10, 9, 3, 3)],
        "zoom int, tile_h long, feature_count long, distinct_features long",
    )
    base.write.parquet(os.path.join(planet, "tile_manifest"))
    spark.createDataFrame(
        [(12, 1)], "zoom int, tile_count long"
    ).write.parquet(os.path.join(planet, "zoom_metrics"))
    ddir = os.path.join(planet, "_manifest_delta")
    rows = [
        (12, 1, 6, 6, 1),          # updates base key at gen 1
        (12, 1, 8, 8, 2),          # ... superseded by gen 2
        (12, 1, 8, 8, 2),          # crash-replay duplicate (identical)
        (12, 5, 2, 2, 2),          # brand-new key
    ]
    spark.createDataFrame(
        rows,
        "zoom int, tile_h long, feature_count long, distinct_features long,"
        " gen int",
    ).write.mode("append").parquet(ddir)
    n = resolve_manifest(spark, planet)
    assert n == 4
    got = {
        (r.zoom, r.tile_h): (r.feature_count, r.distinct_features)
        for r in spark.read.parquet(
            os.path.join(planet, "tile_manifest")
        ).collect()
    }
    assert got == {
        (12, 1): (8, 8),
        (12, 2): (7, 7),
        (10, 9): (3, 3),
        (12, 5): (2, 2),
    }
    mets = {
        r.zoom: (r.tile_count, r.feature_rows)
        for r in spark.read.parquet(
            os.path.join(planet, "zoom_metrics")
        ).collect()
    }
    assert mets == {12: (3, 17), 10: (1, 3)}
    assert not os.path.isdir(ddir)
    assert resolve_manifest(spark, planet) == 0  # idempotent no-op
