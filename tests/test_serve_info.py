"""Tile lookup (J7/S12), Info source (U2), multi-source compose."""

from pyspark.sql import functions as F

from pvt_spark.functions.pvt_codec import decode_tile
from pvt_spark.operators.compose import compose_tiles
from pvt_spark.operators.serve import features_in_tile, tile_lookup
from pvt_spark.sources.info import info_features, union_sources
from pvt_spark.tile import Tile


def test_features_in_tile_range_lookup(spark):
    import numpy as np

    from pvt_spark import hilbert as hb

    # points in and out of z12 tile h=3329134 (Scotts Valley golden tile)
    t = Tile.from_zh(12, 3329134)
    cx, cy = t.center()
    inside_lon, inside_lat = hb.xy_to_lonlat(np.array([cx], np.uint32), np.array([cy], np.uint32))
    rows = [
        (1, int(inside_lon[0]), int(inside_lat[0])),
        (2, 0, 0),  # null island, elsewhere
    ]
    pts = spark.createDataFrame(rows, "feature_id long, lon_dm7 int, lat_dm7 int")
    from pvt_spark.functions.geo import hilbert_h

    pts = pts.withColumn("h", hilbert_h(F.col("lon_dm7"), F.col("lat_dm7")))
    got = features_in_tile(pts, 12, t.x, t.y).collect()
    assert [r.feature_id for r in got] == [1]


def test_info_source_composes_with_boundary_clamp(spark):
    info = info_features(spark, 12, 659, 1593, grandchild_levels=0)
    tiles = compose_tiles(
        info, ["tile_boundary", "tile_center", "tile_bearing"], 1000
    )
    t = Tile.from_zxy(12, 659, 1593)
    row = tile_lookup(tiles, 12, t.x, t.y).collect()
    assert len(row) == 1
    decoded = decode_tile(bytes(row[0].payload))
    names = [l["name"] for l in decoded["layers"]]
    assert names == ["tile_boundary", "tile_center", "tile_bearing"]
    # bearing layer (reference src/info.rs Bearing + src/tile.rs:336-420):
    # 3-point arrow entry-midpoint -> center -> exit-midpoint, tagged
    from pvt_spark.tile import _BEARINGS

    bear = next(l for l in decoded["layers"] if l["name"] == "tile_bearing")
    assert bear["features"], "bearing arrow present"
    for f in bear["features"]:
        tags = dict(zip(f["keys"], f["values"]))
        assert tags["bearing"] in _BEARINGS
        assert {"zoom", "h", "bearing"} <= set(tags)
        gx, gy = f["geoms"][0]
        # straight-through bearings (e.g. WE) are collinear, so DP
        # collapses the 3-point arrow to its 2 endpoints
        assert len(gx) in (2, 3)
    bnd = next(l for l in decoded["layers"] if l["name"] == "tile_boundary")
    own = [
        f
        for f in bnd["features"]
        if dict(zip(f["keys"], f["values"])).get("h") == str(t.h)
    ]
    assert own, "boundary feature for the tile itself present"
    gx, gy = own[0]["geoms"][0]
    # the tile's own boundary spans the full extent 0..8191 (JS e2e golden:
    # z-boundary 0..8191, reference tests/index.spec.mjs)
    assert min(gx) == 0 and min(gy) == 0
    assert max(gx) == 8191 and max(gy) == 8191
    # ancestors' boundaries clamp at -16384/16383
    z0 = [
        f
        for l in decoded["layers"]
        for f in l["features"]
        if dict(zip(f["keys"], f["values"])).get("zoom") == "0"
    ]
    if z0:
        gx0, gy0 = z0[0]["geoms"][0]
        assert min(gx0) == -16384 and max(gx0) == 16383


def test_union_sources(spark):
    a = info_features(spark, 4, 2, 5, grandchild_levels=0)
    b = info_features(spark, 4, 3, 5, grandchild_levels=0)
    u = union_sources(a, b)
    assert u.count() == a.count() + b.count()


def test_zero_info_tile_pyramid(spark):
    """Reference src/info.rs test_zero_info_tile analog: the z0 root tile
    with descendant levels composes a non-trivial info pyramid."""
    info = info_features(spark, 0, 0, 0, grandchild_levels=2)
    tiles = compose_tiles(
        info, ["tile_boundary", "tile_center", "tile_bearing"], 100000
    )
    row = tile_lookup(tiles, 0, 0, 0).collect()
    assert len(row) == 1
    decoded = decode_tile(bytes(row[0].payload))
    n_feats = sum(len(l["features"]) for l in decoded["layers"])
    # z0 + z1 (4) + z2 (16) tiles, boundary+center each, + bearings
    assert n_feats >= 42
    assert row[0].payload_size > 1000
