"""Layered-compose golden: a pinned full-tile structure of santa-cruz
richness (reference src/hilbert/compose.rs:424-493 pins 8 layers /
3,647 features / one feature's id+keys+point for its fixture planet;
this pins the analog for the deterministic minicruz fixture).

Constants documented in FIXTURES.md §8. Any change to rule evaluation,
zoom explode, tile assignment, salting, merge ordering, interning or
payload encoding that alters the composed tile breaks this test.
"""

from pyspark.sql import functions as F

from pvt_spark.functions.geo import grid_x, grid_y
from pvt_spark.functions.pvt_codec import decode_tile
from pvt_spark.manifest import DEFAULT_MANIFEST, compile_rules
from pvt_spark.operators.compose import compose_tiles
from pvt_spark.operators.content import render_content
from pvt_spark.operators.feature_h import assign_way_h, way_geometry
from pvt_spark.operators.rules import include_tags
from pvt_spark.sources.fixtures import minicruz

GOLDEN_ZOOM = 12
GOLDEN_TILE_H = 3329134
GOLDEN_LAYER_COUNTS = {
    "Places": 252,
    "Roads": 262,
    "Buildings": 258,
    "Nature": 241,
    "Power": 239,
}
GOLDEN_FEATURES = 1252
GOLDEN_PAYLOAD_SIZE = 34094
GOLDEN_TOTAL_TILES = 26
GOLDEN_ZOOM_HIST = {6: 1, 8: 1, 10: 4, 12: 20}
# first feature of the first layer (Places), global (h, id) order
GOLDEN_F0_ID = 3498758249159611
GOLDEN_F0_KEYS = ["amenity"]
GOLDEN_F0_VALUES = ["bus_station"]
GOLDEN_F0_POINT = (3773, 1717)


def test_layered_compose_golden(spark):
    pts, ways, _ = minicruz(spark, n_points=3000, n_ways=150, n_relations=5)
    pts_t = pts.select(
        "feature_id",
        "h",
        F.map_from_arrays(F.array("tag_key"), F.array("tag_value")).alias("tags"),
        F.array(grid_x(F.col("lon_dm7"))).alias("geom_x"),
        F.array(grid_y(F.col("lat_dm7"))).alias("geom_y"),
    )
    way_feats = way_geometry(assign_way_h(ways, pts), pts).select(
        "feature_id",
        "h",
        F.map_from_arrays(F.array("tag_key"), F.array("tag_value")).alias("tags"),
        "geom_x",
        "geom_y",
    )
    feats = pts_t.unionByName(way_feats)
    compiled = compile_rules(DEFAULT_MANIFEST)
    content = render_content(
        feats, DEFAULT_MANIFEST, compiled, carry_cols=["tags", "geom_x", "geom_y"]
    )
    evals_df = spark.createDataFrame(
        [(i, e[4], e[5]) for i, e in enumerate(compiled.evals)],
        "eval_i int, include_kind string, include_keys array<string>",
    )
    rf = include_tags(
        content.join(F.broadcast(evals_df), "eval_i", "left"), all_tags=True
    ).select(
        "zoom",
        "tile_h",
        "feature_id",
        "h",
        F.explode("layers").alias("layer"),
        "out_tags",
        "geom_x",
        "geom_y",
    )
    tiles = compose_tiles(rf, ["no_rule"] + DEFAULT_MANIFEST.layer_order, 500)
    rows = tiles.collect()

    assert len(rows) == GOLDEN_TOTAL_TILES
    hist = {}
    for r in rows:
        hist[r.zoom] = hist.get(r.zoom, 0) + 1
    assert hist == GOLDEN_ZOOM_HIST

    golden = [r for r in rows if r.zoom == GOLDEN_ZOOM and r.tile_h == GOLDEN_TILE_H]
    assert len(golden) == 1
    t = golden[0]
    assert t.layer_count == len(GOLDEN_LAYER_COUNTS)
    assert t.feature_count == GOLDEN_FEATURES
    assert t.payload_size == GOLDEN_PAYLOAD_SIZE

    decoded = decode_tile(bytes(t.payload))
    got_counts = {
        layer["name"]: len(layer["features"]) for layer in decoded["layers"]
    }
    assert got_counts == GOLDEN_LAYER_COUNTS
    # layer order follows the manifest's layer_order exactly
    assert [layer["name"] for layer in decoded["layers"]] == list(
        GOLDEN_LAYER_COUNTS
    )

    f0 = decoded["layers"][0]["features"][0]
    assert f0["id"] == GOLDEN_F0_ID
    assert f0["keys"] == GOLDEN_F0_KEYS
    assert f0["values"] == GOLDEN_F0_VALUES
    gx, gy = f0["geoms"][0]
    assert (gx[0], gy[0]) == GOLDEN_F0_POINT
