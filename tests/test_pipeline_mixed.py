"""Mixed build: ways/relations through the staged build_planet pipeline
(reference compose.rs:41-349 + leaf.rs:214-380 end-to-end analog)."""

import os
import tempfile

from pyspark.sql import functions as F

from pvt_spark.functions.pvt_codec import decode_tile
from pvt_spark.plans.pipeline import BuildConfig, build_planet
from pvt_spark.sources.pages import synthesize_pages


def _build(spark, tmp, n_pages=4000):
    pages = synthesize_pages(spark, n_pages, seed=42)
    cfg = BuildConfig(leaf_zoom=12, synth_ways=60, synth_relations=8)
    return build_planet(spark, pages, os.path.join(tmp, "planet"), cfg), cfg


def test_mixed_build_end_to_end(spark):
    with tempfile.TemporaryDirectory() as tmp:
        out, cfg = _build(spark, tmp)

        # multi-point stages materialized, every way/relation has an h
        wf = out["way_features"]
        assert wf.count() > 0
        assert wf.where(F.col("h").isNull()).count() == 0
        assert wf.where(F.size("geom_x") != F.size("geom_y")).count() == 0
        rf = out["relation_features"]
        assert rf.count() > 0
        assert rf.where(F.size("geom_x") != 1).count() == 0

        # leaf counts pivot per entity class (reference n/w/r leaf columns)
        leaves = out["leaves"]
        for c in ("n_count", "w_count", "r_count"):
            assert c in leaves.columns
        assert leaves.agg(F.sum("w_count")).first()[0] == wf.count()
        assert leaves.agg(F.sum("r_count")).first()[0] == rf.count()

        # externals: at least one way enters a leaf beyond its home leaf
        ext = out["external"]
        assert ext.count() > 0

        # content_mp contains external leaf rows: same feature at leaf
        # zoom under MORE tiles than its home tile alone
        cmp_ = out["content_mp"]
        multi = (
            cmp_.where(F.col("zoom") == cfg.leaf_zoom)
            .groupBy("feature_id")
            .agg(F.countDistinct("tile_h").alias("n_tiles"))
            .where(F.col("n_tiles") > 1)
        )
        assert multi.count() > 0

        # tiles decode; line AND ring geometry present in payloads
        tiles = out["tiles"]
        n_lines = n_rings = n_points = 0
        for t in tiles.collect():
            decoded = decode_tile(bytes(t.payload))
            for layer in decoded["layers"]:
                for f in layer["features"]:
                    for gx, gy in f["geoms"]:
                        if len(gx) == 1:
                            n_points += 1
                        elif len(gx) >= 4 and gx[0] == gx[-1] and gy[0] == gy[-1]:
                            n_rings += 1
                        else:
                            n_lines += 1
        assert n_points > 0 and n_lines > 0 and n_rings > 0

        # conservation: payload features == point rf rows + mp rf rows
        from pvt_spark.manifest import compile_rules
        from pvt_spark.plans.pipeline import _mp_rf, _points_rf

        compiled = compile_rules(cfg.manifest)
        expected = (
            _points_rf(spark, out["content"], compiled, cfg).count()
            + _mp_rf(spark, out["content_mp"], compiled, cfg).count()
        )
        got = tiles.agg(F.sum("feature_count")).first()[0]
        assert got == expected


def test_mixed_build_resumes(spark):
    with tempfile.TemporaryDirectory() as tmp:
        out1, _ = _build(spark, tmp, n_pages=1500)
        t1 = out1["tiles"].agg(F.sum("feature_count")).first()[0]
        out2, _ = _build(spark, tmp, n_pages=1500)  # all stages complete
        t2 = out2["tiles"].agg(F.sum("feature_count")).first()[0]
        assert t1 == t2
        lineage = os.path.join(tmp, "planet", "way_features", "_lineage.json")
        assert os.path.exists(lineage)
