#!/usr/bin/env python3
"""spark-submit entry point for the planet build (north rule launch shape).

Package + launch:

    cd /root/repo && zip -qr /tmp/pvt_spark.zip pvt_spark
    spark-submit --master local[8] --py-files /tmp/pvt_spark.zip \\
        scripts/submit_build.py --pages-path /data/pages --planet /data/planet

On a cluster the same command takes --master yarn/k8s and executor
sizing flags; the engine itself is cluster-agnostic (no local-mode
assumptions — all parallelism via partitioning).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages-path", help="existing parquet/Iceberg pages table")
    ap.add_argument("--synthesize", type=int, default=0, help="or: generate N pages")
    ap.add_argument("--planet", required=True, help="output planet dir")
    ap.add_argument("--leaf-zoom", type=int, default=12)
    ap.add_argument("--synth-ways", type=int, default=0,
                    help="derive N ways from the points (mixed build)")
    ap.add_argument("--synth-relations", type=int, default=0)
    ap.add_argument("--relation-geometry", default="rings",
                    choices=["rings", "point"],
                    help="'rings' = assembled multipolygons (default); "
                    "'point' = reference-parity mean-h rendering")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from pvt_spark.plans.pipeline import BuildConfig, build_planet

    spark = SparkSession.builder.appName("pvt-build").getOrCreate()
    if args.pages_path:
        pages = spark.read.parquet(args.pages_path)
    elif args.synthesize:
        from pvt_spark.sources.pages import synthesize_pages

        pages = synthesize_pages(spark, args.synthesize)
    else:
        raise SystemExit("need --pages-path or --synthesize N")

    out = build_planet(
        spark, pages, args.planet,
        BuildConfig(
            leaf_zoom=args.leaf_zoom,
            synth_ways=args.synth_ways,
            synth_relations=args.synth_relations,
            relation_geometry=args.relation_geometry,
        ),
    )
    summary = {
        "points": out["points"].count(),
        "tiles": out["tiles"].count(),
        "zooms": [r.zoom for r in out["zoom_metrics"].orderBy("zoom").collect()],
    }
    print("BUILD_SUMMARY " + json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
