"""The checkpointed planet build — stages, lineage, resumability.

Reference lifecycle (src/main.rs:87-113): convert -> sort -> tree ->
render, each persisting files to the planet dir; those file boundaries
are the reference's resume points. Here every stage writes a parquet
snapshot + a ``_lineage.json`` sidecar (stage name, code version,
config fingerprint, input snapshot ids, row count, partition count,
wall seconds). ``build_planet`` skips any stage whose snapshot already
exists with a matching fingerprint — Iceberg-style snapshot semantics
without requiring an Iceberg catalog in this sandbox (swap
``.write.parquet`` for an Iceberg table write on a real cluster; the
lineage JSON maps 1:1 onto Iceberg snapshot summary properties).

Stage graph (shuffle-minimal; see build_planet docstring):

  pages --extract+geotag+featureize+hilbert-sort--> points_sorted
        --leaf agg + 16x rollup--> tile_tree
        --inline rules + zoom explode + range write--> content
        --phase1 finals (+ boundary merge)--> tiles
        --counts--> tile_manifest / zoom_metrics
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..manifest import DEFAULT_MANIFEST, Manifest, compile_rules
from ..operators.compose import (
    compose_points_presorted,
    geometry_chunks,
    merge_chunks,
    points_chunks,
    project_geometry,
)
from ..operators.content import (
    render_content,
    tile_manifest,
    write_content,
    zoom_metrics_from_manifest,
)
from ..operators.external import (
    external_members_from_geometry,
    external_relation_members,
)
from ..operators.extract import EXTRACTOR_VERSION
from ..operators.feature_h import (
    assign_relation_h,
    assign_way_h_geometry,
    relation_point_geometry,
    relation_ring_geometry,
)
from ..operators.geotag import pages_to_points
from ..operators.hilbert_sort import hilbert_sort
from ..operators.leaves import build_leaves
from ..operators.rules import include_tags
from ..operators.tree import build_tile_tree
from ..sources.ways import synthesize_relations, synthesize_ways

PIPELINE_VERSION = 4  # v4: geom_seq rides content_mp (deterministic ring order)


def _parquet_file_counts(path: str) -> dict[str, int]:
    """Row count per parquet file from footers only (fast, driver-side)."""
    import pyarrow.parquet as pq

    counts: dict[str, int] = {}
    for root, _dirs, files in os.walk(path):
        for fn in files:
            if fn.endswith(".parquet"):
                fp = os.path.join(root, fn)
                try:
                    counts[os.path.relpath(fp, path)] = pq.ParquetFile(fp).metadata.num_rows
                except Exception:
                    pass
    return counts


@dataclass
class BuildConfig:
    leaf_zoom: int = 12
    sort_partitions: int | None = None
    salt_threshold: int = 20_000
    tags_from_url: bool = True  # synthesize feature tags from page urls
    # mixed-build mode: derive this many ways/relations from the points
    # (sources/ways.py) when the caller passes no way/relation tables
    synth_ways: int = 0
    synth_relations: int = 0
    # "rings" (default): assemble member ways into winding-normalized
    # outer/hole rings (relation_ring_geometry — the fixed semantics,
    # oracle-certified by q35); "point": render each relation at its
    # mean-h — the documented reference-parity mode (the reference
    # ships with relation rendering disabled due to a known bug,
    # src/hilbert/leaf.rs:155-166)
    relation_geometry: str = "rings"
    manifest: Manifest = field(default_factory=lambda: DEFAULT_MANIFEST)

    def fingerprint(self) -> str:
        m = self.manifest
        return json.dumps(
            {
                "pipeline": PIPELINE_VERSION,
                "extractor": EXTRACTOR_VERSION,
                "leaf_zoom": self.leaf_zoom,
                "salt_threshold": self.salt_threshold,
                "synth_ways": self.synth_ways,
                "synth_relations": self.synth_relations,
                "relation_geometry": self.relation_geometry,
                "manifest": [m.leaf_zoom, m.layer_order, sorted(m.rules)],
            },
            sort_keys=True,
        )


class Stage:
    """One checkpointed stage: compute -> write -> lineage sidecar."""

    def __init__(self, planet_dir: str, name: str, fingerprint: str):
        self.path = os.path.join(planet_dir, name)
        self.lineage_path = os.path.join(self.path, "_lineage.json")
        self.name = name
        self.fingerprint = fingerprint

    def is_complete(self) -> bool:
        if not os.path.exists(self.lineage_path):
            return False
        try:
            with open(self.lineage_path) as f:
                lin = json.load(f)
            return lin.get("fingerprint") == self.fingerprint
        except (json.JSONDecodeError, OSError):
            return False

    def run(
        self,
        spark: SparkSession,
        compute,
        writer=None,
        inputs: list[str] | None = None,
    ) -> DataFrame:
        if self.is_complete():
            return spark.read.parquet(self.path)
        t0 = time.time()
        df = compute()
        if writer is None:
            df.write.mode("overwrite").parquet(self.path)
        else:
            writer(df, self.path)
        out = spark.read.parquet(self.path)
        # per-partition lineage from parquet footers (driver-side metadata
        # read, no extra Spark job — the Iceberg-manifest analog)
        part_counts = _parquet_file_counts(self.path)
        lineage = {
            "stage": self.name,
            "fingerprint": self.fingerprint,
            "inputs": inputs or [],
            "row_count": int(sum(part_counts.values())),
            "partitions": part_counts,
            "wall_sec": round(time.time() - t0, 3),
            "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        with open(self.lineage_path, "w") as f:
            json.dump(lineage, f, indent=1, sort_keys=True)
        return out


def _featureize(points: DataFrame, tags_from_url: bool) -> DataFrame:
    """points(url, mention_idx, lon/lat, h) -> features with stable 64-bit
    ids + synthetic tags (pages carry no OSM tags; tag each mention so
    the rule engine has something to chew on — key chosen by hash)."""
    df = points.withColumn("feature_id", F.xxhash64("url", "mention_idx"))
    if tags_from_url:
        kinds = F.array(
            *[F.lit(x) for x in ["place", "amenity", "highway", "building", "shop", "natural", "power"]]
        )
        vals = F.array(
            *[F.lit(x) for x in ["city", "bus_station", "primary", "yes", "supermarket", "tree", "pole"]]
        )
        idx = F.pmod(F.xxhash64("feature_id"), F.lit(7)).cast("int")
        df = df.withColumn(
            "tags",
            F.map_from_arrays(
                F.array(F.element_at(kinds, idx + 1), F.lit("source")),
                F.array(F.element_at(vals, idx + 1), F.lit("crawl")),
            ),
        )
    return df


def _layer_order(config: BuildConfig) -> list[str]:
    return ["no_rule"] + config.manifest.layer_order


def _points_rf(spark, content: DataFrame, compiled, config: BuildConfig) -> DataFrame:
    """Point-content rows -> primitive-only render-features for the
    point fast path (see compose_points_presorted input contract)."""
    evals_df = spark.createDataFrame(
        [(i, e[4], e[5]) for i, e in enumerate(compiled.evals)],
        "eval_i int, include_kind string, include_keys array<string>",
    )
    feats = include_tags(
        content.join(F.broadcast(evals_df), "eval_i", "left"),
        all_tags=config.manifest.all_tags,
    )
    layer_order = _layer_order(config)
    rank_args = []
    for i, name in enumerate(layer_order):
        rank_args.extend([F.lit(name), F.lit(i)])
    rank_map = F.create_map(*rank_args)
    return feats.select(
        "zoom",
        "tile_h",
        "feature_id",
        "h",
        F.explode("layers").alias("layer"),
        F.expr(
            "flatten(transform(array_sort(map_entries(out_tags)),"
            " e -> array(e.key, e.value)))"
        ).alias("kv"),
        F.size("out_tags").alias("n_tags"),
        "gx",
        "gy",
    ).withColumn(
        "layer_rank", F.coalesce(F.element_at(rank_map, F.col("layer")), F.lit(999))
    )


def _mp_rf(spark, content_mp: DataFrame, compiled, config: BuildConfig) -> DataFrame:
    """Multi-point content rows -> render-features for geometry_chunks."""
    evals_df = spark.createDataFrame(
        [(i, e[4], e[5]) for i, e in enumerate(compiled.evals)],
        "eval_i int, include_kind string, include_keys array<string>",
    )
    feats = include_tags(
        content_mp.join(F.broadcast(evals_df), "eval_i", "left"),
        all_tags=config.manifest.all_tags,
    )
    return feats.select(
        "zoom",
        "tile_h",
        "feature_id",
        "h",
        F.explode("layers").alias("layer"),
        "out_tags",
        "geom_x",
        "geom_y",
        "geom_seq",
    )


def build_planet(
    spark: SparkSession,
    pages: DataFrame,
    planet_dir: str,
    config: BuildConfig | None = None,
    ways: DataFrame | None = None,
    relations: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """Run (or resume) the full build; returns the stage DataFrames.

    Stage graph is shuffle-minimal: ONE full-data shuffle (the Hilbert
    range partition, fused with extraction into the points stage); the
    tree is a 16x-shrinking rollup; content adds one range shuffle of
    index+attr rows; tile assembly reuses content's clustering (phase 1
    shuffle-free, phase 2 shuffles only chunk rows).

    Mixed builds (reference compose.rs:41-349 + leaf.rs:214-380): pass
    ``ways(feature_id, refs array<long>, tags map)`` and/or
    ``relations(feature_id, members array<struct<etype,ref>>, tags)``
    — or set config.synth_ways/synth_relations to derive them from the
    points. Way/relation h-assignment (J3/A1/A2), external leaf
    membership (J5/J6), and line/ring geometry then flow through the
    SAME per-tile payload merge as points: the point fast path emits
    mergeable chunks instead of finals and one phase-2 shuffle unifies
    node/way/relation features per tile.
    """
    config = config or BuildConfig()
    os.makedirs(planet_dir, exist_ok=True)
    fp = config.fingerprint()
    compiled = compile_rules(config.manifest)

    def stage(name: str) -> Stage:
        return Stage(planet_dir, name, fp)

    # 1. extract + geotag + feature ids + global Hilbert sort (O1) —
    #    one stage, one shuffle, written in h order
    points_sorted = stage("points_sorted").run(
        spark,
        lambda: hilbert_sort(
            _featureize(pages_to_points(pages), config.tags_from_url),
            num_partitions=config.sort_partitions,
        ),
        inputs=["pages"],
    )

    # 1b. multi-point features: way/relation h-assignment + geometry
    has_mp = ways is not None or relations is not None or config.synth_ways > 0
    way_feats = rel_feats = external = None
    if has_mp:
        if ways is not None:
            src_ways = ways
        elif config.synth_ways > 0:
            src_ways = synthesize_ways(points_sorted, config.synth_ways)
        else:  # relations-only build (node-member relations)
            src_ways = spark.createDataFrame(
                [], "feature_id long, refs array<long>, tags map<string,string>"
            )
        # fused J3+J1: one explode/join + one feature_id shuffle yields
        # both the way h and the ordered grid geometry arrays
        way_feats = stage("way_features").run(
            spark,
            lambda: assign_way_h_geometry(src_ways, points_sorted),
            inputs=["points_sorted"],
        )
        src_rels = relations
        if src_rels is None and config.synth_relations > 0:
            src_rels = synthesize_relations(way_feats, config.synth_relations)
        if src_rels is not None:
            def _rel_geom() -> DataFrame:
                rel_h = assign_relation_h(src_rels, points_sorted, way_feats).where(
                    F.col("h").isNotNull()
                )
                if config.relation_geometry == "rings":
                    return relation_ring_geometry(rel_h, way_feats)
                return relation_point_geometry(rel_h)

            rel_feats = stage("relation_features").run(
                spark, _rel_geom, inputs=["points_sorted", "way_features"]
            )

        # 1c. external leaf membership (J5/J6): leaves a way/relation's
        #     geometry enters beyond its home leaf
        def _external() -> DataFrame:
            # leaf membership off the ways' own geometry arrays — no join
            # against the planet-sized points table, and single-leaf ways
            # are dropped map-side before any encode or shuffle
            ext = external_members_from_geometry(way_feats, config.leaf_zoom)
            if rel_feats is not None:
                # rings mode emits one row per assembled ring; membership
                # only needs (feature_id, h, members) once per relation —
                # without the dedup every member row and typed h-join
                # would run once per ring
                ext_r = external_relation_members(
                    rel_feats.dropDuplicates(["feature_id"]),
                    points_sorted,
                    way_feats,
                    config.leaf_zoom,
                )
                pairs = (
                    ext.select("leaf_h", F.explode("external").alias("fid"))
                    .unionByName(
                        ext_r.select("leaf_h", F.explode("external").alias("fid"))
                    )
                    .distinct()
                )
                ext = pairs.groupBy("leaf_h").agg(
                    F.sort_array(F.collect_set("fid")).alias("external")
                )
            return ext

        external = stage("external_members").run(
            spark, _external, inputs=["way_features", "points_sorted"]
        )

    # 2. tile tree (A3 leaves + A4 rollup in one stage; the leaf level IS
    #    the zoom==leaf_zoom slice of the tree); mixed builds pivot counts
    #    per entity class like the reference's n/w/r leaf columns
    def _tree() -> DataFrame:
        if not has_mp:
            return build_tile_tree(
                build_leaves(points_sorted, config.leaf_zoom), config.leaf_zoom
            )
        ents = points_sorted.select("h", F.lit("n").alias("entity"))
        ents = ents.unionByName(way_feats.select("h", F.lit("w").alias("entity")))
        if rel_feats is not None:
            # ring mode emits one row PER RING; the tree counts relations
            rels = rel_feats.select("feature_id", "h").dropDuplicates(["feature_id"])
            ents = ents.unionByName(rels.select("h", F.lit("r").alias("entity")))
        return build_tile_tree(
            build_leaves(ents, config.leaf_zoom, entity_col="entity"),
            config.leaf_zoom,
        )

    # 3. rule-filtered pyramid content (F1-F4 + A5), attrs denormalized so
    #    tile assembly needs no join; written clustered by (zoom, tile_h)
    from ..functions.geo import grid_x, grid_y

    def _content() -> DataFrame:
        pts = points_sorted.withColumn("gx", grid_x(F.col("lon_dm7"))).withColumn(
            "gy", grid_y(F.col("lat_dm7"))
        )
        return render_content(
            pts, config.manifest, compiled, carry_cols=["tags", "gx", "gy"]
        )

    # 3b. multi-point content: rule pyramid over way/relation features
    #     PLUS external leaf rows (U1/F5: a leaf's tile also renders the
    #     ways/relations whose geometry enters it from elsewhere).
    #     Geometry is projected + per-zoom-simplified HERE, before the
    #     range-shuffle write: the zoom explode would otherwise ship
    #     full-resolution coordinates once per pyramid level and tile
    #     assembly would discard ~90% of the points post-shuffle
    def _content_mp() -> DataFrame:
        # geom_seq: deterministic minor key for multi-row features (a
        # relation's rings share feature_id AND h) — carried through to
        # the compose sorts so payload bytes never depend on shuffle
        # arrival order. Ways are single-geometry: always 0.
        feats = way_feats.select(
            "feature_id", "h", "tags", "geom_x", "geom_y",
            F.lit(0).alias("geom_seq"),
        )
        if rel_feats is not None:
            seq = (
                F.col("geom_seq")
                if "geom_seq" in rel_feats.columns
                else F.lit(0).alias("geom_seq")
            )
            feats = feats.unionByName(
                rel_feats.select(
                    "feature_id", "h", "tags", "geom_x", "geom_y",
                    seq.alias("geom_seq"),
                )
            )
        # widen BEFORE the zoom explode: the explode multiplies each
        # feature ~13x and the projection UDF runs map-side on the
        # exploded rows, so parallelism must exist upstream — and the
        # full-resolution shuffle this costs is one row per FEATURE,
        # not per (feature, zoom) row
        feats = feats.repartition(
            int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        )
        c = render_content(
            feats, config.manifest, compiled,
            carry_cols=["tags", "geom_x", "geom_y", "geom_seq"],
        )
        ext_pairs = external.select(
            "leaf_h", F.explode("external").alias("feature_id")
        )
        leaf_rows = (
            c.where(F.col("zoom") == config.leaf_zoom)
            .drop("tile_h")
            .join(ext_pairs, "feature_id")
            .withColumnRenamed("leaf_h", "tile_h")
        )
        return project_geometry(c.unionByName(leaf_rows.select(*c.columns)))

    # tree / content / content_mp are INDEPENDENT given their inputs —
    # run them as concurrent Spark jobs (separate driver threads): the
    # small tree rollup and the content shuffle fill each other's idle
    # cores / stage tails instead of serializing their fixed commit costs.
    # PVT_SERIAL_STAGES=1 serializes them (one pool worker) so per-stage
    # lineage walls measure each stage's OWN plan, not co-scheduling —
    # used by scripts/stage_scaling.py for clean per-stage efficiency
    from concurrent.futures import ThreadPoolExecutor

    serial = bool(os.environ.get("PVT_SERIAL_STAGES"))
    content_mp = None
    with ThreadPoolExecutor(max_workers=1 if serial else 3) as pool:
        f_tree = pool.submit(
            stage("tile_tree").run, spark, _tree, None, ["points_sorted"]
        )
        f_content = pool.submit(
            stage("content").run, spark, _content, write_content, ["points_sorted"]
        )
        # content_mp skips the range-clustered write content gets: serving
        # never reads it and its one consumer (geometry_chunks) reshuffles
        # by (zoom, tile_h, salt) anyway — a plain write saves the persist
        # + boundary-sampling pass + a full sorted shuffle of mp content
        f_mp = (
            pool.submit(
                stage("content_mp").run, spark, _content_mp,
                lambda df, p: df.write.mode("overwrite").parquet(p),
                ["way_features", "external_members"],
            )
            if has_mp
            else None
        )
        tree = f_tree.result()
        content = f_content.result()
        if f_mp is not None:
            content_mp = f_mp.result()

    # 4. tile payload assembly (A6/P7/DP) on the pre-clustered content —
    #    points-only: fast path with interior-tile finals; mixed: point
    #    chunks + geometry chunks merged in one phase 2
    def _compose() -> DataFrame:
        rf = _points_rf(spark, content, compiled, config)
        if not has_mp:
            return compose_points_presorted(rf, _layer_order(config))
        gchunks = geometry_chunks(
            _mp_rf(spark, content_mp, compiled, config),
            salt_threshold=config.salt_threshold,
            projected=True,  # content_mp stores tile-local simplified coords
        )
        # the point finals fast path stays available for every tile with
        # NO multi-point features: demote only the mp tile set to chunks
        # (key set rides a sparkContext.broadcast inside
        # compose_points_presorted), merge those with the geometry
        # chunks. Very way-dense planets (mp tile set beyond the bounded
        # driver collect below) fall back to all-chunks.
        mp_keys = content_mp.select("zoom", "tile_h").distinct()
        n_mp = mp_keys.count()
        if n_mp <= 200_000:
            keys = frozenset(
                (int(r.zoom) << 50) | int(r.tile_h) for r in mp_keys.collect()
            )
            # phase-2 width follows the CHUNK count (~one row per mp
            # tile), not the corpus-shuffle conf: an explicit partition
            # count blocks AQE coalescing, and 128 Python merge tasks
            # over a few thousand chunk rows each paid ~4s of pure
            # worker dispatch at the bench shape (measured; ~4k chunk
            # rows per task is the sweet spot, conf stays the ceiling
            # for way-dense planets)
            return compose_points_presorted(
                rf,
                _layer_order(config),
                merge_partitions=max(
                    8,
                    min(
                        int(spark.conf.get("spark.sql.shuffle.partitions", "32")),
                        n_mp // 4000 + 1,
                    ),
                ),
                exclude_keys=keys,
                extra_chunks=gchunks,
            )
        pchunks = points_chunks(rf)
        return merge_chunks(pchunks.unionByName(gchunks), _layer_order(config))

    # 5. metrics tables (S11 report analog); zoom metrics derive from the
    #    small tile manifest, not a content re-scan. tiles and manifest
    #    both read only the (already-written) content stage -> concurrent
    def _manifest() -> DataFrame:
        c = content.select("zoom", "tile_h", "feature_id")
        if content_mp is not None:
            c = c.unionByName(content_mp.select("zoom", "tile_h", "feature_id"))
        return tile_manifest(c)

    with ThreadPoolExecutor(max_workers=1 if serial else 2) as pool:
        f_tiles = pool.submit(
            stage("tiles").run,
            spark,
            _compose,
            lambda df, p: df.write.mode("overwrite").partitionBy("zoom").parquet(p),
            ["content"] + (["content_mp"] if has_mp else []),
        )
        f_manifest = pool.submit(
            stage("tile_manifest").run, spark, _manifest, None, ["content"]
        )
        tiles = f_tiles.result()
        manifest_df = f_manifest.result()
    metrics_df = stage("zoom_metrics").run(
        spark,
        lambda: zoom_metrics_from_manifest(manifest_df),
        inputs=["tile_manifest"],
    )

    out = {
        "points": points_sorted,
        "points_sorted": points_sorted,
        "leaves": tree.where(F.col("zoom") == config.leaf_zoom),
        "tree": tree,
        "content": content,
        "tiles": tiles,
        "tile_manifest": manifest_df,
        "zoom_metrics": metrics_df,
    }
    if way_feats is not None:
        out["way_features"] = way_feats
    if rel_feats is not None:
        out["relation_features"] = rel_feats
    if external is not None:
        out["external"] = external
    if content_mp is not None:
        out["content_mp"] = content_mp
    return out
