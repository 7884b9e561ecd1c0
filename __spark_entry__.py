"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query — the Hilbert tile-pyramid build
  (geotag-style points -> rules -> pyramid content -> tile manifest)
  over the sf0.001 tables.
- ``queries()``: one entry per implemented operator from SURVEY.md §2
  (see pvt_spark/queries.py for the operator mapping in each docstring).
- ``oracle_sql()``: DuckDB-equivalent SQL for EVERY query. The
  Hilbert queries q26-q28 and q30 are value-checked: the order-32
  encode is recomputed inside DuckDB as an unrolled 32-step CTE chain;
  q25's oracle is the reference's own golden constants. q30's oracle
  is input-dependent (the closed rings' interior-point h — the one
  non-SQL-expressible ladder step — is pinned via a VALUES table
  computed by the same golden-tested numpy kernel), so its SQL is
  generated for the driver's compare scale (sf0.01, overridable via
  SPARK_GRAFT_ORACLE_SF). q34 certifies the partitioned (no-broadcast)
  PIP path against q13's SQL; q35 certifies relation multipolygon
  assembly (stitching + winding) in closed form; q36 certifies dedup
  group resolution (recursive-CTE closure); q37 certifies the H3/S2-
  style cell index (face-Hilbert packing + parent algebra + hex cells
  — the hex float path bit-exact via round_even, the Hilbert step via
  the unrolled CTE). q42/q43 certify the Gopher-style repetition
  filters and the cross-document duplicated-8-gram spans (word-level
  substring-dedup shape); q44 exact-integer BM25 retrieval; q45
  domain-level host stats; q46 per-label embedding centroids; q47
  deterministic stratified sampling; q48 integer-PageRank host
  centrality. q38-q41 certify the web-corpus curation surface
  and its geo composition: URL canonicalization, SemDeDup semantic
  dedup (independent recursive-CTE closure), the one-scan curation
  funnel, and zonal statistics over the partitioned PIP join.
  q50-q57 certify the temporal/spatial/statistical join suite (as-of,
  banded range, radius, MBR-overlap, group quantiles, salted top-k,
  the STREAMING as-of replay, mutual nearest neighbors); q58 the
  hot-key pre-split as-of plan against q50's oracle. Round-5 classes:
  q59 learned merge-table BPE (independent scalar replay as VALUES),
  q60 broadcast-Bloom incremental dedup (== LEFT ANTI JOIN), q61
  exact-integer product quantization + ADC top-k (the entire
  init/Lloyd/encode/ADC ladder replayed scalar-side as VALUES), q62
  degree-orientation triangle counting (oracle enumerates in a
  different order), q63 daily resample with gap/forward fill, q64
  strict-order conversion funnel, q65 integer bigram LM surprise
  (CCNet-style quality filter, exact in int64).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pvt_spark.queries import REGISTRY

ORACLE_SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full tile-pyramid content build at sf0.001."""
    from pyspark.sql import functions as F

    from pvt_spark.functions.geo import hilbert_h
    from pvt_spark.manifest import DEFAULT_MANIFEST, compile_rules
    from pvt_spark.operators.content import render_content, tile_manifest
    from pvt_spark.queries import _SYNTH_LAT, _SYNTH_LON

    cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    kinds = ["place", "amenity", "highway", "building", "shop", "natural", "power"]
    vals = ["city", "bus_station", "primary", "yes", "supermarket", "tree", "pole"]
    kv = F.element_at(F.array(*[F.lit(k) for k in kinds]), (F.col("c_custkey") % 7 + 1).cast("int"))
    vv = F.element_at(F.array(*[F.lit(v) for v in vals]), (F.col("c_custkey") % 7 + 1).cast("int"))
    pts = cust.select(
        F.col("c_custkey").alias("feature_id"),
        F.expr(_SYNTH_LON).alias("lon_dm7"),
        F.expr(_SYNTH_LAT).alias("lat_dm7"),
        F.map_from_arrays(F.array(kv), F.array(vv)).alias("tags"),
    ).withColumn("h", hilbert_h(F.col("lon_dm7"), F.col("lat_dm7")))
    compiled = compile_rules(DEFAULT_MANIFEST)
    content = render_content(pts, DEFAULT_MANIFEST, compiled)
    return tile_manifest(content).orderBy("zoom", "tile_h")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: (sql(ORACLE_SF_DIR) if callable(sql) else sql)
        for name, (_fn, sql) in REGISTRY.items()
        if sql is not None
    }
