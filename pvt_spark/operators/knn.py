"""NEW-J10: k-nearest-neighbor lookup per tile.

Candidates come from the query's leaf tile + its 8 neighbors (tile
algebra P8 on the driver for the small query set), then an exact
ranked selection: ``row_number() over (partitionBy query orderBy
dist) <= k``. Entirely shuffle-light: the candidate join is an
equi-join on tile id against the Hilbert-sorted points (partition
pruned), and the window groups are tiny (per query).

Distance is squared planar distance in the u32 web-mercator grid —
consistent with the reference's location space (src/location.rs:48).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .. import hilbert as hb
from ..functions.geo import grid_x, grid_y, zoom_h


def neighbor_tiles(tile_h: int, zoom: int, ring: int = 1) -> list[int]:
    """The tile and its surrounding rings (clamped at edges), Hilbert ids.

    ring=1 is the 3x3 neighborhood; larger rings support k-NN ring
    expansion when the immediate neighborhood has < k candidates.
    """
    x, y = hb.h2xy(np.array([tile_h], np.uint64), zoom)
    x, y = int(x[0]), int(y[0])
    n = 1 << zoom
    xs, ys = [], []
    for dx in range(-ring, ring + 1):
        for dy in range(-ring, ring + 1):
            nx, ny = x + dx, y + dy
            if 0 <= nx < n and 0 <= ny < n:
                xs.append(nx)
                ys.append(ny)
    hs = hb.xy2h(np.array(xs, np.uint64), np.array(ys, np.uint64), zoom)
    return sorted(set(int(v) for v in hs))


def knn_per_tile(
    points: DataFrame,
    queries: DataFrame,
    k: int = 5,
    zoom: int = 12,
    id_col: str = "feature_id",
    ring: int = 1,
    max_ring: int = 8,
) -> DataFrame:
    """points(id, lon_dm7, lat_dm7, h) x queries(query_id, lon_dm7,
    lat_dm7, h) -> (query_id, neighbor_id, rank, d2).

    queries must be broadcast-sized (ad-hoc lookups); each query probes
    its (2*ring+1)^2 tile neighborhood of the sorted points table.
    Queries that find < k candidates are retried with a doubled ring
    (driver fixed-point, bounded by max_ring) — sparse-region k-NN
    stays correct without paying wide probes for dense regions.
    """
    spark = points.sparkSession

    def run(qrows: list, ring_: int) -> DataFrame:
        probe_rows = []
        for r in qrows:
            th = int(hb.h_to_zoom_h(hb.signed_to_h(np.array([r["h"]])), zoom)[0])
            for t in neighbor_tiles(th, zoom, ring_):
                probe_rows.append((r["query_id"], t, r["lon_dm7"], r["lat_dm7"]))
        probes = spark.createDataFrame(
            probe_rows, "query_id long, probe_tile long, q_lon int, q_lat int"
        )
        pts = (
            points.withColumn("tile", zoom_h(F.col("h"), zoom))
            .withColumn("px", grid_x(F.col("lon_dm7")))
            .withColumn("py", grid_y(F.col("lat_dm7")))
        )
        cand = pts.join(F.broadcast(probes), pts["tile"] == probes["probe_tile"])
        d2 = (
            (F.col("px") - grid_x(F.col("q_lon"))) ** 2
            + (F.col("py") - grid_y(F.col("q_lat"))) ** 2
        ).cast("double")
        w = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc(id_col))
        return (
            cand.withColumn("d2", d2)
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", F.col(id_col).alias("neighbor_id"), "rank", "d2")
        )

    qrows = queries.collect()
    result = run(qrows, ring)
    while ring < max_ring:
        counts = {r["query_id"]: r["n"] for r in result.groupBy("query_id").count().withColumnRenamed("count", "n").collect()}
        short = [r for r in qrows if counts.get(r["query_id"], 0) < k]
        if not short:
            break
        ring = min(ring * 2, max_ring)
        widened = run(short, ring)
        kept = result.join(
            spark.createDataFrame([(r["query_id"],) for r in short], "query_id long"),
            "query_id",
            "left_anti",
        )
        result = kept.unionByName(widened)
        qrows = short
    return result
