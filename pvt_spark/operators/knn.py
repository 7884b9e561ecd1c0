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


def neighbor_tiles(tile_h: int, zoom: int) -> list[int]:
    """The tile and its 8 grid neighbors (clamped at edges), as Hilbert ids."""
    x, y = hb.h2xy(np.array([tile_h], np.uint64), zoom)
    x, y = int(x[0]), int(y[0])
    n = 1 << zoom
    out = set()
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            nx, ny = x + dx, y + dy
            if 0 <= nx < n and 0 <= ny < n:
                h = hb.xy2h(np.array([nx], np.uint64), np.array([ny], np.uint64), zoom)
                out.add(int(h[0]))
    return sorted(out)


def knn_per_tile(
    points: DataFrame,
    queries: DataFrame,
    k: int = 5,
    zoom: int = 12,
    id_col: str = "feature_id",
) -> DataFrame:
    """points(id, lon_dm7, lat_dm7, h) x queries(query_id, lon_dm7,
    lat_dm7, h) -> (query_id, neighbor_id, rank, d2).

    queries must be broadcast-sized (ad-hoc lookups); each query probes
    its 3x3 tile neighborhood of the sorted points table.
    """
    spark = points.sparkSession
    qrows = queries.collect()
    probe_rows = []
    for r in qrows:
        th = int(hb.h_to_zoom_h(hb.signed_to_h(np.array([r["h"]])), zoom)[0])
        for t in neighbor_tiles(th, zoom):
            probe_rows.append((r["query_id"], t, r["lon_dm7"], r["lat_dm7"]))
    probes = spark.createDataFrame(
        probe_rows, "query_id long, probe_tile long, q_lon int, q_lat int"
    )

    pts = points.withColumn("tile", zoom_h(F.col("h"), zoom)).withColumn(
        "px", grid_x(F.col("lon_dm7"))
    ).withColumn("py", grid_y(F.col("lat_dm7")))
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
