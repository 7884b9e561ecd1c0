"""NEW-J9: point-in-polygon join against broadcast admin polygons.

The reference approximates spatial containment by Hilbert-tile
membership (J5/J7); the north rule requires true PIP. Strategy:

  1. driver-side: compute each polygon's covering tile set at a coarse
     zoom (bbox cover — polygons are small relative to the planet);
  2. broadcast the exploded (tile_h, polygon) table; equi-join points
     on their tile at that zoom — this is the pruning step, same role
     as the reference's tree descent;
  3. exact even-odd ray-cast on the candidate pairs, vectorized numpy
     inside a pandas UDF (no shapely dependency).

Skew: a hot tile (dense city) only inflates candidate pairs of ONE
join key; AQE skew-join splits it because this is a plain equi-join,
not a groupBy — which is exactly why the PIP is structured join-first.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

from .. import hilbert as hb
from ..functions.geo import zoom_h


def polygon_cover_tiles(rings: list, cover_zoom: int) -> list[int]:
    """Tile ids (Hilbert, at cover_zoom) covering the polygon's bbox.

    Scans the bbox corner grid; exact cover via bbox is fine for the
    pruning role (false positives removed by the ray-cast).
    """
    outer = rings[0]
    lons = np.array([p[0] for p in outer], dtype=np.int64)
    lats = np.array([p[1] for p in outer], dtype=np.int64)
    x, y = hb.lonlat_to_xy(lons, lats)
    shift = 32 - cover_zoom
    tx0, tx1 = int(x.min()) >> shift, int(x.max()) >> shift
    # y grows southward in grid space; min/max swap under projection
    ty0, ty1 = int(y.min()) >> shift, int(y.max()) >> shift
    ty0, ty1 = min(ty0, ty1), max(ty0, ty1)
    tiles = []
    for tx in range(tx0, tx1 + 1):
        for ty in range(ty0, ty1 + 1):
            h = hb.xy2h(np.array([tx], np.uint64), np.array([ty], np.uint64), cover_zoom)
            tiles.append(int(h[0]))
    return tiles


def _ray_cast(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized even-odd test: points (n,) vs one ring (m, 2)."""
    inside = np.zeros(len(px), dtype=bool)
    x0, y0 = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    for i in range(len(x0)):
        cond = (y0[i] > py) != (y1[i] > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            xs = (x1[i] - x0[i]) * (py - y0[i]) / (y1[i] - y0[i]) + x0[i]
        inside ^= cond & (px < xs)
    return inside


def point_in_polygon_join(
    points: DataFrame,
    polygons: DataFrame,
    cover_zoom: int = 8,
    how: str = "inner",
) -> DataFrame:
    """points(..., lon_dm7, lat_dm7, h) x polygons(admin_id, ..., rings) ->
    matched pairs with exact containment.

    polygons must be broadcast-sized (admin boundaries are); rings is
    array<array<struct<lon_dm7,lat_dm7>>> with outer ring first, holes
    after (even-odd rule handles holes for free).
    """
    spark = points.sparkSession
    polys = polygons.collect()
    cover_rows = []
    for r in polys:
        rings = [[(p["lon_dm7"], p["lat_dm7"]) for p in ring] for ring in r["rings"]]
        for t in polygon_cover_tiles(rings, cover_zoom):
            cover_rows.append((r["admin_id"], t))
    cover = spark.createDataFrame(cover_rows, "admin_id long, cover_tile long")

    pts = points.withColumn("cover_tile", zoom_h(F.col("h"), cover_zoom))
    cand = pts.join(F.broadcast(cover), "cover_tile")

    # ship ring geometry to executors once (numpy arrays via closure)
    ring_map = {
        r["admin_id"]: [
            np.array([[p["lon_dm7"], p["lat_dm7"]] for p in ring], dtype=np.float64)
            for ring in r["rings"]
        ]
        for r in polys
    }

    @F.pandas_udf(BooleanType())
    def contains(admin_id: pd.Series, lon: pd.Series, lat: pd.Series) -> pd.Series:
        px = lon.to_numpy(dtype=np.float64)
        py = lat.to_numpy(dtype=np.float64)
        aid = admin_id.to_numpy()
        out = np.zeros(len(px), dtype=bool)
        for a in np.unique(aid):
            m = aid == a
            acc = np.zeros(m.sum(), dtype=bool)
            for ring in ring_map[int(a)]:
                acc ^= _ray_cast(px[m], py[m], ring)
            out[m] = acc
        return pd.Series(out)

    matched = cand.where(contains(F.col("admin_id"), F.col("lon_dm7"), F.col("lat_dm7")))
    out = matched.drop("cover_tile")
    if how == "inner":
        return out.join(
            F.broadcast(polygons.drop("rings")), "admin_id"
        )
    raise ValueError(f"unsupported how={how}")
