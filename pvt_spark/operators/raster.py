"""Raster <-> vector consistency checks (north rule).

Rasterize (a) emitted tile payloads and (b) the same features straight
from their coordinates onto a per-tile occupancy grid, and compare —
a payload round-trip integrity check that catches projection, codec,
ordering, and dropped-feature bugs in one sweep. Also rasterizes
polygons (ray-cast on cell centers) so vector admin areas can be
checked against point coverage.

Grids are sparse: (cell_idx, count) pairs over a 2^bits x 2^bits grid
of the 8192-unit tile extent.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.pvt_codec import decode_tile

RASTER_SCHEMA = "zoom int, tile_h long, cell int, n long"


def _cells_of(px: np.ndarray, py: np.ndarray, bits: int) -> np.ndarray:
    """Tile-local int16 coords -> grid cell index (clamped into the tile)."""
    g = 1 << bits
    cx = np.clip(np.asarray(px, dtype=np.int64) * g // 8192, 0, g - 1)
    cy = np.clip(np.asarray(py, dtype=np.int64) * g // 8192, 0, g - 1)
    return (cy * g + cx).astype(np.int32)


def rasterize_payloads(tiles: DataFrame, bits: int = 6) -> DataFrame:
    """tiles(zoom, tile_h, payload) -> sparse occupancy grid per tile."""

    def run(batches):
        for pdf in batches:
            rows = []
            for zoom, tile_h, payload in zip(pdf["zoom"], pdf["tile_h"], pdf["payload"]):
                decoded = decode_tile(bytes(payload))
                xs, ys = [], []
                for layer in decoded["layers"]:
                    for f in layer["features"]:
                        for gx, gy in f["geoms"]:
                            xs.append(gx)
                            ys.append(gy)
                if not xs:
                    continue
                cells = _cells_of(np.concatenate(xs), np.concatenate(ys), bits)
                idx, cnt = np.unique(cells, return_counts=True)
                rows.extend(
                    (int(zoom), int(tile_h), int(c), int(n)) for c, n in zip(idx, cnt)
                )
            yield pd.DataFrame(rows, columns=["zoom", "tile_h", "cell", "n"])

    return tiles.select("zoom", "tile_h", "payload").mapInPandas(run, RASTER_SCHEMA)


def rasterize_features(render_features: DataFrame, bits: int = 6) -> DataFrame:
    """Rasterize features DIRECTLY from grid coordinates (no payload):
    the vector-side ground truth. Input: (zoom, tile_h, gx, gy) with
    u32-grid coords; the projection matches compose's P7 exactly."""
    from ..operators.compose import _tile_origin_xy
    from ..tile import tile_project

    def run(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            zoom = pdf["zoom"].to_numpy(dtype=np.int64)
            tile_h = pdf["tile_h"].to_numpy(dtype=np.int64)
            tx, ty = _tile_origin_xy(zoom, tile_h)
            px, py = tile_project(
                zoom.astype(np.float64),
                tx.astype(np.float64),
                ty.astype(np.float64),
                pdf["gx"].to_numpy(dtype=np.float64),
                pdf["gy"].to_numpy(dtype=np.float64),
            )
            cells = _cells_of(px, py, bits)
            out = (
                pd.DataFrame(
                    {"zoom": zoom, "tile_h": tile_h, "cell": cells, "n": 1}
                )
                .groupby(["zoom", "tile_h", "cell"], as_index=False)
                .sum()
            )
            yield out

    grid = render_features.select("zoom", "tile_h", "gx", "gy").mapInPandas(
        run, RASTER_SCHEMA
    )
    # batches may split a tile: final exact combine
    return grid.groupBy("zoom", "tile_h", "cell").agg(F.sum("n").alias("n"))


def raster_mismatches(a: DataFrame, b: DataFrame) -> DataFrame:
    """Full-outer compare of two sparse rasters; empty == consistent."""
    aa = a.groupBy("zoom", "tile_h", "cell").agg(F.sum("n").alias("n_a"))
    bb = b.groupBy("zoom", "tile_h", "cell").agg(F.sum("n").alias("n_b"))
    joined = aa.join(bb, ["zoom", "tile_h", "cell"], "full_outer")
    return joined.where(
        F.coalesce(F.col("n_a"), F.lit(0)) != F.coalesce(F.col("n_b"), F.lit(0))
    )


def rasterize_polygon_rings(rings: list, zoom: int, tile_h: int, bits: int = 6) -> set[int]:
    """Driver-side polygon rasterization on one tile: even-odd ray cast on
    grid-cell centers (u32 location space). Used by the vector<->raster
    polygon coverage check."""
    from .. import hilbert as hb
    from ..operators.pip import _ray_cast

    g = 1 << bits
    tx, ty = hb.h2xy(np.array([tile_h], np.uint64), zoom)
    x0 = int(tx[0]) << (32 - zoom)  # tile grid coords -> location-space origin
    y0 = int(ty[0]) << (32 - zoom)
    extent = np.uint64(0xFFFFFFFF) >> np.uint64(zoom)
    step = float(extent) / g
    cy, cx = np.mgrid[0:g, 0:g]
    px = float(x0) + (cx.ravel() + 0.5) * step
    py = float(y0) + (cy.ravel() + 0.5) * step
    inside = np.zeros(g * g, dtype=bool)
    for ring in rings:
        inside ^= _ray_cast(px, py, np.asarray(ring, dtype=np.float64))
    return set(np.flatnonzero(inside).astype(int))
