"""Client-side decode helpers (reference src/typescript/pvt.ts).

The reference's TypeScript client infers geometry types, splits
polygon rings by winding, and reprojects tile coordinates to WGS84
GeoJSON (pvt.ts:70-233). These are the Python equivalents, used for
tests/inspection and as the documented decode contract.
"""

from __future__ import annotations

import numpy as np

from ..tile import TILE_EXTENT, Tile

# geometry type codes (MapLibre convention)
POINT, LINE, POLYGON = 1, 2, 3


def geometry_type(gx: np.ndarray, gy: np.ndarray) -> int:
    """P14 (reference pvt.ts:74-89): point/line/polygon by ring closure."""
    if len(gx) < 2:
        return POINT
    if gx[0] == gx[-1] and gy[0] == gy[-1]:
        return POLYGON
    return LINE


def signed_ring_area(gx: np.ndarray, gy: np.ndarray) -> float:
    """P15 shoelace area (reference pvt.ts:184-233): positive = CW in the
    y-down tile space = outer ring; negative = hole."""
    x = np.asarray(gx, dtype=np.float64)
    y = np.asarray(gy, dtype=np.float64)
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def split_rings(geoms: list) -> list[list]:
    """Group rings into polygons: an outer ring (area >= 0) starts a new
    polygon; holes (area < 0) attach to the preceding outer ring."""
    polys: list[list] = []
    for gx, gy in geoms:
        if signed_ring_area(gx, gy) >= 0 or not polys:
            polys.append([(gx, gy)])
        else:
            polys[-1].append((gx, gy))
    return polys


def tile_point_to_lonlat(z: int, x: int, y: int, px, py):
    """P16: tile-local coords -> WGS84 degrees (reference pvt.ts:125-210)."""
    from .. import hilbert as hb

    t = Tile.from_zxy(z, x, y)
    res = t.axis_tile_count() * TILE_EXTENT
    ux = (np.asarray(px, dtype=np.float64) + t.x * TILE_EXTENT) / res
    uy = (np.asarray(py, dtype=np.float64) + t.y * TILE_EXTENT) / res
    lon_dm7, lat_dm7 = hb.project_mercator_to_lonlat(ux, uy)
    return lon_dm7 / 1e7, lat_dm7 / 1e7


def tile_to_geojson(payload: bytes, z: int, x: int, y: int) -> dict:
    """Decode a tile payload into a GeoJSON FeatureCollection."""
    from .pvt_codec import decode_tile

    decoded = decode_tile(payload)
    features = []
    for layer in decoded["layers"]:
        for f in layer["features"]:
            geoms = f["geoms"]
            if not geoms:
                continue
            gt = geometry_type(*geoms[0])
            if gt == POINT:
                lon, lat = tile_point_to_lonlat(z, x, y, geoms[0][0], geoms[0][1])
                geometry = {"type": "Point", "coordinates": [float(lon[0]), float(lat[0])]}
            elif gt == LINE:
                lon, lat = tile_point_to_lonlat(z, x, y, geoms[0][0], geoms[0][1])
                geometry = {
                    "type": "LineString",
                    "coordinates": [[float(a), float(b)] for a, b in zip(lon, lat)],
                }
            else:
                rings = []
                for gx, gy in geoms:
                    lon, lat = tile_point_to_lonlat(z, x, y, gx, gy)
                    rings.append([[float(a), float(b)] for a, b in zip(lon, lat)])
                geometry = {"type": "Polygon", "coordinates": rings}
            features.append(
                {
                    "type": "Feature",
                    "id": f["id"],
                    "properties": dict(zip(f["keys"], f["values"])) | {"layer": layer["name"]},
                    "geometry": geometry,
                }
            )
    return {"type": "FeatureCollection", "features": features}
