"""Discrete global grid cell ids: S2-style face-Hilbert cells and
H3-style hexagonal cells (pure numpy; no external index service).

The north rule calls for encoding points to "H3/S2 cells" alongside the
PVT Hilbert tile ids. These implementations reproduce the STRUCTURE of
those systems (hierarchy, locality, fixed-width int64 ids, parent/child
algebra) with our own curve kernels; they are NOT byte-compatible with
Google S2 / Uber H3 (whose exact ids depend on proprietary-looking but
public lookup tables we have no need to replicate — all joins here are
self-consistent equi-joins on our ids).

- ``s2ish_cell``: project lat/lon to one of 6 cube faces (gnomonic),
  quadratic s,t warp like S2's, then the face-local Hilbert position at
  the given level. id layout: [3 bits face][2*level bits hilbert]
  packed at a fixed 30-level scale like S2's, so ids at different
  levels share prefixes (range queries work).
- ``hexish_cell``: axial-rounded hexagonal cell on an equal-spacing
  planar grid per resolution — the hexagonal-aggregation role of H3.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from .. import hilbert as hb

MAX_LEVEL = 30


def _lonlat_to_xyz(lon_deg: np.ndarray, lat_deg: np.ndarray):
    lon = np.radians(lon_deg)
    lat = np.radians(lat_deg)
    cl = np.cos(lat)
    return cl * np.cos(lon), cl * np.sin(lon), np.sin(lat)


def _face_uv(x: np.ndarray, y: np.ndarray, z: np.ndarray):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(
        (ax >= ay) & (ax >= az),
        np.where(x >= 0, 0, 3),
        np.where(ay >= az, np.where(y >= 0, 1, 4), np.where(z >= 0, 2, 5)),
    )
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (nu, de1, de2) in enumerate(
        [
            (0, 1, 2),  # face 0: +x, u=y/x v=z/x
            (1, 0, 2),  # face 1: +y, u=-x/y v=z/y
            (2, 0, 1),  # face 2: +z, u=-x/z v=-y/z
            (0, 1, 2),  # face 3: -x, u=z/x v=y/x (S2 swaps; we mirror)
            (1, 0, 2),
            (2, 0, 1),
        ]
    ):
        m = face == f
        axis = [x, y, z][nu]
        a = [x, y, z][de1]
        b = [x, y, z][de2]
        with np.errstate(divide="ignore", invalid="ignore"):
            u[m] = (a[m] / axis[m])
            v[m] = (b[m] / axis[m])
    return face.astype(np.int64), u, v


def _st_warp(u: np.ndarray) -> np.ndarray:
    """S2-style quadratic projection: u in [-1,1] -> s in [0,1]."""
    s = np.where(u >= 0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u))
    return np.clip(s, 0.0, 1.0)


def pack_s2ish(face, si, ti, level: int = 12) -> np.ndarray:
    """Integer core: (face, si, ti at ``level``) -> int64 cell id.

    Layout: (face << 60) | (hilbert_at_level << 2*(MAX_LEVEL-level))
    — lexicographic prefix containment across levels on the same face.
    Pure integer math (certified against the DuckDB unrolled-Hilbert
    oracle in q37; the order-32 CTE equals the level-L encode for
    coords < 2^L because the leading zero-bit iterations contribute 0
    to d and their x/y swaps cancel in pairs).
    """
    assert 0 <= level <= MAX_LEVEL
    face = np.asarray(face, dtype=np.uint64)
    si = np.asarray(si, dtype=np.uint64)
    ti = np.asarray(ti, dtype=np.uint64)
    h = hb.xy2h(si, ti, level) if level > 0 else np.zeros(len(si), dtype=np.uint64)
    cell = (face << np.uint64(60)) | (h << np.uint64(2 * (MAX_LEVEL - level)))
    return cell.view(np.int64)


def s2ish_cell(lon_dm7, lat_dm7, level: int = 12) -> np.ndarray:
    """dm7 int arrays -> int64 cell ids at the given level (<= 30).

    Float face projection + quadratic warp (golden/locality-tested in
    pytest), then the integer ``pack_s2ish`` core.
    """
    assert 0 <= level <= MAX_LEVEL
    lon = np.asarray(lon_dm7, dtype=np.float64) / 1e7
    lat = np.asarray(lat_dm7, dtype=np.float64) / 1e7
    x, y, z = _lonlat_to_xyz(lon, lat)
    face, u, v = _face_uv(x, y, z)
    s = _st_warp(u)
    t = _st_warp(v)
    n = np.uint64(1) << np.uint64(level)
    si = np.minimum((s * float(n)).astype(np.uint64), n - np.uint64(1))
    ti = np.minimum((t * float(n)).astype(np.uint64), n - np.uint64(1))
    return pack_s2ish(face.astype(np.uint64), si, ti, level)


def s2ish_parent(cell: np.ndarray, level: int, parent_level: int) -> np.ndarray:
    """Parent cell id at a coarser level (prefix truncation)."""
    c = np.asarray(cell, dtype=np.int64).view(np.uint64)
    face = c >> np.uint64(60)
    h = (c & ((np.uint64(1) << np.uint64(60)) - np.uint64(1))) >> np.uint64(
        2 * (MAX_LEVEL - level)
    )
    ph = h >> np.uint64(2 * (level - parent_level))
    return (
        (face << np.uint64(60)) | (ph << np.uint64(2 * (MAX_LEVEL - parent_level)))
    ).view(np.int64)


SQRT3 = np.sqrt(3.0)


def hexish_cell(lon_dm7, lat_dm7, resolution: int = 8) -> np.ndarray:
    """Hex cell id via axial-coordinate rounding on an equirectangular
    plane; cell size halves per resolution. id = (res<<56)|(q<<28)|r
    with q,r offset-biased 27-bit ints."""
    lon = np.asarray(lon_dm7, dtype=np.float64) / 1e7
    lat = np.asarray(lat_dm7, dtype=np.float64) / 1e7
    size = 360.0 / (8 << resolution)  # hex circumradius in degrees
    q = (SQRT3 / 3.0 * lon - 1.0 / 3.0 * lat) / size
    r = (2.0 / 3.0 * lat) / size
    # cube rounding
    xc = q
    zc = r
    yc = -xc - zc
    rx, ry, rz = np.round(xc), np.round(yc), np.round(zc)
    dx, dy, dz = np.abs(rx - xc), np.abs(ry - yc), np.abs(rz - zc)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & (dz > dy)
    rx = np.where(fix_x, -ry - rz, rx)
    rz = np.where(fix_z, -rx - ry, rz)
    qi = rx.astype(np.int64) + (1 << 27)
    ri = rz.astype(np.int64) + (1 << 27)
    return (np.int64(resolution) << np.int64(56)) | (qi << np.int64(28)) | ri


# --- Spark column wrappers (Arrow-batched pandas UDFs over the numpy
# kernels; one UDF instance per (kernel, level) closure) ---------------


def pack_s2ish_col(face, si, ti, level: int = 12):
    @F.pandas_udf(LongType())
    def _k(f: pd.Series, s: pd.Series, t: pd.Series) -> pd.Series:
        return pd.Series(
            pack_s2ish(f.to_numpy(), s.to_numpy(), t.to_numpy(), level)
        )

    return _k(face, si, ti)


def s2ish_parent_col(cell, level: int, parent_level: int):
    @F.pandas_udf(LongType())
    def _k(c: pd.Series) -> pd.Series:
        return pd.Series(s2ish_parent(c.to_numpy(), level, parent_level))

    return _k(cell)


def hexish_cell_col(lon_dm7, lat_dm7, resolution: int = 8):
    @F.pandas_udf(LongType())
    def _k(lon: pd.Series, lat: pd.Series) -> pd.Series:
        return pd.Series(
            hexish_cell(lon.to_numpy(), lat.to_numpy(), resolution)
        )

    return _k(lon_dm7, lat_dm7)
