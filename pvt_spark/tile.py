"""Tile algebra (reference src/tile.rs:50-334), driver-side helpers.

A Tile is (z, x, y, h) where h is the Hilbert curve position at zoom z
over the 2^z x 2^z grid.  Semantics replicated from the reference:

- ``from_zxy`` / ``from_zh``: z==0 is always (0,0,0,h=0)
  (reference src/tile.rs:50-74).
- ``at_zoom`` RECOMPUTES h from shifted x/y via xy2h — at a finer zoom
  the NW-corner subtile's curve position depends on orientation and is
  NOT simply ``h << 2Δ`` (reference src/tile.rs:76-99).
- ``h_range_for_zoom``: coarser zoom is ``h >> 2Δ`` (a single tile);
  finer zoom is the contiguous range ``[h << 2Δ, (h+1) << 2Δ)`` —
  the load-bearing property that makes spatial retrieval pure range
  arithmetic (reference src/tile.rs:101-129, README.md:24).
- 52-bit JS-safe ``tile_id = z << 47 | h`` with the reference's
  mod-wrap overflow branch (reference src/tile.rs:141-152).
- ``project``: location space -> tile-local i16 coords, extent 8192,
  clamp [-16384, 16383] (reference src/tile.rs:297-334).

Golden values from reference src/tile.rs:489-666 are pinned in
tests/test_tile.py.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from . import hilbert as hb

TILE_EXTENT = 8192.0
TILE_MAX = 16383.0
TILE_MIN = -16384.0
U32_SIZE = 4294967296.0
U32_MAX = 4294967295

# 2^47 - 1 and the reference's (buggy but replicated) 2^52 - 1 modulus
_H_47_MAX = 140_737_488_355_327
_ID_MOD = 4_503_599_627_370_495


def _xy2h_scalar(x: int, y: int, order: int) -> int:
    return int(hb.xy2h(np.array([x], dtype=np.uint64), np.array([y], dtype=np.uint64), order)[0])


def _h2xy_scalar(h: int, order: int) -> tuple[int, int]:
    xs, ys = hb.h2xy(np.array([h], dtype=np.uint64), order)
    return int(xs[0]), int(ys[0])


@dataclass(frozen=True)
class Tile:
    z: int
    x: int
    y: int
    h: int

    @staticmethod
    def from_zxy(z: int, x: int, y: int) -> "Tile":
        if z == 0:
            return Tile(0, 0, 0, 0)
        return Tile(z, x, y, _xy2h_scalar(x, y, z))

    @staticmethod
    def from_zh(z: int, h: int) -> "Tile":
        if z == 0:
            return Tile(0, 0, 0, 0)
        x, y = _h2xy_scalar(h, z)
        return Tile(z, x, y, h)

    def at_zoom(self, z: int) -> "Tile":
        if z == self.z:
            return self
        if z == 0:
            return Tile(0, 0, 0, 0)
        if z > self.z:
            d = z - self.z
            return Tile.from_zxy(z, self.x << d, self.y << d)
        d = self.z - z
        return Tile.from_zxy(z, self.x >> d, self.y >> d)

    def h_range_for_zoom(self, z: int) -> range:
        if z == self.z:
            return range(self.h, self.h + 1)
        if z < self.z:
            start = self.h >> (2 * (self.z - z))
            return range(start, start + 1)
        d = z - self.z
        start = self.h << (2 * d)
        return range(start, start + (1 << (2 * d)))

    def id(self) -> int:
        if self.h > _H_47_MAX:
            return self.h % _ID_MOD
        return (self.z << 47) | self.h

    def parent(self) -> "Tile | None":
        if self.z == 0:
            return None
        return Tile(self.z - 1, self.x >> 1, self.y >> 1, self.h >> 2)

    def children(self) -> list["Tile"]:
        z, w, n = self.z + 1, self.x * 2, self.y * 2
        return [
            Tile.from_zxy(z, w, n),
            Tile.from_zxy(z, w, n + 1),
            Tile.from_zxy(z, w + 1, n + 1),
            Tile.from_zxy(z, w + 1, n),
        ]

    def grandchildren(self) -> list["Tile"]:
        return [gc for c in self.children() for gc in c.children()]

    def descendants(self, grandchild_levels: int, max_zoom: int) -> list["Tile"]:
        if grandchild_levels == 0:
            return []
        top_z = min(self.z + grandchild_levels * 2, max_zoom)
        out: list[Tile] = []
        queue = list(self.grandchildren())
        while queue:
            t = queue.pop(0)
            if t.z < top_z:
                queue.extend(t.grandchildren())
            out.append(t)
        return out

    def ancestor(self, z: int) -> "Tile":
        assert z < self.z
        if z == 0:
            return Tile(0, 0, 0, 0)
        d = self.z - z
        return Tile(z, self.x >> d, self.y >> d, self.h >> (2 * d))

    def pyramid(self, grandchild_levels: int, max_zoom: int) -> list["Tile"]:
        out = [self.ancestor(z) for z in range(0, self.z, 2)]
        out.append(self)
        out.extend(self.descendants(grandchild_levels, max_zoom))
        return out

    def origin_location(self) -> tuple[int, int]:
        if self.z == 0:
            return (0, 0)
        if self.z == 32:
            return (self.x, self.y)
        d = 32 - self.z
        return (self.x << d, self.y << d)

    def location_extent(self) -> int:
        if self.z == 32:
            return 0
        return U32_MAX >> self.z

    def center(self) -> tuple[int, int]:
        m = self.location_extent() >> 1
        ox, oy = self.origin_location()
        return (ox + m, oy + m)

    def bbox(self) -> tuple[tuple[int, int], tuple[int, int]]:
        o = self.origin_location()
        e = self.location_extent()
        return (o, (o[0] + e, o[1] + e))

    def axis_tile_count(self) -> float:
        return float(1 << self.z)

    def project(self, loc_x, loc_y):
        """Vectorized location->tile-local projection (src/tile.rs:297-334).

        Accepts scalars or numpy arrays; returns int16 arrays (extent
        8192, clamped to [-16384, 16383], Rust `as i16` truncation).
        """
        unit_x = np.asarray(loc_x, dtype=np.float64) / U32_SIZE
        unit_y = np.asarray(loc_y, dtype=np.float64) / U32_SIZE
        resolution = self.axis_tile_count() * TILE_EXTENT
        x = unit_x * resolution - self.x * TILE_EXTENT
        y = unit_y * resolution - self.y * TILE_EXTENT
        x = np.clip(x, TILE_MIN, TILE_MAX)
        y = np.clip(y, TILE_MIN, TILE_MAX)
        return np.trunc(x).astype(np.int16), np.trunc(y).astype(np.int16)


_BEARINGS = ["NW", "NS", "NE", "WS", "WE", "WN", "SE", "SN", "SW", "EN", "EW", "ES"]


def hilbert_bearing(t: Tile) -> str | None:
    """P9 (reference src/tile.rs:336-420): which neighbors the curve enters
    and exits this tile through (debug/Info layer). Returns e.g. "WE" or
    None at curve ends/edges."""
    order_max = 1 << t.z
    n = _xy2h_scalar(t.x, t.y - 1, t.z) if t.y != 0 else None
    w = _xy2h_scalar(t.x - 1, t.y, t.z) if t.x != 0 else None
    s = _xy2h_scalar(t.x, t.y + 1, t.z) if t.y + 1 < order_max else None
    e = _xy2h_scalar(t.x + 1, t.y, t.z) if t.x + 1 < order_max else None
    from_h = t.h - 1 if t.h != 0 else None
    to_h = t.h + 1 if t.h < (1 << (2 * t.z)) else None
    if to_h is None:
        return None
    if n == from_h:
        return {w: "NW", s: "NS", e: "NE"}.get(to_h)
    if w == from_h:
        return {s: "WS", e: "WE", n: "WN"}.get(to_h, "WE")
    if s == from_h:
        return {e: "SE", n: "SN", w: "SW"}.get(to_h, "SN")
    if e == from_h:
        return {n: "EN", w: "EW", s: "ES"}.get(to_h)
    return None


def tile_project(z, tile_x, tile_y, loc_x, loc_y):
    """Fully vectorized variant of Tile.project over per-row tiles.

    All args numpy arrays; used inside the tile-assembly pandas UDF where
    each batch spans many tiles.
    """
    z = np.asarray(z, dtype=np.float64)
    unit_x = np.asarray(loc_x, dtype=np.float64) / U32_SIZE
    unit_y = np.asarray(loc_y, dtype=np.float64) / U32_SIZE
    resolution = np.exp2(z) * TILE_EXTENT
    x = unit_x * resolution - np.asarray(tile_x, dtype=np.float64) * TILE_EXTENT
    y = unit_y * resolution - np.asarray(tile_y, dtype=np.float64) * TILE_EXTENT
    x = np.clip(x, TILE_MIN, TILE_MAX)
    y = np.clip(y, TILE_MIN, TILE_MAX)
    return np.trunc(x).astype(np.int16), np.trunc(y).astype(np.int16)
