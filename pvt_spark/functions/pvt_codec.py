"""PVT-equivalent tile payload codec (deterministic binary).

Mirrors the reference's flatbuffer tile model
(schema/planet_vector_tile.fbs:1-50): a tile is layers -> features ->
geometries, with per-tile interned string/value tables
(src/tile_attributes.rs:14-80). The byte layout here is our own (the
reference's exact flatbuffer bytes are NOT part of the parity
invariant — tile ids, feature assignments and counts are); what
matters is that encoding is deterministic and self-describing.

Layout (little-endian):
  u32 magic 'PVTS', u16 version, u8 zoom, pad, u64 tile_h
  u32 n_strings; per string: u32 len + utf8 bytes
  u16 n_layers; per layer:
    u32 name_idx, u32 n_features; per feature:
      u64 id, u16 n_tags, n_tags x (u32 key_idx, u32 val_idx),
      u16 n_geoms; per geom: u32 n_points, n_points x (i16 x, i16 y)

Encode/decode are numpy-vectorized per array block.
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"PVTS"
VERSION = 1


class TileAttributes:
    """First-seen-order string interner (reference src/tile_attributes.rs)."""

    def __init__(self) -> None:
        self._idx: dict[str, int] = {}
        self.strings: list[str] = []

    def upsert(self, s: str) -> int:
        i = self._idx.get(s)
        if i is None:
            i = len(self.strings)
            self._idx[s] = i
            self.strings.append(s)
        return i

    def upsert_many(self, arr) -> np.ndarray:
        return np.fromiter((self.upsert(s) for s in arr), dtype=np.uint32, count=len(arr))


def encode_tile(zoom: int, tile_h: int, layers: list[dict]) -> bytes:
    """layers: [{name, features: [{id, keys:[str], values:[str],
    geoms: [(x_i16_array, y_i16_array), ...]}]}] -> payload bytes."""
    attrs = TileAttributes()
    parts = [MAGIC, struct.pack("<HBxQ", VERSION, zoom, tile_h)]
    body: list[bytes] = []
    body.append(struct.pack("<H", len(layers)))
    for layer in layers:
        name_idx = attrs.upsert(layer["name"])
        feats = layer["features"]
        body.append(struct.pack("<II", name_idx, len(feats)))
        for f in feats:
            kidx = attrs.upsert_many(f.get("keys", []))
            vidx = attrs.upsert_many(f.get("values", []))
            geoms = f.get("geoms", [])
            body.append(struct.pack("<QH", f["id"] & 0xFFFFFFFFFFFFFFFF, len(kidx)))
            kv = np.empty(2 * len(kidx), dtype=np.uint32)
            kv[0::2] = kidx
            kv[1::2] = vidx
            body.append(kv.tobytes())
            body.append(struct.pack("<H", len(geoms)))
            for gx, gy in geoms:
                pts = np.empty(2 * len(gx), dtype=np.int16)
                pts[0::2] = gx
                pts[1::2] = gy
                body.append(struct.pack("<I", len(gx)))
                body.append(pts.tobytes())
    parts.append(struct.pack("<I", len(attrs.strings)))
    for s in attrs.strings:
        b = s.encode("utf-8")
        parts.append(struct.pack("<I", len(b)))
        parts.append(b)
    parts.extend(body)
    return b"".join(parts)


def decode_tile(payload: bytes) -> dict:
    assert payload[:4] == MAGIC
    off = 4
    version, zoom, tile_h = struct.unpack_from("<HBxQ", payload, off)
    off += 12
    (n_strings,) = struct.unpack_from("<I", payload, off)
    off += 4
    strings = []
    for _ in range(n_strings):
        (ln,) = struct.unpack_from("<I", payload, off)
        off += 4
        strings.append(payload[off : off + ln].decode("utf-8"))
        off += ln
    (n_layers,) = struct.unpack_from("<H", payload, off)
    off += 2
    layers = []
    for _ in range(n_layers):
        name_idx, n_feats = struct.unpack_from("<II", payload, off)
        off += 8
        feats = []
        for _ in range(n_feats):
            fid, n_tags = struct.unpack_from("<QH", payload, off)
            off += 10
            kv = np.frombuffer(payload, dtype=np.uint32, count=2 * n_tags, offset=off)
            off += 8 * n_tags
            (n_geoms,) = struct.unpack_from("<H", payload, off)
            off += 2
            geoms = []
            for _ in range(n_geoms):
                (n_pts,) = struct.unpack_from("<I", payload, off)
                off += 4
                pts = np.frombuffer(payload, dtype=np.int16, count=2 * n_pts, offset=off)
                off += 4 * n_pts
                geoms.append((pts[0::2].copy(), pts[1::2].copy()))
            feats.append(
                {
                    "id": fid,
                    "keys": [strings[i] for i in kv[0::2]],
                    "values": [strings[i] for i in kv[1::2]],
                    "geoms": geoms,
                }
            )
        layers.append({"name": strings[name_idx], "features": feats})
    return {"version": version, "zoom": zoom, "tile_h": tile_h, "layers": layers}


def geometry_type(geom_points: int, first, last) -> int:
    """Client-side inference (reference src/typescript/pvt.ts:74-89):
    1=point, 2=line, 3=polygon (closed ring)."""
    if geom_points < 2:
        return 1
    return 3 if first == last else 2
