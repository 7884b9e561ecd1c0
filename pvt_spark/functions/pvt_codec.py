"""PVT-equivalent tile payload codec (deterministic columnar binary).

Mirrors the reference's flatbuffer tile model
(schema/planet_vector_tile.fbs:1-50): a tile is layers -> features ->
geometries, with per-tile interned string/value tables
(src/tile_attributes.rs:14-80). The byte layout here is our own (the
reference's exact flatbuffer bytes are NOT part of the parity
invariant — tile ids, feature assignments and counts are).

v2 layout is COLUMNAR so encode/decode are a handful of numpy
``tobytes``/``frombuffer`` calls (the per-feature loop of v1 dominated
tile assembly):

  u32 magic 'PVTS', u16 version=2, u8 zoom, pad, u64 tile_h
  u32 n_strings; per string: u32 len + utf8 bytes  (first-seen order)
  u16 n_layers; per layer:
    u32 name_idx, u32 n_features
    i64[n_features]      feature ids
    u16[n_features]      n_tags
    u32[2*sum(n_tags)]   key/value string indexes, interleaved
    u32[n_features]      geom point counts (single geometry per feature)
    i16[2*sum(counts)]   x/y interleaved tile-local points
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"PVTS"
VERSION = 2


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


def encode_tile_arrays(zoom: int, tile_h: int, layers: list[dict]) -> bytes:
    """Array-form encoder (the fast path used by tile assembly).

    layers: [{name: str, ids: i64[n], n_tags: int[n], kv: object[2*sum]
    (interleaved key/value strings), geom_lens: int[n],
    pts: i16[2*sum(geom_lens)] (interleaved x/y)}]
    """
    attrs = TileAttributes()
    body: list[bytes] = [struct.pack("<H", len(layers))]
    for layer in layers:
        name_idx = attrs.upsert(layer["name"])
        ids = np.ascontiguousarray(layer["ids"], dtype=np.int64)
        n_tags = np.ascontiguousarray(layer["n_tags"], dtype=np.uint16)
        kv_strings = layer["kv"]
        kv_idx = attrs.upsert_many(kv_strings)
        geom_lens = np.ascontiguousarray(layer["geom_lens"], dtype=np.uint32)
        pts = np.ascontiguousarray(layer["pts"], dtype=np.int16)
        body.append(struct.pack("<II", name_idx, len(ids)))
        body.append(ids.tobytes())
        body.append(n_tags.tobytes())
        body.append(kv_idx.tobytes())
        body.append(geom_lens.tobytes())
        body.append(pts.tobytes())
    parts = [MAGIC, struct.pack("<HBxQ", VERSION, zoom, tile_h)]
    parts.append(struct.pack("<I", len(attrs.strings)))
    for s in attrs.strings:
        b = s.encode("utf-8")
        parts.append(struct.pack("<I", len(b)))
        parts.append(b)
    parts.extend(body)
    return b"".join(parts)


def encode_tile(zoom: int, tile_h: int, layers: list[dict]) -> bytes:
    """Dict-form encoder (tests/fixtures): features as list of dicts with
    keys/values/geoms like the decoder output."""
    arr_layers = []
    for layer in layers:
        feats = layer["features"]
        ids = np.array([f["id"] for f in feats], dtype=np.uint64).view(np.int64)
        n_tags = np.array([len(f.get("keys", [])) for f in feats], dtype=np.int64)
        kv: list[str] = []
        for f in feats:
            for k, v in zip(f.get("keys", []), f.get("values", [])):
                kv.append(k)
                kv.append(v)
        geom_lens = []
        pts_parts = []
        for f in feats:
            geoms = f.get("geoms", [])
            gx = np.concatenate([np.asarray(g[0], np.int16) for g in geoms]) if geoms else np.empty(0, np.int16)
            gy = np.concatenate([np.asarray(g[1], np.int16) for g in geoms]) if geoms else np.empty(0, np.int16)
            geom_lens.append(len(gx))
            inter = np.empty(2 * len(gx), dtype=np.int16)
            inter[0::2] = gx
            inter[1::2] = gy
            pts_parts.append(inter)
        pts = np.concatenate(pts_parts) if pts_parts else np.empty(0, np.int16)
        arr_layers.append(
            {
                "name": layer["name"],
                "ids": ids,
                "n_tags": n_tags,
                "kv": kv,
                "geom_lens": np.array(geom_lens, dtype=np.int64),
                "pts": pts,
            }
        )
    return encode_tile_arrays(zoom, tile_h, arr_layers)


def decode_tile(payload: bytes) -> dict:
    assert payload[:4] == MAGIC
    off = 4
    version, zoom, tile_h = struct.unpack_from("<HBxQ", payload, off)
    assert version == VERSION
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
        name_idx, n = struct.unpack_from("<II", payload, off)
        off += 8
        ids = np.frombuffer(payload, np.int64, n, off).view(np.uint64)
        off += 8 * n
        n_tags = np.frombuffer(payload, np.uint16, n, off).astype(np.int64)
        off += 2 * n
        total_kv = int(n_tags.sum()) * 2
        kv = np.frombuffer(payload, np.uint32, total_kv, off)
        off += 4 * total_kv
        geom_lens = np.frombuffer(payload, np.uint32, n, off).astype(np.int64)
        off += 4 * n
        total_pts = int(geom_lens.sum()) * 2
        pts = np.frombuffer(payload, np.int16, total_pts, off)
        off += 2 * total_pts
        feats = []
        tag_off = np.concatenate([[0], np.cumsum(n_tags)])
        geo_off = np.concatenate([[0], np.cumsum(geom_lens)])
        for i in range(n):
            kvs = kv[2 * tag_off[i] : 2 * tag_off[i + 1]]
            p = pts[2 * geo_off[i] : 2 * geo_off[i + 1]]
            feats.append(
                {
                    "id": int(ids[i]),
                    "keys": [strings[j] for j in kvs[0::2]],
                    "values": [strings[j] for j in kvs[1::2]],
                    "geoms": [(p[0::2].copy(), p[1::2].copy())] if len(p) else [],
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
