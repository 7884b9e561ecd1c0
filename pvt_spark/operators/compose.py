"""Tile payload assembly — salted two-phase applyInPandas (A5/A6/P7 + DP).

Reference equivalent: ``compose_tile``/``build_pvt`` assemble one tile
at a time from index ranges (src/hilbert/compose.rs:110-349) with
per-tile string interning (src/tile_attributes.rs:14-80) and tile-local
projection (src/tile.rs:297-334).

Spark design (north rule: explicit salting for hot tiles):

  phase 0  per-(zoom, tile_h) counts -> n_salt = ceil(count/threshold)
           (a cheap count agg; AQE alone cannot split a single
           applyInPandas group, so salting is load-bearing here)
  phase 1  groupBy(zoom, tile_h, salt).applyInPandas: geometry
           projection (vectorized P7), Douglas-Peucker per zoom,
           serialize a COLUMNAR CHUNK per (tile, salt, layer)
  phase 2  groupBy(zoom, tile_h): merge the few chunks per tile —
           global h-order restore, first-seen string interning (A6),
           emit the PVT-equivalent payload (pvt_codec)

Phase 1 carries the heavy compute over salt-balanced groups; phase 2
touches ~n_salt*n_layers rows per tile. Feature order inside a layer is
ascending (h, feature_id) — the reference's storage order invariant.
"""

from __future__ import annotations

import pickle

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import hilbert as hb
from ..functions.pvt_codec import TileAttributes, encode_tile
from ..tile import tile_project
from .simplify import DEFAULT_TOLERANCE, simplify_line

CHUNK_SCHEMA = (
    "zoom int, tile_h long, salt int, layer string, n_features long, chunk binary"
)
TILE_SCHEMA = (
    "zoom int, tile_h long, tile_id long, layer_count int, feature_count long, "
    "payload binary, payload_size int"
)


def _tile_xy_at(zoom: int, tile_h: int) -> tuple[int, int]:
    if zoom == 0:
        return 0, 0
    x, y = hb.h2xy(np.array([tile_h], dtype=np.uint64), zoom)
    return int(x[0]), int(y[0])


def _feature_tile_id(zoom: int, h_signed: np.ndarray) -> np.ndarray:
    """PVT feature id = the feature's own h (reference compose.rs uses the
    entity h as feature id), 52-bit packed with zoom (src/tile.rs:141-152)."""
    h = hb.signed_to_h(h_signed)
    over = h > np.uint64(140_737_488_355_327)
    packed = (np.uint64(zoom) << np.uint64(47)) | h
    return np.where(over, h % np.uint64(4_503_599_627_370_495), packed).astype(np.int64)


def _partial_assemble(key, pdf: pd.DataFrame, tolerance: float) -> pd.DataFrame:
    zoom, tile_h, salt = int(key[0]), int(key[1]), int(key[2])
    tx, ty = _tile_xy_at(zoom, tile_h)
    out_rows = []
    for layer, grp in pdf.groupby("layer", sort=True):
        grp = grp.sort_values(["h", "feature_id"], kind="mergesort")
        n = len(grp)
        # flatten all geometries of the layer group for ONE vectorized projection
        geom_lens = grp["geom_x"].map(len).to_numpy(dtype=np.int64)
        flat_x = np.concatenate([np.asarray(g, dtype=np.float64) for g in grp["geom_x"]]) if n else np.empty(0)
        flat_y = np.concatenate([np.asarray(g, dtype=np.float64) for g in grp["geom_y"]]) if n else np.empty(0)
        px, py = tile_project(
            np.full(len(flat_x), zoom, dtype=np.float64),
            np.full(len(flat_x), tx, dtype=np.float64),
            np.full(len(flat_x), ty, dtype=np.float64),
            flat_x,
            flat_y,
        )
        # split + simplify per feature
        offsets = np.concatenate([[0], np.cumsum(geom_lens)])
        sx, sy, slens = [], [], np.empty(n, dtype=np.int64)
        for i in range(n):
            gx = px[offsets[i] : offsets[i + 1]]
            gy = py[offsets[i] : offsets[i + 1]]
            if len(gx) > 2:
                gx, gy = simplify_line(gx, gy, tolerance)
            sx.append(gx)
            sy.append(gy)
            slens[i] = len(gx)
        keys_flat: list[str] = []
        vals_flat: list[str] = []
        n_tags = np.empty(n, dtype=np.int64)
        for i, tags in enumerate(grp["out_tags"]):
            items = sorted(tags.items()) if tags else []
            n_tags[i] = len(items)
            keys_flat.extend(k for k, _ in items)
            vals_flat.extend(v for _, v in items)
        chunk = pickle.dumps(
            {
                "ids": grp["feature_id"].to_numpy(dtype=np.int64),
                "h": grp["h"].to_numpy(dtype=np.int64),
                "n_tags": n_tags,
                "keys": keys_flat,
                "vals": vals_flat,
                "geom_lens": slens,
                "gx": np.concatenate(sx) if n else np.empty(0, dtype=np.int16),
                "gy": np.concatenate(sy) if n else np.empty(0, dtype=np.int16),
            },
            protocol=4,
        )
        out_rows.append((zoom, tile_h, salt, layer, n, chunk))
    return pd.DataFrame(
        out_rows, columns=["zoom", "tile_h", "salt", "layer", "n_features", "chunk"]
    )


def _merge_tile(key, pdf: pd.DataFrame, layer_order: list[str]) -> pd.DataFrame:
    zoom, tile_h = int(key[0]), int(key[1])
    layer_rank = {name: i for i, name in enumerate(layer_order)}
    layers_out = []
    total_features = 0
    for layer, grp in sorted(
        pdf.groupby("layer", sort=False),
        key=lambda kv: (layer_rank.get(kv[0], len(layer_rank)), kv[0]),
    ):
        chunks = [pickle.loads(c) for c in grp.sort_values("salt")["chunk"]]
        ids = np.concatenate([c["ids"] for c in chunks])
        hs = np.concatenate([c["h"] for c in chunks])
        n_tags = np.concatenate([c["n_tags"] for c in chunks])
        geom_lens = np.concatenate([c["geom_lens"] for c in chunks])
        keys_flat = [k for c in chunks for k in c["keys"]]
        vals_flat = [v for c in chunks for v in c["vals"]]
        gx = np.concatenate([c["gx"] for c in chunks])
        gy = np.concatenate([c["gy"] for c in chunks])
        # restore global (h, id) order across salt chunks
        order = np.lexsort((ids, hs))
        tag_off = np.concatenate([[0], np.cumsum(n_tags)])
        geo_off = np.concatenate([[0], np.cumsum(geom_lens)])
        fids = _feature_tile_id(zoom, hs)
        features = []
        for i in order:
            features.append(
                {
                    "id": int(fids[i]) & 0xFFFFFFFFFFFFFFFF,
                    "keys": keys_flat[tag_off[i] : tag_off[i + 1]],
                    "values": vals_flat[tag_off[i] : tag_off[i + 1]],
                    "geoms": [(gx[geo_off[i] : geo_off[i + 1]], gy[geo_off[i] : geo_off[i + 1]])],
                }
            )
        total_features += len(features)
        layers_out.append({"name": layer, "features": features})
    payload = encode_tile(zoom, tile_h, layers_out)
    tile_id = (zoom << 47) | tile_h if tile_h <= 140_737_488_355_327 else tile_h % 4_503_599_627_370_495
    return pd.DataFrame(
        [
            (
                zoom,
                tile_h,
                tile_id,
                len(layers_out),
                total_features,
                payload,
                len(payload),
            )
        ],
        columns=[
            "zoom",
            "tile_h",
            "tile_id",
            "layer_count",
            "feature_count",
            "payload",
            "payload_size",
        ],
    )


def compose_tiles(
    render_features: DataFrame,
    layer_order: list[str],
    salt_threshold: int = 20_000,
    tolerance: float = DEFAULT_TOLERANCE,
) -> DataFrame:
    """render_features(zoom, tile_h, feature_id, h, layer, out_tags,
    geom_x array<long>, geom_y array<long>) -> tiles table.

    ``layer`` must already be exploded (one row per feature x layer).
    """
    # phase 0: hot-tile salt counts (two cheap aggs, map-side combined)
    counts = render_features.groupBy("zoom", "tile_h").agg(F.count(F.lit(1)).alias("cnt"))
    salts = counts.select(
        "zoom",
        "tile_h",
        F.greatest(F.lit(1), F.ceil(F.col("cnt") / F.lit(salt_threshold)))
        .cast("int")
        .alias("n_salt"),
    )
    salted = render_features.join(F.broadcast(salts.where(F.col("n_salt") > 1)), ["zoom", "tile_h"], "left").withColumn(
        "salt",
        F.when(
            F.col("n_salt").isNotNull(),
            F.pmod(F.xxhash64("feature_id"), F.col("n_salt")).cast("int"),
        ).otherwise(F.lit(0)),
    )

    def phase1(key, pdf):
        return _partial_assemble(key, pdf, tolerance)

    chunks = salted.groupBy("zoom", "tile_h", "salt").applyInPandas(phase1, CHUNK_SCHEMA)

    def phase2(key, pdf):
        return _merge_tile(key, pdf, layer_order)

    return chunks.groupBy("zoom", "tile_h").applyInPandas(phase2, TILE_SCHEMA)
