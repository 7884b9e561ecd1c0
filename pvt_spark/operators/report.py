"""S11: the per-tile YAML report — the reference's debugging workhorse
(src/report.rs:31-99 + src/pvt_yaml.rs:13-221).

Walks every leaf tile (or just ``include_leaves`` and the manifest's
selection), decodes each payload, and appends one YAML document per
tile with tile id, human size, layers, features (id/keys/values) and
optionally geometries / the interned string table; can also dump the
raw payload per tile (``write_fb_tiles`` analog).

Spark shape: the tiles table streams to the driver partition-by-
partition (``toLocalIterator`` — bounded memory like the reference's
leaf iterator); the report itself is a serial sink in the reference
too. ``include_leaves`` pushes an IN filter into the parquet scan.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.pvt_codec import TileAttributes, decode_tile


@dataclass
class ReportOptions:
    """Mirrors reference ReportOptions (src/report.rs:21-29)."""

    write_fb_tiles: bool = False
    lookup_strings_and_values: bool = True
    include_strings: bool = False
    include_values: bool = False
    include_layers: bool = True
    include_features: bool = True
    include_geometries: bool = False


def parse_options(names: list[str] | None) -> ReportOptions:
    """Reference parse_options analog: option names toggle fields on."""
    opts = ReportOptions()
    for n in names or []:
        key = str(n).strip().lower()
        if hasattr(opts, key):
            setattr(opts, key, True)
    return opts


def _fmt_size(size: int) -> str:
    if size > 1024 * 1024:
        return f"{size / 1024.0 / 1024.0:.2f} M"
    return f"{size / 1024.0:.2f} K"


def _replay_string_table(decoded: dict) -> list[str]:
    """Reproduce the payload's interned string table: the encoder interns
    layer name then key/value pairs first-seen; replaying the identical
    upsert sequence over the decoded tile yields identical indexes."""
    attrs = TileAttributes()
    for layer in decoded["layers"]:
        attrs.upsert(layer["name"])
        for f in layer["features"]:
            for k, v in zip(f["keys"], f["values"]):
                attrs.upsert(k)
                attrs.upsert(v)
    return attrs.strings


def _tile_doc(zoom: int, tile_h: int, payload: bytes, options: ReportOptions) -> dict:
    from ..tile import Tile

    decoded = decode_tile(payload)
    t = Tile.from_zh(zoom, tile_h)
    doc: dict = {
        "tile": f"z{t.z} x{t.x} y{t.y} h{t.h}",
        "size": _fmt_size(len(payload)),
    }
    strings = _replay_string_table(decoded)
    index_of = {s: i for i, s in enumerate(strings)}
    if options.include_strings:
        doc["strings"] = list(strings)
    if not options.include_layers:
        return doc
    layers_out = []
    for layer in decoded["layers"]:
        lh: dict = {
            "name": layer["name"]
            if options.lookup_strings_and_values
            else index_of[layer["name"]]
        }
        if options.include_features:
            feats_out = []
            for f in layer["features"]:
                fh: dict = {"id": str(f["id"])}  # u64 > yaml int range
                if options.lookup_strings_and_values:
                    fh["keys"] = list(f["keys"])
                    fh["values"] = list(f["values"])
                else:
                    fh["keys"] = [index_of[k] for k in f["keys"]]
                    fh["values"] = [index_of[v] for v in f["values"]]
                if options.include_geometries:
                    fh["geometries"] = [
                        [[int(x), int(y)] for x, y in zip(gx, gy)]
                        for gx, gy in f["geoms"]
                    ]
                feats_out.append(fh)
            lh["features"] = feats_out
        layers_out.append(lh)
    doc["layers"] = layers_out
    return doc


def generate_report(
    tiles: DataFrame,
    planet_dir: str,
    leaf_zoom: int | None = None,
    include_leaves: list[int] | None = None,
    options: ReportOptions | None = None,
) -> str:
    """tiles(zoom, tile_h, payload) -> report-<ts>.yaml path.

    Reference semantics: empty ``include_leaves`` -> every leaf tile;
    otherwise only the listed leaf h values (sorted, deduped,
    src/report.rs:53-74). ``write_fb_tiles`` dumps each payload to
    ``tiles/<z>_<h>.pvt`` alongside.
    """
    options = options or ReportOptions()
    sel = tiles
    if leaf_zoom is not None:
        sel = sel.where(F.col("zoom") == leaf_zoom)
    if include_leaves:
        wanted = sorted(set(int(h) for h in include_leaves))
        sel = sel.where(F.col("tile_h").isin(wanted))
    ordered = sel.select("zoom", "tile_h", "payload").orderBy("zoom", "tile_h")

    os.makedirs(planet_dir, exist_ok=True)
    stamp = time.strftime("%Y-%m-%d_%H:%M:%S")
    report_path = os.path.join(planet_dir, f"report-{stamp}.yaml")
    tiles_dir = os.path.join(planet_dir, "tiles")
    if options.write_fb_tiles:
        os.makedirs(tiles_dir, exist_ok=True)

    try:
        import yaml

        def dump(doc: dict) -> str:
            return yaml.safe_dump(doc, sort_keys=False, default_flow_style=None)
    except ImportError:  # pragma: no cover - container lacks pyyaml
        import json

        def dump(doc: dict) -> str:
            return json.dumps(doc, indent=1) + "\n"

    with open(report_path, "w") as out:
        for row in ordered.toLocalIterator():
            payload = bytes(row.payload)
            if options.write_fb_tiles:
                with open(
                    os.path.join(tiles_dir, f"{row.zoom}_{row.tile_h}.pvt"), "wb"
                ) as f:
                    f.write(payload)
            out.write("---\n")
            out.write(dump(_tile_doc(row.zoom, row.tile_h, payload, options)))
    return report_path
