"""Spark column functions for the geo/Hilbert pipeline.

Two tiers, per SURVEY.md §2.2:

- **Native SQL expressions** (JVM-side, whole-stage codegen) for
  everything Catalyst can express: Web-Mercator projection (P1),
  quantization (P3), zoom shifts (P6), tile x/y assignment.
- **Arrow-batched pandas UDFs** only for the one genuinely
  non-relational kernel: the order-32 Hilbert encode/decode (P4/P5),
  backed by the vectorized numpy implementation in pvt_spark.hilbert.

No per-row Python anywhere (input_hint mandate).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, LongType, StructField, StructType

from .. import hilbert as hb

LONG_MIN = -(1 << 63)

# ---------------------------------------------------------------------------
# Native-SQL projections (P1/P3): dm7 -> u32 grid, as DOUBLE then LONG.
# Matches pvt_spark.hilbert.lonlat_to_xy bit-for-bit (same IEEE ops).
# ---------------------------------------------------------------------------


def mercator_x(lon_dm7: Column) -> Column:
    """Unit-square mercator x in [0,1] (reference src/location.rs:14,19-24)."""
    x = lon_dm7.cast("double") / F.lit(1e7) / F.lit(360.0) + F.lit(0.5)
    return F.least(F.greatest(x, F.lit(0.0)), F.lit(1.0))


def mercator_y(lat_dm7: Column) -> Column:
    """Unit-square mercator y in [0,1], north=0 (src/location.rs:16-17,25-30)."""
    phi = F.radians(lat_dm7.cast("double") / F.lit(1e7))
    y = (F.lit(1.0) - F.log(F.tan(phi) + F.lit(1.0) / F.cos(phi)) / F.lit(float(np.pi))) / F.lit(2.0)
    return F.least(F.greatest(y, F.lit(0.0)), F.lit(1.0))


def grid_x(lon_dm7: Column) -> Column:
    """u32 grid x as LONG: trunc(merc * 2^32) saturated at u32::MAX (P3)."""
    return F.least(
        F.floor(mercator_x(lon_dm7) * F.lit(4294967296.0)), F.lit(4294967295)
    ).cast("long")


def grid_y(lat_dm7: Column) -> Column:
    return F.least(
        F.floor(mercator_y(lat_dm7) * F.lit(4294967296.0)), F.lit(4294967295)
    ).cast("long")


def tile_xy(lon_dm7: Column, lat_dm7: Column, z: int) -> tuple[Column, Column]:
    """Slippy tile (x, y) at zoom z — pure native SQL (no Hilbert needed)."""
    shift = 32 - z
    return (
        F.shiftright(grid_x(lon_dm7), shift),
        F.shiftright(grid_y(lat_dm7), shift),
    )


# ---------------------------------------------------------------------------
# Hilbert encode (P4) — the one pandas-UDF kernel
# ---------------------------------------------------------------------------


@F.pandas_udf(LongType())
def _hilbert_h_udf(lon_dm7: pd.Series, lat_dm7: pd.Series) -> pd.Series:
    h = hb.lonlat_to_signed_h(
        lon_dm7.to_numpy(dtype=np.int64), lat_dm7.to_numpy(dtype=np.int64)
    )
    return pd.Series(h)


def hilbert_h(lon_dm7: Column, lat_dm7: Column) -> Column:
    """Biased-signed zoom-32 Hilbert h (storage form; see hilbert.py)."""
    return _hilbert_h_udf(lon_dm7, lat_dm7)


@F.pandas_udf(LongType())
def _xy2h_udf(x: pd.Series, y: pd.Series) -> pd.Series:
    h = hb.xy2h(x.to_numpy(dtype=np.uint64), y.to_numpy(dtype=np.uint64), 32)
    return pd.Series(hb.h_to_signed(h))


def xy_to_hilbert_h(x: Column, y: Column) -> Column:
    """u32-grid (x, y) LONG columns -> biased-signed h."""
    return _xy2h_udf(x, y)


_H2LL_SCHEMA = StructType(
    [StructField("lon_dm7", IntegerType()), StructField("lat_dm7", IntegerType())]
)


@F.pandas_udf(_H2LL_SCHEMA)
def _h_to_lonlat_udf(hs: pd.Series) -> pd.DataFrame:
    u = hb.signed_to_h(hs.to_numpy(dtype=np.int64))
    lon, lat = hb.h_to_lonlat(u)
    return pd.DataFrame({"lon_dm7": lon, "lat_dm7": lat})


def hilbert_h_to_lonlat(h: Column) -> Column:
    """Biased-signed h -> struct<lon_dm7:int, lat_dm7:int> (P5)."""
    return _h_to_lonlat_udf(h)


_H2XY_SCHEMA = StructType(
    [StructField("gx", LongType()), StructField("gy", LongType())]
)


@F.pandas_udf(_H2XY_SCHEMA)
def _h_to_grid_udf(hs: pd.Series) -> pd.DataFrame:
    u = hb.signed_to_h(hs.to_numpy(dtype=np.int64))
    x, y = hb.h2xy(u, 32)
    return pd.DataFrame({"gx": x.astype(np.int64), "gy": y.astype(np.int64)})


def hilbert_h_to_grid_xy(h: Column) -> Column:
    """Biased-signed h -> struct<gx:long, gy:long> u32-grid coords (P5
    without the lossy float round-trip to lonlat)."""
    return _h_to_grid_udf(h)


# ---------------------------------------------------------------------------
# Zoom shifts (P6) — pure native SQL on the biased representation
# ---------------------------------------------------------------------------


def zoom_h(h: Column, z: int) -> Column:
    """Tile id at zoom z from a biased-signed h column.

    Unbias (XOR the sign bit) then unsigned right shift — exactly
    ``u64(h) >> 2*(32-z)`` (reference src/location.rs:105-107).
    Result fits in 2z bits (non-negative) for z <= 31.
    """
    unbiased = h.bitwiseXOR(F.lit(LONG_MIN))
    return F.shiftrightunsigned(unbiased, 2 * (32 - z))


def zoom_h_range(tile_h: int, z: int) -> tuple[int, int]:
    """Biased-signed [start, end) h range covered by tile_h at zoom z.

    Driver-side helper for partition-pruned tile lookups (J7): the
    Hilbert trick turns point-in-tile into a range predicate on h
    (reference src/tile.rs:101-129).
    """
    def to_signed(u: int) -> int:
        u ^= 1 << 63
        return u - (1 << 64) if u >= (1 << 63) else u

    start_u = tile_h << (2 * (32 - z))
    end_u = (tile_h + 1) << (2 * (32 - z))
    if end_u >= 1 << 64:  # last tile on the curve: closed-end range
        return to_signed(start_u), (1 << 63) - 1
    return to_signed(start_u), to_signed(end_u)


def parent_h(tile_h: Column) -> Column:
    """Parent tile id two zoom levels up (even-zoom tree, A4)."""
    return F.shiftrightunsigned(tile_h, 4)


def child_pos(tile_h: Column) -> Column:
    """4-bit position of a tile within its even-zoom parent (mask bit)."""
    return tile_h.bitwiseAND(F.lit(15))
