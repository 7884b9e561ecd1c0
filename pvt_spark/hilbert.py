"""Hilbert-curve + Web-Mercator kernel (pure numpy, no Spark).

Re-implements, from public math, the coordinate/key pipeline of the
reference engine (see /root/reference/src/location.rs:11-111):

    dm7 lonlat --P1--> unit-square Web Mercator --P3--> u32 grid
               --P4--> zoom-32 Hilbert `h` (u64) --P6--> per-zoom tile id

The Hilbert order is the classic Wikipedia/Skilling xy<->d algorithm,
which is bit-for-bit identical to the `fast_hilbert` crate the reference
uses (verified against the reference's golden constants, e.g.
Cavallero Transit Center (-1220279745, 370491457) -> xy
(691633204, 1670996018) -> h 3660422102463285814; see
reference src/location.rs:237-284 and tests/test_hilbert.py).

Spark storage note: zoom-32 h occupies the full u64 range (u64::MAX at
the Bering Strait corner, reference src/location.rs:242-252). Spark's
LongType is signed, so we persist the **order-preserving biased signed
form** `h_signed = int64(h ^ 2^63)`: flipping the MSB maps u64 order
onto int64 order exactly.  All zoom-shift arithmetic unbiases first.

Everything here is vectorized numpy over uint64 arrays — these kernels
run inside Arrow-batched pandas UDFs on executors; no per-row Python.
"""

from __future__ import annotations

import numpy as np

U32_SIZE = 4294967296.0  # 2^32  (reference src/location.rs:8)
I32_SIZE = 4294967295.0  # u32::MAX as f64 (reference src/location.rs:7)
BIAS = np.uint64(1) << np.uint64(63)
_ONE = np.uint64(1)
_THREE = np.uint64(3)


def _as_u64(a) -> np.ndarray:
    return np.asarray(a, dtype=np.uint64)


# ---------------------------------------------------------------------------
# P1/P2: dm7 lonlat <-> unit-square Web Mercator
# ---------------------------------------------------------------------------

def project_lonlat_to_mercator(lon_dm7, lat_dm7):
    """dm7 ints -> (x, y) float64 in [0, 1], y flipped (north = 0).

    Mirrors reference src/location.rs:11-33 including the clamp.
    """
    lon = np.asarray(lon_dm7, dtype=np.float64) / 1e7
    lat = np.asarray(lat_dm7, dtype=np.float64) / 1e7
    x = lon / 360.0 + 0.5
    phi = lat * np.pi / 180.0
    with np.errstate(divide="ignore", invalid="ignore"):
        # at the poles tan/sec diverge; the clamp below absorbs +-inf
        y = (1.0 - np.log(np.tan(phi) + 1.0 / np.cos(phi)) / np.pi) / 2.0
    x = np.clip(x, 0.0, 1.0)
    y = np.clip(y, 0.0, 1.0)
    return x, y


def project_mercator_to_lonlat(x, y):
    """Unit-square mercator -> dm7 ints (reference src/location.rs:35-46)."""
    x = np.asarray(x, dtype=np.float64)
    y = 180.0 - np.asarray(y, dtype=np.float64) * 360.0
    lon = x * 360.0 - 180.0
    lat = 360.0 / np.pi * np.arctan(np.exp(y * np.pi / 180.0)) - 90.0
    # Rust `as i32` truncates toward zero; np trunc then cast matches.
    return (
        np.trunc(lon * 1e7).astype(np.int64).astype(np.int32),
        np.trunc(lat * 1e7).astype(np.int64).astype(np.int32),
    )


# ---------------------------------------------------------------------------
# P3: quantize to the u32 grid
# ---------------------------------------------------------------------------

def lonlat_to_xy(lon_dm7, lat_dm7):
    """dm7 -> u32 grid coords (reference src/location.rs:48-54).

    Rust `(f * 2^32) as u32` truncates and saturates; clamp before cast.
    """
    fx, fy = project_lonlat_to_mercator(lon_dm7, lat_dm7)
    x = np.minimum(np.trunc(fx * U32_SIZE), I32_SIZE).astype(np.uint64)
    y = np.minimum(np.trunc(fy * U32_SIZE), I32_SIZE).astype(np.uint64)
    return x.astype(np.uint32), y.astype(np.uint32)


def xy_to_lonlat(x, y):
    """u32 grid -> dm7 (reference src/location.rs:56-61; divides by u32::MAX)."""
    fx = np.asarray(x, dtype=np.float64) / I32_SIZE
    fy = np.asarray(y, dtype=np.float64) / I32_SIZE
    return project_mercator_to_lonlat(fx, fy)


# ---------------------------------------------------------------------------
# P4/P5: Hilbert encode/decode, order 32 (fast_hilbert-compatible)
# ---------------------------------------------------------------------------

def xy2h(x, y, order: int = 32) -> np.ndarray:
    """Vectorized Hilbert encode: u32 grid -> u64 curve position.

    Matches fast_hilbert::xy2h(x, y, 32) (reference src/location.rs:80-83)
    bit-for-bit: goldens (0,0)->0, (u32::MAX,0)->u64::MAX, Cavallero.
    """
    x = _as_u64(x).copy()
    y = _as_u64(y).copy()
    d = np.zeros(x.shape, dtype=np.uint64)
    for i in range(order - 1, -1, -1):
        s = _ONE << np.uint64(i)
        rx = ((x & s) > 0).astype(np.uint64)
        ry = ((y & s) > 0).astype(np.uint64)
        d += s * s * ((_THREE * rx) ^ ry)
        # rotate quadrant: where ry==0 (flip when rx==1, then swap axes)
        swap = ry == 0
        flip = swap & (rx == 1)
        sm1 = s - _ONE
        np.subtract(sm1, x, out=x, where=flip)  # wraps like C unsigned
        np.subtract(sm1, y, out=y, where=flip)
        xs = np.where(swap, y, x)
        ys = np.where(swap, x, y)
        x, y = xs, ys
    return d


def h2xy(h, order: int = 32):
    """Vectorized Hilbert decode: u64 -> (u32, u32). Inverse of xy2h."""
    t = _as_u64(h).copy()
    x = np.zeros(t.shape, dtype=np.uint64)
    y = np.zeros(t.shape, dtype=np.uint64)
    for i in range(order):
        s = _ONE << np.uint64(i)
        rx = _ONE & (t >> _ONE)
        ry = _ONE & (t ^ rx)
        swap = ry == 0
        flip = swap & (rx == 1)
        sm1 = s - _ONE
        np.subtract(sm1, x, out=x, where=flip)
        np.subtract(sm1, y, out=y, where=flip)
        xs = np.where(swap, y, x)
        ys = np.where(swap, x, y)
        x, y = xs, ys
        x += s * rx
        y += s * ry
        t >>= np.uint64(2)
    return x.astype(np.uint32), y.astype(np.uint32)


def lonlat_to_h(lon_dm7, lat_dm7) -> np.ndarray:
    """dm7 -> zoom-32 Hilbert u64 (reference src/location.rs:80-83)."""
    x, y = lonlat_to_xy(lon_dm7, lat_dm7)
    return xy2h(x, y, 32)


def h_to_lonlat(h):
    x, y = h2xy(h, 32)
    return xy_to_lonlat(x, y)


# ---------------------------------------------------------------------------
# Signed bias for Spark LongType storage
# ---------------------------------------------------------------------------

def h_to_signed(h) -> np.ndarray:
    """u64 h -> order-preserving int64 (flip MSB, reinterpret)."""
    return (_as_u64(h) ^ BIAS).view(np.int64)


def signed_to_h(hs) -> np.ndarray:
    """int64 (biased) -> u64 h."""
    return np.asarray(hs, dtype=np.int64).view(np.uint64) ^ BIAS


# ---------------------------------------------------------------------------
# P6: zoom shifts (reference src/location.rs:105-111)
# ---------------------------------------------------------------------------

def h_to_zoom_h(h, z: int) -> np.ndarray:
    """u64 h -> tile id at zoom z: h >> 2*(32-z). Fits in 2z bits."""
    return _as_u64(h) >> np.uint64(2 * (32 - z))


def zoom_h_to_h(zoom_h, z: int) -> np.ndarray:
    """Tile id at zoom z -> smallest zoom-32 h inside the tile."""
    return _as_u64(zoom_h) << np.uint64(2 * (32 - z))


def signed_h_to_zoom_h(hs, z: int) -> np.ndarray:
    """Biased int64 h column -> tile id at zoom z (plain non-negative int64).

    For z <= 31 the result fits in 62 bits so the int64 cast is exact.
    """
    return (signed_to_h(hs) >> np.uint64(2 * (32 - z))).astype(np.int64)


def lonlat_to_signed_h(lon_dm7, lat_dm7) -> np.ndarray:
    return h_to_signed(lonlat_to_h(lon_dm7, lat_dm7))
