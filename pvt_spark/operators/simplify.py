"""Douglas-Peucker simplification, applied per zoom before tile emission.

The reference serves full-resolution geometry; the north rule adds
per-zoom DP simplification. Tolerance is expressed in tile-local units
(extent 8192): geometry error below ~half a display pixel is invisible,
so ``tolerance = 8192 / 512 = 16`` units by default, constant across
zooms because coordinates are already tile-local (a fixed tile-unit
tolerance = resolution-proportional tolerance in world space).

Implementation: iterative stack DP over numpy arrays — no recursion,
no shapely dependency, deterministic. Runs inside the tile-assembly
pandas UDF (per-feature loop over numpy segments; the distance math is
vectorized per span).
"""

from __future__ import annotations

import numpy as np

DEFAULT_TOLERANCE = 16.0  # tile units (extent 8192) ~ half a pixel at 256px


def simplify_dp(x: np.ndarray, y: np.ndarray, tolerance: float = DEFAULT_TOLERANCE) -> np.ndarray:
    """Return a boolean keep-mask for one polyline/ring.

    Endpoints are always kept; closed rings keep first == last. O(n log n)
    typical; distance computation vectorized per stack span.
    """
    n = len(x)
    if n <= 2 or tolerance <= 0:
        return np.ones(n, dtype=bool)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    tol2 = tolerance * tolerance
    stack = [(0, n - 1)]
    while stack:
        i0, i1 = stack.pop()
        if i1 - i0 < 2:
            continue
        xs = x[i0 + 1 : i1]
        ys = y[i0 + 1 : i1]
        dx = x[i1] - x[i0]
        dy = y[i1] - y[i0]
        seg2 = dx * dx + dy * dy
        if seg2 == 0.0:  # degenerate span: plain point distance
            d2 = (xs - x[i0]) ** 2 + (ys - y[i0]) ** 2
        else:  # perpendicular distance to the chord
            cross = (xs - x[i0]) * dy - (ys - y[i0]) * dx
            d2 = cross * cross / seg2
        j = int(np.argmax(d2))
        if d2[j] > tol2:
            split = i0 + 1 + j
            keep[split] = True
            stack.append((i0, split))
            stack.append((split, i1))
    return keep


def simplify_line(
    x: np.ndarray, y: np.ndarray, tolerance: float = DEFAULT_TOLERANCE, min_ring_points: int = 4
) -> tuple[np.ndarray, np.ndarray]:
    """Simplify one line/ring; collapses below-tolerance detail, but never
    degenerates a closed ring below a triangle (min 4 points incl. the
    closing point)."""
    keep = simplify_dp(x, y, tolerance)
    closed = len(x) >= 4 and x[0] == x[-1] and y[0] == y[-1]
    if closed and keep.sum() < min_ring_points:
        return x, y  # refuse to collapse a ring into a degenerate line
    return np.asarray(x)[keep], np.asarray(y)[keep]


def simplify_many(
    x: np.ndarray,
    y: np.ndarray,
    offsets: np.ndarray,
    tolerance: float = DEFAULT_TOLERANCE,
    min_ring_points: int = 4,
) -> np.ndarray:
    """Batched DP: flat coords of MANY polylines + feature offsets ->
    one keep-mask, equivalent per feature to ``simplify_line``'s mask
    (including the closed-ring minimum guard).

    Per-feature DP costs ~200µs of call overhead on a 20-point way;
    a phase-1 batch carries 10⁴-10⁵ features, so the per-call constant
    dominated the tile-assembly UDF. Here every DP round processes the
    ACTIVE CHORD SPANS OF ALL FEATURES in one vectorized pass (spans
    are contiguous in the flat array, so max/argmax per span are
    ``reduceat`` calls); rounds ~ DP recursion depth, not feature count.
    Split choice ties break on the FIRST max index, matching np.argmax.
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    offsets = np.asarray(offsets, dtype=np.int64)
    starts, ends = offsets[:-1], offsets[1:]
    lens = ends - starts
    keep = np.zeros(len(x), dtype=bool)
    if tolerance <= 0:
        keep[:] = True
        return keep
    nz = lens > 0
    keep[starts[nz]] = True  # endpoints always kept (covers 1/2-point rows)
    keep[ends[nz] - 1] = True
    tol2 = tolerance * tolerance
    big = np.iinfo(np.int64).max
    long_f = lens >= 3
    i0 = starts[long_f].copy()
    i1 = (ends[long_f] - 1).copy()
    while len(i0):
        m = i1 - i0 - 1  # interior point count per active span (>=1)
        cum = np.zeros(len(m) + 1, dtype=np.int64)
        np.cumsum(m, out=cum[1:])
        span_of = np.repeat(np.arange(len(m)), m)
        local = np.arange(int(cum[-1]), dtype=np.int64) - cum[span_of]
        idx = i0[span_of] + 1 + local
        dx = x[i1] - x[i0]
        dy = y[i1] - y[i0]
        seg2 = dx * dx + dy * dy
        rx = x[idx] - x[i0][span_of]
        ry = y[idx] - y[i0][span_of]
        cross = rx * dy[span_of] - ry * dx[span_of]
        degen = seg2[span_of] == 0.0
        d2 = np.where(
            degen,
            rx * rx + ry * ry,
            cross * cross / np.where(seg2[span_of] == 0.0, 1.0, seg2[span_of]),
        )
        dmax = np.maximum.reduceat(d2, cum[:-1])
        # first index attaining the max (ties -> first, like np.argmax)
        first_local = np.minimum.reduceat(
            np.where(d2 == dmax[span_of], local, big), cum[:-1]
        )
        split = i0 + 1 + first_local
        hit = dmax > tol2
        keep[split[hit]] = True
        a0, a1 = i0[hit], split[hit]
        b0, b1 = split[hit], i1[hit]
        al, bl = a1 - a0 >= 2, b1 - b0 >= 2
        i0 = np.concatenate([a0[al], b0[bl]])
        i1 = np.concatenate([a1[al], b1[bl]])
    # closed-ring guard: a ring whose mask fell below the minimum keeps
    # ALL its points (simplify_line parity)
    c = np.zeros(len(x) + 1, dtype=np.int64)
    np.cumsum(keep, out=c[1:])
    kept = c[ends] - c[starts]
    top = max(len(x) - 1, 0)
    s_safe = np.minimum(starts, top)
    e_safe = np.minimum(np.maximum(ends - 1, 0), top)
    closed = (lens >= 4) & (x[s_safe] == x[e_safe]) & (y[s_safe] == y[e_safe])
    for s, e in zip(starts[closed & (kept < min_ring_points)],
                    ends[closed & (kept < min_ring_points)]):
        keep[s:e] = True
    return keep
