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
