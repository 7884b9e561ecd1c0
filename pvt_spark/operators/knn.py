"""NEW-J10: k-nearest-neighbor lookup per tile — fully distributed.

Candidates come from each query's (2*ring+1)^2 Hilbert-tile
neighborhood of the sorted points table (tile algebra P8, computed as
an exploded COLUMN — no driver loops or collects), then an exact
ranked selection: ``row_number() over (partitionBy query orderBy
dist) <= k``.

Exactness guarantee: a query's result is provably the true k-NN when
its k-th candidate distance is <= ring * tile_size — every point that
close is inside the probed region (the region boundary is at least
ring tiles from the query's own tile). Queries failing the guarantee
(sparse regions) escalate: ring -> 4*ring -> brute force; each later
pass is only SCHEDULED if a driver-side count of the satisfied set
falls short of the query total (one gate job per pass), so at planet
densities the build runs exactly one candidate join. Intermediates
are unpersisted before returning; the eagerly-checkpointed result is
the only storage the call leaves behind.

Distance is squared planar distance in the u32 web-mercator grid —
consistent with the reference's location space (src/location.rs:48).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType
from pyspark.sql.window import Window

from .. import hilbert as hb
from ..functions.geo import grid_x, grid_y, zoom_h


def neighbor_tiles(tile_h: int, zoom: int, ring: int = 1) -> list[int]:
    """The tile and its surrounding rings (clamped at edges), Hilbert ids.

    Driver-side helper (ad-hoc lookups / serving); the distributed path
    uses ``_ring_tiles_col`` instead.
    """
    x, y = hb.h2xy(np.array([tile_h], np.uint64), zoom)
    x, y = int(x[0]), int(y[0])
    n = 1 << zoom
    xs, ys = [], []
    for dx in range(-ring, ring + 1):
        for dy in range(-ring, ring + 1):
            nx, ny = x + dx, y + dy
            if 0 <= nx < n and 0 <= ny < n:
                xs.append(nx)
                ys.append(ny)
    hs = hb.xy2h(np.array(xs, np.uint64), np.array(ys, np.uint64), zoom)
    return sorted(set(int(v) for v in hs))


def _ring_tiles_col(zoom: int, ring: int):
    """Pandas UDF: biased-signed h -> array of the (2*ring+1)^2 probe
    tile ids at ``zoom`` (edge-clamped), vectorized per offset."""

    @F.pandas_udf(ArrayType(LongType()))
    def ring_tiles(h: pd.Series) -> pd.Series:
        th = hb.h_to_zoom_h(hb.signed_to_h(h.to_numpy(np.int64)), zoom)
        x, y = hb.h2xy(th, zoom)
        xi = x.astype(np.int64)
        yi = y.astype(np.int64)
        n = 1 << zoom
        rows = len(xi)
        offsets = [(dx, dy) for dx in range(-ring, ring + 1) for dy in range(-ring, ring + 1)]
        m = np.full((len(offsets), rows), -1, dtype=np.int64)
        for j, (dx, dy) in enumerate(offsets):
            nx = xi + dx
            ny = yi + dy
            valid = (nx >= 0) & (nx < n) & (ny >= 0) & (ny < n)
            if valid.any():
                hs = hb.xy2h(
                    nx[valid].astype(np.uint64), ny[valid].astype(np.uint64), zoom
                )
                m[j, valid] = hs.astype(np.int64)
        return pd.Series(
            [np.unique(col[col >= 0]).tolist() for col in m.T]
        )

    return ring_tiles


def knn_per_tile(
    points: DataFrame,
    queries: DataFrame,
    k: int = 5,
    zoom: int = 12,
    id_col: str = "feature_id",
    ring: int = 1,
    max_ring: int = 8,
    grid_cols: tuple[str, str] | None = None,
    n_queries: int | None = None,
) -> DataFrame:
    """points(id, lon_dm7, lat_dm7, h) x queries(query_id, lon_dm7,
    lat_dm7, h) -> (query_id, neighbor_id, rank, d2). EXACT k-NN.

    No driver collects: probe rings are exploded columns, deficit
    queries escalate through lazily-unioned passes. ``queries`` is
    broadcast into the candidate joins — suitable up to millions of
    queries; the points side streams at any scale.

    ``grid_cols=(x, y)``: use these columns (both tables) as the u32
    planar coordinates directly instead of Mercator-projecting
    lon_dm7/lat_dm7 — the coordinates MUST live on the same u32 grid
    as ``h`` or the ring exactness guarantee is unsound.

    ``n_queries``: skips the one driver count job, and MUST be the
    EXACT row count of ``queries`` — the completeness gate compares
    the satisfied-set count against it, so an undercount fires the
    gate early and silently truncates the result (an overcount merely
    forces extra escalation passes).
    """
    tile_size = float(1 << (32 - zoom))
    if grid_cols is None:
        pts = (
            points.withColumn("tile", zoom_h(F.col("h"), zoom))
            .withColumn("px", grid_x(F.col("lon_dm7")))
            .withColumn("py", grid_y(F.col("lat_dm7")))
        )
        q_src = lambda qs: qs.select(  # noqa: E731
            "query_id",
            grid_x(F.col("lon_dm7")).alias("qx"),
            grid_y(F.col("lat_dm7")).alias("qy"),
            "h",
        )
    else:
        xc, yc = grid_cols
        pts = (
            points.withColumn("tile", zoom_h(F.col("h"), zoom))
            .withColumn("px", F.col(xc))
            .withColumn("py", F.col(yc))
        )
        q_src = lambda qs: qs.select(  # noqa: E731
            "query_id", F.col(xc).alias("qx"), F.col(yc).alias("qy"), "h"
        )

    def run_pass(qs: DataFrame, ring_: int) -> DataFrame:
        probes = q_src(qs).select(
            "query_id",
            "qx",
            "qy",
            F.explode(_ring_tiles_col(zoom, ring_)(F.col("h"))).alias("probe_tile"),
        )
        cand = pts.join(F.broadcast(probes), pts["tile"] == probes["probe_tile"])
        d2 = ((F.col("px") - F.col("qx")) ** 2 + (F.col("py") - F.col("qy")) ** 2).cast(
            "double"
        )
        w = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc(id_col))
        return (
            cand.withColumn("d2", d2)
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", F.col(id_col).alias("neighbor_id"), "rank", "d2")
        )

    def split_ok(result: DataFrame, ring_: int) -> DataFrame:
        """Query ids whose pass result satisfies the exactness guarantee:
        k found AND k-th distance inside the probed radius."""
        guarantee = (ring_ * tile_size) ** 2
        return (
            result.groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("found"), F.max("d2").alias("d2_max"))
            .where((F.col("found") == k) & (F.col("d2_max") <= F.lit(guarantee)))
            .select("query_id")
        )

    # Escalation passes are SHORT-CIRCUITED driver-side with ONE job per
    # pass: count the satisfied set (which materializes the pass result
    # into its persist) and compare against the total query count — no
    # separate deficit isEmpty job. At planet densities ring 1 satisfies
    # every query, so the common case runs exactly one candidate join.
    # All intermediates are unpersisted before returning; the result is
    # eagerly localCheckpoint'ed (lineage truncated), so its blocks are
    # the ONLY storage left after the call, owned by the returned
    # DataFrame and released by the ContextCleaner when the caller drops
    # it — nothing leaks across a long-lived build session.
    to_unpersist: list[DataFrame] = []

    def finish(result: DataFrame) -> DataFrame:
        out = result.localCheckpoint(eager=True)
        for df in to_unpersist:
            df.unpersist()
        return out

    # callers that know their query count skip one driver job
    n_q = queries.count() if n_queries is None else n_queries
    r1 = run_pass(queries, ring).persist()
    ok1 = split_ok(r1, ring).persist()
    to_unpersist += [r1, ok1]
    n_ok1 = ok1.count()
    done1 = r1.join(F.broadcast(ok1), "query_id")
    if n_ok1 == n_q:
        return finish(done1)

    # deficit queries: broadcast anti-join over the (tiny) queries table —
    # cheap to recompute, so never persisted
    ring2 = min(ring * 4, max_ring)
    q2 = queries.join(F.broadcast(ok1), "query_id", "left_anti")
    r2 = run_pass(q2, ring2).persist()
    ok2 = split_ok(r2, ring2).persist()
    to_unpersist += [r2, ok2]
    n_ok2 = ok2.count()
    done2 = r2.join(F.broadcast(ok2), "query_id")
    if n_ok1 + n_ok2 == n_q:
        return finish(done1.unionByName(done2))

    # final pass: exact brute force for the (rare) still-deficient set
    q3 = q2.join(F.broadcast(ok2), "query_id", "left_anti")
    d2b = ((F.col("px") - F.col("qx")) ** 2 + (F.col("py") - F.col("qy")) ** 2).cast(
        "double"
    )
    wb = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc(id_col))
    brute = (
        pts.crossJoin(F.broadcast(q_src(q3).select("query_id", "qx", "qy")))
        .withColumn("d2", d2b)
        .withColumn("rank", F.row_number().over(wb))
        .where(F.col("rank") <= k)
        .select("query_id", F.col(id_col).alias("neighbor_id"), "rank", "d2")
    )
    return finish(done1.unionByName(done2).unionByName(brute))


def radius_zoom(radius: float) -> int:
    """Deepest zoom whose tile edge still covers ``radius``: the largest
    z with ``2^(32-z) >= radius``, clamped to [3, 28].

    At that zoom a ring-1 (3x3) probe neighborhood provably contains
    every point within ``radius`` of the query, so the radius join needs
    exactly ONE candidate pass — no escalation ladder. The z >= 3 floor
    keeps candidate coordinate deltas under 3 tiles = 3*2^29, so squared
    distances stay int64-exact.
    """
    z = 32 - max(0, math.ceil(math.log2(max(1.0, float(radius)))))
    return max(3, min(28, z))


def radius_join_per_tile(
    points: DataFrame,
    queries: DataFrame,
    radius: int,
    zoom: int | None = None,
    id_col: str = "feature_id",
    grid_cols: tuple[str, str] | None = None,
    exclude_self: bool = False,
) -> DataFrame:
    """All (query, point) pairs within planar distance ``radius`` — the
    2D analog of the banded interval join (operators/temporal): bucket
    space into Hilbert tiles sized >= radius, equi-join on the tile,
    keep the residual ``d2 <= radius^2``.

    points(feature_id, lon_dm7, lat_dm7, h) x queries(query_id, ..., h)
    -> (query_id, neighbor_id, d2), d2 int64-exact squared grid
    distance. Each pair is produced exactly once: a point lives in ONE
    tile and the query's probe-tile array is deduplicated. Unlike
    ``knn_per_tile`` the probe side is NOT broadcast — both sides of a
    radius self-join are corpus-sized, so this is a plain shuffle
    equi-join on the tile id (AQE splits dense/skewed tiles). One
    shuffle per side, one pass, no escalation: completeness is
    guaranteed by the zoom choice (``radius_zoom``), not by a gate.

    ``grid_cols=(x, y)``: use these u32 planar columns directly (same
    contract as knn_per_tile). ``exclude_self``: drop pairs where
    neighbor_id == query_id (self radius join). d2 exactness requires
    zoom >= 3 (candidate deltas <= 3 tiles keep squares in int64);
    ``radius_zoom`` enforces this.
    """
    if zoom is None:
        zoom = radius_zoom(radius)
    if not (3 <= zoom <= 31) or float(1 << (32 - zoom)) < float(radius):
        raise ValueError(
            f"zoom {zoom} tile edge {1 << (32 - zoom)} does not cover radius "
            f"{radius} (ring-1 completeness unsound)"
        )
    if grid_cols is None:
        px, py = grid_x(F.col("lon_dm7")), grid_y(F.col("lat_dm7"))
    else:
        px, py = F.col(grid_cols[0]), F.col(grid_cols[1])
    pts = points.select(
        F.col(id_col).alias("neighbor_id"),
        zoom_h(F.col("h"), zoom).alias("tile"),
        px.cast("long").alias("px"),
        py.cast("long").alias("py"),
    )
    qx, qy = (
        (grid_x(F.col("lon_dm7")), grid_y(F.col("lat_dm7")))
        if grid_cols is None
        else (F.col(grid_cols[0]), F.col(grid_cols[1]))
    )
    probes = queries.select(
        "query_id",
        qx.cast("long").alias("qx"),
        qy.cast("long").alias("qy"),
        F.explode(_ring_tiles_col(zoom, 1)(F.col("h"))).alias("probe_tile"),
    )
    d2 = (F.col("px") - F.col("qx")) * (F.col("px") - F.col("qx")) + (
        F.col("py") - F.col("qy")
    ) * (F.col("py") - F.col("qy"))
    out = (
        pts.join(probes, pts["tile"] == probes["probe_tile"])
        .withColumn("d2", d2)
        .where(F.col("d2") <= F.lit(int(radius) * int(radius)))
        .select("query_id", "neighbor_id", "d2")
    )
    if exclude_self:
        out = out.where(F.col("neighbor_id") != F.col("query_id"))
    return out
