"""A1/A2/J3: Hilbert location assignment for multi-point features.

- Way h = Hilbert key of an interior point of its geometry, with the
  reference's exact fallback ladder (src/sort.rs:262-383):
    < 4 refs            -> first ref node's h
    closed ring (>= 4)  -> polygon interior point
    open line           -> linestring midpoint-ish interior point
    failure             -> median ref's h, then first ref's h
  Interior point computed in numpy (no shapely): for polygons, the
  midpoint of the widest interval of ring crossings on the horizontal
  line through the centroid-y (the classic representative-point
  construction); for lines, the coordinate of the middle vertex.

- Relation h = floor(mean of member h) (u128 sum in the reference,
  src/sort.rs:389-491); nested relations resolved by a bounded
  fixed-point driver loop (Catalyst has no recursion).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from .. import hilbert as hb
from ..session import drop_local_checkpoint

_WAY_H_SCHEMA = StructType(
    [StructField("feature_id", LongType()), StructField("h", LongType())]
)


def _interior_point(xs: np.ndarray, ys: np.ndarray) -> tuple[float, float]:
    closed = len(xs) >= 4 and xs[0] == xs[-1] and ys[0] == ys[-1]
    if not closed:
        mid = len(xs) // 2
        return float(xs[mid]), float(ys[mid])
    cy = float(ys[:-1].mean())
    x0, y0 = xs[:-1], ys[:-1]
    x1, y1 = xs[1:], ys[1:]
    cond = (y0 > cy) != (y1 > cy)
    if not cond.any():
        return float(xs[:-1].mean()), cy
    with np.errstate(divide="ignore", invalid="ignore"):
        crossings = np.sort((x1 - x0)[cond] * (cy - y0[cond]) / (y1 - y0)[cond] + x0[cond])
    if len(crossings) >= 2:
        widths = crossings[1::2] - crossings[0::2][: len(crossings[1::2])]
        if len(widths):
            j = int(np.argmax(widths))
            return float((crossings[2 * j] + crossings[2 * j + 1]) / 2.0), cy
    return float(xs[:-1].mean()), cy


def _ways_h_batch(pdf: pd.DataFrame, grid: bool = False) -> pd.DataFrame:
    """One vectorized pass over a batch of COMPLETE ways (rows sorted by
    (feature_id, pos), each way contiguous). Semantics identical to the
    reference ladder (src/sort.rs:262-383): <4 refs -> first ref h;
    closed ring -> polygon interior point; open line -> middle vertex;
    failure -> median ref h.

    ``grid=True``: coordinates (cx, cy) are already on the u32 grid, so
    ring interior points encode via xy2h directly (planar sources)."""
    fid = pdf["feature_id"].to_numpy(dtype=np.int64)
    node_h = pdf["node_h"].to_numpy(dtype=np.int64)
    xs = pdf["cx"].to_numpy(dtype=np.float64)
    ys = pdf["cy"].to_numpy(dtype=np.float64)
    n = len(fid)
    offs = np.concatenate([[0], 1 + np.flatnonzero(fid[1:] != fid[:-1]), [n]])
    lens = np.diff(offs)
    starts = offs[:-1]
    ends = offs[1:] - 1
    way_ids = fid[starts]
    small = lens < 4
    closed = (~small) & (xs[starts] == xs[ends]) & (ys[starts] == ys[ends])
    # default: middle vertex (open-line interior point == that node's own
    # h, since the node's h was produced by the identical encode)
    h_out = node_h[starts + lens // 2]
    h_out = np.where(small, node_h[starts], h_out)
    # closed rings: interior-point construction, batched Hilbert encode
    closed_idx = np.flatnonzero(closed)
    if len(closed_idx):
        ixs = np.empty(len(closed_idx), dtype=np.int64)
        iys = np.empty(len(closed_idx), dtype=np.int64)
        fallback = np.zeros(len(closed_idx), dtype=bool)
        for j, w in enumerate(closed_idx):
            s, e = offs[w], offs[w + 1]
            try:
                ix, iy = _interior_point(xs[s:e], ys[s:e])
                ixs[j], iys[j] = int(ix), int(iy)
            except Exception:  # fallback ladder: median ref
                fallback[j] = True
        if not fallback.all():
            if grid:
                enc = hb.h_to_signed(
                    hb.xy2h(ixs.astype(np.uint64), iys.astype(np.uint64), 32)
                )
            else:
                enc = hb.lonlat_to_signed_h(ixs, iys)
            ring_h = np.where(fallback, h_out[closed_idx], enc)
        else:
            ring_h = h_out[closed_idx]
        h_out[closed_idx] = ring_h
    return pd.DataFrame({"feature_id": way_ids, "h": h_out})


def _ways_hgeom_batch(pdf: pd.DataFrame, grid: bool = False) -> pd.DataFrame:
    """Fused J3 + J1: the h ladder AND the ordered u32-grid coordinate
    arrays from ONE sorted batch. The grid projection runs here in numpy
    (hb.lonlat_to_xy — bit-identical to the native-SQL grid_x/grid_y:
    same IEEE ops, floor == trunc on [0,1]); in grid mode the inputs
    already ARE the grid coords."""
    hdf = _ways_h_batch(pdf, grid)
    fid = pdf["feature_id"].to_numpy(dtype=np.int64)
    n = len(fid)
    offs = np.concatenate([[0], 1 + np.flatnonzero(fid[1:] != fid[:-1]), [n]])
    if grid:
        gx = pdf["cx"].to_numpy(dtype=np.int64)
        gy = pdf["cy"].to_numpy(dtype=np.int64)
    else:
        x32, y32 = hb.lonlat_to_xy(
            pdf["cx"].to_numpy(dtype=np.int64), pdf["cy"].to_numpy(dtype=np.int64)
        )
        gx = x32.astype(np.int64)
        gy = y32.astype(np.int64)
    hdf["geom_x"] = [gx[s:e].tolist() for s, e in zip(offs[:-1], offs[1:])]
    hdf["geom_y"] = [gy[s:e].tolist() for s, e in zip(offs[:-1], offs[1:])]
    return hdf


def _way_h_stream(batches, grid: bool = False, batch_fn=_ways_h_batch):
    """Streaming merge over Arrow batches: a way's rows are contiguous in
    the (feature_id, pos)-sorted partition; hold back the last (possibly
    incomplete) way of each batch until the next arrives."""
    carry: pd.DataFrame | None = None
    for pdf in batches:
        if carry is not None:
            pdf = pd.concat([carry, pdf], ignore_index=True)
            carry = None
        if pdf.empty:
            continue
        last = pdf["feature_id"].iloc[-1]
        is_last = pdf["feature_id"] == last
        carry = pdf[is_last]
        done = pdf[~is_last]
        if not done.empty:
            yield batch_fn(done, grid)
    if carry is not None and not carry.empty:
        yield batch_fn(carry.reset_index(drop=True), grid)


def assign_way_h(
    ways: DataFrame, nodes: DataFrame, grid_cols: tuple[str, str] | None = None
) -> DataFrame:
    """ways(feature_id, refs array<long>) x nodes(feature_id, lon_dm7,
    lat_dm7, h) -> ways + h column (J3 join + A2 aggregation).

    ONE shuffle (repartition on feature_id) + sorted ``mapInPandas``
    batch processing — no per-way UDF dispatch (the compose phase-1
    pattern; per-group applyInPandas measured 146s of a 162s build).

    ``grid_cols=(x, y)``: node coordinates are already u32-grid planar
    (same grid as ``h``); ring interior points then encode via xy2h."""
    cx, cy = grid_cols if grid_cols is not None else ("lon_dm7", "lat_dm7")
    grid = grid_cols is not None
    way_nodes = (
        ways.select("feature_id", F.posexplode("refs").alias("pos", "ref_id"))
        .join(
            nodes.select(
                F.col("feature_id").alias("ref_id"),
                F.col(cx).alias("cx"),
                F.col(cy).alias("cy"),
                F.col("h").alias("node_h"),
            ),
            "ref_id",
        )
    )
    hs = (
        way_nodes.repartition("feature_id")
        .sortWithinPartitions("feature_id", "pos")
        .mapInPandas(lambda it: _way_h_stream(it, grid), _WAY_H_SCHEMA)
    )
    return ways.join(hs, "feature_id", "left")


_WAY_HG_SCHEMA = StructType(
    [
        StructField("feature_id", LongType()),
        StructField("h", LongType()),
        StructField("geom_x", ArrayType(LongType())),
        StructField("geom_y", ArrayType(LongType())),
    ]
)


def assign_way_h_geometry(
    ways: DataFrame, nodes: DataFrame, grid_cols: tuple[str, str] | None = None
) -> DataFrame:
    """Fused J3 + J1: ONE ref explode + equi-join and ONE feature_id
    repartition produce BOTH the way h (interior-point ladder) and the
    ordered u32-grid geometry arrays — assign_way_h followed by
    way_geometry ran the identical explode/join/shuffle twice (VERDICT
    r3 item 5). Semantics match the two-step path exactly: same h
    ladder, same grid projection, inner join (a way with no resolved
    refs yields no row, as in way_geometry)."""
    cx, cy = grid_cols if grid_cols is not None else ("lon_dm7", "lat_dm7")
    grid = grid_cols is not None
    way_nodes = ways.select(
        "feature_id", F.posexplode("refs").alias("pos", "ref_id")
    ).join(
        nodes.select(
            F.col("feature_id").alias("ref_id"),
            F.col(cx).alias("cx"),
            F.col(cy).alias("cy"),
            F.col("h").alias("node_h"),
        ),
        "ref_id",
    )
    hs = (
        way_nodes.repartition("feature_id")
        .sortWithinPartitions("feature_id", "pos")
        .mapInPandas(
            lambda it: _way_h_stream(it, grid, _ways_hgeom_batch), _WAY_HG_SCHEMA
        )
    )
    return ways.join(hs, "feature_id")


def way_geometry(
    ways_with_h: DataFrame,
    nodes: DataFrame,
    grid_cols: tuple[str, str] | None = None,
) -> DataFrame:
    """Resolve each way's ordered ref coordinates into u32-grid arrays:
    ways(feature_id, refs, ...) x nodes(feature_id, lon_dm7, lat_dm7) ->
    + geom_x array<long>, geom_y array<long> (ref order preserved).

    Pure JVM-side: explode + equi-join + collect_list(struct(pos,...))
    + array_sort — the relational form of the reference's ref->coord
    gather (src/hilbert/compose.rs:168-216).

    ``grid_cols=(x, y)``: node coordinates are already u32-grid planar —
    used directly, no Mercator projection."""
    from ..functions.geo import grid_x, grid_y

    if grid_cols is None:
        node_cols = nodes.select(
            F.col("feature_id").alias("ref_id"),
            grid_x(F.col("lon_dm7")).alias("gx"),
            grid_y(F.col("lat_dm7")).alias("gy"),
        )
    else:
        node_cols = nodes.select(
            F.col("feature_id").alias("ref_id"),
            F.col(grid_cols[0]).alias("gx"),
            F.col(grid_cols[1]).alias("gy"),
        )
    wn = ways_with_h.select(
        "feature_id", F.posexplode("refs").alias("pos", "ref_id")
    ).join(node_cols, "ref_id")
    geom = (
        wn.groupBy("feature_id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "gx", "gy"))).alias("_pts"))
        .select(
            "feature_id",
            F.expr("transform(_pts, p -> p.gx)").alias("geom_x"),
            F.expr("transform(_pts, p -> p.gy)").alias("geom_y"),
        )
    )
    return ways_with_h.join(geom, "feature_id")


def relation_point_geometry(relations_with_h: DataFrame) -> DataFrame:
    """Relations render as a single point at their mean-h location
    (divergence note: the reference ships with relation rendering
    disabled due to a known bug, src/hilbert/leaf.rs:155-166; we render
    the A1 mean-h location as a point feature instead — or assemble
    full member-way rings via ``relation_ring_geometry``)."""
    from ..functions.geo import hilbert_h_to_grid_xy

    g = relations_with_h.withColumn("_g", hilbert_h_to_grid_xy(F.col("h")))
    return g.withColumn("geom_x", F.array(F.col("_g.gx"))).withColumn(
        "geom_y", F.array(F.col("_g.gy"))
    ).drop("_g")


# --- multipolygon assembly from member ways ---------------------------------

_REL_GEOM_SCHEMA = StructType(
    [
        StructField("feature_id", LongType()),
        StructField("geom_x", ArrayType(LongType())),
        StructField("geom_y", ArrayType(LongType())),
        # deterministic position of the ring/line within its relation's
        # assembled output: multiple geometry rows share one feature_id
        # (and h), so every downstream feature ordering uses geom_seq as
        # the final tie-break — without it, payload byte order would
        # depend on shuffle arrival order
        StructField("geom_seq", IntegerType()),
    ]
)


def _assemble_rings(arrs):
    """Member-way coordinate arrays -> (closed rings, leftover chains).

    Closed member ways are rings directly; open ways stitch end-to-end
    (either orientation) until closed or stuck — the standard OSM
    multipolygon assembly. Chains that never close render as lines."""
    rings, opens = [], []
    for xs, ys in arrs:
        xs = np.asarray(xs, dtype=np.int64)
        ys = np.asarray(ys, dtype=np.int64)
        if len(xs) >= 4 and xs[0] == xs[-1] and ys[0] == ys[-1]:
            rings.append((xs, ys))
        else:
            opens.append((xs, ys))
    lines = []
    while opens:
        cx, cy = opens.pop(0)
        extended = True
        while extended and not (
            len(cx) >= 4 and cx[0] == cx[-1] and cy[0] == cy[-1]
        ):
            extended = False
            for i, (ox, oy) in enumerate(opens):
                if cx[-1] == ox[0] and cy[-1] == oy[0]:
                    cx, cy = np.concatenate([cx, ox[1:]]), np.concatenate([cy, oy[1:]])
                elif cx[-1] == ox[-1] and cy[-1] == oy[-1]:
                    cx, cy = (
                        np.concatenate([cx, ox[-2::-1]]),
                        np.concatenate([cy, oy[-2::-1]]),
                    )
                elif cx[0] == ox[-1] and cy[0] == oy[-1]:
                    cx, cy = np.concatenate([ox[:-1], cx]), np.concatenate([oy[:-1], cy])
                elif cx[0] == ox[0] and cy[0] == oy[0]:
                    cx, cy = (
                        np.concatenate([ox[::-1][:-1], cx]),
                        np.concatenate([oy[::-1][:-1], cy]),
                    )
                else:
                    continue
                opens.pop(i)
                extended = True
                break
        if len(cx) >= 4 and cx[0] == cx[-1] and cy[0] == cy[-1]:
            rings.append((cx, cy))
        else:
            lines.append((cx, cy))
    return rings, lines


def _orient_rings(rings):
    """Normalize winding per P15 (y-down grid space: positive shoelace
    area = CW = outer, negative = hole, functions/client.py:28-46).
    Without member roles, a ring is a hole iff it lies inside the
    largest-area ring; everything else is an outer."""
    if not rings:
        return []

    def area(xs, ys):
        xf = xs.astype(np.float64)
        yf = ys.astype(np.float64)
        return 0.5 * float(np.sum(xf[:-1] * yf[1:] - xf[1:] * yf[:-1]))

    from .pip import _ray_cast

    areas = [area(*r) for r in rings]
    outer_i = int(np.argmax(np.abs(areas)))
    oring = np.column_stack(rings[outer_i]).astype(np.float64)
    out = []
    for i, ((xs, ys), a) in enumerate(zip(rings, areas)):
        if i == outer_i:
            want_pos = True
        else:
            inside = bool(
                _ray_cast(
                    np.array([float(xs[0])]), np.array([float(ys[0])]), oring
                )[0]
            )
            want_pos = not inside
        if (a >= 0) != want_pos:
            xs, ys = xs[::-1], ys[::-1]
        out.append((xs, ys))
    return out


def _rel_rings_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """One pass over a batch of COMPLETE relations (rows sorted by
    (feature_id, pos), each relation contiguous): offset-run slicing
    over plain numpy/object arrays — the `_ways_h_batch` pattern — so
    the batch cost is the ring stitching itself, not pandas groupby
    machinery (one Index + BlockManager build per relation)."""
    fid = pdf["feature_id"].to_numpy(dtype=np.int64)
    gx = pdf["geom_x"].to_numpy(dtype=object)
    gy = pdf["geom_y"].to_numpy(dtype=object)
    n = len(fid)
    if n == 0:
        return pd.DataFrame(
            {"feature_id": [], "geom_x": [], "geom_y": [], "geom_seq": []}
        )
    offs = np.concatenate([[0], 1 + np.flatnonzero(fid[1:] != fid[:-1]), [n]])
    out_fid: list[int] = []
    out_x: list[list] = []
    out_y: list[list] = []
    out_seq: list[int] = []
    for k in range(len(offs) - 1):
        s, e = offs[k], offs[k + 1]
        rings, lines = _assemble_rings(list(zip(gx[s:e], gy[s:e])))
        f = fid[s]
        seq = 0
        for xs, ys in _orient_rings(rings):
            out_fid.append(f)
            out_x.append(xs.tolist())
            out_y.append(ys.tolist())
            out_seq.append(seq)
            seq += 1
        for xs, ys in lines:
            out_fid.append(f)
            out_x.append(xs.tolist())
            out_y.append(ys.tolist())
            out_seq.append(seq)
            seq += 1
    return pd.DataFrame(
        {
            "feature_id": out_fid,
            "geom_x": out_x,
            "geom_y": out_y,
            "geom_seq": pd.array(out_seq, dtype="int32"),
        }
    )


def _rel_geom_stream(batches):
    """Carry-buffered streaming merge (a relation's member rows are
    contiguous in the (feature_id, pos)-sorted partition)."""
    carry: pd.DataFrame | None = None
    for pdf in batches:
        if carry is not None:
            pdf = pd.concat([carry, pdf], ignore_index=True)
            carry = None
        if pdf.empty:
            continue
        last = pdf["feature_id"].iloc[-1]
        is_last = pdf["feature_id"] == last
        carry = pdf[is_last]
        done = pdf[~is_last]
        if not done.empty:
            yield _rel_rings_batch(done)
    if carry is not None and not carry.empty:
        yield _rel_rings_batch(carry.reset_index(drop=True))


def relation_ring_geometry(
    relations_with_h: DataFrame, ways_with_geom: DataFrame
) -> DataFrame:
    """Full relation geometry: assemble member ways' coordinate arrays
    (J1 output) into ordered outer/hole rings, winding-normalized via
    P15 — the 'fixed semantics' upgrade of the reference's disabled
    relation rendering (src/hilbert/leaf.rs:155-166). One output row per
    assembled ring (or unclosed chain, rendered as a line); relations
    with no way-member geometry fall back to the mean-h point.

    Same distributed shape as assign_way_h: explode + equi-join +
    ONE repartition + sorted streaming mapInPandas."""
    mem = (
        relations_with_h.select(
            "feature_id", F.posexplode("members").alias("pos", "m")
        )
        .where(F.col("m.etype") == F.lit("w"))
        .select("feature_id", "pos", F.col("m.ref").alias("ref_id"))
    )
    wg = ways_with_geom.select(
        F.col("feature_id").alias("ref_id"), "geom_x", "geom_y"
    )
    ring_rows = (
        mem.join(wg, "ref_id")
        .select("feature_id", "pos", "geom_x", "geom_y")
        .repartition("feature_id")
        .sortWithinPartitions("feature_id", "pos")
        .mapInPandas(_rel_geom_stream, _REL_GEOM_SCHEMA)
    )
    with_rings = relations_with_h.join(ring_rows, "feature_id")
    no_geom = relations_with_h.join(
        ring_rows.select("feature_id").distinct(), "feature_id", "left_anti"
    )
    return with_rings.unionByName(
        relation_point_geometry(no_geom).withColumn("geom_seq", F.lit(0))
    )


def assign_relation_h(
    relations: DataFrame,
    nodes: DataFrame,
    ways_with_h: DataFrame,
    max_iters: int = 10,
) -> DataFrame:
    """A1: relation h = floor(mean member h), nested relations via a
    bounded fixed-point loop (reference retry queue, src/sort.rs:462-487).

    Mean is computed on UNBIASED u64 values through decimal(38,0) so the
    u128-sum semantics are exact, then re-biased.
    """
    node_h = nodes.select(F.col("feature_id").alias("ref_id"), F.col("h").alias("mh"))
    way_h = ways_with_h.select(F.col("feature_id").alias("ref_id"), F.col("h").alias("mh"))
    base = node_h.withColumn("et", F.lit("n")).unionByName(
        way_h.withColumn("et", F.lit("w"))
    )
    # 2^63 exceeds Java long; build the decimal from a string literal
    bias = F.lit("9223372036854775808").cast("decimal(38,0)")

    def member_rows(rels: DataFrame) -> DataFrame:
        return rels.select("feature_id", F.explode("members").alias("m")).select(
            "feature_id",
            F.col("m.etype").alias("etype"),
            F.col("m.ref").alias("ref_id"),
        )

    def ready_of(mrows: DataFrame, members_all: DataFrame) -> DataFrame:
        sides = mrows.join(
            members_all,
            (mrows["ref_id"] == members_all["ref_id"])
            & (mrows["etype"] == members_all["et"]),
            "left",
        )
        agg = sides.groupBy(mrows["feature_id"].alias("feature_id")).agg(
            F.count(F.lit(1)).alias("n_members"),
            F.count("mh").alias("n_resolved"),
            F.sum((F.col("mh").cast("decimal(38,0)") + bias)).alias("sum_h"),
        )
        return agg.where(F.col("n_members") == F.col("n_resolved")).select(
            "feature_id",
            (F.floor(F.col("sum_h") / F.col("n_members")) - bias)
            .cast("long")
            .alias("h"),
        )

    nested_pred = F.expr("exists(members, m -> m.etype = 'r')")
    flat_ready = ready_of(member_rows(relations.where(~nested_pred)), base)

    # common case: NO relation references another relation -> the whole
    # resolution is one aggregation with zero checkpoints/blocking jobs
    # (one cheap driver count of the nested set decides; the reference's
    # retry queue only spins for nested relations, src/sort.rs:462-487)
    n_pending = relations.where(nested_pred).count()
    if n_pending == 0:
        return relations.join(flat_ready, "feature_id", "left")

    # nested case: bounded fixed point over ONLY the nested relations,
    # one blocking action per iteration (the eager checkpoint; the row
    # count after it reads checkpointed partitions, and the driver-side
    # pending counter replaces the old per-iteration anti-join count job)
    resolved = flat_ready.localCheckpoint(eager=True)
    pending_mem = member_rows(relations.where(nested_pred)).localCheckpoint(eager=True)
    for _ in range(max_iters):
        members_all = base.unionByName(
            resolved.select(
                F.col("feature_id").alias("ref_id"), F.col("h").alias("mh")
            ).withColumn("et", F.lit("r"))
        )
        ready = ready_of(pending_mem, members_all).localCheckpoint(eager=True)
        n_ready = ready.count()
        if n_ready == 0:
            drop_local_checkpoint(ready)
            break
        resolved = resolved.unionByName(ready)
        n_pending -= n_ready
        if n_pending <= 0:
            break
        next_pending = pending_mem.join(
            ready.select("feature_id"), "feature_id", "left_anti"
        ).localCheckpoint(eager=True)
        # the shrunk member set supersedes the old checkpoint; `ready`
        # snapshots stay live on purpose (referenced by `resolved`)
        drop_local_checkpoint(pending_mem)
        pending_mem = next_pending
    drop_local_checkpoint(pending_mem)
    return relations.join(resolved, "feature_id", "left")
