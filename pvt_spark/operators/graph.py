"""Graph analytics over edge lists — triangle counting.

Exact triangle counting by DEGREE ORIENTATION (Schank & Wagner 2005;
the MapReduce formulation of Suri & Vassilvitskii, WWW 2011): orient
every undirected edge from its lower-(degree, id) endpoint to the
higher one, enumerate wedges as ordered pairs of out-neighbors, and
close each wedge against the oriented edge set. Every triangle
materializes EXACTLY once (its three nodes are totally ordered by
(degree, id), and both wedge and closing edge follow that order), and
the wedge fan-out is bounded by oriented out-degree — O(sqrt(m)) on
any graph — so a celebrity hub with 10^7 neighbors produces no
quadratic wedge explosion; its edges all point INTO it.

Scale shape: one distinct pass over edges, one degree aggregate, one
self-equi-join on the wedge pivot, one closing equi-join on the pair.
All shuffles key on node/pair ids; nothing is broadcast or collected.

The reference engine has no graph surface (SURVEY §2.4 — joins are
id-equi/Hilbert-range only); this extends the training-data side
(host-graph structure signals next to q48's PageRank).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Edge list (directed, possibly with duplicates/reverses/self
    loops) -> (node, triangles) for every node in at least one
    triangle, on the UNDIRECTED simple graph the edges induce."""
    e = (
        edges.selectExpr(
            f"least({src}, {dst}) as a", f"greatest({src}, {dst}) as b"
        )
        .where("a != b")
        .distinct()
    )
    deg = (
        e.selectExpr("a as n")
        .unionAll(e.selectExpr("b as n"))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ed = (
        e.join(deg.selectExpr("n as a", "deg as da"), "a")
        .join(deg.selectExpr("n as b", "deg as db"), "b")
    )
    lower_first = "(da < db) OR (da = db AND a < b)"
    oriented = ed.selectExpr(
        f"CASE WHEN {lower_first} THEN a ELSE b END as u",
        f"CASE WHEN {lower_first} THEN b ELSE a END as v",
        # the head's (deg, id) key, carried so wedge pairs order by the
        # SAME total order the orientation used
        f"CASE WHEN {lower_first} THEN db ELSE da END as dv",
    )
    w1 = oriented.selectExpr("u", "v as x", "dv as dx")
    w2 = oriented.selectExpr("u", "v as y", "dv as dy")
    wedges = w1.join(w2, "u").where("(dx < dy) OR (dx = dy AND x < y)")
    # the closing edge between x and y is oriented x -> y in the same
    # order, so one equi-join on the pair finds it
    tri = wedges.join(
        oriented.selectExpr("u as x", "v as y"), ["x", "y"]
    ).select("u", "x", "y")
    return (
        tri.selectExpr("u as node")
        .unionAll(tri.selectExpr("x as node"))
        .unionAll(tri.selectExpr("y as node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
