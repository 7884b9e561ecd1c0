"""Near-duplicate group resolution: candidate pairs -> connected
components -> canonical survivor per group.

The LSH / Jaccard / embedding stages (q19, q21, q29) emit CANDIDATE
PAIRS; a production dedup pipeline must then transitively close those
pairs into duplicate GROUPS and keep one canonical document per group.
The survivor policy mirrors the engine's first-seen dedup semantics
(F5, ``operators/external.py``; reference analog
``/root/reference/src/hilbert/leaf.rs`` leaf-dedup keeping the first
occurrence in h order): within a group the smallest doc_id survives.

Scale notes (100 TB): min-label propagation converges in O(component
diameter) supersteps. Real-web LSH dup components are overwhelmingly
tiny stars (a handful of near-identical pages around one template), so
3-5 supersteps close planet-scale graphs. Each superstep is one
shuffle keyed on doc_id; the symmetric edge list is built once,
persisted, and re-read unshuffled every iteration. Convergence is
detected by the monotone sum-of-labels invariant (labels only ever
decrease, so the total strictly decreases iff any label moved) — one
scalar aggregate per superstep on checkpointed data, no row-level diff
join. For adversarially long chains (crawl-loop URL-rewrite cycles,
pathological shingle overlaps), propagation degrades to O(diameter):
after ``star_fallback_after`` supersteps without a fixpoint the loop
hands the CURRENT edge set plus the partial labels (valid
same-component edges — the propagation work is kept, not discarded) to
alternating large-star / small-star rounds (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14), which contract any
graph in O(log^2 n) rounds. Convergence there is exact, not a
fingerprint: the edge set is a star forest iff no destination node
still has an outgoing edge AND every source points at exactly one
root — two scalar aggregates per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pvt_spark.session import drop_local_checkpoint as _drop_checkpoint


def _star_contract(edges: DataFrame, n_parts: int, max_rounds: int,
                   stats: dict | None = None) -> DataFrame:
    """Alternating large-star / small-star contraction (Kiveris et al.,
    SoCC'14 §3) of a directed edge set oriented big->small; returns the
    converged star forest as (doc_id, group_id) labels.

    Per round, two shuffles keyed on the star center (groupBy min +
    re-join — no collect_list, so a 10^8-degree hub never materializes
    an array) and two scalar aggregates for the EXACT convergence test:
    a directed edge set is a star forest iff (1) no destination still
    has an outgoing edge and (2) every source points at exactly one
    root. O(log^2 n) rounds on any graph, including paths/cycles where
    min-label propagation needs O(n) supersteps.
    """
    E = edges.localCheckpoint(eager=True)
    rounds = 0
    converged = False
    for rounds in range(1, max_rounds + 1):
        # large-star: over the SYMMETRIC adjacency, every node u sends
        # its strictly-larger neighbors to m = min(N(u) + {u})
        sym = E.unionByName(E.select(F.col("b").alias("a"), F.col("a").alias("b")))
        mins = sym.groupBy("a").agg(F.min("b").alias("m"))
        mins = mins.select("a", F.least("m", F.col("a")).alias("m"))
        large = (
            sym.join(mins, "a")
            .where(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .where(F.col("a") != F.col("b"))
            .repartition(n_parts, "a")
            .distinct()
        )
        # small-star: over big->small edges, every center u rewires its
        # smaller neighbors AND itself to m = min(N(u))
        smins = large.groupBy("a").agg(F.min("b").alias("m"))
        small = (
            large.join(smins, "a")
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .unionByName(smins.select("a", F.col("m").alias("b")))
            .where(F.col("a") != F.col("b"))
            .repartition(n_parts, "a")
            .distinct()
            .localCheckpoint(eager=True)
        )
        _drop_checkpoint(E)
        E = small
        # exact star-forest test (two scalar jobs on the checkpoint)
        n_chained = (
            E.alias("x")
            .join(E.alias("y"), F.col("x.b") == F.col("y.a"), "left_semi")
            .count()
        )
        n_multi = (
            E.groupBy("a").agg(F.count_distinct("b").alias("nd"))
            .where(F.col("nd") > 1)
            .count()
        )
        if n_chained == 0 and n_multi == 0:
            converged = True
            break
    if stats is not None:
        stats["star_rounds"] = rounds
        stats["star_converged"] = converged
    if not converged:
        # ADVICE r5: never silently return labels from an unconverged
        # edge set — members of one component could get different group
        # ids with no signal. log2(n)^2 can exceed max_rounds at extreme
        # n; the caller should raise max_iters rather than accept this.
        raise RuntimeError(
            f"_star_contract: star-forest test still failing after "
            f"{max_rounds} rounds (raise max_iters)"
        )
    roots = (
        E.select(F.col("b").alias("doc_id"))
        .distinct()
        .join(E.select(F.col("a").alias("doc_id")).distinct(), "doc_id", "left_anti")
        .withColumn("group_id", F.col("doc_id"))
    )
    labels = (
        E.select(F.col("a").alias("doc_id"), F.col("b").alias("group_id"))
        .unionByName(roots)
        .repartition(n_parts, "doc_id")
        .localCheckpoint(eager=True)
    )
    _drop_checkpoint(E)
    return labels


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iters: int = 50,
    star_fallback_after: int = 8,
    stats: dict | None = None,
) -> DataFrame:
    """Transitive closure of an undirected candidate-pair graph.

    pairs: DataFrame with two id columns (``src``, ``dst``), one row
    per undirected edge (duplicates and orientation don't matter).
    Returns (doc_id, group_id) for every id that appears in a pair,
    where group_id is the minimum id in the connected component.
    Deterministic: min-label propagation has a unique fixpoint, and the
    star fallback's fixpoint is the same star forest.

    ``star_fallback_after``: supersteps of min-label propagation to try
    before switching to the O(log^2 n) large-star/small-star contraction
    (high-diameter escape hatch; see module docstring). ``stats``, when
    a dict, receives {"supersteps": k[, "star_rounds": m]} for
    observability and tests.
    """
    # BOTH edge directions from ONE scan of ``pairs`` (an explode, not a
    # self-union — the union evaluated the upstream candidate-pair plan
    # twice inside the same job, which for the LSH pipeline means
    # re-hashing the whole corpus)
    sym = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col(src).alias("a"), F.col(dst).alias("b")),
                F.struct(F.col(dst).alias("a"), F.col(src).alias("b")),
            )
        ).alias("e")
    ).select("e.a", "e.b").persist()
    # Superstep shuffle width follows the EDGE count, not the
    # session-wide conf — thousands at 10^12 docs — floored at the
    # scheduler's width so mid-size graphs use every core instead of
    # parking 500k-row partitions on a handful of tasks. Tiny graphs
    # (under ~16k edges per core) stay at 1 partition: task-launch
    # overhead would dominate any parallelism win there. (Sizing uses
    # the raw directed count — a <=2x overestimate of the deduped set,
    # which only errs toward narrower partitions.)
    n_edges = sym.count()  # the count doubles as sym's materialization
    width = sym.sparkSession.sparkContext.defaultParallelism
    n_parts = max(1, -(-n_edges // 500_000))
    if n_edges >= width * 16_384:
        n_parts = max(n_parts, width)
    # Hash-partition the big side ONCE on the probe key and sort within
    # partitions: the checkpoint preserves partitioning AND ordering, so
    # every superstep's sort-merge join satisfies its distribution from
    # the stored blocks — the edge list never re-shuffles or re-sorts
    # inside the loop; only label-scale rows move per superstep.
    # Dedup rides the SAME shuffle: rows sorted (a, b) within the hash
    # partition make duplicate edges adjacent, so a lag filter replaces
    # the separate ``distinct()`` exchange the old plan paid.
    from pyspark.sql.window import Window as _W

    edges = (
        sym.repartition(n_parts, "a")
        .sortWithinPartitions("a", "b")
        .withColumn("_p", F.lag("b").over(_W.partitionBy("a").orderBy("b")))
        .where(F.col("_p").isNull() | (F.col("_p") != F.col("b")))
        .drop("_p")
        .localCheckpoint(eager=True)
    )
    sym.unpersist()
    labels = (
        edges.select(F.col("a").alias("doc_id"))
        .repartition(n_parts, "doc_id")
        .distinct()
        .withColumn("group_id", F.col("doc_id"))
    ).localCheckpoint(eager=False)
    prev_sum = labels.agg(F.sum("group_id")).collect()[0][0]
    converged = False
    supersteps = 0
    try:
        for supersteps in range(1, max_iters + 1):
            # superstep: every node offers its label to each neighbor;
            # a node keeps the min of its own label and all offers.
            # ONE label-scale exchange (the pre-groupBy repartition);
            # the lazy checkpoint is materialized by the convergence
            # aggregate, so each superstep is a single blocking job.
            msgs = edges.join(
                labels, edges["a"] == labels["doc_id"], "inner"
            ).select(F.col("b").alias("doc_id"), "group_id")
            new_labels = (
                labels.unionByName(msgs)
                .repartition(n_parts, "doc_id")
                .groupBy("doc_id")
                .agg(F.min("group_id").alias("group_id"))
            ).localCheckpoint(eager=False)
            new_sum = new_labels.agg(F.sum("group_id")).collect()[0][0]
            # the superseded checkpoint is dead once the new one is
            # materialized — drop its blocks so a long-lived session
            # keeps exactly ONE labels snapshot (kNN hygiene convention)
            _drop_checkpoint(labels)
            labels = new_labels
            if new_sum == prev_sum:  # monotone invariant -> fixpoint
                converged = True
                break
            prev_sum = new_sum
            if supersteps >= star_fallback_after:
                break  # high-diameter graph: hand off to star rounds
        if stats is not None:
            stats["supersteps"] = supersteps
        if not converged:
            # Seed the contraction with the original edges PLUS the
            # partial labels (each non-trivial label is a proven
            # same-component edge), so propagation work is kept: a
            # path already collapsed to distance-8 stars contracts in
            # correspondingly fewer rounds.
            seed = edges.select("a", "b").unionByName(
                labels.where(F.col("group_id") != F.col("doc_id")).select(
                    F.col("doc_id").alias("a"), F.col("group_id").alias("b")
                )
            )
            e0 = (
                seed.select(
                    F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
                )
                .where(F.col("a") != F.col("b"))
                .repartition(n_parts, "a")
                .distinct()
            )
            star_labels = _star_contract(
                e0, n_parts, max_rounds=max(8, max_iters), stats=stats
            )
            # only now is the seed materialized — safe to drop the
            # partial-label snapshot it was derived from
            _drop_checkpoint(labels)
            labels = star_labels
    finally:
        _drop_checkpoint(edges)
    return labels


def semantic_dedup(
    vectors: DataFrame,
    centroids: DataFrame,
    threshold_milli: int = 900,
    id_col: str = "vec_id",
    vec_col: str = "qv",
    assign_method: str = "sql",
) -> DataFrame:
    """SemDeDup-style embedding dedup (Abbas et al. 2023,
    arXiv:2303.09540): cluster-assign every vector, find near-identical
    pairs WITHIN each cluster only, transitively close them, keep the
    min-id survivor per group.

    Inputs are integer-quantized vectors (``vec_col``: array<bigint>)
    and a centroid table (centroid_id, cv) — quantize unit-norm float
    embeddings at scale <= ~1700 (squared norm <= ~2.9e6) so the
    integer cosine test below stays inside int64:

        cos(a, b) >= t/1000   <=>   dot > 0  AND
        1_000_000 * dot^2 >= t^2 * |a|^2 * |b|^2

    — exact integer arithmetic end to end, no float divergence between
    engines (certified vs a DuckDB oracle as q39).

    Scale shape (100 TB): assignment is shuffle-free
    (``ann.ivf_assign``); the pairwise stage is an equi-join on
    centroid_id (AQE skew-splittable), quadratic only WITHIN a cell —
    with k = ceil(sqrt(N)) cells this is the published SemDeDup
    operating point; group closure reuses ``connected_components``
    (one id-scale shuffle per superstep). Nothing driver-side beyond
    the centroid table — and k is the caller's lever: at 10^12 docs a
    full sqrt(N) = 10^6-centroid table is ~0.5 GB broadcast-side, so
    cap k around 10^5 (SemDeDup's own regime) or shard the assignment
    rather than reaching for more cells.
    """
    from .ann import ivf_assign

    t = int(threshold_milli)
    assigned = ivf_assign(
        vectors, centroids, id_col=id_col, vec_col=vec_col, method=assign_method
    )
    withn = assigned.select(
        F.col(id_col),
        F.col(vec_col),
        "centroid_id",
        F.expr(
            f"aggregate(transform({vec_col}, x -> x * x), 0L, (acc, v) -> acc + v)"
        ).alias("n2"),
    )
    dot = (
        f"aggregate(zip_with(a.{vec_col}, b.{vec_col}, (x, y) -> x * y), "
        "0L, (acc, v) -> acc + v)"
    )
    pairs = (
        withn.alias("a")
        .join(
            withn.alias("b"),
            (F.col("a.centroid_id") == F.col("b.centroid_id"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.expr(dot).alias("dot"),
            F.col("a.n2").alias("na"),
            F.col("b.n2").alias("nb"),
        )
        .where(
            (F.col("dot") > 0)
            & (
                F.lit(1_000_000) * F.col("dot") * F.col("dot")
                >= F.lit(t * t) * F.col("na") * F.col("nb")
            )
        )
        .select("doc_a", "doc_b")
    )
    return dedup_groups(pairs)


def dedup_groups(
    pairs: DataFrame, src: str = "doc_a", dst: str = "doc_b"
) -> DataFrame:
    """Candidate pairs -> (doc_id, group_id, group_size, is_canonical).

    is_canonical (int 1/0) marks the group survivor (min doc_id) — the
    row set a pipeline KEEPS; the complement is the drop list. Docs
    with no candidate pair are trivially canonical and not returned
    (a full keep-list is an anti-join of the corpus against the
    ``is_canonical = 0`` rows — no reason to materialize the corpus
    here).
    """
    comp = connected_components(pairs, src=src, dst=dst)
    sizes = comp.groupBy("group_id").agg(F.count(F.lit(1)).alias("group_size"))
    return comp.join(sizes, "group_id").select(
        "doc_id",
        "group_id",
        "group_size",
        (F.col("doc_id") == F.col("group_id")).cast("int").alias("is_canonical"),
    )


def mutual_nearest_pairs(
    vectors: DataFrame,
    group: str,
    id_col: str = "vec_id",
    vec_col: str = "qv",
) -> DataFrame:
    """Reciprocal (mutual) nearest neighbors within each group under
    EXACT integer squared-L2 — the D4/SemDeDup-family dedup primitive:
    a pair survives only if each vector is the other's top-1 neighbor.

    ``vectors``: (group, id_col, vec_col) with vec_col an
    ``array<bigint>`` (quantize floats upstream — scale-1000 keeps the
    distance in int64 for unit-norm embeddings). Directed NN = one
    group-equi self-join plus a per-vector top-1 window (ties to the
    smallest neighbor id); mutual pairs = the NN table joined against
    its own reverse. The quadratic work is GROUP-BOUNDED: ``group``
    must come from an upstream partitioner (IVF cell, LSH bucket,
    cluster label) that keeps groups ~sqrt(N)-sized — the same
    contract as semantic_dedup; the join shuffles on the group key and
    AQE splits hot groups. Distance stays in JVM whole-stage codegen
    (zip_with + aggregate HOFs, no Python).

    Output: (group, a_id, b_id, d2) with a_id < b_id, one row per
    mutual pair. Vectors in singleton groups produce nothing.
    """
    a = vectors.select(
        F.col(group).alias("_g"),
        F.col(id_col).alias("_aid"),
        F.col(vec_col).alias("_av"),
    )
    b = vectors.select(
        F.col(group).alias("_g"),
        F.col(id_col).alias("_bid"),
        F.col(vec_col).alias("_bv"),
    )
    d2 = F.aggregate(
        F.zip_with("_av", "_bv", lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("_g", "_aid").orderBy("d2", "_bid")
    nn = (
        a.join(b, "_g")
        .where(F.col("_aid") != F.col("_bid"))
        .withColumn("d2", d2)
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select("_g", "_aid", "_bid", "d2")
    )
    rev = nn.select(
        F.col("_g").alias("_g2"),
        F.col("_aid").alias("_raid"),
        F.col("_bid").alias("_rbid"),
    )
    return (
        nn.join(
            rev,
            (F.col("_g") == F.col("_g2"))
            & (F.col("_aid") == F.col("_rbid"))
            & (F.col("_bid") == F.col("_raid")),
        )
        .where(F.col("_aid") < F.col("_bid"))
        .select(
            F.col("_g").alias(group),
            F.col("_aid").alias("a_id"),
            F.col("_bid").alias("b_id"),
            "d2",
        )
    )
