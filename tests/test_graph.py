"""Triangle counting: hand goldens, dirty-input normalization, random
parity vs a scalar enumerator, hub safety, q62 oracle."""

import itertools

import pytest
from pyspark.sql import functions as F

from pvt_spark.operators.graph import triangle_count


def _tc(spark, pairs):
    df = spark.createDataFrame(pairs, "src long, dst long")
    return {r.node: r.triangles for r in triangle_count(df).collect()}


def test_hand_goldens(spark):
    # K4: every node is in C(3,2) = 3 triangles
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    assert _tc(spark, k4) == {0: 3, 1: 3, 2: 3, 3: 3}
    # a path has none
    assert _tc(spark, [(0, 1), (1, 2), (2, 3)]) == {}
    # two triangles sharing edge (1,2)
    two = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)]
    assert _tc(spark, two) == {0: 1, 1: 2, 2: 2, 3: 1}


def test_dirty_input_normalized(spark):
    # duplicates, reverses, and self-loops must not change the count
    clean = [(0, 1), (0, 2), (1, 2)]
    dirty = clean + [(1, 0), (2, 0), (2, 1), (0, 1), (1, 1), (2, 2)]
    assert _tc(spark, dirty) == _tc(spark, clean) == {0: 1, 1: 1, 2: 1}


def test_random_parity_vs_scalar(spark):
    # deterministic pseudo-random graph, checked against a brute
    # per-node enumeration over the adjacency sets
    n, edges = 40, []
    for i in range(400):
        a = (i * i * 13 + i * 7 + 1) % n
        b = (i * i * 17 + i * 11 + 5) % n
        if a != b:
            edges.append((a, b))
    adj: dict[int, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {}
    for v, nb in adj.items():
        t = sum(1 for x, y in itertools.combinations(sorted(nb), 2) if y in adj.get(x, set()))
        if t:
            want[v] = t
    assert _tc(spark, edges) == want


def test_hub_wedges_bounded(spark):
    """A star hub (degree 200) closes no triangles and — because every
    edge orients INTO the hub — generates zero wedges at it."""
    star = [(0, i) for i in range(1, 201)]
    assert _tc(spark, star) == {}
    # add one rim edge: exactly one triangle, counted once
    assert _tc(spark, star + [(1, 2)]) == {0: 1, 1: 1, 2: 1}


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_q62_oracle(spark, sf_dir):
    from pvt_spark.queries import compare_against_oracle

    res = compare_against_oracle(spark, sf_dir, names={"q62_host_triangles"})
    assert res["q62_host_triangles"].get("match") is True, res
