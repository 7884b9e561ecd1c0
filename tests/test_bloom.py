"""Broadcast Bloom dedup: no false negatives, bounded false positives,
exact mode == LEFT ANTI JOIN (incl. NULL semantics), streaming mode
over-drops only, serialization round-trip, map-side probe plan."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pvt_spark.operators.bloom import (
    BloomFilter,
    bloom_build,
    bloom_might_contain,
    bloom_new_rows,
)


def _resident(spark, n=2000):
    return spark.range(n).selectExpr("concat('key_', id) as k", "id as v")


def test_no_false_negatives_and_fp_bounded(spark):
    res = _resident(spark)
    bloom = bloom_build(res, "k", expected=2000, fpp=0.01)
    # every resident key probes true — Bloom's hard guarantee
    hits = bloom_might_contain(res, "k", bloom, "m").where(~F.col("m")).count()
    assert hits == 0
    # a disjoint probe set false-positives at ~fpp (allow 4x slack)
    probe = spark.range(4000).selectExpr("concat('other_', id) as k")
    fp = bloom_might_contain(probe, "k", bloom, "m").where(F.col("m")).count()
    assert fp <= 4000 * 0.04, fp
    assert 0.0 < bloom.fill_ratio < 0.6


def test_exact_mode_equals_anti_join_with_nulls(spark):
    res = spark.createDataFrame(
        [("a",), ("b",), (None,)], "k string"
    )
    batch = spark.createDataFrame(
        [(0, "a"), (1, "c"), (2, None), (3, "b"), (4, "d")],
        "rid long, k string",
    )
    got = {
        r.rid
        for r in bloom_new_rows(batch, res, "k", expected=3).collect()
    }
    want = {
        r.rid for r in batch.join(res, "k", "left_anti").collect()
    }
    # NULL batch key is NEW (never equal); NULL resident key never blocks
    assert got == want == {1, 2, 4}


def test_streaming_mode_overdrops_only(spark):
    res = _resident(spark, 1000)
    batch = spark.range(500, 1500).selectExpr(
        "concat('key_', id) as k", "id as v"
    )
    bloom = bloom_build(res, "k", expected=1000, fpp=0.01)
    exact = {
        r.v for r in bloom_new_rows(batch, res, "k", bloom=bloom).collect()
    }
    approx = {
        r.v
        for r in bloom_new_rows(
            batch, res, "k", bloom=bloom, exact=False
        ).collect()
    }
    assert exact == set(range(1000, 1500))
    # approximate is a subset of exact-new (over-drop only, never a
    # true duplicate emitted), missing at most ~fpp of the batch
    assert approx <= exact
    assert len(exact) - len(approx) <= 1000 * 0.04


def test_serialization_roundtrip(spark):
    res = _resident(spark, 300)
    bloom = bloom_build(res, "k", expected=300)
    back = BloomFilter.from_bytes(bloom.to_bytes())
    assert back.n_bits == bloom.n_bits and back.n_hashes == bloom.n_hashes
    assert np.array_equal(back.bitmap, bloom.bitmap)
    # the deserialized filter answers identically
    probe = spark.range(600).selectExpr("concat('key_', id) as k")
    a = bloom_might_contain(probe, "k", bloom, "m").collect()
    b = bloom_might_contain(probe, "k", back, "m").collect()
    assert [(r.k, r.m) for r in a] == [(r.k, r.m) for r in b]


def test_probe_is_map_side(spark):
    res = _resident(spark, 200)
    bloom = bloom_build(res, "k", expected=200)
    probed = bloom_might_contain(
        spark.range(100).selectExpr("concat('key_', id) as k"), "k", bloom, "m"
    )
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert "Exchange" not in plan and "Join" not in plan, plan[:1200]


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_q60_oracle(spark, sf_dir):
    from pvt_spark.queries import compare_against_oracle

    res = compare_against_oracle(spark, sf_dir, names={"q60_bloom_dedup"})
    assert res["q60_bloom_dedup"].get("match") is True, res


def test_wide_build_tree_merges_executor_side(spark):
    """>=512-partition resident input: the build must take the depth-2
    executor-side merge path (one bitmap row to the driver) and still
    honor the no-false-negative guarantee."""
    res = spark.range(0, 60_000, 1, 512).selectExpr(
        "concat('wide_', id) as k"
    )
    assert res.rdd.getNumPartitions() == 512
    bloom = bloom_build(res, "k", expected=60_000, fpp=0.01)
    misses = (
        bloom_might_contain(res, "k", bloom, "m").where(~F.col("m")).count()
    )
    assert misses == 0
    probe = spark.range(10_000).selectExpr("concat('nope_', id) as k")
    fp = bloom_might_contain(probe, "k", bloom, "m").where(F.col("m")).count()
    assert fp <= 10_000 * 0.04, fp


def test_sharded_family(spark):
    """The documented hash-prefix family: per-shard builds over pmod
    slices, probe routed by the same pmod — union of shard verdicts ==
    single-filter semantics (no false negatives, fp bounded)."""
    S = 4
    res = _resident(spark, 8_000)
    shard_of = lambda df: df.withColumn(  # noqa: E731
        "_s", F.pmod(F.xxhash64(F.col("k"), F.lit(2)), F.lit(S))
    )
    res_s = shard_of(res)
    family = [
        bloom_build(
            res_s.where(F.col("_s") == s), "k", expected=8_000 // S, fpp=0.01
        )
        for s in range(S)
    ]
    probe = shard_of(
        res.select("k").unionByName(
            spark.range(8_000).selectExpr("concat('other_', id) as k")
        )
    )
    flagged = None
    for s in range(S):
        part = bloom_might_contain(
            probe.where(F.col("_s") == s), "k", family[s], "m"
        )
        flagged = part if flagged is None else flagged.unionByName(part)
    # every resident key still probes true through its shard
    miss = (
        flagged.join(res.select("k"), "k", "left_semi")
        .where(~F.col("m"))
        .count()
    )
    assert miss == 0
    fp = (
        flagged.join(res.select("k"), "k", "left_anti")
        .where(F.col("m"))
        .count()
    )
    assert fp <= 8_000 * 0.04, fp


def test_explicit_nbits_without_expected_gets_sane_k(spark):
    """ADVICE r5: n_bits without expected must not derive k from
    expected=1 (which saturated at the 16 cap and inflated fpp)."""
    bloom = bloom_build(_resident(spark, 500), "k", n_bits=1 << 16)
    assert bloom.n_hashes == 7
