"""Rule-engine semantics tests (reference src/rules.rs:264-310)."""

from pyspark.sql import functions as F

from pvt_spark.manifest import Manifest, Rule, compile_rules
from pvt_spark.operators.rules import evaluate_rules, include_tags, visible_zooms


def _manifest() -> Manifest:
    return Manifest(
        leaf_zoom=12,
        layer_order=["A", "B"],
        layers={"A": ["tag_rule", "key_rule"], "B": ["value_rule"]},
        rules={
            "tag_rule": Rule(minzoom=2, tags=[("highway", "motorway")]),
            "value_rule": Rule(minzoom=4, values=["motorway", "special"]),
            "key_rule": Rule(minzoom=6, keys=["highway", "building"]),
        },
    )


def _features(spark, rows):
    return spark.createDataFrame(
        rows, "feature_id long, tags array<struct<key:string, value:string>>"
    )


def test_precedence_tag_beats_value_beats_key(spark):
    compiled = compile_rules(_manifest())
    feats = _features(
        spark,
        [
            # Tag match (highway=motorway) even though value+key also match
            (1, [("highway", "motorway")]),
            # Value match only (special) beats the key match on building
            (2, [("building", "special")]),
            # Key match only
            (3, [("highway", "residential")]),
            # no match at all -> no_rule (eval 0)
            (4, [("name", "x")]),
        ],
    )
    out = {r.feature_id: r for r in evaluate_rules(feats, compiled).collect()}
    assert out[1].rule == "tag_rule" and out[1].minzoom == 2
    assert out[2].rule == "value_rule" and out[2].minzoom == 4
    assert out[3].rule == "key_rule" and out[3].minzoom == 6
    assert out[4].rule == "no_rule" and out[4].minzoom == 12 and out[4].maxzoom == 12


def test_first_tag_short_circuits(spark):
    # two tags both Tag-matching different rules: FIRST tag position wins
    m = Manifest(
        leaf_zoom=12,
        layer_order=["A"],
        layers={"A": ["r1", "r2"]},
        rules={
            "r1": Rule(minzoom=2, tags=[("a", "1")]),
            "r2": Rule(minzoom=4, tags=[("b", "2")]),
        },
    )
    compiled = compile_rules(m)
    feats = _features(spark, [(1, [("b", "2"), ("a", "1")]), (2, [("a", "1"), ("b", "2")])])
    out = {r.feature_id: r.rule for r in evaluate_rules(feats, compiled).collect()}
    assert out[1] == "r2"
    assert out[2] == "r1"


def test_duplicate_rule_last_sorted_name_wins(spark):
    # reference BTreeMap iteration: later sorted rule overwrites the map entry
    m = Manifest(
        leaf_zoom=12,
        layer_order=["A"],
        layers={"A": ["aaa", "zzz"]},
        rules={
            "zzz": Rule(minzoom=8, tags=[("k", "v")]),
            "aaa": Rule(minzoom=2, tags=[("k", "v")]),
        },
    )
    compiled = compile_rules(m)
    feats = _features(spark, [(1, [("k", "v")])])
    out = evaluate_rules(feats, compiled).collect()[0]
    assert out.rule == "zzz"


def test_visible_zooms_even_expansion(spark):
    compiled = compile_rules(_manifest())
    feats = _features(spark, [(1, [("highway", "motorway")])])  # minzoom 2
    z = sorted(
        r.zoom for r in visible_zooms(evaluate_rules(feats, compiled), 12).collect()
    )
    assert z == [2, 4, 6, 8, 10, 12]
    # odd minzoom rounds up to next even zoom
    m = _manifest()
    m.rules["tag_rule"] = Rule(minzoom=5, tags=[("highway", "motorway")])
    z = sorted(
        r.zoom
        for r in visible_zooms(evaluate_rules(feats, compile_rules(m)), 12).collect()
    )
    assert z == [6, 8, 10, 12]


def test_include_tags_projection(spark):
    m = _manifest()
    m.rules["key_rule"] = Rule(minzoom=6, keys=["building"], include={"building"})
    compiled = compile_rules(m)
    feats = _features(spark, [(1, [("building", "yes"), ("name", "x")])])
    out = include_tags(evaluate_rules(feats, compiled)).collect()[0]
    assert out.rule == "key_rule"
    assert out.out_tags == {"building": "yes"}
    # all_tags override keeps everything
    out2 = include_tags(evaluate_rules(feats, compiled), all_tags=True).collect()[0]
    assert out2.out_tags == {"building": "yes", "name": "x"}


def test_inline_equals_broadcast_join_evaluation(spark):
    """Property test: the fold-expression evaluator matches the
    min_by/broadcast-join evaluator on randomized tag sets."""
    import random

    from pvt_spark.operators.rules import evaluate_rules_inline

    rng = random.Random(42)
    compiled = compile_rules(_manifest())
    keys = ["highway", "building", "name", "x", "amenity"]
    vals = ["motorway", "special", "residential", "yes", "z"]
    rows = []
    for fid in range(200):
        n = rng.randint(1, 5)
        tags = [(rng.choice(keys), rng.choice(vals)) for _ in range(n)]
        rows.append((fid, tags))
    feats = _features(spark, rows)
    a = {
        r.feature_id: (r.rule, r.minzoom, r.maxzoom)
        for r in evaluate_rules(feats, compiled).collect()
    }
    b = {
        r.feature_id: (r.rule, r.minzoom, r.maxzoom)
        for r in evaluate_rules_inline(feats, compiled).collect()
    }
    assert a == b
