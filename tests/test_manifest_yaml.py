"""YAML manifest parsing (same shape as the reference's manifests)."""

import pytest

from pvt_spark.manifest import Manifest, compile_rules, manifest_from_dict, parse_manifest

YAML_TEXT = """
render:
  leaf_zoom: 12
  layer_order: [Water, Roads, Places]
  all_tags: false

layers:
  Water: [water, waterway]
  Roads: [highway_primary, highway]
  Places: [place_city, place]

rules:
  water:
    minzoom: 10
    keys: [water]
  waterway:
    minzoom: 8
  highway_primary:
    minzoom: 6
    tags: [[highway, motorway], [highway, trunk]]
  highway:
    minzoom: 12
    keys: [highway]
  place_city:
    minzoom: 8
    tags: [[place, city]]
  place:
    minzoom: 10
    maxzoom: 12
    keys: [place]
"""


def test_parse_manifest_yaml(tmp_path):
    p = tmp_path / "manifest.yaml"
    p.write_text(YAML_TEXT)
    m = parse_manifest(str(p))
    assert m.leaf_zoom == 12
    assert m.layer_order == ["Water", "Roads", "Places"]
    assert m.rules["highway_primary"].tags == [("highway", "motorway"), ("highway", "trunk")]
    assert m.rules["place"].maxzoom == 12
    compiled = compile_rules(m)
    assert compiled.evals[0][0] == "no_rule"
    assert ("highway", "motorway", [e[0] for e in compiled.evals].index("highway_primary")) in compiled.tag_matches
    assert compiled.layer_names[0] == "no_rule"


def test_leaf_zoom_validation():
    with pytest.raises(ValueError, match="even"):
        Manifest(leaf_zoom=11, layer_order=[], layers={}, rules={})
    with pytest.raises(ValueError, match="maximum"):
        Manifest(leaf_zoom=16, layer_order=[], layers={}, rules={})


def test_manifest_from_dict_include_forms():
    m = manifest_from_dict(
        {
            "render": {"leaf_zoom": 10, "layer_order": ["A"]},
            "layers": {"A": ["r1", "r2", "r3"]},
            "rules": {
                "r1": {"minzoom": 2, "keys": ["k"], "include": "all"},
                "r2": {"minzoom": 2, "keys": ["k2"], "include": {"Keys": ["name"]}},
                "r3": {"minzoom": 2, "keys": ["k3"], "include": "none"},
            },
        }
    )
    c = compile_rules(m)
    by_name = {e[0]: e for e in c.evals}
    assert by_name["r1"][4] == "all"
    assert by_name["r2"][4] == "keys" and by_name["r2"][5] == ["name"]
    assert by_name["r3"][4] == "none"
