"""Declarative manifest model (reference src/manifest.rs:10-143).

Same YAML shape as the reference: ``render.leaf_zoom`` (even, <= 14),
``render.layer_order``, ``render.all_tags``, ``layers: name ->
[rule names]``, ``rules: name -> {minzoom, maxzoom?, tags, keys,
values, include}``.

Compilation (reference src/rules.rs:80-262) resolves rules into three
small match tables + an eval table; in Spark these become broadcast
DataFrames (F1). Rule-name iteration is sorted (BTreeMap semantics), so
when two rules claim the same (k,v)/value/key the LAST sorted rule name
wins — replicated here via overwriting dict inserts in sorted order.

eval 0 is always ``no_rule``: layer "no_rule", minzoom = maxzoom =
leaf_zoom, include All (reference src/rules.rs:64-78,185-192).
"""

from __future__ import annotations

from dataclasses import dataclass, field

try:
    import yaml  # type: ignore

    _HAVE_YAML = True
except ImportError:  # pragma: no cover - container lacks pyyaml
    _HAVE_YAML = False


@dataclass
class Rule:
    minzoom: int
    maxzoom: int | None = None
    tags: list[tuple[str, str]] = field(default_factory=list)
    keys: list[str] = field(default_factory=list)
    values: list[str] = field(default_factory=list)
    # None | "all" | set of keys
    include: object = None


@dataclass
class Manifest:
    leaf_zoom: int
    layer_order: list[str]
    layers: dict[str, list[str]]
    rules: dict[str, Rule]
    all_tags: bool = False
    # report selection (reference manifest data.include_leaves +
    # report_options, consumed by operators/report.py)
    include_leaves: list[int] = field(default_factory=list)
    report_options: list[str] = field(default_factory=list)

    def __post_init__(self) -> None:
        if self.leaf_zoom % 2 != 0:
            raise ValueError(f"The leaf zoom must be even. leaf_zoom: {self.leaf_zoom}")
        if self.leaf_zoom > 14:
            raise ValueError(
                f"The maximum supported leaf zoom is 14. leaf_zoom: {self.leaf_zoom}"
            )


def manifest_from_dict(d: dict) -> Manifest:
    render = d.get("render", {})
    rules = {}
    for name, r in sorted(d.get("rules", {}).items()):
        include = r.get("include")
        if isinstance(include, dict):  # {"Keys": [...]} serde enum form
            include = set(include.get("Keys", []))
        elif isinstance(include, str):
            include = include.lower() if include.lower() in ("none", "all") else include
        rules[name] = Rule(
            minzoom=int(r["minzoom"]),
            maxzoom=int(r["maxzoom"]) if r.get("maxzoom") is not None else None,
            tags=[(str(k), str(v)) for k, v in r.get("tags", [])],
            keys=[str(k) for k in r.get("keys", [])],
            values=[str(v) for v in r.get("values", [])],
            include=include,
        )
    data = d.get("data", {})
    return Manifest(
        leaf_zoom=int(render.get("leaf_zoom", 12)),
        layer_order=list(render.get("layer_order", [])),
        layers={k: list(v) for k, v in d.get("layers", {}).items()},
        rules=rules,
        all_tags=bool(render.get("all_tags", False)),
        include_leaves=[int(h) for h in data.get("include_leaves", [])],
        report_options=[str(o) for o in d.get("report_options", [])],
    )


def parse_manifest(path: str) -> Manifest:
    if not _HAVE_YAML:
        raise RuntimeError("pyyaml unavailable; use manifest_from_dict")
    with open(path) as f:
        return manifest_from_dict(yaml.safe_load(f))


@dataclass
class CompiledRules:
    """Driver-side compiled rule tables, ready to broadcast (F1)."""

    # eval_i -> (name, layers[str], minzoom, maxzoom, include_kind, include_keys)
    evals: list[tuple]
    tag_matches: list[tuple[str, str, int]]  # (key, value, eval_i)
    value_matches: list[tuple[str, int]]  # (value, eval_i)
    key_matches: list[tuple[str, int]]  # (key, eval_i)
    layer_names: list[str]  # index 0 = "no_rule"


def compile_rules(manifest: Manifest) -> CompiledRules:
    layer_names = ["no_rule"] + list(manifest.layer_order)
    layer_idx = {n: i for i, n in enumerate(layer_names)}
    rule_layers: dict[str, set[int]] = {}
    for layer_name, rule_names in manifest.layers.items():
        li = layer_idx.get(layer_name)
        if li is None:
            continue  # reference warns and skips (src/rules.rs:160-166)
        for rn in rule_names:
            rule_layers.setdefault(rn, set()).add(li)

    evals: list[tuple] = [
        ("no_rule", ["no_rule"], manifest.leaf_zoom, manifest.leaf_zoom, "all", [])
    ]
    tag_map: dict[tuple[str, str], int] = {}
    value_map: dict[str, int] = {}
    key_map: dict[str, int] = {}
    for rule_name in sorted(manifest.rules):
        rule = manifest.rules[rule_name]
        maxzoom = rule.maxzoom if rule.maxzoom is not None else manifest.leaf_zoom
        if manifest.all_tags or rule.include == "all":
            inc_kind, inc_keys = "all", []
        elif isinstance(rule.include, (set, frozenset, list)):
            inc_kind, inc_keys = "keys", sorted(rule.include)
        else:
            inc_kind, inc_keys = "none", []
        layers = sorted(rule_layers.get(rule_name, set()))
        evals.append(
            (
                rule_name,
                [layer_names[i] for i in layers],
                rule.minzoom,
                maxzoom,
                inc_kind,
                inc_keys,
            )
        )
        eval_i = len(evals) - 1
        for k, v in rule.tags:
            tag_map[(k, v)] = eval_i
        for v in rule.values:
            value_map[v] = eval_i
        for k in rule.keys:
            key_map[k] = eval_i

    return CompiledRules(
        evals=evals,
        tag_matches=[(k, v, i) for (k, v), i in sorted(tag_map.items())],
        value_matches=sorted(value_map.items()),
        key_matches=sorted(key_map.items()),
        layer_names=layer_names,
    )


DEFAULT_MANIFEST = Manifest(
    leaf_zoom=12,
    layer_order=["Places", "Roads", "Buildings", "Nature", "Power"],
    layers={
        "Places": ["place", "amenity"],
        "Roads": ["highway_major", "highway"],
        "Buildings": ["building", "shop"],
        "Nature": ["natural"],
        "Power": ["power"],
    },
    rules={
        "place": Rule(minzoom=4, keys=["place"]),
        "amenity": Rule(minzoom=10, keys=["amenity"]),
        "highway_major": Rule(minzoom=6, values=["motorway", "trunk", "primary"]),
        "highway": Rule(minzoom=10, keys=["highway"]),
        "building": Rule(minzoom=12, keys=["building"]),
        "shop": Rule(minzoom=10, keys=["shop"]),
        "natural": Rule(minzoom=8, keys=["natural"]),
        "power": Rule(minzoom=12, tags=[("power", "pole")]),
    },
)
