import numpy as np

from pvt_spark.functions.pvt_codec import decode_tile, encode_tile
from pvt_spark.operators.simplify import simplify_dp, simplify_line


def test_codec_roundtrip():
    layers = [
        {
            "name": "Roads",
            "features": [
                {
                    "id": 123456789,
                    "keys": ["highway", "name"],
                    "values": ["primary", "Main St"],
                    "geoms": [
                        (np.array([0, 100, 200], np.int16), np.array([0, 50, 25], np.int16))
                    ],
                },
                {"id": 42, "keys": [], "values": [], "geoms": [(np.array([7], np.int16), np.array([9], np.int16))]},
            ],
        },
        {"name": "Empty", "features": []},
    ]
    payload = encode_tile(12, 3329134, layers)
    out = decode_tile(payload)
    assert out["zoom"] == 12 and out["tile_h"] == 3329134
    assert [l["name"] for l in out["layers"]] == ["Roads", "Empty"]
    f0 = out["layers"][0]["features"][0]
    assert f0["id"] == 123456789
    assert f0["keys"] == ["highway", "name"] and f0["values"] == ["primary", "Main St"]
    gx, gy = f0["geoms"][0]
    assert list(gx) == [0, 100, 200] and list(gy) == [0, 50, 25]
    # string interning dedups: encoding twice is deterministic
    assert payload == encode_tile(12, 3329134, layers)


def test_simplify_collinear_collapses():
    x = np.arange(10, dtype=float)
    y = np.zeros(10)
    keep = simplify_dp(x, y, tolerance=1.0)
    assert keep.sum() == 2 and keep[0] and keep[-1]


def test_simplify_keeps_spike():
    x = np.array([0.0, 5.0, 10.0])
    y = np.array([0.0, 100.0, 0.0])
    keep = simplify_dp(x, y, tolerance=1.0)
    assert keep.all()


def test_simplify_ring_floor():
    # a tiny square below tolerance must NOT collapse to a line
    x = np.array([0.0, 1.0, 1.0, 0.0, 0.0])
    y = np.array([0.0, 0.0, 1.0, 1.0, 0.0])
    sx, sy = simplify_line(x, y, tolerance=50.0)
    assert len(sx) >= 4 and sx[0] == sx[-1] and sy[0] == sy[-1]
