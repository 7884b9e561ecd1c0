"""Golden-value tests for tile algebra (reference src/tile.rs:489-666)."""

import numpy as np

from pvt_spark.tile import Tile, tile_project


def test_basic_tile():
    t = Tile.from_zxy(9, 82, 199)
    lt = t.at_zoom(32)
    assert (lt.z, lt.x, lt.y, lt.h) == (32, 687865856, 1669332992, 3660417878385666730)


def test_at_zoom_zero_tile():
    t = Tile.from_zxy(0, 0, 0)
    for z in (1, 2, 31, 32):
        zt = t.at_zoom(z)
        assert (zt.x, zt.y, zt.h) == (0, 0, 0)


def test_at_zoom_barrow():
    barrow = Tile.from_zh(5, 24)
    assert barrow.at_zoom(4).h == 6
    assert barrow.at_zoom(3).h == 1
    assert barrow.at_zoom(2).h == 0
    assert barrow.at_zoom(1).h == 0
    assert barrow.at_zoom(0).h == 0
    assert barrow.at_zoom(6).h == 96
    assert barrow.at_zoom(7).h == 384
    assert barrow.at_zoom(8).h == 1536
    assert barrow.at_zoom(9).h == 6144
    assert barrow.at_zoom(10).h == 24576


def test_at_zoom_cavallero():
    c = Tile.from_zh(28, 14298523837747280)
    assert c.at_zoom(4).h == 50
    assert c.at_zoom(3).h == 12
    assert c.at_zoom(2).h == 3
    assert c.at_zoom(1).h == 0
    assert c.at_zoom(8).h == 13004
    assert c.at_zoom(9).h == 52017
    assert c.at_zoom(10).h == 208070


def test_location_extent_and_bbox():
    t = Tile.from_zxy(0, 0, 0)
    assert t.location_extent() == 4294967295
    assert Tile.from_zxy(1, 0, 0).location_extent() == 2147483647
    b = t.bbox()
    assert b == ((0, 0), (4294967295, 4294967295))
    b3 = Tile.from_zxy(1, 1, 0).bbox()
    assert b3 == ((2147483648, 0), (4294967295, 2147483647))


def test_center():
    assert Tile.from_zxy(32, 0, 0).center() == (0, 0)
    assert Tile.from_zxy(31, 0, 0).center() == (0, 0)
    assert Tile.from_zxy(0, 0, 0).center() == (2147483647, 2147483647)
    assert Tile.from_zxy(30, 0, 0).center() == (1, 1)


def test_pyramid():
    t = Tile.from_zxy(0, 0, 0)
    assert len(t.pyramid(0, 14)) == 1
    assert len(t.pyramid(1, 14)) == 17


def test_h_range_for_zoom():
    t = Tile.from_zxy(9, 82, 199)
    assert t.h == 52017
    r = t.h_range_for_zoom(9)
    assert (r.start, r.stop) == (52017, 52018)
    r2 = t.h_range_for_zoom(2)
    assert (r2.start, r2.stop) == (3, 4)
    r3 = t.h_range_for_zoom(12)
    assert (r3.start, r3.stop) == (3329088, 3329152)


def test_null_island_tile():
    # src/location.rs:262-269
    t = Tile.from_zxy(1, 1, 1).at_zoom(32)
    assert t.x == 2147483648 and t.y == 2147483648
    from pvt_spark import hilbert as hb

    h = hb.lonlat_to_h(np.array([0]), np.array([0]))
    assert int(h[0]) == t.h


def test_tile_id_js_safe():
    t = Tile.from_zxy(9, 82, 199)
    assert t.id() == (9 << 47) | 52017
    big = Tile(32, 0, 0, 1 << 50)
    assert big.id() == (1 << 50) % 4503599627370495


def test_project_vectorized_matches_tile():
    t = Tile.from_zxy(12, 659, 1593)
    ox, oy = t.origin_location()
    loc_x = np.array([ox, ox + 1000, ox + t.location_extent()], dtype=np.uint64)
    loc_y = np.array([oy, oy + 1000, oy + t.location_extent()], dtype=np.uint64)
    px, py = t.project(loc_x, loc_y)
    assert px[0] == 0 and py[0] == 0
    assert px[2] == 8191 and py[2] == 8191
    vx, vy = tile_project(
        np.full(3, t.z), np.full(3, t.x), np.full(3, t.y), loc_x, loc_y
    )
    assert np.array_equal(px, vx) and np.array_equal(py, vy)


def test_project_clamp():
    # JS e2e asserts clamp bounds -16384/16383 (tests/index.spec.mjs)
    t = Tile.from_zxy(12, 659, 1593)
    far = np.array([0], dtype=np.uint64)
    px, py = t.project(far, far)
    assert px[0] == -16384 and py[0] == -16384
