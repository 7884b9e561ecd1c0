"""Golden-value tests for the Hilbert/Mercator kernel.

Every constant here is asserted by the reference's own unit tests
(/root/reference/src/location.rs:123-285) — implementation-independent
math, so parity with these pins fast_hilbert + projection compatibility.
"""

import numpy as np

from pvt_spark import hilbert as hb

U32_MAX = 4294967295
U64_MAX = 18446744073709551615
MIDDLE = 2147483648  # i32::MAX as u32 + 1


def _s(v):
    return np.array([v], dtype=np.int64)


def test_project_null_island():
    x, y = hb.project_lonlat_to_mercator(_s(0), _s(0))
    assert x[0] == 0.5 and y[0] == 0.5


def test_project_cavallero_bounds():
    # src/location.rs:136-151
    x, y = hb.project_lonlat_to_mercator(_s(-1220279745), _s(370491457))
    assert 0.16103339195251465 < x[0] < 0.16103363037109375
    assert 0.38905906677246094 < y[0] < 0.38905930519104004
    tx = int(x[0] * (1 << 22))
    ty = int(y[0] * (1 << 22))
    assert (tx, ty) == (675423, 1631832)


def test_mercator_to_lonlat_goldens():
    # src/location.rs:166-181
    lon, lat = hb.project_mercator_to_lonlat(np.array([0.5]), np.array([0.5]))
    assert (lon[0], lat[0]) == (0, 0)
    lon, lat = hb.project_mercator_to_lonlat(np.array([0.0]), np.array([0.0]))
    assert (lon[0], lat[0]) == (-1800000000, 850511287)
    lon, lat = hb.project_mercator_to_lonlat(np.array([1.0]), np.array([1.0]))
    assert (lon[0], lat[0]) == (1800000000, -850511287)


def test_lonlat_to_xy_goldens():
    # src/location.rs:184-200
    x, y = hb.lonlat_to_xy(_s(0), _s(0))
    assert (x[0], y[0]) == (MIDDLE, MIDDLE)
    x, y = hb.lonlat_to_xy(_s(-1220279745), _s(370491457))
    assert (x[0], y[0]) == (691633204, 1670996018)
    x, y = hb.lonlat_to_xy(_s(-1800000000), _s(900000000))
    assert (x[0], y[0]) == (0, 0)


def test_xy_to_lonlat_goldens():
    # src/location.rs:203-217
    lon, lat = hb.xy_to_lonlat(_s(2147483647).astype(np.uint32), _s(2147483647).astype(np.uint32))
    assert (lon[0], lat[0]) == (0, 0)
    lon, lat = hb.xy_to_lonlat(np.array([691633204], np.uint32), np.array([1670996018], np.uint32))
    assert (lon[0], lat[0]) == (-1220279745, 370491457)
    lon, lat = hb.xy_to_lonlat(np.array([0], np.uint32), np.array([0], np.uint32))
    assert (lon[0], lat[0]) == (-1800000000, 850511287)


def test_roundtrip_goldens():
    # src/location.rs:220-234
    lon, lat = hb.xy_to_lonlat(np.array([0], np.uint32), np.array([0], np.uint32))
    x, y = hb.lonlat_to_xy(lon, lat)
    assert (x[0], y[0]) == (0, 11)
    x, y = hb.lonlat_to_xy(_s(1800000000), _s(-900000000))
    assert (x[0], y[0]) == (U32_MAX, U32_MAX)
    lon, lat = hb.xy_to_lonlat(x, y)
    assert (lon[0], lat[0]) == (1800000000, -850511287)


def test_lonlat_to_h_corners():
    # src/location.rs:237-252
    h = hb.lonlat_to_h(_s(-1800000000), _s(900000000))
    assert int(h[0]) == 0
    x, y = hb.lonlat_to_xy(_s(1800000000), _s(900000000))
    assert (x[0], y[0]) == (U32_MAX, 0)
    h = hb.xy2h(x, y, 32)
    assert int(h[0]) == U64_MAX
    h = hb.lonlat_to_h(_s(1800000000), _s(900000000))
    assert int(h[0]) == U64_MAX


def test_lonlat_to_h_cavallero():
    # src/location.rs:273-284
    h = hb.lonlat_to_h(_s(-1220279745), _s(370491457))
    assert int(h[0]) == 3660422102463285814


def test_h2xy_inverse_of_xy2h():
    rng = np.random.RandomState(42)
    x = rng.randint(0, 1 << 32, size=1000).astype(np.uint64)
    y = rng.randint(0, 1 << 32, size=1000).astype(np.uint64)
    h = hb.xy2h(x, y, 32)
    x2, y2 = hb.h2xy(h, 32)
    assert np.array_equal(x.astype(np.uint32), x2)
    assert np.array_equal(y.astype(np.uint32), y2)


def test_signed_bias_order_preserving():
    rng = np.random.RandomState(7)
    h = rng.randint(0, 1 << 63, size=2000).astype(np.uint64) * 2 + rng.randint(0, 2, size=2000).astype(np.uint64)
    hs = hb.h_to_signed(h)
    order_u = np.argsort(h, kind="stable")
    order_s = np.argsort(hs, kind="stable")
    assert np.array_equal(order_u, order_s)
    assert np.array_equal(hb.signed_to_h(hs), h)
    # corners
    assert hb.h_to_signed(np.array([0], np.uint64))[0] == -(1 << 63)
    assert hb.h_to_signed(np.array([U64_MAX], np.uint64))[0] == (1 << 63) - 1


def test_zoom_shift():
    # h_to_zoom_h semantics (src/location.rs:105-111)
    h = np.array([3660422102463285814], dtype=np.uint64)
    assert int(hb.h_to_zoom_h(h, 12)[0]) == 3660422102463285814 >> (2 * 20)
    hs = hb.h_to_signed(h)
    assert int(hb.signed_h_to_zoom_h(hs, 12)[0]) == 3660422102463285814 >> 40
    # Scotts Valley z12 tile (src/hilbert/tree.rs:227)
    assert int(hb.signed_h_to_zoom_h(hs, 12)[0]) == 3329134


def test_santa_cruz_sort_goldens():
    """Reference src/sort.rs:529-551: the first santa-cruz node/way pair
    constants — h decodes to the exact asserted lon/lat."""
    import numpy as np

    from pvt_spark import hilbert as hb

    for h_u64, want_lon, want_lat in (
        (3660331851833214363, -121.2510385, 36.9596099),
        (3660337306988711752, -121.4516216, 36.9000422),
    ):
        x, y = hb.h2xy(np.array([h_u64], np.uint64), 32)
        lon, lat = hb.xy_to_lonlat(x, y)
        assert lon[0] / 1e7 == want_lon
        assert lat[0] / 1e7 == want_lat
