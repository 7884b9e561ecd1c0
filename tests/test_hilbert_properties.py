"""Property-based tests (hypothesis) for the Hilbert kernel and tile
algebra — the invariants the engine's range arithmetic depends on."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pvt_spark import hilbert as hb
from pvt_spark.tile import Tile

U32 = st.integers(min_value=0, max_value=2**32 - 1)
LON = st.integers(min_value=-1800000000, max_value=1800000000)
LAT = st.integers(min_value=-900000000, max_value=900000000)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(U32, U32), min_size=1, max_size=50))
def test_xy2h_h2xy_roundtrip(pairs):
    x = np.array([p[0] for p in pairs], dtype=np.uint64)
    y = np.array([p[1] for p in pairs], dtype=np.uint64)
    h = hb.xy2h(x, y, 32)
    x2, y2 = hb.h2xy(h, 32)
    assert np.array_equal(x.astype(np.uint32), x2)
    assert np.array_equal(y.astype(np.uint32), y2)


@settings(max_examples=200, deadline=None)
@given(U32, U32)
def test_hilbert_locality_adjacent_h_adjacent_cells(x, y):
    """Consecutive curve positions are 4-adjacent grid cells."""
    h = hb.xy2h(np.array([x], np.uint64), np.array([y], np.uint64), 32)
    if int(h[0]) == 2**64 - 1:
        return
    x2, y2 = hb.h2xy(h + np.uint64(1), 32)
    dist = abs(int(x2[0]) - int(x)) + abs(int(y2[0]) - int(y))
    assert dist == 1


@settings(max_examples=200, deadline=None)
@given(LON, LAT)
def test_signed_bias_preserves_zoom_prefix(lon, lat):
    """Tile id via the biased signed form == tile id via u64 shift."""
    h = hb.lonlat_to_h(np.array([lon]), np.array([lat]))
    hs = hb.h_to_signed(h)
    for z in (2, 6, 12, 14):
        assert int(hb.signed_h_to_zoom_h(hs, z)[0]) == int(h[0]) >> (2 * (32 - z))


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=1, max_value=14), st.data())
def test_tile_child_ranges_partition_parent(z, data):
    """A tile's h-range at z+2 is exactly the union of its 16 children's
    (the mask/rollup invariant of A4)."""
    h = data.draw(st.integers(min_value=0, max_value=(1 << (2 * z)) - 1))
    t = Tile.from_zh(z, h)
    r = t.h_range_for_zoom(min(z + 2, 14))
    if z + 2 > 14:
        return
    kids = t.grandchildren()
    kid_hs = sorted(k.h for k in kids)
    assert kid_hs == list(range(r.start, r.stop))


@settings(max_examples=100, deadline=None)
@given(LON, LAT)
def test_point_in_own_tile_range(lon, lat):
    """Every point's h lies inside the h-range of its tile at any zoom."""
    h = int(hb.lonlat_to_h(np.array([lon]), np.array([lat]))[0])
    for z in (4, 10, 14):
        tile_h = h >> (2 * (32 - z))
        t = Tile.from_zh(z, tile_h)
        r = t.h_range_for_zoom(32)
        assert r.start <= h < r.stop or (h == 2**64 - 1 and r.stop >= 2**64 - 1)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(LON, LAT), min_size=2, max_size=30))
def test_sort_by_h_groups_tiles_contiguously(coords):
    """After sorting by h, every zoom-z tile's rows are contiguous —
    THE property the whole engine architecture rests on."""
    lon = np.array([c[0] for c in coords])
    lat = np.array([c[1] for c in coords])
    h = hb.lonlat_to_h(lon, lat)
    order = np.argsort(h, kind="stable")
    for z in (6, 12):
        tiles = (h[order] >> np.uint64(2 * (32 - z))).tolist()
        seen = set()
        prev = None
        for t in tiles:
            if t != prev:
                assert t not in seen, "tile rows not contiguous after h sort"
                seen.add(t)
                prev = t
