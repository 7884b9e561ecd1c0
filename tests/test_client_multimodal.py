"""Client decode helpers (P9/P14/P15/P16) + multimodal plumbing."""

import numpy as np
from pyspark.sql import functions as F

from pvt_spark.functions.client import (
    LINE,
    POINT,
    POLYGON,
    geometry_type,
    signed_ring_area,
    split_rings,
    tile_point_to_lonlat,
)
from pvt_spark.functions.multimodal import (
    extract_media_features,
    sample_frames,
    synthesize_media,
)
from pvt_spark.tile import Tile, hilbert_bearing


def test_geometry_type_inference():
    assert geometry_type(np.array([1]), np.array([2])) == POINT
    assert geometry_type(np.array([0, 5]), np.array([0, 5])) == LINE
    assert geometry_type(np.array([0, 5, 5, 0]), np.array([0, 0, 5, 0])) == POLYGON


def test_ring_area_and_split():
    outer = (np.array([0, 10, 10, 0, 0]), np.array([0, 0, 10, 10, 0]))
    hole = (np.array([2, 2, 4, 4, 2]), np.array([2, 4, 4, 2, 2]))
    assert signed_ring_area(*outer) < 0 or signed_ring_area(*outer) > 0
    a_outer = signed_ring_area(*outer)
    a_hole = signed_ring_area(*hole)
    assert a_outer * a_hole < 0  # opposite winding
    rings = [outer, hole] if a_outer >= 0 else [hole, outer]
    polys = split_rings(rings)
    assert len(polys) == 1 and len(polys[0]) == 2


def test_tile_point_reprojection_roundtrip():
    t = Tile.from_zxy(12, 659, 1593)
    # center of the tile in tile coords = extent/2
    lon, lat = tile_point_to_lonlat(12, t.x, t.y, np.array([4096.0]), np.array([4096.0]))
    cx, cy = t.center()
    from pvt_spark import hilbert as hb

    clon, clat = hb.xy_to_lonlat(np.array([cx], np.uint32), np.array([cy], np.uint32))
    assert abs(lon[0] - clon[0] / 1e7) < 1e-3
    assert abs(lat[0] - clat[0] / 1e3 / 1e4) < 1e-3


def test_hilbert_bearing_smoke():
    # curve enters/exits through neighbors; value is one of the 12 bearings
    t = Tile.from_zh(4, 6)
    b = hilbert_bearing(t)
    assert b is None or (len(b) == 2 and set(b) <= set("NSEW"))
    # bearings exist for most interior tiles
    vals = [hilbert_bearing(Tile.from_zh(4, h)) for h in range(1, 255)]
    assert sum(v is not None for v in vals) > 200


def test_media_features_real_and_stub(spark):
    media = synthesize_media(spark, 30)
    out = extract_media_features(media, feat_dim=16).collect()
    assert len(out) == 30
    assert all(r.feat_dim == 16 and len(r.features) == 16 for r in out)
    # real payloads decode for real; every 10th row is compressed -> stub
    by_id = {r.media_id: r for r in out}
    assert all(
        by_id[i].decode_ok == ("stubbed" if i % 10 == 9 else "ok") for i in range(30)
    )
    # deterministic across runs
    again = {r.media_id: r.features for r in extract_media_features(media, 16).collect()}
    first = {r.media_id: r.features for r in out}
    assert first == again
    # content-sensitive: two different images differ
    assert first[0] != first[6]


def test_image_codec_roundtrip_and_resize(spark):
    import numpy as np

    from pvt_spark.functions.multimodal import (
        decode_bmp,
        encode_bmp,
        resize_images,
    )

    rng = np.random.RandomState(0)
    rgb = rng.randint(0, 256, (13, 7, 3), dtype=np.uint8)  # odd width: padding
    assert (decode_bmp(encode_bmp(rgb)) == rgb).all()

    media = synthesize_media(spark, 12)
    resized = resize_images(media, 8, 8)
    for r in resized.where(F.col("kind") == "image").collect():
        if r.mime == "image/bmp":
            img = decode_bmp(bytes(r.data))
            assert img.shape == (8, 8, 3) and r.width == 8 and r.height == 8


def test_audio_codec_roundtrip():
    import numpy as np

    from pvt_spark.functions.multimodal import decode_wav, encode_wav

    s = (np.sin(np.linspace(0, 50, 1000)) * 20000).astype(np.int16)
    got, rate = decode_wav(encode_wav(s, 8000))
    assert rate == 8000 and (got == s).all()


def test_frame_sampling(spark):
    from pvt_spark.functions.multimodal import decode_bmp

    media = synthesize_media(spark, 30)
    frames = sample_frames(media, every_ms=100)
    rows = frames.collect()
    assert rows
    # sampled frames are REAL decodable images
    img = decode_bmp(bytes(rows[0].frame))
    assert img.shape == (16, 16, 3)
    # one row per 100ms of container duration (10 fps)
    n_by_id = {}
    for r in rows:
        n_by_id[r.media_id] = n_by_id.get(r.media_id, 0) + 1
    durations = {
        r.media_id: r.duration_ms
        for r in media.where(F.col("kind") == "video").collect()
        if r.duration_ms is not None
    }
    for mid, n in n_by_id.items():
        assert n == durations[mid] // 100
