"""Round-4 review regressions (ADVICE.md): sniff false-positives on
top-level arrays / value-position strings, nested-map tie-break columns
in batch stream_dedup, and the rasterize world-domain filter."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F


def test_has_toplevel_features_rejects_array_root_and_value_position():
    from geojson_spark.sources.geojson import _has_toplevel_features

    # a top-level JSON ARRAY is never an FC, even when its depth-1 string
    # element 'features' is immediately followed by an array
    assert not _has_toplevel_features('["features", [1]]')
    assert not _has_toplevel_features('[{"features": [1]}]')
    # value-position string followed by an array key must not match either
    assert not _has_toplevel_features('{"name": "features", "x": [1]}')
    # and the real thing still matches, colon spaced or not
    assert _has_toplevel_features('{"type": "FeatureCollection", "features": [')
    assert _has_toplevel_features('{"features"\n  :\t[')
    # 'features' key whose value is NOT an array is not a streamable FC
    assert not _has_toplevel_features('{"features": {"a": 1}}')


def test_stream_dedup_batch_skips_nested_map_columns(spark):
    """Columns merely CONTAINING a map (array<map>, struct with a map
    field) are unorderable — they must be excluded from the tie-break,
    not crash the window ORDER BY."""
    from geojson_spark.streaming.stateful import stream_dedup

    df = spark.createDataFrame(
        [
            Row(event_id=1, ts="2024-01-01 00:00:00", payload="b",
                tags=[{"k": "v1"}], meta=Row(m={"a": "b"}, n=2)),
            Row(event_id=1, ts="2024-01-01 00:00:00", payload="a",
                tags=[{"k": "v2"}], meta=Row(m={"a": "c"}, n=1)),
            Row(event_id=2, ts="2024-01-01 00:00:01", payload="z",
                tags=[{"k": "v3"}], meta=Row(m={"a": "d"}, n=3)),
        ]
    )
    out = {r.event_id: r.payload
           for r in stream_dedup(df, key_cols=["event_id"]).collect()}
    assert out == {1: "a", 2: "z"}  # orderable columns still break the tie


def test_rasterize_drops_out_of_range_clamps_boundary(spark):
    """Out-of-world coordinates must be filtered before tiling (a signed
    ty would alias under the tile_id decode); the LEGAL boundary
    positions lon=180 / lat=90 clamp into the last pixel column/row."""
    from geojson_spark.operators.rasterize import rasterize_density

    pts = spark.createDataFrame(
        [
            Row(p=1, lon=10.2, lat=20.3),
            Row(p=2, lon=10.2, lat=20.3),
            Row(p=3, lon=-200.0, lat=20.0),   # lon out of range: dropped
            Row(p=4, lon=10.0, lat=-95.0),    # lat out of range: dropped
            Row(p=5, lon=180.0, lat=0.0),     # antimeridian: kept, clamped
            Row(p=6, lon=0.0, lat=90.0),      # pole: kept, clamped
        ]
    )
    tiles = {t.tile_id: t for t in rasterize_density(pts, cpd=1, res=32).collect()}
    assert sum(t.n_points for t in tiles.values()) == 4
    assert all(t >= 0 and t % 4096 < 180 for t in tiles)
    # p5 lands in the last lon tile (tx=359), last pixel column
    assert 359 * 4096 + 90 in tiles
    # p6 lands in the last lat tile (ty=179)
    assert 180 * 4096 + 179 in tiles


def test_sniff_tolerates_utf8_bom():
    from geojson_spark.sources.geojson import _has_toplevel_features

    assert _has_toplevel_features('﻿{"type": "FeatureCollection", "features": [')
    assert not _has_toplevel_features('﻿["features", [1]]')


def test_cosine_topk_drops_ragged_vectors(spark):
    """A dim-mismatched vector folds to a NULL cosine under zip_with
    padding — it must be excluded, never fill a rank."""
    from geojson_spark.operators.similarity import cosine_topk_bruteforce

    vecs = spark.createDataFrame(
        [
            Row(vec_id=1, embedding=[1.0, 0.0]),
            Row(vec_id=2, embedding=[0.5, 0.5]),
            Row(vec_id=3, embedding=[1.0]),          # ragged: dropped
            Row(vec_id=4, embedding=[0.0, None]),    # null element: dropped
        ]
    )
    qs = spark.createDataFrame([Row(q_id=0, q_vec=[1.0, 0.0])])
    rows = cosine_topk_bruteforce(qs, vecs, 10).collect()
    assert {r.vec_id for r in rows} == {1, 2}
    assert all(r.cosine is not None for r in rows)


def test_zonal_stats_matches_numpy_replay(spark):
    """zonal_stats over a rendered raster == a NumPy replay of the same
    pixel grid + rect containment (the driver oracle's logic, in-process)."""
    import numpy as np

    from geojson_spark.operators.rasterize import rasterize_density, zonal_stats

    rng = np.random.default_rng(7)
    xy = rng.uniform([-20, -10], [20, 10], size=(500, 2))
    pts = spark.createDataFrame(
        [Row(p=i, lon=float(x), lat=float(y)) for i, (x, y) in enumerate(xy)]
    )
    tiles = rasterize_density(pts, cpd=1, res=32)
    x0, y0, x1, y1 = -10.0005, -5.0005, 10.0005, 5.0005
    polys = spark.createDataFrame(
        [Row(poly_id=1, coords=[x0, y0, x1, y0, x1, y1, x0, y1, x0, y0],
             ring_offsets=[0, 5], part_offsets=[0, 1], dim=2,
             bbox=[x0, y0, x1, y1])]
    )
    got = {r.poly_id: (r.n_px, r.sum_val, r.max_val)
           for r in zonal_stats(tiles, polys, cpd=1).collect()}

    gx = np.floor((xy[:, 0] + 180.0) * 32.0).astype(np.int64)
    gy = np.floor((xy[:, 1] + 90.0) * 32.0).astype(np.int64)
    from collections import Counter

    counts = Counter(zip(gx, gy))
    n_px = s = mx = 0
    for (cx, cy), c in counts.items():
        lon = (cx + 0.5) / 32.0 - 180.0
        lat = (cy + 0.5) / 32.0 - 90.0
        if x0 < lon < x1 and y0 < lat < y1:
            v = min(c, 255)
            n_px += 1
            s += v
            mx = max(mx, v)
    assert got == {1: (n_px, s, mx)}
