"""The image_luma oracle regenerates every pixel arithmetically in DuckDB
(splitmix64 replayed in staged mod-2^64 HUGEINT SQL, q8 mid-bin
quantization applied in SQL). This test pins that SQL generator to the
engine's own NumPy pixel pipeline — no Spark session needed, so it runs
in milliseconds and catches any drift between sources/images.py and
_image_luma_oracle_sql before the driver's hash check would."""

import importlib.util
import os

import numpy as np
import pandas as pd

_spec = importlib.util.spec_from_file_location(
    "spark_entry", os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py")
)
_entry = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_entry)


def _numpy_reference(n: int, bins: int) -> pd.DataFrame:
    from geojson_spark.sources.images import _pixels_for, _splitmix64, q8_quantize

    rows = []
    for i in range(n):
        h0 = int(_splitmix64(np.array([i], dtype=np.uint64))[0])
        w = 8 + h0 % 25
        h = 8 + (h0 >> 8) % 25
        fmt = ["raw", "rle", "q8"][i % 3]
        px = _pixels_for(i, w, h)
        if fmt == "q8":
            px = q8_quantize(px)
        tri = px.reshape(-1, 3).astype(np.int64)
        luma = (299 * tri[:, 0] + 587 * tri[:, 1] + 114 * tri[:, 2]) // 1000
        hist = np.bincount(luma * bins // 256, minlength=bins)
        iid = f"img{i:012d}"
        for b, cnt in enumerate(hist):
            if cnt:
                rows.append((iid, b, int(cnt)))
        rows.append((iid, -1, 1000 * int(luma.sum()) // (luma.size * 255)))
    return (
        pd.DataFrame(rows, columns=["image_id", "bin", "n_px"])
        .sort_values(["image_id", "bin"])
        .reset_index(drop=True)
    )


def test_image_luma_oracle_sql_matches_numpy_pixels():
    import duckdb

    n, bins = 24, 16
    got = (
        duckdb.sql(_entry._image_luma_oracle_sql(n, bins))
        .df()
        .sort_values(["image_id", "bin"])
        .reset_index(drop=True)
    )
    got["bin"] = got["bin"].astype(int)
    got["n_px"] = got["n_px"].astype(int)
    want = _numpy_reference(n, bins)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_image_cells_oracle_sql_matches_numpy_lonlat():
    """The image_cells oracle must replay lonlat_for bit-exactly,
    INCLUDING the 30% hotspot branch and its jitter doubles."""
    import duckdb

    from geojson_spark.sources.images import _splitmix64, lonlat_for

    n = 500
    got = (
        duckdb.sql(_entry._image_cells_oracle_sql(n))
        .df()
        .sort_values("cell_id")
        .reset_index(drop=True)
    )
    ids = np.arange(n, dtype=np.uint64)
    lon, lat = lonlat_for(_splitmix64(ids), skew=True)
    cell = np.floor((lon + 180.0) * 8.0).astype(np.int64) * 4096 + np.floor(
        (lat + 90.0) * 8.0
    ).astype(np.int64)
    want = (
        pd.Series(cell)
        .value_counts()
        .rename_axis("cell_id")
        .reset_index(name="n_images")
        .sort_values("cell_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
