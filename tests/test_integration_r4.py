"""Round-4 integration: the newest operators composed into pipelines.

1. streaming GeoJSON source → rasterize_density per micro-batch → GeoJSON
   sink (feature-per-tile), two real micro-batches, stream == batch.
2. kill→resume (resumable_apply) wrapping rasterize_density: completed
   buckets are skipped on resume and the resumed output is identical to
   a direct full run.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from geojson_spark.operators.rasterize import rasterize_density


def _feature(i: int) -> dict:
    return {
        "type": "Feature",
        "id": i,
        "geometry": {
            "type": "Point",
            "coordinates": [float(i % 30) - 15.0, float(i % 20) - 10.0],
        },
        "properties": None,
    }


def _write_ndjson(path, lo, hi):
    with open(path, "w") as fh:
        for i in range(lo, hi):
            fh.write(json.dumps(_feature(i)) + "\n")


def test_streaming_density_pipeline_two_batches(spark, tmp_path):
    """read_geojson_stream → rasterize_density inside foreachBatch →
    GeoJSON feature-per-tile sink; per-tile n_points summed across the
    two micro-batches equals one batch rasterize over all points."""
    from geojson_spark.functions.constructors import st_point
    from geojson_spark.sources.geojson import (
        read_geojson,
        read_geojson_stream,
        table_to_features,
        write_geojson,
    )

    d = tmp_path / "nd"
    d.mkdir()
    out_root = tmp_path / "tiles_out"
    out_root.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def sink(batch_df, batch_id: int) -> None:
        pts = batch_df.select(
            F.element_at("geometry.coords", 1).alias("lon"),
            F.element_at("geometry.coords", 2).alias("lat"),
        )
        tiles = rasterize_density(pts, cpd=1, res=32)
        tx = F.floor(F.col("tile_id") / 4096).cast("double")
        ty = F.pmod(F.col("tile_id"), F.lit(4096)).cast("double")
        feat = table_to_features(
            tiles.select(
                st_point(tx + 0.5 - 180.0, ty + 0.5 - 90.0).alias("geometry"),
                "tile_id",
                "n_points",
                "nonzero_px",
                "max_count",
            ),
            id_col="tile_id",
        )
        write_geojson(feat, str(out_root / f"batch-{batch_id:06d}"))

    def drain():
        q = (
            read_geojson_stream(spark, str(d))
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    _write_ndjson(d / "a.ndjson", 0, 60)
    drain()  # micro-batch 0
    _write_ndjson(d / "b.ndjson", 60, 140)
    drain()  # micro-batch 1 (same checkpoint: only the new file)

    batch_dirs = sorted(p.name for p in out_root.iterdir())
    assert len(batch_dirs) == 2, batch_dirs

    back = read_geojson(spark, str(out_root / "*" / "*.geojson"))
    got: dict[int, int] = {}
    for r in back.collect():
        props = json.loads(r.properties)
        tid = int(json.loads(r.id_json))
        got[tid] = got.get(tid, 0) + int(props["n_points"])

    all_pts = spark.createDataFrame(
        [
            Row(lon=float(i % 30) - 15.0, lat=float(i % 20) - 10.0)
            for i in range(140)
        ]
    )
    want = {
        r.tile_id: r.n_points
        for r in rasterize_density(all_pts, cpd=1, res=32).collect()
    }
    assert got == want


def test_resumable_rasterize_kill_then_resume(spark, tmp_path):
    """resumable_apply over rasterize_density: bucket by the tile key so
    every tile's points live in one bucket, kill after 2 buckets, resume,
    and require (a) completed buckets are NOT reprocessed and (b) the
    resumed union is row-identical to a direct full run."""
    import numpy as np

    from geojson_spark.plans.checkpoint import CheckpointTable, resumable_apply

    rng = np.random.default_rng(11)
    xy = rng.uniform([-40, -20], [40, 20], size=(3000, 2))
    pts = spark.createDataFrame(
        [Row(lon=float(x), lat=float(y)) for x, y in xy]
    ).withColumn(
        # one 1°-tile == one bucket key: floor((lon+180)*32)//32 == floor(lon+180)
        "tile_key",
        (F.floor(F.col("lon") + 180.0) * 4096 + F.floor(F.col("lat") + 90.0)).cast(
            "long"
        ),
    )

    calls: list[int] = []

    def fn(part):
        calls.append(1)
        return rasterize_density(part, cpd=1, res=32)

    ckpt = CheckpointTable(str(tmp_path / "ckpt"))
    with pytest.raises(RuntimeError, match="simulated failure"):
        resumable_apply(
            spark, pts, fn, ckpt,
            stage="rasterize", bucket_col="tile_key", n_buckets=4, fail_after=2,
        )
    assert len(calls) == 2
    assert len(ckpt.completed_buckets("rasterize")) == 2

    calls.clear()
    resumed = resumable_apply(
        spark, pts, fn, ckpt,
        stage="rasterize", bucket_col="tile_key", n_buckets=4,
    )
    assert len(calls) == 2  # only the 2 missing buckets ran
    assert len(ckpt.lineage()) == 4

    def key(rows):
        return sorted(
            (r.tile_id, r.n_points, r.nonzero_px, r.max_count, r.checksum,
             r.phash, bytes(r.bytes))
            for r in rows
        )

    direct = rasterize_density(pts, cpd=1, res=32)
    assert key(resumed.collect()) == key(direct.collect())
