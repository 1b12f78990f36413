"""Streaming sinks: GeoJSON FeatureCollection files via foreachBatch.

Structured Streaming has no native GeoJSON sink; ``foreachBatch`` is the
canonical escape hatch — each micro-batch is a plain DataFrame, so the
batch writer (S4 FC envelope, sources/geojson.write_geojson) runs
unchanged and the sink inherits its exactly-once-per-batch semantics
from the streaming checkpoint (batch ids are deterministic; a replayed
batch overwrites its own file).
"""

from __future__ import annotations

import os

from geojson_spark.sources.geojson import write_geojson


def write_geojson_stream(feature_df, out_dir: str, *, checkpoint_dir: str,
                         query_name: str = "geojson_sink"):
    """featureful stream → one FeatureCollection file per micro-batch
    (``batch-<id>.geojson``). Returns the started query."""

    os.makedirs(out_dir, exist_ok=True)

    def sink(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        write_geojson(batch_df, os.path.join(out_dir, f"batch-{batch_id:06d}.geojson"))

    return (
        feature_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
