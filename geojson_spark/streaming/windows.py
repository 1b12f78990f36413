"""Structured-Streaming windowed ops over the events stream.

The same transformation function serves batch and streaming DataFrames
(Spark's unified API): tumbling-window per-cell event counts with a
watermark for late data when the input is a stream. ``run_events_stream``
wires a parquet file-source stream → window agg → memory sink, which is the
shape a production Kafka/Kinesis source would use unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geojson_spark.functions.spark_funcs import derived_lonlat, grid_cell


def eventized(events: DataFrame) -> DataFrame:
    """events(user_id, ts, ...) → + (lon, lat, cell_id) via the shared
    deterministic derivation (SQL-oracle-reproducible)."""
    lon, lat = derived_lonlat(F.col("user_id").cast("bigint"))
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))  # NTZ → TZ for watermarks
        .withColumn("lon", lon)
        .withColumn("lat", lat)
        .withColumn("cell_id", grid_cell(F.col("lon"), F.col("lat")))
    )


def windowed_cell_counts(
    events: DataFrame, *, window: str = "1 hour", watermark: str | None = None
) -> DataFrame:
    """Tumbling-window counts per (cell, event_type). Works on both batch
    and streaming inputs; pass ``watermark`` for streams to bound state."""
    df = eventized(events)
    if watermark is not None:
        df = df.withWatermark("ts", watermark)
    return (
        df.groupBy(F.window("ts", window).alias("w"), "cell_id", "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "cell_id",
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_events_stream(
    spark: SparkSession, events_dir: str, *, window: str = "1 hour",
    watermark: str = "2 hours", query_name: str = "cell_counts",
):
    """File-source stream → windowed agg → memory sink. Returns the query;
    caller awaits termination / processAllAvailable then reads
    ``spark.table(query_name)``."""
    schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    agg = windowed_cell_counts(stream, window=window, watermark=watermark)
    # complete mode so the memory sink holds every window (append would
    # only emit watermark-finalized windows, which never happens in a
    # single availableNow batch)
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
