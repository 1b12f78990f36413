"""Stream-stream joins with watermark-bounded state.

``error_click_attribution`` pairs each error event with the same user's
click events in the following ``window_minutes`` — the streaming variant
of the batch funnel/range join. Spark requires BOTH sides watermarked
plus a time-range join condition so the state store can evict rows once
the watermark passes ``ts + window``; without the range bound the join
state would grow without limit. The same function works on batch
DataFrames (the watermark is a no-op there), which is how the test
establishes equivalence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def error_click_attribution(
    errors: DataFrame,
    clicks: DataFrame,
    *,
    window_minutes: int = 30,
    watermark: str = "2 hours",
) -> DataFrame:
    """(error_user, error_ts, click_ts) pairs where the click lands in
    [error_ts, error_ts + window). Both inputs need ``user_id`` and a
    timestamp ``ts``; streaming inputs are watermarked so join state is
    evicted once no matching click can still arrive."""
    e = errors.select(
        F.col("user_id"), F.col("ts").cast("timestamp").alias("err_ts")
    )
    c = clicks.select(
        F.col("user_id").alias("c_user"), F.col("ts").cast("timestamp").alias("click_ts")
    )
    if e.isStreaming:
        e = e.withWatermark("err_ts", watermark)
    if c.isStreaming:
        c = c.withWatermark("click_ts", watermark)
    cond = (
        (e["user_id"] == c["c_user"])
        & (c["click_ts"] >= e["err_ts"])
        & (c["click_ts"] < e["err_ts"] + F.expr(f"INTERVAL {int(window_minutes)} MINUTE"))
    )
    return e.join(c, cond, "inner").select("user_id", "err_ts", "click_ts")


def run_error_click_stream(
    spark,
    events_dir: str,
    *,
    window_minutes: int = 30,
    query_name: str = "err_click",
):
    """File-source events stream split into error/click sub-streams,
    stream-stream joined, appended to a memory sink. Returns the query."""
    schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    errors = stream.where(F.col("event_type") == "error")
    clicks = stream.where(F.col("event_type") == "click")
    joined = error_click_attribution(errors, clicks, window_minutes=window_minutes)
    return (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
