"""Gap-based sessionization over an event stream (batch form).

Classic training-pipeline / clickstream operator: events of one user whose
consecutive gaps are <= ``gap`` belong to one session. Expressed entirely
with built-in window functions (lag -> boundary flag -> running sum), so it
is one shuffle (the partitionBy) and stays JVM-side; a SQL oracle
reproduces it bit-exactly. The streaming counterpart (cross-batch state via
``applyInPandasWithState``) lives in geojson_spark.streaming.stateful.

At 100 TB the single shuffle partitions by user — the natural key; skewed
power-users are bounded by session count, not event count, after the
in-partition running sum (no driver involvement, spills handled by the
sort-based window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tie_col: str = "event_id",
    gap: str = "30 minutes",
) -> DataFrame:
    """Adds a per-user 1-based ``session_id`` column.

    A new session starts when the gap to the previous event (ordered by
    ``ts, tie``) exceeds ``gap`` (strictly), matching the SQL formulation
    ``ts > lag(ts) + INTERVAL gap``.
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(), F.col(tie_col).asc())
    lag_ts = F.lag(F.col(ts_col)).over(w)
    is_new = F.when(
        lag_ts.isNull() | (F.col(ts_col) > lag_ts + F.expr(f"INTERVAL {gap}")), 1
    ).otherwise(0)
    # derive the running frame from the SAME spec as the lag window — a
    # divergent ordering between the two would split sessions differently
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.withColumn("session_id", F.sum(is_new).over(run))


def session_stats(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tie_col: str = "event_id",
    gap: str = "30 minutes",
    value_col: str | None = None,
) -> DataFrame:
    """Per-session rollup: (user, session_id, n_events, start, end[, cents]).

    Monetary/value sums are emitted as integer cents so outputs stay
    deterministic across engines.
    """
    s = sessionize(events, user_col=user_col, ts_col=ts_col, tie_col=tie_col, gap=gap)
    aggs = [
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    ]
    if value_col is not None:
        aggs.append(
            F.sum(F.round(F.col(value_col) * 100).cast("bigint")).alias("value_cents")
        )
    return s.groupBy(user_col, "session_id").agg(*aggs)
