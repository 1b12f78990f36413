"""Custom stateful streaming operators via ``applyInPandasWithState``.

``stateful_session_counts`` carries per-user session state across
micro-batches: the state tuple (first event time, last event time,
running event count, running session count) lets a gap-based
sessionization continue over a batch boundary — the thing the batch
window formulation (geojson_spark.operators.sessions) cannot do on an
unbounded stream. Stragglers gap-separated BELOW every seen event open
sessions correctly; stragglers inside the already-seen range merge
conservatively (exact attribution there would need the full timeline,
not O(1) state).

The fold inside each batch is vectorized NumPy over the sorted event times
(no per-row Python); state is O(1) per user. On a real cluster this scales
with the number of distinct users per executor, and the HDFS-backed state
store checkpoints it per micro-batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd  # noqa: F401 — resolves pandas-UDF type hints
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructType

_OUT_SCHEMA = (
    StructType()
    .add("user_id", LongType())
    .add("n_events", LongType())
    .add("n_sessions", LongType())
)
_STATE_SCHEMA = (
    StructType()
    .add("first_ts_ns", LongType())
    .add("last_ts_ns", LongType())
    .add("n_events", LongType())
    .add("n_sessions", LongType())
)


def _session_fold(gap_ns: int):
    def fold(key, pdfs, state: GroupState):
        if state.exists:
            first_ts_ns, last_ts_ns, n_events, n_sessions = state.get
        else:
            first_ts_ns, last_ts_ns, n_events, n_sessions = None, None, 0, 0
        ts_parts = []
        for pdf in pdfs:
            # NaT (null ts) would decode to int64-min, overflow the gap
            # subtraction, and poison last_ts for every later batch —
            # rows without an event time cannot be sessionized
            col = pdf["ts"].to_numpy(dtype="datetime64[ns]")
            ts_parts.append(col[~np.isnat(col)].astype(np.int64))
        ts = np.sort(np.concatenate(ts_parts)) if ts_parts else np.empty(0, np.int64)
        if ts.size:
            # stragglers STRICTLY gap-separated below every seen event can
            # never merge with a known session — count them with the gap
            # rule among themselves (comparing them against max(last_ts),
            # as the pre-round-4 fold did, yielded a negative diff and
            # silently NO session for e.g. a lone 09:00 event arriving
            # after a 12:00 one). Stragglers INSIDE the seen range still
            # merge conservatively — exact attribution there needs the
            # full timeline, not O(1) state (documented approximation).
            if first_ts_ns is not None:
                below = ts[ts < first_ts_ns - gap_ns]
                rest = ts[ts >= first_ts_ns - gap_ns]
            else:
                below = np.empty(0, np.int64)
                rest = ts
            if below.size:
                n_sessions += 1 + int((np.diff(below) > gap_ns).sum())
                # bridge: when the newest below-range straggler lands within
                # gap_ns of the first retained event, below's last session
                # and the session rest[0] belongs to (new or merged into the
                # prior state session) are ONE session — without this the
                # pair double-counts and n_sessions overshoots by one
                if rest.size and int(rest[0]) - int(below[-1]) <= gap_ns:
                    n_sessions -= 1
            if rest.size:
                prev = np.empty_like(rest)
                # a missing last_ts means the first event opens a session
                prev[0] = last_ts_ns if last_ts_ns is not None else rest[0] - gap_ns - 1
                prev[1:] = rest[:-1]
                # new session when gap strictly exceeds gap_ns (matches
                # the batch formulation ts > lag(ts) + INTERVAL gap)
                n_sessions += int((rest - prev > gap_ns).sum())
            n_events += int(ts.size)
            # max, not last: an out-of-order micro-batch whose events all
            # precede last_ts must not REGRESS the state — a later batch
            # would then see an inflated gap vs the true latest event and
            # overcount sessions
            lo, hi = int(ts[0]), int(ts[-1])
            first_ts_ns = lo if first_ts_ns is None else min(lo, first_ts_ns)
            last_ts_ns = hi if last_ts_ns is None else max(hi, last_ts_ns)
        state.update((first_ts_ns, last_ts_ns, n_events, n_sessions))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n_events], "n_sessions": [n_sessions]}
        )

    return fold


def stateful_session_counts(events: DataFrame, *, gap_minutes: int = 30) -> DataFrame:
    """Streaming DF (user_id, ts, ...) → running (n_events, n_sessions) per
    user, sessions continuing across micro-batches. Use outputMode
    'update'; counts are monotone so the latest row per user is the answer.
    """
    gap_ns = gap_minutes * 60 * 1_000_000_000
    typed = events.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("ts").cast("timestamp").alias("ts"),
    )
    return typed.groupBy("user_id").applyInPandasWithState(
        _session_fold(gap_ns),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stateful_sessions(
    spark,
    events_dir: str,
    *,
    gap_minutes: int = 30,
    query_name: str = "session_counts",
    max_files_per_trigger: int = 1,
):
    """File-source stream (one file per micro-batch, so state genuinely
    crosses batch boundaries) → stateful sessionize → memory sink."""
    schema = spark.read.parquet(events_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("latestFirst", "false")
        .parquet(events_dir)
    )
    out = stateful_session_counts(stream, gap_minutes=gap_minutes)
    return (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def stream_dedup(stream: DataFrame, *, key_cols: list[str], ts_col: str = "ts",
                 watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup: keep the first arrival of each key, with
    state bounded by the watermark (``dropDuplicatesWithinWatermark`` —
    a duplicate arriving after the watermark passes its first occurrence
    may re-emit, which is the standard bounded-state trade; an unbounded
    ``dropDuplicates`` would grow state forever on a real stream). The
    same call works on batch frames via plain dropDuplicates."""
    typed = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if not stream.isStreaming:
        # deterministic 'first arrival' for the batch path (plain
        # dropDuplicates keeps an arbitrary partition-order-dependent row);
        # same ts cast as the streaming path so the two schemas match
        from pyspark.sql.window import Window

        # ts alone leaves same-timestamp duplicates partition-order
        # dependent; break ties on every remaining orderable column so
        # repeated runs keep the same row. Maps are unorderable in Spark
        # at ANY nesting depth (array<map>, struct with a map field also
        # raise in an ORDER BY), so the check walks the full type tree.
        from pyspark.sql.types import ArrayType, MapType, StructType

        def orderable(dt) -> bool:
            if isinstance(dt, MapType):
                return False
            if isinstance(dt, ArrayType):
                return orderable(dt.elementType)
            if isinstance(dt, StructType):
                return all(orderable(f.dataType) for f in dt.fields)
            return True

        tie = [
            F.col(f.name).asc_nulls_last()
            for f in typed.schema.fields
            if f.name not in key_cols
            and f.name != ts_col
            and orderable(f.dataType)
        ]
        w = Window.partitionBy(*key_cols).orderBy(
            F.col(ts_col).asc_nulls_last(), *tie
        )
        return (
            typed.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
    return typed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(key_cols)
