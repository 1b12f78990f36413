"""Round-5 regression tests for the ADVICE findings.

1. resumable_apply must never return a partial result when a concurrent
   resume holds claims: it waits for live siblings' commits (or raises on
   timeout) and reclaims buckets whose owner died.
2. stateful session fold: a below-range straggler within gap of the first
   retained event bridges into that session — one session, not two.
3. property-key JSON paths: '?' and '' are inexpressible in Spark's
   JsonPathParser and must raise instead of silently returning null.
"""

from __future__ import annotations

import json
import os
import subprocess
import threading
import time

import pandas as pd
import pytest
from pyspark.sql import functions as F

GAP_NS = 30 * 60 * 1_000_000_000


# ---------------------------------------------------------------------------
# checkpoint: full-output contract under concurrent resumes
# ---------------------------------------------------------------------------


def _mk_input(spark, n=40):
    return spark.range(n).select(
        F.col("id").cast("long").alias("k"), (F.col("id") * 2).alias("v")
    )


def test_resumable_apply_raises_on_live_sibling_timeout(spark, tmp_path):
    """A bucket claimed by a LIVE sibling that never commits must make
    resumable_apply raise after the wait budget — not silently return a
    DataFrame missing that bucket's rows."""
    from geojson_spark.plans.checkpoint import CheckpointTable, resumable_apply

    ckpt = CheckpointTable(str(tmp_path / "c"))
    # the test process itself is the "live sibling" (pid alive)
    assert ckpt.claim_bucket(0, stage="s", owner="sibling")
    df = _mk_input(spark)
    with pytest.raises(TimeoutError, match="refusing to return a partial"):
        resumable_apply(
            spark, df, lambda part: part, ckpt,
            stage="s", bucket_col="k", n_buckets=2, sibling_wait_s=2.0,
        )


def test_resumable_apply_waits_for_sibling_commit(spark, tmp_path):
    """While a live sibling holds a claim, resumable_apply polls; once the
    sibling commits, the returned frame contains the FULL output."""
    from geojson_spark.plans.checkpoint import CheckpointTable, resumable_apply

    ckpt = CheckpointTable(str(tmp_path / "c"))
    df = _mk_input(spark)
    n_buckets = 2
    # precompute bucket 0's rows exactly as resumable_apply hashes them
    b0 = df.withColumn(
        "_b", F.pmod(F.xxhash64(F.col("k")), F.lit(n_buckets))
    ).where(F.col("_b") == 0).drop("_b")
    b0_rows = b0.count()
    assert 0 < b0_rows < 40
    sibling_out = str(tmp_path / "sibling_out")
    b0.write.mode("overwrite").parquet(sibling_out)

    assert ckpt.claim_bucket(0, stage="s", owner="sibling")

    def sibling_commit():
        time.sleep(1.0)
        os.replace(sibling_out, ckpt.bucket_data_path(0))
        ckpt.commit_bucket(
            0, {"stage": "s", "bucket": 0, "rows_out": b0_rows},
            meta={"stage": "s", "n_buckets": n_buckets},
        )

    t = threading.Thread(target=sibling_commit)
    t.start()
    try:
        out = resumable_apply(
            spark, df, lambda part: part, ckpt,
            stage="s", bucket_col="k", n_buckets=n_buckets, sibling_wait_s=30.0,
        )
        assert out.count() == 40  # nothing missing
        assert sorted(r.k for r in out.collect()) == list(range(40))
    finally:
        t.join()


def test_resumable_apply_reclaims_dead_siblings_bucket(spark, tmp_path):
    """A claim whose owner pid is gone is crashed state — the resume must
    reclaim and process that bucket itself, still returning full output."""
    from geojson_spark.plans.checkpoint import CheckpointTable, resumable_apply

    ckpt = CheckpointTable(str(tmp_path / "c"))
    proc = subprocess.Popen(["true"])
    proc.wait()
    dead_pid = proc.pid
    m = ckpt.read_manifest()
    m["buckets"]["0"] = {
        "state": "claimed", "stage": "s", "bucket": 0,
        "owner": "dead-run", "pid": dead_pid, "ts": time.time(),
    }
    with open(os.path.join(str(tmp_path / "c"), "manifest.json"), "w") as fh:
        json.dump(m, fh)

    df = _mk_input(spark)
    out = resumable_apply(
        spark, df, lambda part: part, ckpt,
        stage="s", bucket_col="k", n_buckets=2, sibling_wait_s=10.0,
    )
    assert sorted(r.k for r in out.collect()) == list(range(40))


# ---------------------------------------------------------------------------
# stateful sessions: below-range straggler bridging the first retained event
# ---------------------------------------------------------------------------


class _FakeState:
    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def _fold_batch(fold, state, ts_list):
    pdf = pd.DataFrame({"ts": pd.to_datetime(ts_list)})
    return list(fold((1,), iter([pdf]), state))[-1].iloc[0]


def test_stateful_fold_below_straggler_bridges_into_session():
    """State holds first_ts=12:00. A batch carrying [11:20, 11:40]: 11:20 is
    below-range (< 11:30), 11:40 is retained and within gap of both 11:20
    and 12:00 — the true timeline 11:20→11:40→12:00 is ONE session."""
    from geojson_spark.streaming.stateful import _session_fold

    fold = _session_fold(GAP_NS)
    st = _FakeState()
    _fold_batch(fold, st, ["2024-01-01 12:00:00"])
    row = _fold_batch(fold, st, ["2024-01-01 11:20:00", "2024-01-01 11:40:00"])
    assert row["n_events"] == 3
    assert row["n_sessions"] == 1, "below-range straggler double-counted the bridged session"


def test_stateful_fold_below_straggler_without_bridge_stays_separate():
    """Control: straggler gap-separated from the first retained event keeps
    its own session (10:00 vs 11:45 is a 105-min gap)."""
    from geojson_spark.streaming.stateful import _session_fold

    fold = _session_fold(GAP_NS)
    st = _FakeState()
    _fold_batch(fold, st, ["2024-01-01 12:00:00"])
    row = _fold_batch(fold, st, ["2024-01-01 10:00:00", "2024-01-01 11:45:00"])
    assert row["n_events"] == 3
    assert row["n_sessions"] == 2


# ---------------------------------------------------------------------------
# property keys Spark's JsonPathParser cannot express
# ---------------------------------------------------------------------------


def test_prop_rejects_inexpressible_keys():
    from geojson_spark.functions.properties import _json_path

    for bad in ("", "can't", "back\\slash"):
        with pytest.raises(ValueError, match="not expressible"):
            _json_path(bad)
    # sane keys still work
    assert _json_path("name") == "$.name"
    assert _json_path("a.b") == "$['a.b']"


def test_spark_json_path_bracket_names_verified_against_engine(spark):
    """Empirical record of what Spark 4.1.2's JsonPathParser actually
    resolves: '?' and '*' and spaces inside a quoted name WORK (so the
    guard must not reject them), while the empty name does not."""
    df = spark.createDataFrame([('{"a?b": 1, "a*b": 2, "": 3, "x y": 4}',)], "p string")

    def lookup(path):
        return df.select(F.get_json_object("p", path).alias("v")).first().v

    assert lookup("$['a?b']") == "1"
    assert lookup("$['a*b']") == "2"
    assert lookup("$['x y']") == "4"
    assert lookup("$['']") is None  # why _json_path("") raises

    from geojson_spark.functions.properties import prop

    assert df.select(prop(F.col("p"), "a?b").alias("v")).first().v == "1"
