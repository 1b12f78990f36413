"""Iceberg-style checkpoint table: per-partition lineage + resumable stages.

The container has no Iceberg runtime (SURVEY.md environment facts), so the
"Iceberg table" contract is emulated the way Iceberg itself works: immutable
data files + an atomically-swapped JSON manifest (write-temp + ``os.replace``).
That gives the two properties the north rule needs — atomic visibility of
completed work and partition-granular resume.

Layout under ``root``:
    manifest.json                 {"buckets": {bucket: {"rows": n, ...}}, "seq": k}
    data/bucket=<b>/part.parquet  output rows of bucket b
    lineage/<stage>-<b>.json      per-bucket lineage record

``resumable_apply`` splits the input on a bucket column, skips buckets the
manifest marks complete, processes the rest through the caller's
DataFrame→DataFrame function, and appends lineage (rows_in, rows_out,
wall_ms, partition count) per bucket. A killed job re-runs only missing
buckets; outputs are union(previous parquet, new work).
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CheckpointTable:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "data"), exist_ok=True)
        os.makedirs(os.path.join(root, "lineage"), exist_ok=True)

    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.root, "manifest.json")

    def read_manifest(self) -> dict:
        try:
            with open(self._manifest_path, encoding="utf-8") as fh:
                return json.load(fh)
        except FileNotFoundError:
            return {"buckets": {}, "seq": 0}

    def commit_bucket(self, bucket: int, record: dict) -> None:
        """Atomic manifest swap — the Iceberg commit protocol in miniature."""
        m = self.read_manifest()
        m["buckets"][str(bucket)] = record
        m["seq"] += 1
        tmp = self._manifest_path + f".tmp{os.getpid()}"
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(m, fh)
        os.replace(tmp, self._manifest_path)

    def completed_buckets(self) -> set[int]:
        return {int(b) for b in self.read_manifest()["buckets"]}

    def bucket_data_path(self, bucket: int) -> str:
        return os.path.join(self.root, "data", f"bucket={bucket}")

    def write_lineage(self, stage: str, bucket: int, record: dict) -> None:
        p = os.path.join(self.root, "lineage", f"{stage}-{bucket}.json")
        tmp = p + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(record, fh)
        os.replace(tmp, p)

    def lineage(self) -> list[dict]:
        out = []
        d = os.path.join(self.root, "lineage")
        for fn in sorted(os.listdir(d)):
            if fn.endswith(".json"):
                with open(os.path.join(d, fn), encoding="utf-8") as fh:
                    out.append(json.load(fh))
        return out


def resumable_apply(
    spark: SparkSession,
    df: DataFrame,
    fn: Callable[[DataFrame], DataFrame],
    ckpt: CheckpointTable,
    *,
    stage: str,
    bucket_col: str,
    n_buckets: int,
    fail_after: int | None = None,
) -> DataFrame:
    """Run ``fn`` bucket-by-bucket with checkpoint/resume.

    ``bucket_col`` is hashed into ``n_buckets`` work units (the north rule's
    'explicit repartitioning by H3 prefix' — pass a cell/cell-prefix column).
    ``fail_after`` kills the job after N buckets (for kill→resume tests).
    Returns the full output (previously checkpointed ∪ newly computed).
    """
    bucketed = df.withColumn("_bucket", F.pmod(F.xxhash64(F.col(bucket_col)), F.lit(n_buckets)))
    done = ckpt.completed_buckets()
    todo = [b for b in range(n_buckets) if b not in done]

    processed = 0
    for b in todo:
        if fail_after is not None and processed >= fail_after:
            raise RuntimeError(f"simulated failure after {processed} buckets")
        t0 = time.time()
        part = bucketed.where(F.col("_bucket") == b).drop("_bucket")
        rows_in = part.count()
        out = fn(part)
        out_path = ckpt.bucket_data_path(b)
        out.write.mode("overwrite").parquet(out_path)
        rows_out = spark.read.parquet(out_path).count()
        wall_ms = int((time.time() - t0) * 1000)
        rec = {
            "stage": stage,
            "bucket": b,
            "rows_in": rows_in,
            "rows_out": rows_out,
            "wall_ms": wall_ms,
            "partitions": out.rdd.getNumPartitions() if rows_out else 0,
        }
        ckpt.write_lineage(stage, b, rec)
        ckpt.commit_bucket(b, rec)
        processed += 1

    paths = [ckpt.bucket_data_path(b) for b in sorted(ckpt.completed_buckets())]
    paths = [p for p in paths if os.path.exists(p)]
    return spark.read.parquet(*paths)


def partition_metrics(df: DataFrame, stage: str) -> DataFrame:
    """Per-partition row counts + cell range — the lineage record the north
    rule asks to land 'after every stage'. Pure mapInPandas; cheap."""
    import pandas as pd

    def count(it):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        n = 0
        for pdf in it:
            n += len(pdf)
        yield pd.DataFrame({"stage": [stage], "partition_id": [pid], "rows": [n]})

    return df.mapInPandas(count, schema="stage string, partition_id int, rows long")
