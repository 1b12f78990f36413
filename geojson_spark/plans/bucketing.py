"""Bucketed (co-located) joins — the shuffle-elimination lever for big
fact-to-fact joins.

Spark's bucketing writes each table pre-hash-partitioned on the join key
into a fixed number of buckets. When both sides of an equi-join are
bucketed on the key with the same bucket count, the join needs NO Exchange
at all: each task zips bucket i of both tables. At the 100 TB design point
this converts the biggest recurring shuffle (e.g. lineitem ⋈ orders, or
image-cells ⋈ tile-metadata on cell prefix) into a scan-side merge — pay
the shuffle once at write time, reuse it for every subsequent join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    *,
    bucket_col: str,
    n_buckets: int,
    path: str,
    sort_col: str | None = None,
) -> None:
    """Persist ``df`` as an external bucketed table at ``path``.

    ``sort_col`` additionally sorts within buckets (enables sort-merge
    without a per-task sort). Overwrites any existing table of that name.

    ``table_name`` is validated up front (the built-in catalog only
    accepts ``[A-Za-z0-9_]`` parts — a name like 'tiles-v2' fails DEEP
    inside saveAsTable otherwise) and backtick-quoted before being
    interpolated into the DROP statement, closing the SQL-injection hole
    an unquoted caller-supplied name would open.
    """
    import re

    if not re.fullmatch(r"[A-Za-z0-9_]+(\.[A-Za-z0-9_]+)*", table_name):
        raise ValueError(
            f"invalid table name {table_name!r}: parts must match [A-Za-z0-9_]+"
        )
    quoted = ".".join(f"`{part}`" for part in table_name.split("."))
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {quoted}")
    w = df.write.mode("overwrite").option("path", path).bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.saveAsTable(quoted)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Equi-join two same-bucketed tables; with matching bucket specs the
    physical plan contains no Exchange (verify with .explain)."""
    return spark.table(left_table).join(spark.table(right_table), on)
