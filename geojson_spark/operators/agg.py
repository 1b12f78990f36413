"""Aggregations: the bbox-union fold (G1) and salted skew-safe aggregation.

The bbox fold re-expresses the reference's ``FromIterator<Feature> for
FeatureCollection`` (src/feature_collection.rs:184-241) as Catalyst
partial+final hash aggregation — including its poison rules (:205-218):
the result is NULL if any member bbox is null, empty, odd-length, or
dimension-mismatched with the others. Test vector: [-1,-1,-1,1,1,1] ∪
[10,10,10,11,11,11] = [-1,-1,-1,11,11,11] (:250-268).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from geojson_spark.functions.spark_funcs import salt


def bbox_union_agg(df: DataFrame, group_cols: list[str], bbox_col: str = "bbox") -> DataFrame:
    """Per-group bbox union with reference poison semantics.

    Works for any (uniform within group) even dimension via posexplode →
    positional min/max → re-assembly, all built-in ops (two-stage hash agg
    + one re-agg; no UDF, no window).
    """
    b = F.col(bbox_col)
    # exists(null element): the reference cannot even PARSE a bbox with a
    # null member (Vec<f64>), so one must poison the group — min/max would
    # otherwise silently skip the nulls and emit a "clean" union computed
    # from a malformed member
    poison = F.when(
        b.isNull()
        | (F.size(b) == 0)
        | (F.size(b) % 2 != 0)
        | F.exists(b, lambda x: x.isNull()),
        F.lit(1),
    ).otherwise(F.lit(0))

    base = df.select(
        *group_cols,
        b.alias("_bbox"),
        poison.alias("_poison"),
        F.when(b.isNull(), F.lit(-1)).otherwise(F.size(b)).alias("_blen"),
    )
    # group-level poison + dim-mismatch detection
    flags = base.groupBy(*group_cols).agg(
        F.max("_poison").alias("_poisoned"),
        F.min("_blen").alias("_lmin"),
        F.max("_blen").alias("_lmax"),
    )
    exploded = base.where(F.col("_poison") == 0).select(
        *group_cols, F.col("_blen").alias("_n"), F.posexplode("_bbox").alias("_pos", "_val")
    )
    folded = exploded.groupBy(*group_cols, "_pos").agg(
        F.min(F.when(F.col("_pos") < F.col("_n") / 2, F.col("_val"))).alias("_mn"),
        F.max(F.when(F.col("_pos") >= F.col("_n") / 2, F.col("_val"))).alias("_mx"),
    )
    assembled = folded.groupBy(*group_cols).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("_pos"), F.coalesce("_mn", "_mx").alias("_v")))
        ).alias("_pairs")
    ).select(*group_cols, F.transform("_pairs", lambda s: s["_v"]).alias("_folded"))

    # eqNullSafe: NULL group keys are legitimate groups (groupBy folds
    # them into one), but a plain equi-join would never match them and
    # silently NULL their union
    cond = F.lit(True)
    for c in group_cols:
        cond = cond & flags[c].eqNullSafe(assembled[c])
    out = flags.join(assembled, cond, "left").select(
        *[flags[c] for c in group_cols],
        F.when(
            (F.col("_poisoned") == 1) | (F.col("_lmin") != F.col("_lmax")), F.lit(None)
        )
        .otherwise(F.col("_folded"))
        .alias("bbox"),
    )
    return out


def bbox_union_2d(df: DataFrame, group_cols: list[str], bbox_col: str = "bbox") -> DataFrame:
    """Fixed-2-D bbox union — pure min/max agg, SQL-oracle-reproducible."""
    b = F.col(bbox_col)
    bad = b.isNull() | (F.size(b) != 4) | F.exists(b, lambda x: x.isNull())
    agg = df.groupBy(*group_cols).agg(
        F.max(F.when(bad, 1).otherwise(0)).alias("_p"),
        F.min(F.try_element_at(b, F.lit(1))).alias("min_x"),
        F.min(F.try_element_at(b, F.lit(2))).alias("min_y"),
        F.max(F.try_element_at(b, F.lit(3))).alias("max_x"),
        F.max(F.try_element_at(b, F.lit(4))).alias("max_y"),
    )
    nul = F.lit(None).cast("double")
    return agg.select(
        *group_cols,
        *[
            F.when(F.col("_p") == 1, nul).otherwise(F.col(c)).alias(c)
            for c in ("min_x", "min_y", "max_x", "max_y")
        ],
    )


def salted_agg(
    df: DataFrame,
    key_col: str,
    aggs: dict[str, tuple[str, str]],
    *,
    salt_col: str = "image_id",
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation (north rule 'salted two-stage agg').

    ``aggs``: output name → (function, input column) with function in
    {count, sum, min, max}. Stage 1 aggregates on (key, salt) — map-side
    combine spreads a hot key over ``n_salts`` reducers; stage 2 merges.
    """
    fn1 = {"count": F.count, "sum": F.sum, "min": F.min, "max": F.max}
    fn2 = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}
    stage1 = df.withColumn("_salt", salt(F.col(salt_col), n_salts)).groupBy(
        key_col, "_salt"
    ).agg(*[fn1[f](c).alias(name) for name, (f, c) in aggs.items()])
    stage2 = stage1.groupBy(key_col).agg(
        *[fn2[f](name).alias(name) for name, (f, _) in aggs.items()]
    )
    return stage2


def tile_pyramid(
    points_with_cell: DataFrame,
    *,
    cell_col: str = "cell_id",
    factors: tuple[int, ...] = (1, 16, 256),
    value_col: str | None = None,
) -> DataFrame:
    """Multi-resolution tile rollup in ONE pass: every point explodes to
    (level, parent_tile) for each pyramid level (pure Column arithmetic —
    ``grid_parent`` is integer division on the packed cell id), then a
    single partial+final hash aggregate counts per (level, tile).

    This is the map-tile-pyramid build: levels = coarsening ``factors``
    over the base grid. One shuffle total regardless of level count —
    versus one aggregation per level, the map-side combine already
    collapses most of the explode fan-out, so the shuffled volume is
    ~Σ_level distinct tiles, not points × levels.

    With ``value_col``, also sums ``floor(value)`` per tile — the value is
    integerized PER ROW before summing (the one derivation Spark and a SQL
    oracle define identically), so fractional values undercount by up to
    1 per point; pre-scale to integer units (cents, milli) when the
    fractional part matters.
    """
    from geojson_spark.functions.spark_funcs import grid_parent

    levels = F.array(
        *[
            F.struct(
                F.lit(i).alias("level"),
                (
                    F.col(cell_col)
                    if f == 1
                    else grid_parent(F.col(cell_col), f)
                ).alias("tile_id"),
            )
            for i, f in enumerate(factors)
        ]
    )
    exploded = points_with_cell.select(
        F.explode(levels).alias("lt"),
        *( [F.col(value_col)] if value_col else [] ),
    ).select("lt.level", "lt.tile_id", *([value_col] if value_col else []))
    aggs = [F.count("*").alias("n_points")]
    if value_col:
        # floor, not cast: Spark's double→bigint cast truncates toward
        # zero while DuckDB's rounds — floor is the one integerization both
        # engines define identically (CLAUDE.md shared-derivation rule)
        aggs.append(F.sum(F.floor(F.col(value_col))).alias(f"sum_{value_col}"))
    return exploded.groupBy("level", "tile_id").agg(*aggs)
