"""Engine schemas: the geometry struct column and the image table.

One DataFrame row = one GeoJSON Feature (SURVEY.md §1.2). The geometry is a
fixed struct with flat Arrow-friendly buffers — the columnar inversion of the
reference's document tree (src/geometry.rs:240-260, src/feature.rs:63-96).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Columnar geometry (see functions/geojson_codec.py module docstring for the
# offsets encoding). geoms_json carries GeometryCollection children (Spark
# structs cannot recurse — SURVEY.md §7.3) and the ragged mixed-dim fallback.
GEOMETRY_STRUCT = StructType(
    [
        StructField("geom_type", StringType()),
        StructField("coords", ArrayType(DoubleType())),
        StructField("ring_offsets", ArrayType(IntegerType())),
        StructField("part_offsets", ArrayType(IntegerType())),
        StructField("dim", IntegerType()),
        StructField("geoms_json", StringType()),
        StructField("bbox", ArrayType(DoubleType())),
        StructField("foreign_members", StringType()),
    ]
)

# One Feature row. id_json holds the JSON literal ("\"foo\"" vs "0") so the
# string|number id union round-trips exactly (src/feature.rs:244-249).
FEATURE_SCHEMA = StructType(
    [
        StructField("feature_idx", LongType()),
        StructField("geometry", GEOMETRY_STRUCT),
        StructField("bbox", ArrayType(DoubleType())),
        StructField("id_json", StringType()),
        StructField("properties", StringType()),
        StructField("foreign_members", StringType()),
    ]
)

# The north-rule input table (BASELINE.json input_hint).
IMAGE_SCHEMA = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("bytes", BinaryType(), False),
        StructField("w", IntegerType(), False),
        StructField("h", IntegerType(), False),
        StructField("fmt", StringType(), False),
        StructField("caption", StringType(), False),
        StructField("phash", LongType(), False),
        StructField("lon", DoubleType(), False),
        StructField("lat", DoubleType(), False),
    ]
)
