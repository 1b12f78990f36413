"""Tests: typed projections (C1/S5), property algebra (A1-A6), geometry
constructors/extractors (C6/C7), pretty print (S2)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from geojson_spark.functions.constructors import (
    expect_geometry,
    point_x,
    point_y,
    st_point,
    st_rect,
)
from geojson_spark.functions.geojson_codec import (
    parse_geojson,
    serialize_geojson,
    serialize_geojson_pretty,
)
from geojson_spark.functions.properties import (
    contains_prop,
    len_props,
    prop,
    props_entries,
    remove_prop,
    set_prop,
)
from geojson_spark.sources.geojson import features_to_table, table_to_features, to_feature_json


@pytest.fixture(scope="module")
def feature_df(spark, tmp_path_factory):
    from geojson_spark.sources.geojson import read_geojson

    p = tmp_path_factory.mktemp("fc")
    (p / "fc.geojson").write_text(
        json.dumps(
            {
                "type": "FeatureCollection",
                "features": [
                    {"type": "Feature", "id": i,
                     "geometry": {"type": "Point", "coordinates": [float(i), float(i) / 2]},
                     "properties": {"name": f"f{i}", "pop": i * 10}}
                    for i in range(6)
                ],
            }
        )
    )
    return read_geojson(spark, str(p)).cache()


def test_features_to_table_flattens(feature_df):
    schema = StructType([StructField("name", StringType()), StructField("pop", IntegerType())])
    t = features_to_table(feature_df, schema)
    rows = {r.name: r for r in t.collect()}
    assert rows["f3"].pop == 30
    assert rows["f3"].geometry.geom_type == "Point"
    assert "foreign_members" not in t.columns  # dropped (de.rs:467-469)


def test_table_to_features_roundtrip(spark, feature_df):
    schema = StructType([StructField("name", StringType()), StructField("pop", IntegerType())])
    t = features_to_table(feature_df, schema).withColumn(
        "id_num", F.col("pop") / 10
    )
    back = table_to_features(t.select("geometry", "name", "pop"), geometry_col="geometry")
    j = back.select(to_feature_json(F.struct(
        "feature_idx", "geometry", "bbox", "id_json", "properties", "foreign_members"
    )).alias("j")).collect()
    objs = [json.loads(r.j) for r in j]
    assert {o["properties"]["name"] for o in objs} == {f"f{i}" for i in range(6)}
    assert all(o["geometry"]["type"] == "Point" for o in objs)


def test_table_to_features_missing_geometry(spark):
    from geojson_spark.errors import MalformedGeoJson

    df = spark.range(3)
    with pytest.raises(MalformedGeoJson, match="missing `geometry` field"):
        table_to_features(df)


def test_property_algebra(feature_df):
    df = feature_df
    assert df.where(contains_prop(F.col("properties"), "name")).count() == 6
    vals = df.select(prop(F.col("properties"), "pop").alias("v")).collect()
    assert sorted(int(r.v) for r in vals) == [0, 10, 20, 30, 40, 50]
    upd = df.select(set_prop(F.col("properties"), "tag", "x").alias("p"))
    assert all(json.loads(r.p)["tag"] == "x" for r in upd.collect())
    rem = df.select(remove_prop(F.col("properties"), "pop").alias("p"))
    assert all("pop" not in json.loads(r.p) for r in rem.collect())
    assert df.select(len_props(F.col("properties")).alias("n")).first().n == 2
    entries = props_entries(df)
    assert entries.count() == 12
    assert set(r.prop_key for r in entries.collect()) == {"name", "pop"}


def test_constructors_and_extractors(spark):
    df = spark.createDataFrame([(1.5, 2.5)], "x double, y double").select(
        st_point(F.col("x"), F.col("y")).alias("g"),
        st_rect(F.lit(0.0), F.lit(0.0), F.lit(2.0), F.lit(1.0)).alias("r"),
    )
    row = df.first()
    assert row.g.geom_type == "Point" and row.g.coords == [1.5, 2.5]
    assert row.r.geom_type == "Polygon" and len(row.r.coords) == 10  # 5-point wound ring
    assert df.select(point_x(F.col("g")).alias("x")).first().x == 1.5
    assert df.select(point_y(F.col("g")).alias("y")).first().y == 2.5
    # type guard passes for Point, raises for mismatch
    assert df.where(expect_geometry(F.col("g"), "Point")).count() == 1
    with pytest.raises(Exception, match="Expected type: `LineString`, but found `Point`"):
        df.where(expect_geometry(F.col("g"), "LineString")).count()


def test_pretty_print():
    src = '{"type":"Point","coordinates":[100.0,0.5]}'
    kind, g = parse_geojson(src)
    pretty = serialize_geojson_pretty(kind, g)
    assert "\n" in pretty and '"type": "Point"' in pretty
    # reparse → compact identical
    k2, g2 = parse_geojson(pretty)
    assert serialize_geojson(k2, g2) == src
