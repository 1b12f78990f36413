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


def test_constructor_reference_vectors(spark):
    """Conversion vectors from the reference's from_geo_types tests
    (:300-360): Line→LineString, Triangle closes the ring, Rect winds
    from (max_x, min_y), MultiLineString / Polygon-with-hole nesting."""
    from geojson_spark.functions.constructors import (
        st_geometry_collection,
        st_line,
        st_linestring,
        st_multilinestring,
        st_multipoint,
        st_multipolygon,
        st_polygon,
        st_triangle,
    )
    from geojson_spark.sources.geojson import to_geometry_json

    lit = F.lit
    one = spark.range(1)

    def gj(col):
        return json.loads(one.select(to_geometry_json(col).alias("j")).first().j)

    assert gj(st_line(lit(1.0), lit(2.0), lit(3.0), lit(4.0))) == {
        "type": "LineString", "coordinates": [[1.0, 2.0], [3.0, 4.0]],
    }
    assert gj(st_triangle(lit(0.0), lit(0.0), lit(2.0), lit(0.0), lit(1.0), lit(1.0))) == {
        "type": "Polygon",
        "coordinates": [[[0.0, 0.0], [2.0, 0.0], [1.0, 1.0], [0.0, 0.0]]],
    }
    # RECT(0 0, 1 2) — from_geo_types.rs:321-333
    assert gj(st_rect(lit(0.0), lit(0.0), lit(1.0), lit(2.0))) == {
        "type": "Polygon",
        "coordinates": [[[1.0, 0.0], [1.0, 2.0], [0.0, 2.0], [0.0, 0.0], [1.0, 0.0]]],
    }
    mp = F.array(F.array(lit(1.0), lit(2.0)), F.array(lit(3.0), lit(4.0)))
    assert gj(st_multipoint(mp)) == {
        "type": "MultiPoint", "coordinates": [[1.0, 2.0], [3.0, 4.0]],
    }
    assert gj(st_linestring(mp)) == {
        "type": "LineString", "coordinates": [[1.0, 2.0], [3.0, 4.0]],
    }
    mls = F.array(
        F.array(F.array(lit(1.0), lit(2.0)), F.array(lit(3.0), lit(4.0))),
        F.array(F.array(lit(5.0), lit(6.0)), F.array(lit(7.0), lit(8.0))),
    )
    assert gj(st_multilinestring(mls)) == {
        "type": "MultiLineString",
        "coordinates": [[[1.0, 2.0], [3.0, 4.0]], [[5.0, 6.0], [7.0, 8.0]]],
    }
    # polygon with exterior + one hole (from_geo_types.rs:352-360)
    def ring(*pts):
        return F.array(*[F.array(lit(x), lit(y)) for x, y in pts])

    outer = ring((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0))
    hole = ring((1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0), (1.0, 1.0))
    poly = st_polygon(F.array(outer, hole))
    assert gj(poly) == {
        "type": "Polygon",
        "coordinates": [
            [[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]],
            [[1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 2.0], [1.0, 1.0]],
        ],
    }
    mpoly = st_multipolygon(F.array(F.array(outer, hole), F.array(hole)))
    assert gj(mpoly) == {
        "type": "MultiPolygon",
        "coordinates": [
            [
                [[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]],
                [[1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 2.0], [1.0, 1.0]],
            ],
            [[[1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 2.0], [1.0, 1.0]]],
        ],
    }
    gc = st_geometry_collection(F.array(st_point(lit(1.0), lit(2.0)), st_line(lit(1.0), lit(2.0), lit(3.0), lit(4.0))))
    assert gj(gc) == {
        "type": "GeometryCollection",
        "geometries": [
            {"type": "Point", "coordinates": [1.0, 2.0]},
            {"type": "LineString", "coordinates": [[1.0, 2.0], [3.0, 4.0]]},
        ],
    }


def test_extractors_invert_constructors(spark):
    from geojson_spark.functions.constructors import (
        expect_multi_polygon,
        expect_polygon,
        feature_geometry,
        line_string_positions,
        multi_line_string_lines,
        multi_point_positions,
        multi_polygon_polygons,
        polygon_rings,
        st_multilinestring,
        st_multipoint,
        st_multipolygon,
        st_polygon,
    )

    lit = F.lit

    def ring(*pts):
        return F.array(*[F.array(lit(x), lit(y)) for x, y in pts])

    outer = ring((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0))
    hole = ring((1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0), (1.0, 1.0))
    df = spark.range(1).select(
        st_polygon(F.array(outer, hole)).alias("poly"),
        st_multipolygon(F.array(F.array(outer, hole), F.array(hole))).alias("mpoly"),
        st_multipoint(ring((1.0, 2.0), (3.0, 4.0))).alias("mpt"),
        st_multilinestring(
            F.array(ring((1.0, 2.0), (3.0, 4.0)), ring((5.0, 6.0), (7.0, 8.0)))
        ).alias("mls"),
    )
    row = df.select(
        polygon_rings(F.col("poly")).alias("rings"),
        multi_polygon_polygons(F.col("mpoly")).alias("polys"),
        multi_point_positions(F.col("mpt")).alias("pts"),
        multi_line_string_lines(F.col("mls")).alias("lines"),
        line_string_positions(F.col("mpt")).alias("ls"),
    ).first()
    O = [[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]]
    H = [[1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 2.0], [1.0, 1.0]]
    assert row.rings == [O, H]
    assert row.polys == [[O, H], [H]]
    assert row.pts == [[1.0, 2.0], [3.0, 4.0]]
    assert row.lines == [[[1.0, 2.0], [3.0, 4.0]], [[5.0, 6.0], [7.0, 8.0]]]
    assert row.ls == [[1.0, 2.0], [3.0, 4.0]]

    # per-variant guards: pass-through on match, reference message on mismatch
    assert df.where(expect_polygon(F.col("poly"))).count() == 1
    assert df.where(expect_multi_polygon(F.col("mpoly"))).count() == 1
    with pytest.raises(Exception, match="Expected type: `Polygon`, but found `MultiPoint`"):
        df.where(expect_polygon(F.col("mpt"))).count()

    # Feature with no geometry → FeatureHasNoGeometry (to_geo_types.rs:219-224)
    nog = spark.range(1).select(
        F.lit(None).cast(df.schema["poly"].dataType).alias("geometry")
    )
    assert df.where(feature_geometry(F.col("poly"))).count() == 1
    with pytest.raises(Exception, match="without a geometry"):
        nog.where(feature_geometry(F.col("geometry"))).count()


def test_geometry_collection_to_features(spark):
    from geojson_spark.functions.constructors import (
        geometry_collection_to_features,
        st_geometry_collection,
        st_line,
        st_point,
    )

    lit = F.lit
    df = spark.range(1).select(
        st_geometry_collection(
            F.array(st_point(lit(1.0), lit(2.0)), st_line(lit(1.0), lit(2.0), lit(3.0), lit(4.0)))
        ).alias("geometry")
    )
    feats = geometry_collection_to_features(df)
    rows = feats.select("child_idx", "feature.geometry.geom_type").orderBy("child_idx").collect()
    assert [(r.child_idx, r.geom_type) for r in rows] == [(0, "Point"), (1, "LineString")]
    # Feature envelope per feature.rs:140-150: no id/properties, bbox copied (None here)
    f = feats.select("feature.id_json", "feature.properties", "feature.bbox").first()
    assert f.id_json is None and f.properties is None and f.bbox is None


def test_pretty_print():
    src = '{"type":"Point","coordinates":[100.0,0.5]}'
    kind, g = parse_geojson(src)
    pretty = serialize_geojson_pretty(kind, g)
    assert "\n" in pretty and '"type": "Point"' in pretty
    # reparse → compact identical
    k2, g2 = parse_geojson(pretty)
    assert serialize_geojson(k2, g2) == src


def test_field_level_parse_udfs(spark):
    """C2/C3 — field-level geometry parse and single-feature parse, with
    the reference's ExpectedType on kind mismatch (src/geojson.rs:118-150)."""
    from geojson_spark.sources.geojson import parse_feature_udf, parse_geometry_udf

    df = spark.createDataFrame(
        [
            ('{"type":"Point","coordinates":[1.0,2.0]}',
             '{"type":"Feature","geometry":{"type":"Point","coordinates":[3.0,4.0]},'
             '"properties":{"a":1},"id":7}'),
            (None, None),
        ],
        "gj string, fj string",
    )
    rows = df.select(
        parse_geometry_udf(F.col("gj")).alias("g"),
        parse_feature_udf(F.col("fj")).alias("f"),
    ).collect()
    got = {r.g.geom_type: r for r in rows}
    assert got[None] is not None  # null input stays null
    ok = got["Point"]
    assert ok.g.coords == [1.0, 2.0]
    assert ok.f.geometry.coords == [3.0, 4.0] and ok.f.id_json == "7"
    assert json.loads(ok.f.properties) == {"a": 1}

    # kind mismatch raises the reference's ExpectedType message
    fc = spark.createDataFrame(
        [('{"type":"FeatureCollection","features":[]}',)], "doc string"
    )
    with pytest.raises(Exception, match="Expected GeoJSON type `Geometry`, found `FeatureCollection`"):
        fc.select(parse_geometry_udf(F.col("doc")).alias("g")).collect()
    with pytest.raises(Exception, match="Expected GeoJSON type `Feature`, found `FeatureCollection`"):
        fc.select(parse_feature_udf(F.col("doc")).alias("f")).collect()
    # permissive mode nulls out instead
    deg = fc.select(parse_geometry_udf(F.col("doc"), strict=False).alias("g")).first()
    assert deg.g.geom_type is None


def test_geojson_kind_extractors():
    from geojson_spark.functions.geojson_codec import (
        geojson_to_feature,
        geojson_to_feature_collection,
        geojson_to_geometry,
        parse_geojson,
    )

    k, obj = parse_geojson('{"type":"Point","coordinates":[1.0,2.0]}')
    assert geojson_to_geometry(k, obj)["geom_type"] == "Point"
    with pytest.raises(Exception, match="Expected GeoJSON type `FeatureCollection`, found `Geometry`"):
        geojson_to_feature_collection(k, obj)
    with pytest.raises(Exception, match="Expected GeoJSON type `Feature`, found `Geometry`"):
        geojson_to_feature(k, obj)


def test_geometries_to_collection(spark):
    from geojson_spark.functions.constructors import geometries_to_collection, st_point

    df = spark.range(3).select(
        st_point(F.col("id").cast("double"), F.lit(1.0)).alias("geometry")
    )
    gc = geometries_to_collection(df).first().geometry
    assert gc.geom_type == "GeometryCollection"
    children = json.loads(gc.geoms_json)
    assert {tuple(c["coordinates"]) for c in children} == {(0.0, 1.0), (1.0, 1.0), (2.0, 1.0)}


def test_geometry_measures(spark):
    from geojson_spark.functions.constructors import st_rect, st_triangle
    from geojson_spark.functions.measures import st_area, st_centroid_xy, st_perimeter

    lit = F.lit
    df = spark.range(1).select(
        st_rect(lit(0.0), lit(0.0), lit(2.0), lit(1.0)).alias("r"),
        st_triangle(lit(0.0), lit(0.0), lit(4.0), lit(0.0), lit(0.0), lit(3.0)).alias("t"),
    )
    cx, cy = st_centroid_xy(F.col("r"))
    tcx, tcy = st_centroid_xy(F.col("t"))
    row = df.select(
        st_area(F.col("r")).alias("ra"),
        st_perimeter(F.col("r")).alias("rp"),
        cx.alias("rcx"), cy.alias("rcy"),
        st_area(F.col("t")).alias("ta"),
        st_perimeter(F.col("t")).alias("tp"),
        tcx.alias("tcx"), tcy.alias("tcy"),
    ).first()
    assert row.ra == 2.0 and row.rp == 6.0
    assert row.rcx == 1.0 and row.rcy == 0.5  # vertex mean of the 4 corners
    assert row.ta == 6.0 and row.tp == 12.0  # 3-4-5 right triangle
    assert abs(row.tcx - 4.0 / 3.0) < 1e-15 and abs(row.tcy - 1.0) < 1e-15


def test_measures_use_first_ring_only(spark):
    """A polygon with a hole: area/perimeter fold must stop at the first
    ring (no phantom bridge edges, no hole contributions)."""
    from geojson_spark.functions.constructors import st_polygon
    from geojson_spark.functions.measures import st_area, st_perimeter

    lit = F.lit

    def ring(*pts):
        return F.array(*[F.array(lit(x), lit(y)) for x, y in pts])

    outer = ring((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0))
    hole = ring((1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0), (1.0, 1.0))
    row = (
        spark.range(1)
        .select(st_polygon(F.array(outer, hole)).alias("g"))
        .select(st_area(F.col("g")).alias("a"), st_perimeter(F.col("g")).alias("p"))
        .first()
    )
    assert row.a == 16.0  # outer ring only
    assert row.p == 16.0
