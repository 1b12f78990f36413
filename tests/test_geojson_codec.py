"""Conformance corpus + error-path tests for the pure-Python codec.

Mirrors the reference's golden-file round-trip test
(/root/reference/tests/roundtrip.rs:28-65): parse each of the 16 canonical
fixtures, serialize, reparse as plain JSON, and compare *semantically* to the
original — plus the in-module error tests of src/geometry.rs:624-780 and
src/feature.rs:251-473. Fixture contents are embedded as literals (values
copied, per SURVEY.md §5), not read from the reference tree.
"""

from __future__ import annotations

import json

import pytest

from geojson_spark.errors import (
    GeometryCollectionWithoutGeometriesKey,
    GeometryWithoutCoordinatesKey,
    InvalidGeometryDimensions,
    MalformedGeoJson,
    PositionTooShort,
)
from geojson_spark.functions.geojson_codec import parse_geojson, serialize_geojson

# The 16 canonical fixtures (tests/fixtures/canonical/*.geojson, enumerated
# at tests/roundtrip.rs:28-45), embedded verbatim.
FIXTURES = {
    "good-feature-with-id": '{ "type": "Feature", "id": 100, "geometry": {"type": "Point", "coordinates": [102.0, 0.5]}, "properties": {"prop0": "value0"} }',
    "good-feature-with-string-id": '{ "type": "Feature", "id": "myfeature", "geometry": {"type": "Point", "coordinates": [102.0, 0.5]}, "properties": {"prop0": "value0"} }',
    "good-feature": '{ "type": "Feature", "bbox": [102.0, 0.5, 102.0, 0.5], "geometry": {"type": "Point", "coordinates": [102.0, 0.5]}, "properties": {"prop0": "value0"} }',
    "good-featurecollection-bbox": '{ "type": "FeatureCollection", "bbox": [100.0, 0.5, 102.0, 2.5], "features": [ { "type": "Feature", "geometry": {"type": "Point", "coordinates": [102.0, 0.5]}, "properties": {"prop0": "value0"} }, { "type": "Feature", "geometry": {"type": "Point", "coordinates": [100.0, 2.5]}, "properties": {"prop0": "value0"} } ] }',
    "good-featurecollection-bbox3d": '{ "type": "FeatureCollection", "bbox": [100.0, 0.5, 15.0, 102.0, 2.5, 25.0], "features": [ { "type": "Feature", "geometry": {"type": "Point", "coordinates": [102.0, 0.5, 15.0]}, "properties": {"prop0": "value0"} }, { "type": "Feature", "geometry": {"type": "Point", "coordinates": [100.0, 2.5, 25.0]}, "properties": {"prop0": "value0"} } ] }',
    "good-featurecollection-extensions": '{ "type": "FeatureCollection", "custom": true, "features": [ { "type": "Feature", "geometry": { "type": "Point", "custom": true, "coordinates": [102.0, 0.5]}, "properties": {"prop0": "value0"}, "custom": true }, { "type": "Feature", "geometry": { "type": "LineString", "custom": true, "coordinates": [ [102.0, 0.0], [103.0, 1.0], [104.0, 0.0], [105.0, 1.0] ] }, "properties": { "prop0": "value0", "prop1": 0.0 } }, { "type": "Feature", "geometry": { "type": "Polygon", "custom": true, "coordinates": [ [ [100.0, 0.0], [101.0, 0.0], [101.0, 1.0], [100.0, 1.0], [100.0, 0.0] ] ] }, "properties": { "prop0": "value0", "prop1": {"this": "that"} } } ] }',
    "good-featurecollection": '{ "type": "FeatureCollection", "features": [ { "type": "Feature", "geometry": {"type": "Point", "coordinates": [102.0, 0.5]}, "properties": {"prop0": "value0"} }, { "type": "Feature", "geometry": { "type": "LineString", "coordinates": [ [102.0, 0.0], [103.0, 1.0], [104.0, 0.0], [105.0, 1.0] ] }, "properties": { "prop0": "value0", "prop1": 0.0 } }, { "type": "Feature", "geometry": { "type": "Polygon", "coordinates": [ [ [100.0, 0.0], [101.0, 0.0], [101.0, 1.0], [100.0, 1.0], [100.0, 0.0] ] ] }, "properties": { "prop0": "value0", "prop1": {"this": "that"} } } ] }',
    "good-geometrycollection": '{ "type": "GeometryCollection", "geometries": [ { "type": "Point", "coordinates": [100.0, 0.0] }, { "type": "LineString", "coordinates": [ [101.0, 0.0], [102.0, 1.0] ] } ] }',
    "good-linestring": '{ "type": "LineString", "coordinates": [ [100.0, 0.0], [101.0, 1.0] ] }',
    "good-multilinestring": '{ "type": "MultiLineString", "coordinates": [ [ [100.0, 0.0], [101.0, 1.0] ], [ [102.0, 2.0], [103.0, 3.0] ] ] }',
    "good-multipoint": '{ "type": "MultiPoint", "coordinates": [[100.0, 0.0]] }',
    "good-point-3d": '{ "type": "Point", "coordinates": [100.0, 0.0, 15.0] }',
    "good-point": '{ "type": "Point", "coordinates": [100.0, 0.0] }',
    "good-polygon": '{ "type": "Polygon", "coordinates": [ [ [100.0, 0.0], [101.0, 0.0], [101.0, 1.0], [100.0, 1.0], [100.0, 0.0] ] ] }',
    "multipolygon": '{ "type": "MultiPolygon", "coordinates": [ [[[102.0, 2.0], [103.0, 2.0], [103.0, 3.0], [102.0, 3.0], [102.0, 2.0]]], [[[100.0, 0.0], [101.0, 0.0], [101.0, 1.0], [100.0, 1.0], [100.0, 0.0]], [[100.2, 0.2], [100.2, 0.8], [100.8, 0.8], [100.8, 0.2], [100.2, 0.2]]] ] }',
    "nullgeometry": '{ "type": "FeatureCollection", "features": [{ "type": "Feature", "properties": {}, "geometry": null }] }',
}


def norm(v):
    """Numeric-insensitive JSON tree normalization (102 == 102.0)."""
    if isinstance(v, dict):
        return {k: norm(x) for k, x in v.items()}
    if isinstance(v, list):
        return [norm(x) for x in v]
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return float(v)
    return v


@pytest.mark.parametrize("name", sorted(FIXTURES))
def test_roundtrip_canonical(name):
    src = FIXTURES[name]
    kind, obj = parse_geojson(src)
    out = serialize_geojson(kind, obj)
    assert norm(json.loads(out)) == norm(json.loads(src))
    # idempotence: second round-trip is byte-stable
    kind2, obj2 = parse_geojson(out)
    assert serialize_geojson(kind2, obj2) == out


def test_feature_id_roundtrip_exact():
    # src/feature.rs:395-436 — byte-exact encode incl. key order
    s = '{"type":"Feature","geometry":{"type":"Point","coordinates":[1.1,2.1]},"id":0,"properties":{}}'
    kind, f = parse_geojson(s)
    assert kind == "Feature"
    assert serialize_geojson(kind, f) == s
    s2 = '{"type":"Feature","geometry":{"type":"Point","coordinates":[1.1,2.1]},"id":"foo","properties":{}}'
    kind, f = parse_geojson(s2)
    assert serialize_geojson(kind, f) == s2


def test_id_null_is_none():
    # src/feature.rs:459-473
    kind, f = parse_geojson('{"type":"Feature","geometry":null,"id":null,"properties":null}')
    assert f["id_json"] is None
    assert serialize_geojson(kind, f) == '{"type":"Feature","geometry":null,"properties":null}'


def test_invalid_id():
    # src/feature.rs:439-456
    with pytest.raises(MalformedGeoJson, match="Feature 'id' must be a string or a number"):
        parse_geojson('{"type":"Feature","geometry":null,"id":{},"properties":null}')


def test_position_too_short():
    # src/geometry.rs:767-779
    with pytest.raises(PositionTooShort, match="got `1`"):
        parse_geojson('{"type":"Point","coordinates":[23.42]}')
    with pytest.raises(PositionTooShort, match="got `0`"):
        parse_geojson('{"type":"Point","coordinates":[]}')


def test_invalid_dimensions():
    with pytest.raises(InvalidGeometryDimensions, match="`Point`.*dimensions: 1"):
        parse_geojson('{"type":"Point","coordinates":[[1.0,2.0]]}')
    with pytest.raises(InvalidGeometryDimensions, match="`LineString`"):
        parse_geojson('{"type":"LineString","coordinates":[[[1.0,2.0]]]}')
    with pytest.raises(InvalidGeometryDimensions, match="`Polygon`"):
        parse_geojson('{"type":"Polygon","coordinates":[1.0,2.0]}')


def test_missing_keys():
    with pytest.raises(GeometryWithoutCoordinatesKey, match="`Point` with no `coordinates` key"):
        parse_geojson('{"type":"Point"}')
    with pytest.raises(GeometryCollectionWithoutGeometriesKey):
        parse_geojson('{"type":"GeometryCollection"}')
    with pytest.raises(MalformedGeoJson, match="missing field `features`"):
        parse_geojson('{"type":"FeatureCollection"}')


def test_empty_coordinates_special_cases():
    # geometry.rs:537-544 (Polygon []), 560-566 (MLS []), 575-581 (MP [])
    for t in ("Polygon", "MultiLineString", "MultiPolygon", "MultiPoint", "LineString"):
        kind, g = parse_geojson('{"type":"%s","coordinates":[]}' % t)
        assert serialize_geojson(kind, g) == '{"type":"%s","coordinates":[]}' % t


def test_tokenizer_errors_carry_line_and_column():
    # Reference parity (CHANGES.md:34-38): v1.0.0 errors carry position via
    # serde_json::Error. A malformed token on line 3 must surface 1-based
    # line/column both structurally and in the message.
    bad = '{"type":"Point",\n"coordinates":\n[1.0,]\n}'
    with pytest.raises(MalformedGeoJson) as ei:
        parse_geojson(bad)
    assert ei.value.lineno == 3
    assert ei.value.colno == 6
    assert "line 3 column 6" in str(ei.value)
    # semantic (post-tokenizer) errors have no single source position
    with pytest.raises(MalformedGeoJson) as ei:
        parse_geojson('{"coordinates":[1.0,2.0]}')
    assert ei.value.lineno is None and ei.value.colno is None


def test_bad_documents():
    with pytest.raises(MalformedGeoJson):
        parse_geojson("[]")
    with pytest.raises(MalformedGeoJson, match="missing field `type`"):
        parse_geojson('{"coordinates":[1.0,2.0]}')
    with pytest.raises(MalformedGeoJson):
        parse_geojson("not json at all")
    with pytest.raises(MalformedGeoJson, match="coordinate nesting too deep"):
        parse_geojson('{"type":"MultiPolygon","coordinates":[[[[[1.0,2.0]]]]]}')


def test_foreign_members_preserved_and_normalized():
    # geometry-level foreign member; empty map → absent (util.rs:18-24)
    kind, g = parse_geojson('{"type":"Point","coordinates":[1.0,2.0],"extra":{"a":1}}')
    out = serialize_geojson(kind, g)
    assert json.loads(out)["extra"] == {"a": 1}
    kind, f = parse_geojson('{"type":"Feature","geometry":null,"properties":null}')
    assert f["foreign_members"] is None


def test_nested_geometrycollection():
    # src/geometry.rs:735-752 — recursive GC
    s = '{"type":"GeometryCollection","geometries":[{"type":"GeometryCollection","geometries":[{"type":"Point","coordinates":[1.0,2.0]}]}]}'
    kind, g = parse_geojson(s)
    assert serialize_geojson(kind, g) == s


def test_3d_dimension_preserved():
    kind, g = parse_geojson('{"type":"LineString","coordinates":[[1.0,2.0,3.0],[4.0,5.0,6.0]]}')
    assert g["dim"] == 3
    assert json.loads(serialize_geojson(kind, g))["coordinates"][1] == [4.0, 5.0, 6.0]


def test_mixed_dim_ragged_fallback_roundtrips():
    s = '{"type":"LineString","coordinates":[[1.0,2.0],[3.0,4.0,5.0]]}'
    kind, g = parse_geojson(s)
    assert g["dim"] == -1
    assert norm(json.loads(serialize_geojson(kind, g))) == norm(json.loads(s))


def test_properties_always_emitted():
    # src/feature.rs:84-87
    kind, f = parse_geojson('{"type":"Feature","geometry":null}')
    assert serialize_geojson(kind, f) == '{"type":"Feature","geometry":null,"properties":null}'


def test_empty_ring_and_null_key_reference_semantics():
    """Corner-case parity with the reference's RawGeometry dispatch
    (geometry.rs:382-621): nested empty arrays classify one level deeper,
    explicit null == missing key, a primitive type with a geometries key
    is an invalid combination, and NaN/Infinity literals are rejected at
    parse."""
    import pytest

    from geojson_spark.errors import (
        GeometryCollectionWithoutGeometriesKey,
        GeometryWithoutCoordinatesKey,
        InvalidGeometryDimensions,
        MalformedGeoJson,
    )
    from geojson_spark.functions.geojson_codec import parse_geojson, serialize_geojson

    def rt(doc):
        k, o = parse_geojson(doc)
        return serialize_geojson(k, o)

    # empty rings are VALID for Polygon/MultiPolygon and round-trip
    assert rt('{"type":"Polygon","coordinates":[[]]}') == '{"type":"Polygon","coordinates":[[]]}'
    assert (
        rt('{"type":"MultiPolygon","coordinates":[[[]]]}')
        == '{"type":"MultiPolygon","coordinates":[[[]]]}'
    )
    # ...but a nested empty is dims=2 for MultiPoint (invalid)
    with pytest.raises(InvalidGeometryDimensions, match="`MultiPoint`.*dimensions: 2"):
        parse_geojson('{"type":"MultiPoint","coordinates":[[]]}')
    # explicit null == missing key (serde Option semantics)
    with pytest.raises(GeometryWithoutCoordinatesKey):
        parse_geojson('{"type":"Point","coordinates":null}')
    with pytest.raises(GeometryCollectionWithoutGeometriesKey):
        parse_geojson('{"type":"GeometryCollection","geometries":null}')
    # primitive type + geometries key = invalid combination
    with pytest.raises(InvalidGeometryDimensions, match="`Point`.*dimensions: 0"):
        parse_geojson('{"type":"Point","coordinates":[1,2],"geometries":[]}')
    # serde rejects the non-standard literals Python json would accept
    with pytest.raises(MalformedGeoJson, match="Infinity"):
        parse_geojson('{"type":"Point","coordinates":[1,2],"x":Infinity}')
    # ryu-style exponent text
    assert rt('{"type":"Point","coordinates":[1e16,1e-5]}') == (
        '{"type":"Point","coordinates":[1e16,1e-5]}'
    )
    # a bare geometry's id/properties keys are FOREIGN MEMBERS (RawGeometry
    # reserves only type/coordinates/geometries/bbox) and round-trip
    assert '"id":7' in rt(
        '{"type":"Feature","geometry":{"type":"Point","coordinates":[1,2],"id":7},'
        '"properties":null}'
    )
    # an empty position among real ones routes to the raw fallback and
    # round-trips instead of corrupting the offset arrays
    assert rt('{"type":"LineString","coordinates":[[1,2],[]]}') == (
        '{"type":"LineString","coordinates":[[1.0,2.0],[]]}'
    )
