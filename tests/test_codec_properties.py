"""Property-based round-trip tests for the GeoJSON codec (hypothesis).

The reference pins fidelity with 16 canonical fixtures
(/root/reference/tests/roundtrip.rs:28-65); these properties generalize
that: for ANY spec-valid document, parse → serialize must be semantically
lossless (same normalization rules the reference applies: `properties`
always emitted, empty foreign-member maps dropped, `type` first) and the
serializer must be idempotent (serialize∘parse∘serialize == serialize).
"""

from __future__ import annotations

import json
import math

from hypothesis import given, settings
from hypothesis import strategies as st

from geojson_spark.functions.geojson_codec import parse_geojson, serialize_geojson

# finite floats that survive json round-trips exactly (shortest-repr)
coord = st.one_of(
    st.integers(min_value=-1000, max_value=1000).map(float),
    st.floats(
        min_value=-180.0, max_value=180.0, allow_nan=False, allow_infinity=False
    ),
)
position = st.lists(coord, min_size=2, max_size=3).map(list)


def _ring():
    # closed ring with >= 4 positions
    return st.lists(position, min_size=3, max_size=5).map(lambda ps: ps + [ps[0]])


point = st.fixed_dictionaries({"type": st.just("Point"), "coordinates": position})
multipoint = st.fixed_dictionaries(
    {"type": st.just("MultiPoint"), "coordinates": st.lists(position, max_size=4)}
)
linestring = st.fixed_dictionaries(
    {"type": st.just("LineString"), "coordinates": st.lists(position, min_size=2, max_size=5)}
)
multilinestring = st.fixed_dictionaries(
    {
        "type": st.just("MultiLineString"),
        "coordinates": st.lists(st.lists(position, min_size=2, max_size=4), max_size=3),
    }
)
polygon = st.fixed_dictionaries(
    {"type": st.just("Polygon"), "coordinates": st.lists(_ring(), max_size=3)}
)
multipolygon = st.fixed_dictionaries(
    {
        "type": st.just("MultiPolygon"),
        "coordinates": st.lists(st.lists(_ring(), min_size=1, max_size=2), max_size=2),
    }
)
simple_geometry = st.one_of(point, multipoint, linestring, multilinestring, polygon, multipolygon)
geometry = st.one_of(
    simple_geometry,
    st.fixed_dictionaries(
        {
            "type": st.just("GeometryCollection"),
            "geometries": st.lists(simple_geometry, max_size=3),
        }
    ),
)

json_scalar = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**31), max_value=2**31),
    st.text(max_size=12),
)
properties = st.one_of(
    st.none(),
    st.dictionaries(st.text(min_size=1, max_size=8), json_scalar, max_size=4),
)
feature_id = st.one_of(st.text(max_size=8), st.integers(min_value=-(2**31), max_value=2**31))

feature = st.builds(
    lambda geom, props, fid, with_id: {
        "type": "Feature",
        "geometry": geom,
        "properties": props,
        **({"id": fid} if with_id else {}),
    },
    st.one_of(st.none(), geometry),
    properties,
    feature_id,
    st.booleans(),
)
feature_collection = st.builds(
    lambda feats: {"type": "FeatureCollection", "features": feats},
    st.lists(feature, max_size=4),
)
document = st.one_of(geometry, feature, feature_collection)


def _normalize(o):
    """Expected output-side normalization (matches the reference: Feature
    always emits `properties`; numbers compare by value)."""
    if isinstance(o, dict):
        out = {k: _normalize(v) for k, v in o.items()}
        if o.get("type") == "Feature" and "properties" not in o:
            out["properties"] = None
        return out
    if isinstance(o, list):
        return [_normalize(v) for v in o]
    if isinstance(o, float) and o == int(o) and not math.isinf(o):
        return o  # json round-trips floats exactly; 1.0 stays 1.0 by value
    return o


@settings(max_examples=200, deadline=None)
@given(document)
def test_roundtrip_semantic_and_idempotent(doc):
    src = json.dumps(doc)
    kind, obj = parse_geojson(src)
    out1 = serialize_geojson(kind, obj)
    kind2, obj2 = parse_geojson(out1)
    out2 = serialize_geojson(kind2, obj2)
    assert out2 == out1, "serializer must be idempotent"
    assert json.loads(out1) == _normalize(doc), "round-trip must be semantically lossless"
    # spec shape: `type` is the first key of every serialized object
    assert out1.startswith('{"type":')


@settings(max_examples=100, deadline=None)
@given(feature, st.dictionaries(st.text(min_size=1, max_size=6), json_scalar, min_size=1, max_size=3))
def test_foreign_members_roundtrip(feat, extras):
    reserved = {"type", "geometry", "properties", "id", "bbox", "features", "coordinates", "geometries"}
    extras = {k: v for k, v in extras.items() if k not in reserved}
    doc = {**feat, **extras}
    kind, obj = parse_geojson(json.dumps(doc))
    back = json.loads(serialize_geojson(kind, obj))
    for k, v in extras.items():
        assert back[k] == v, f"foreign member {k!r} must survive"


def test_whitespace_class_consistent_across_engine_and_oracles():
    """Every tokenizing split in the engine and every DuckDB oracle must
    use the ONE canonical whitespace set (text.WS_CLASS) — Python \\s,
    Java \\s, and RE2 \\s disagree on \\x0B/NBSP, which silently breaks
    Spark↔DuckDB parity. The oracle strings may spell the class with
    backslash escapes or literal control characters; normalize both."""
    import re as _re

    import __spark_entry__ as E
    from geojson_spark.functions.text import WS_CLASS

    def charset(cls_text: str) -> frozenset:
        # interpret backslash escapes if present, then collect the chars
        body = cls_text[1:-1]
        body = body.encode().decode("unicode_escape")
        return frozenset(body)

    canon = charset(WS_CLASS)
    assert canon == frozenset(" \t\n\x0b\f\r")
    seen = 0
    for name, sql in E.oracle_sql().items():
        # the first argument may contain nested parens/commas/quotes
        # (e.g. coalesce(text, '')); match any split-class literal that
        # follows a string_split_regex call on the same statement
        for m in _re.finditer(
            r"string_split_regex\((?:[^,']|'[^']*'|\([^()]*\))+,\s*'(\[[^]]*\])\+'",
            sql,
        ):
            seen += 1
            assert charset(m.group(1)) == canon, (name, repr(m.group(1)))
    assert seen >= 8  # minhash, simhash, contamination, lang×2, corpus×2, jaccard…
