"""Feature property algebra (SURVEY.md §2.5, A1–A6).

The reference's ``Feature::property / contains_property / set_property /
remove_property / len_properties / properties_iter``
(src/feature.rs:190-238) over the JSON-text ``properties`` column.
Point lookups and membership stay JVM-side (``get_json_object``); mutation
goes through a JSON-merge pandas UDF (arbitrary JSON values can't round-trip
a typed MapType).
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from geojson_spark.functions.geojson_codec import dumps_json


def _json_path(key: str) -> str:
    """Spark JSON path for a top-level key. A raw f"$.{key}" interprets
    '.', '[', '*' as PATH SYNTAX (properties['a.b'] silently becomes a
    nested lookup returning null); non-identifier keys use the quoted
    bracket form instead. Keys Spark's JsonPathParser cannot express —
    no escaping exists, so a single quote or backslash, and the empty
    name (the quoted-name rule needs ≥1 char), would make
    get_json_object silently return null — refuse loudly. '?' inside a
    quoted name was suspected unparseable too, but Spark 4.1.2 resolves
    ``$['a?b']`` correctly (verified empirically in
    tests/test_review_r5.py), so it stays allowed."""
    import re

    if re.fullmatch(r"[A-Za-z0-9_]+", key):
        return f"$.{key}"
    if "'" in key or "\\" in key or key == "":
        raise ValueError(
            f"property key {key!r} is not expressible as a Spark JSON path"
        )
    return f"$['{key}']"


def prop(properties: Column, key: str) -> Column:
    """A1 — Feature::property: value of properties[key] as
    ``get_json_object`` text (null if absent; note string values come back
    UNQUOTED — '1' and \"1\" are indistinguishable in the result, which is
    the Spark primitive's contract). JVM-side."""
    return F.get_json_object(properties, _json_path(key))


def contains_prop(properties: Column, key: str) -> Column:
    """A2 — Feature::contains_property: KEY PRESENCE, like the reference's
    ``props.contains_key`` (src/feature.rs) — a key holding JSON null is
    still present. The previous get_json_object(...).isNotNull() form
    conflated null values with absent keys. JVM-side."""
    return F.coalesce(
        F.array_contains(F.json_object_keys(properties), F.lit(key)),
        F.lit(False),
    )


def set_prop(properties: Column, key: str, value) -> Column:
    """A3 — Feature::set_property: upsert; creates the map when absent
    (src/feature.rs:205-214)."""

    @F.pandas_udf(StringType())
    def _set(props: pd.Series) -> pd.Series:
        out = []
        for p in props:
            obj = json.loads(p) if p else {}
            obj[key] = value
            out.append(dumps_json(obj))
        return pd.Series(out)

    return _set(properties)


def remove_prop(properties: Column, key: str) -> Column:
    """A4 — Feature::remove_property (returns the new properties text;
    pair with ``prop`` beforehand to capture the removed value)."""

    @F.pandas_udf(StringType())
    def _rm(props: pd.Series) -> pd.Series:
        out = []
        for p in props:
            if not p:
                out.append(p)
                continue
            obj = json.loads(p)
            obj.pop(key, None)
            out.append(dumps_json(obj))
        return pd.Series(out)

    return _rm(properties)


def len_props(properties: Column) -> Column:
    """A5 — Feature::len_properties (0 for null, matching the reference's
    ``map_or(0, len)``). Pure Catalyst — ``size(json_object_keys(...))``
    replaces the former pandas UDF (a read-only lookup has no business
    paying Python-worker serialization; malformed JSON now yields 0
    instead of crashing the task)."""
    return F.coalesce(
        F.size(F.json_object_keys(properties)), F.lit(0)
    ).cast("int")


def props_entries(df: DataFrame, properties_col: str = "properties") -> DataFrame:
    """A6 — properties_iter: one row per (key, value-JSON-text) pair."""
    m = F.from_json(F.col(properties_col), "map<string,string>")
    return df.select("*", F.explode_outer(m).alias("prop_key", "prop_value"))
