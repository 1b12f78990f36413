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
from pyspark.sql.types import IntegerType, StringType

from geojson_spark.functions.geojson_codec import dumps_json


def prop(properties: Column, key: str) -> Column:
    """A1 — Feature::property: JSON value text of properties[key] (null if
    absent). JVM-side."""
    return F.get_json_object(properties, f"$.{key}")


def contains_prop(properties: Column, key: str) -> Column:
    """A2 — Feature::contains_property. JVM-side."""
    return F.get_json_object(properties, f"$.{key}").isNotNull()


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
    ``map_or(0, len)``)."""

    @F.pandas_udf(IntegerType())
    def _len(props: pd.Series) -> pd.Series:
        return pd.Series([len(json.loads(p)) if p else 0 for p in props])

    return _len(properties)


def props_entries(df: DataFrame, properties_col: str = "properties") -> DataFrame:
    """A6 — properties_iter: one row per (key, value-JSON-text) pair."""
    m = F.from_json(F.col(properties_col), "map<string,string>")
    return df.select("*", F.explode_outer(m).alias("prop_key", "prop_value"))
