"""Error surface mirroring the reference crate's ``Error`` enum.

Parity target: /root/reference/src/errors.rs:8-39 — same variant set, same
display messages, so strict-mode parse failures are reference-identical.
"""

from __future__ import annotations


class GeoJsonError(Exception):
    """Base class for all GeoJSON engine errors (errors.rs:8)."""


class MalformedGeoJson(GeoJsonError):
    """errors.rs:34 — "Error while deserializing GeoJSON: {0}".

    ``lineno``/``colno`` carry the 1-based source position when the failure
    came from the JSON tokenizer (the reference's v1.0.0 errors carry
    position via serde_json::Error — CHANGES.md:34-38); None for semantic
    errors raised after parsing, which have no single source position.
    """

    def __init__(self, detail: str, *, lineno: int | None = None, colno: int | None = None):
        super().__init__(f"Error while deserializing GeoJSON: {detail}")
        self.detail = detail
        self.lineno = lineno
        self.colno = colno


class InvalidGeometryDimensions(GeoJsonError):
    """errors.rs:22-28."""

    def __init__(self, geometry_type: str, dimensions: int):
        super().__init__(
            f"Encountered geometry type: `{geometry_type}` with unexpected "
            f"coordinates dimensions: {dimensions}"
        )
        self.geometry_type = geometry_type
        self.dimensions = dimensions


class GeometryWithoutCoordinatesKey(GeoJsonError):
    """errors.rs:29-30."""

    def __init__(self, geometry_type: str):
        super().__init__(
            f"Encountered geometry type: `{geometry_type}` with no `coordinates` key"
        )
        self.geometry_type = geometry_type


class GeometryCollectionWithoutGeometriesKey(GeoJsonError):
    """errors.rs:31-32."""

    def __init__(self) -> None:
        super().__init__("Encountered GeometryCollection with no `geometries` key")


class PositionTooShort(GeoJsonError):
    """errors.rs:37-38."""

    def __init__(self, n: int):
        super().__init__(
            f"A position must contain two or more elements, but got `{n}`"
        )
        self.n = n


class InvalidFeatureId(MalformedGeoJson):
    """feature.rs:244-249 — untagged Id enum rejection message."""

    def __init__(self) -> None:
        super().__init__("Feature 'id' must be a string or a number")


class ExpectedType(GeoJsonError):
    """errors.rs:35-36."""

    def __init__(self, expected: str, actual: str):
        super().__init__(f"Expected GeoJSON type `{expected}`, found `{actual}`")
        self.expected = expected
        self.actual = actual


class InvalidGeometryConversion(GeoJsonError):
    """errors.rs:13-17."""

    def __init__(self, expected_type: str, found_type: str):
        super().__init__(
            f"Expected type: `{expected_type}`, but found `{found_type}`"
        )
        self.expected_type = expected_type
        self.found_type = found_type


class FeatureHasNoGeometry(GeoJsonError):
    """errors.rs:18-21."""

    def __init__(self) -> None:
        super().__init__(
            "Attempted to a convert a feature without a geometry into a "
            "geo_types::Geometry"
        )


class InvalidWriterState(GeoJsonError):
    """errors.rs:9-10 — streaming FeatureWriter state machine violations."""

    def __init__(self, detail: str):
        super().__init__(f"invalid writer state: {detail}")
        self.detail = detail
