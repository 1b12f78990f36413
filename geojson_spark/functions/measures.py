"""Planar geometry measures as pure Column expressions over the geometry
struct: shoelace area, perimeter, vertex centroid.

All three are single-row folds over the flat coords array
(``F.transform`` terms + ``F.aggregate`` left-to-right sum), so they run
inside whole-stage codegen with no UDF and — crucially for the DuckDB
oracle — a DETERMINISTIC float-addition order (per-row fold, never a
cross-row float aggregate). The reference crate carries no geometry
math; these serve the engine's tiling/join surface (e.g. area-weighted
tile stats) and give the oracle gate a geometry-measure query.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _xy(coords: Column, i):
    """1-based position i → (x, y) for dim-2 coords."""
    return (
        F.element_at(coords, (i - 1) * 2 + 1),
        F.element_at(coords, (i - 1) * 2 + 2),
    )


def _fold_sum(terms: Column) -> Column:
    """Left-to-right float sum of a terms array — ((0+t1)+t2)+…, the same
    association a SQL list_reduce over a 0-prepended list produces."""
    return F.aggregate(terms, F.lit(0.0), lambda acc, t: acc + t)


def _ring_seq(coords: Column) -> Column:
    """Edge indices 1..n-1 of a closed dim-2 ring (position n repeats
    position 1, so edges don't wrap)."""
    n = (F.size(coords) / 2).cast("int")
    return F.sequence(F.lit(1), n - 1)


def st_area(geometry: Column) -> Column:
    """Shoelace area of the first (closed) ring: |Σ xᵢ·yᵢ₊₁ − xᵢ₊₁·yᵢ|/2."""
    c = geometry["coords"]

    def term(i):
        x1, y1 = _xy(c, i)
        x2, y2 = _xy(c, i + 1)
        return x1 * y2 - x2 * y1

    return F.abs(_fold_sum(F.transform(_ring_seq(c), term))) / 2.0


def st_perimeter(geometry: Column) -> Column:
    """Perimeter of the first (closed) ring: Σ √(Δx² + Δy²) — sqrt is
    IEEE-correctly-rounded, so the value is engine-independent given the
    same fold order."""
    c = geometry["coords"]

    def term(i):
        x1, y1 = _xy(c, i)
        x2, y2 = _xy(c, i + 1)
        dx, dy = x2 - x1, y2 - y1
        return F.sqrt(dx * dx + dy * dy)

    return _fold_sum(F.transform(_ring_seq(c), term))


def st_centroid_xy(geometry: Column) -> tuple[Column, Column]:
    """Vertex-mean centroid of the first ring's distinct vertices (the
    closing duplicate excluded): (Σxᵢ/(n−1), Σyᵢ/(n−1))."""
    c = geometry["coords"]
    seq = _ring_seq(c)
    n1 = F.size(seq).cast("double")
    cx = _fold_sum(F.transform(seq, lambda i: _xy(c, i)[0])) / n1
    cy = _fold_sum(F.transform(seq, lambda i: _xy(c, i)[1])) / n1
    return cx, cy
