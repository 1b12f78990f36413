"""Vectorized geometry kernels over the columnar encoding.

These are the NumPy hot-path functions invoked from pandas/Arrow UDFs —
flat buffers in, flat buffers out, no per-row Python (BASELINE.json
``input_hint``). The reference crate has no geometry predicates (it is a
format library); PIP/kNN semantics come from the north rule.
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS_KM = 6371.0088


def haversine_km(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Great-circle distance in km, elementwise over float64 arrays."""
    lon1, lat1, lon2, lat2 = (np.radians(np.asarray(a, dtype=np.float64)) for a in (lon1, lat1, lon2, lat2))
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    h = np.sin(dlat / 2.0) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2.0) ** 2
    return 2.0 * EARTH_RADIUS_KM * np.arcsin(np.minimum(1.0, np.sqrt(h)))


def geometry_bbox(coords: np.ndarray, dim: int) -> list[float] | None:
    """[min_x, min_y, max_x, max_y] over interleaved coords (2-D slots only).

    Mirrors the bbox shape rules of RFC 7946 §5 as used by the reference's
    bbox fold (src/feature_collection.rs:184-241); returns None for empty.
    """
    if dim < 2 or coords.size == 0:
        return None
    xs = coords[0::dim]
    ys = coords[1::dim]
    return [float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max())]


def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Ray-casting crossing test of n points against one ring.

    ``ring`` is (m, 2) float64 (closed or open — the wrap edge is included).
    Vectorized over points × edges: O(n·m) numpy, no Python loop over points.
    Boundary points follow the half-open crossing rule (consistent, so a
    point on a shared border lands in exactly one polygon).
    """
    x1 = ring[:, 0]
    y1 = ring[:, 1]
    x2 = np.roll(x1, -1)
    y2 = np.roll(y1, -1)
    with np.errstate(divide="ignore", invalid="ignore"):
        slope = (x2 - x1) / (y2 - y1)
    n = px.shape[0]
    out = np.empty(n, dtype=bool)
    # chunk points so the (chunk, edges) intermediates stay cache/memory-sized
    chunk = max(1, (1 << 22) // max(1, x1.shape[0]))
    for lo in range(0, n, chunk):
        hi = min(n, lo + chunk)
        cpx = px[lo:hi, None]
        cpy = py[lo:hi, None]
        cond = (y1[None, :] > cpy) != (y2[None, :] > cpy)
        with np.errstate(invalid="ignore"):
            # horizontal edges give inf/nan slope; cond is False there
            xint = x1[None, :] + (cpy - y1[None, :]) * slope[None, :]
            out[lo:hi] = ((cond & (cpx < xint)).sum(axis=1) % 2).astype(bool)
    return out


def points_in_polygon(
    px: np.ndarray,
    py: np.ndarray,
    coords: np.ndarray,
    ring_offsets: np.ndarray,
    dim: int = 2,
) -> np.ndarray:
    """Points vs one (multi-ring) polygon: inside exterior, outside holes.

    Even-odd rule over all rings — exactly the RFC winding-agnostic
    semantics: a point is inside iff it crosses an odd number of ring
    boundaries in total.
    """
    n = px.shape[0]
    if n == 0:
        return np.zeros(0, dtype=bool)
    inside = np.zeros(n, dtype=bool)
    xs = coords[0::dim]
    ys = coords[1::dim]
    for r in range(len(ring_offsets) - 1):
        a, b = ring_offsets[r], ring_offsets[r + 1]
        if b - a < 3:
            continue
        ring = np.stack([xs[a:b], ys[a:b]], axis=1)
        # drop duplicated closing vertex so the roll-edge isn't double-counted
        if ring.shape[0] > 1 and ring[0, 0] == ring[-1, 0] and ring[0, 1] == ring[-1, 1]:
            ring = ring[:-1]
        inside ^= points_in_ring(px, py, ring)
    return inside


def polygon_cover_cells(
    bbox: list[float],
    cell_fn,
    step_deg: float,
) -> np.ndarray:
    """Candidate cell ids covering a polygon's bbox.

    Samples the bbox on a grid at ``step_deg`` (≤ the target cell size so no
    cell is skipped) and maps each sample through ``cell_fn(lon, lat)``.
    Returns unique int64 cell ids. This is the join-key fan-out side; exact
    PIP refinement happens after the equi-join, so over-coverage only costs
    candidate pairs, never correctness.
    """
    min_x, min_y, max_x, max_y = bbox
    # pad by one step so boundary cells are included
    xs = np.arange(min_x - step_deg, max_x + 2 * step_deg, step_deg)
    ys = np.arange(min_y - step_deg, max_y + 2 * step_deg, step_deg)
    gx, gy = np.meshgrid(xs, ys)
    cells = cell_fn(gx.ravel(), gy.ravel())
    return np.unique(cells)


def polygon_area(coords: np.ndarray, ring_offsets: np.ndarray) -> float:
    """Planar (degree²) shoelace area of one polygon in the engine's flat
    encoding: interleaved (x, y) in ``coords``, ring boundaries (in point
    counts) in ``ring_offsets``. Ring 0 is the exterior; further rings are
    holes and subtract (magnitude-based, winding-agnostic — matching the
    reference's ring-role-by-position model, to_geo_types.rs:350-369)."""
    coords = np.asarray(coords, dtype=np.float64)
    ring_offsets = np.asarray(ring_offsets, dtype=np.int64)
    total = 0.0
    for r in range(len(ring_offsets) - 1):
        lo, hi = 2 * ring_offsets[r], 2 * ring_offsets[r + 1]
        x = coords[lo:hi:2]
        y = coords[lo + 1 : hi : 2]
        if len(x) < 3:
            continue
        a = 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))
        total += a if r == 0 else -a
    return float(total)


def simplify_ring(xy: np.ndarray, tolerance: float) -> np.ndarray:
    """Douglas–Peucker polyline simplification over an (n, 2) vertex
    array — iterative stack (no recursion limit), vectorized
    point-to-segment distances per split. Returns the kept-vertex mask.

    Endpoints are always kept; a vertex survives iff some retained
    segment has it farther than ``tolerance``.
    """
    n = len(xy)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        lo, hi = stack.pop()
        if hi - lo < 2:
            continue
        a, b = xy[lo], xy[hi]
        ab = b - a
        seg = xy[lo + 1 : hi] - a
        denom = float(ab @ ab)
        if denom == 0.0:
            d = np.sqrt((seg * seg).sum(axis=1))
        else:
            t = np.clip(seg @ ab / denom, 0.0, 1.0)
            diff = seg - t[:, None] * ab
            d = np.sqrt((diff * diff).sum(axis=1))
        i = int(np.argmax(d))
        if d[i] > tolerance:
            mid = lo + 1 + i
            keep[mid] = True
            stack.append((lo, mid))
            stack.append((mid, hi))
    return keep
