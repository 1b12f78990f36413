"""Spatial joins: point-in-polygon, kNN, raster-tile↔vector-cell.

All three are *compositions of built-in DataFrame ops* around one vectorized
refine kernel (SURVEY.md §2.8): cover/explode → equi-join on cell keys
(Catalyst picks broadcast-hash vs sort-merge; we force broadcast for small
polygon sides per the north rule's 'adaptive broadcast') → exact NumPy
refinement in an Arrow-batched UDF. No driver-side loops over rows; the only
driver logic is plan construction.

Scale notes (100 TB design point):
- polygon covers are multi-level: each polygon picks the coarsest cell level
  whose cover fits ``max_cover_cells``, so a continent-sized polygon costs
  ~1k join keys instead of 10^8 level-13 cells; points join each level via
  pure-bit-arithmetic ancestor keys (no UDF, no extra shuffle).
- kNN ring-expansion is Column-only (explode over a (2r+1)² delta array);
  the guarantee check + brute-force fallback touches only unsatisfied
  queries (usually none), so the crossJoin never sees the big table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, BooleanType, LongType

from geojson_spark.functions import cells as _cells
from geojson_spark.functions.geometry import points_in_polygon
from geojson_spark.functions.spark_funcs import (
    GRID_K,
    grid_cell,
    grid_parent,
    haversine_km,
    s2_cell_udf,
    s2_parent_col,
)

import math as _math

from geojson_spark.functions.geometry import EARTH_RADIUS_KM

# derived from the ONE shared radius constant (spark_funcs re-exports it
# from geometry.py) — a hardcoded 111.19… literal would silently keep the
# old radius in the ring-completeness bounds if the constant ever changed
KM_PER_DEG_LAT = 2.0 * _math.pi * EARTH_RADIUS_KM / 360.0

# adaptive-broadcast budget for pip_join, in *exploded* (poly, cell) rows —
# the thing actually shipped to every executor
PIP_BROADCAST_MAX_ROWS = 4_000_000
# ... and in estimated exploded bytes: every exploded row ships the
# polygon's full coords array, so 4M rows of multi-KB coastlines would
# blow Spark's ~8 GB broadcast ceiling long before the row gate fires.
# 1 GiB leaves headroom for the hash relation's ~2x build overhead.
PIP_BROADCAST_MAX_BYTES = 1 << 30


# ---------------------------------------------------------------------------
# polygon covers
# ---------------------------------------------------------------------------


GRID_FACTORS = (1, 8, 64, 512)  # coarsening factors for large polygons


def _grid_cover(bbox: np.ndarray, cpd: int, factor: int) -> np.ndarray:
    """Exact grid cover of a bbox at coarsening ``factor`` — integer ranges,
    no sampling, no truncation."""
    gx0 = int(np.floor((bbox[0] + 180.0) * cpd)) // factor
    gx1 = int(np.floor((bbox[2] + 180.0) * cpd)) // factor
    gy0 = int(np.floor((bbox[1] + 90.0) * cpd)) // factor
    gy1 = int(np.floor((bbox[3] + 90.0) * cpd)) // factor
    gx = np.arange(gx0, gx1 + 1, dtype=np.int64)
    gy = np.arange(gy0, gy1 + 1, dtype=np.int64)
    return (gx[:, None] * GRID_K + gy[None, :]).ravel()


def grid_cover_udf(cpd: int = 8, max_cover_cells: int = 4096):
    """bbox → array of factor-tagged grid cells (key = cell·8 + factor_idx;
    grid ids at different factors collide numerically, so keys carry the
    factor). Each polygon picks the smallest coarsening factor whose cover
    fits the budget — a hemisphere costs ~hundreds of keys, never a silent
    cap."""

    @F.pandas_udf(ArrayType(LongType()))
    def _cover(bbox: pd.Series) -> pd.Series:
        covers = []
        for b in bbox:
            if b is None or len(b) < 4:
                covers.append([])
                continue
            bb = np.asarray(b, dtype=np.float64)
            fi = len(GRID_FACTORS) - 1
            for i, f in enumerate(GRID_FACTORS):
                nx = (bb[2] - bb[0]) * cpd / f + 2
                ny = (bb[3] - bb[1]) * cpd / f + 2
                if nx * ny <= max_cover_cells:
                    fi = i
                    break
            cells = _grid_cover(bb, cpd, GRID_FACTORS[fi])
            covers.append((cells * 8 + fi).tolist())
        return pd.Series(covers)

    return _cover


def _s2_edge_deg(level: int) -> float:
    """Approximate level-L cell edge in degrees (equatorial face scale)."""
    return 90.0 / (1 << level)


# fixed cover-level ladder: every polygon picks one of these, every point
# joins via its 4 ancestor keys (pure bit arithmetic) — no data-dependent
# driver round-trips, one equi-join total
S2_COVER_LEVELS = (13, 10, 7, 4)


def s2_cover_udf(levels=S2_COVER_LEVELS, max_cover_cells: int = 1024):
    """bbox array → array<cell>: per-polygon cover at the finest ladder
    level whose cover fits ``max_cover_cells``. Cell ids self-encode their
    level (trailing bit), so one array carries the multi-level cover.
    Samples the bbox at half-cell pitch; over-approximation is refined by
    exact PIP after the join."""

    from geojson_spark.functions.geometry import polygon_cover_cells

    @F.pandas_udf(ArrayType(LongType()))
    def _cover(bbox: pd.Series) -> pd.Series:
        covers = []
        for b in bbox:
            if b is None or len(b) < 4:
                covers.append([])
                continue
            b = np.asarray(b, dtype=np.float64)
            span = max(b[2] - b[0], b[3] - b[1], 1e-9)
            level = levels[-1]
            for lv in levels:  # finest → coarsest
                if (span / _s2_edge_deg(lv)) ** 2 * 4 <= max_cover_cells:
                    level = lv
                    break
            # quarter-edge pitch: worst-case sheared cells near face
            # corners have an inscribed axis-aligned square of only
            # ~0.42·edge, so a half-edge lattice could MISS a covering
            # cell entirely — an under-approximation would silently drop
            # points, not just widen candidates
            step = _s2_edge_deg(level) / 4.0
            cover = polygon_cover_cells(
                b.tolist(),
                lambda lo, la, lv=level: _cells.s2_cell_id(
                    np.clip(lo, -180, 180), np.clip(la, -89.999, 89.999), lv
                ),
                step,
            )
            covers.append(cover.tolist())
        return pd.Series(covers)

    return _cover


# ---------------------------------------------------------------------------
# PIP refine kernel
# ---------------------------------------------------------------------------


def pip_refine_udf():
    """(px, py, poly_id, coords, ring_offsets, dim) → bool, vectorized per
    polygon.

    Rows inside an Arrow batch are grouped by ``poly_id`` — the join key,
    unique per polygon — so each polygon's edge array is built once and all
    its candidate points go through one NumPy ray-casting call (north rule:
    'ray-casting over sorted edge lists per cell'). Grouping by id rather
    than a coords signature avoids collisions between distinct polygons
    that share vertex count + first vertex (common in tiled/gridded
    data)."""

    @F.pandas_udf(BooleanType())
    def _refine(
        px: pd.Series,
        py: pd.Series,
        poly_id: pd.Series,
        coords: pd.Series,
        ring_offsets: pd.Series,
        dim: pd.Series,
    ) -> pd.Series:
        n = len(px)
        out = np.zeros(n, dtype=bool)
        if n == 0:
            return pd.Series(out)
        pxv = px.to_numpy(np.float64)
        pyv = py.to_numpy(np.float64)
        frame = pd.DataFrame({"i": np.arange(n)})
        frame["sig"] = pd.factorize(poly_id.values)[0]
        for _, grp in frame.groupby("sig", sort=False):
            idx = grp["i"].to_numpy()
            first = idx[0]
            c = coords.iloc[first]
            ro = ring_offsets.iloc[first]
            # pd.isna, not `is None`: a NULL in a nullable bigint column
            # arrives as NaN, and int(NaN) would crash the task instead of
            # taking the documented dim=2 fallback
            d = 2 if pd.isna(dim.iloc[first]) else int(dim.iloc[first])
            if c is None or len(c) == 0 or d < 2:
                continue
            cv = np.asarray(c, dtype=np.float64)
            rov = np.asarray(ro, dtype=np.int64)
            out[idx] = points_in_polygon(pxv[idx], pyv[idx], cv, rov, d)
        return pd.Series(out)

    return _refine


# ---------------------------------------------------------------------------
# joins
# ---------------------------------------------------------------------------


def pip_join(
    points: DataFrame,
    polygons: DataFrame,
    *,
    index: str = "grid",
    level: int = 13,
    cpd: int = 8,
    lon: str = "lon",
    lat: str = "lat",
    broadcast_polygons: bool | None = None,
    max_cover_cells: int = 1024,
) -> DataFrame:
    """Point-in-polygon join.

    ``polygons`` must carry ``poly_id``, ``coords``, ``ring_offsets``,
    ``dim``, ``bbox`` (array<double> [minx,miny,maxx,maxy]). Returns points'
    columns + ``poly_id``, one row per (point, containing polygon).

    ``broadcast_polygons=None`` (default) decides adaptively (north rule
    'adaptive broadcast of small polygon sides'): what is broadcast is the
    *exploded* cover, so the gate bounds estimated post-explode rows —
    polygon count × mean cover size sampled from ≤2048 polygons — not raw
    polygon count (a 100k-polygon side with ~1k-cell covers would be 10⁸
    broadcast rows and OOM the driver). Small sides broadcast (points
    never shuffle); larger sides fall back to a shuffled equi-join where
    AQE's skew-join splitting applies.
    """
    poly_cols = ["poly_id", "coords", "ring_offsets", "dim"]

    # broadcast path = points never shuffle — which also means the
    # explode+join+refine pandas-UDF stage inherits the raw points
    # partitioning; a 1-partition small-parquet scan would run it all on
    # one core (CLAUDE.md rule). Plan-aware: no-op on healthy inputs.
    from geojson_spark.functions.spark_funcs import ensure_min_partitions

    points = ensure_min_partitions(points)

    # One equi-join, no data-dependent driver round-trips: polygons carry a
    # cover at one level of a fixed ladder; points explode to their ancestor
    # key at every ladder level (pure Column bit arithmetic). A polygon
    # covers each point position at exactly one ladder level, so no
    # duplicate pairs arise. Point-side fan-out is ladder-width (4), which
    # a broadcast join absorbs without any shuffle.
    if index == "grid":
        cover_expr = grid_cover_udf(cpd, max_cover_cells)(F.col("bbox"))
        exploded = polygons.select(*poly_cols, F.explode(cover_expr).alias("cell_id"))
        pcell = grid_cell(F.col(lon), F.col(lat), cpd)
        keys = []
        for fi, f in enumerate(GRID_FACTORS):
            c = pcell if f == 1 else grid_parent(pcell, f)
            keys.append(c * 8 + fi)
        pts = points.withColumn("cell_id", F.explode(F.array(*keys)))
    elif index == "s2":
        cover_expr = s2_cover_udf(max_cover_cells=max_cover_cells)(F.col("bbox"))
        exploded = polygons.select(*poly_cols, F.explode(cover_expr).alias("cell_id"))
        pcell = s2_cell_udf(S2_COVER_LEVELS[0])(F.col(lon), F.col(lat))
        pts = points.withColumn("_leaf", pcell).withColumn(
            "cell_id",
            F.explode(F.array(*[s2_parent_col(F.col("_leaf"), lv) for lv in S2_COVER_LEVELS])),
        ).drop("_leaf")
    else:
        raise ValueError(f"unknown index {index!r}")

    broadcast_max_rows = PIP_BROADCAST_MAX_ROWS
    if broadcast_polygons is None:
        # Two-step probe, each step bounded. Step 1: a bare count — no
        # cover UDF in the plan, so Catalyst prunes every column and a
        # side too big to broadcast costs one cheap scan and nothing else
        # (a fused count+sample aggregation ran the cover UDF on ~1/16 of
        # ALL rows even when the count alone decided the answer — probe
        # cost scaled linearly with polygon count on exactly the sides
        # where the answer was already 'shuffle').
        n_polys = polygons.count()
        if n_polys > broadcast_max_rows:
            broadcast_polygons = False
        elif n_polys == 0:
            broadcast_polygons = True
        else:
            # Step 2 (small sides only): cover/bytes stats over a
            # deterministic hash sample capped at ~2048 EXPECTED rows —
            # an absolute bound on cover-UDF evaluations, not a fraction
            # that grows with the table. n is known here, so the modulus
            # adapts; sides under 2048 rows are measured exactly.
            bytes_expr = F.size(cover_expr) * (
                F.size(F.col("coords")) * F.lit(8.0) + F.lit(64.0)
            )
            mod = max(1, n_polys // 2048)
            sampled = F.pmod(F.xxhash64(F.col("poly_id")), F.lit(mod)) == 0
            # E[cover·bytes], NOT E[cover]·E[bytes]: cover size and coords
            # length are positively correlated (big polygons have both),
            # so the product of means can undershoot by an order of
            # magnitude on a mostly-tiny + few-coastlines mix
            probe = polygons.where(sampled).select(
                F.avg(F.size(cover_expr)).alias("m"),
                F.avg(bytes_expr).alias("pb"),
            ).first()
            mean_cover, mean_bytes = probe["m"], probe["pb"]
            est_rows = n_polys * (mean_cover or 1.0)
            # per exploded row: coords doubles (8 B each) + offsets/key/id
            # overhead (~64 B) — bounds estimated broadcast BYTES, not just
            # rows, so a fat-coords side at modest row count still shuffles
            est_bytes = n_polys * (mean_bytes or 0.0)
            broadcast_polygons = (
                est_rows <= broadcast_max_rows
                and est_bytes <= PIP_BROADCAST_MAX_BYTES
            )

    right = F.broadcast(exploded) if broadcast_polygons else exploded
    joined = pts.join(right, "cell_id")

    refined = joined.where(
        pip_refine_udf()(
            F.col(lon),
            F.col(lat),
            F.col("poly_id"),
            F.col("coords"),
            F.col("ring_offsets"),
            F.col("dim"),
        )
    )
    drop = [c for c in ("cell_id", "coords", "ring_offsets", "dim") if c in refined.columns]
    return refined.drop(*drop)


def knn_join(
    queries: DataFrame,
    points: DataFrame,
    k: int,
    *,
    ring: int | str = "auto",
    cpd: int = 8,
    q_id: str = "q_id",
    p_id: str = "p_id",
    q_lon: str = "q_lon",
    q_lat: str = "q_lat",
    p_lon: str = "p_lon",
    p_lat: str = "p_lat",
    exact: bool = True,
    metric: str = "haversine",
) -> DataFrame:
    """k nearest neighbors by haversine via grid ring expansion + re-rank.

    Phase 1: candidates = equi-join on all cells within Chebyshev ring
    ``ring`` of the query cell (explode of a (2r+1)² literal delta array —
    pure Column ops, whole-stage codegen). Window re-rank keeps the top k
    (ties broken by point id → fully deterministic).

    Phase 2 (``exact``): a query's result is provably complete iff its k-th
    distance ≤ the minimum possible distance to any point outside the ring.
    Queries failing the bound (or with <k candidates) are re-solved by
    brute force — an anti-joined, usually-empty residual.

    ``ring="auto"`` sizes the ring from the measured global point density
    so the expected candidate count is ~4k per query: a too-small ring
    sends every query down the brute-force fallback (the ring join finds
    <k candidates), which at cluster scale is the difference between an
    equi-join and a crossJoin over the whole point table. The density probe
    is one cheap count() (parquet row-group metadata).
    """
    from pyspark.sql.window import Window

    if ring == "auto":
        n_points = points.count()
        total_cells = (360 * cpd) * (180 * cpd)
        density = max(n_points / total_cells, 1e-12)
        # (2r+1)^2 * density >= 4k  =>  r >= (sqrt(4k/density) - 1) / 2
        ring = int(np.ceil((np.sqrt(4.0 * k / density) - 1.0) / 2.0))
        ring = max(1, min(ring, 24))

    q = queries.select(
        q_id,
        q_lon,
        q_lat,
        F.floor((F.col(q_lon) + 180.0) * cpd).cast("bigint").alias("qgx"),
        F.floor((F.col(q_lat) + 90.0) * cpd).cast("bigint").alias("qgy"),
    )
    # two sequence-explodes instead of a (2r+1)^2 literal array: plan size
    # stays O(1) in the ring radius (auto rings can reach r~20)
    ring_seq = F.sequence(F.lit(-ring), F.lit(ring))
    q_exp = (
        q.select(q_id, q_lon, q_lat, "qgx", "qgy", F.explode(ring_seq).alias("dx"))
        .select(q_id, q_lon, q_lat, "qgx", "qgy", "dx", F.explode(ring_seq).alias("dy"))
        .select(
            q_id,
            q_lon,
            q_lat,
            "qgx",
            "qgy",
            ((F.col("qgx") + F.col("dx")) * GRID_K + (F.col("qgy") + F.col("dy"))).alias(
                "cell_id"
            ),
        )
    )
    p = points.select(
        p_id, p_lon, p_lat, grid_cell(F.col(p_lon), F.col(p_lat), cpd).alias("cell_id")
    )
    if metric == "haversine":
        def dist_expr():
            return haversine_km(F.col(q_lon), F.col(q_lat), F.col(p_lon), F.col(p_lat))
    elif metric == "euclidean_deg2":
        # squared equirectangular-degree distance: only IEEE +/* — bit-exact
        # reproducible in any SQL engine (used by the DuckDB-oracle query)
        def dist_expr():
            dx = F.col(p_lon) - F.col(q_lon)
            dy = F.col(p_lat) - F.col(q_lat)
            return dx * dx + dy * dy
    else:
        raise ValueError(f"unknown metric {metric!r}")

    cand = q_exp.join(p, "cell_id").withColumn("dist_km", dist_expr())
    w = Window.partitionBy(q_id).orderBy(F.col("dist_km").asc(), F.col(p_id).asc())
    ranked = cand.withColumn("rn", F.row_number().over(w))
    topk = ranked.where(F.col("rn") <= k)

    if not exact:
        return topk.select(q_id, q_lon, q_lat, p_id, p_lon, p_lat, "dist_km", "rn")

    # topk feeds three consumers (bound stats, the complete join, the
    # residual anti-join) — eager localCheckpoint materializes it once AND
    # lets the ContextCleaner reclaim the blocks when the DataFrame is
    # GC'd (a .cache() here would leak storage across repeated calls)
    topk = topk.localCheckpoint(eager=True)

    # completeness bound: a point outside Chebyshev ring r differs by ≥ r
    # whole cells (r/cpd degrees) in lon or lat. The great-circle distance
    # for an angular separation θ is 2R·sin(θ/2) — the CHORD-derived form,
    # NOT the arc length R·θ: for lat-separation d, dist = 2R·sin(d/2); for
    # lon-separation d at |φ| ≤ lat_worst, dist = 2R·asin(√h) ≥ 2R·√h ≥
    # 2R·cos(lat_worst)·sin(d/2). The previous linear bound
    # 0.999·r·cell_deg·KM_PER_DEG overstated the true minimum once the
    # ring spanned more than ~8.9° (sin(x)/x < 0.999), so wide rings could
    # wrongly mark queries complete; 2R·sin(θ/2)·cos is exact-direction for
    # ANY θ (0.999 retained purely as float-rounding slack).
    cell_deg = 1.0 / cpd
    stats = topk.groupBy(q_id, q_lon, q_lat).agg(
        F.count("*").alias("n_cand"), F.max("dist_km").alias("kth_dist")
    )
    if metric == "haversine":
        import math

        from geojson_spark.functions.geometry import EARTH_RADIUS_KM

        lat_worst = F.least(F.lit(89.9), F.abs(F.col(q_lat)) + F.lit((ring + 1) * cell_deg))
        half_sin = math.sin(math.radians(min(ring * cell_deg, 180.0)) / 2.0)
        bound = F.lit(0.999 * 2.0 * EARTH_RADIUS_KM * half_sin) * F.least(
            F.lit(1.0), F.cos(F.radians(lat_worst))
        )
        # the planar grid has no wraparound, so the cell-separation
        # argument is invalid for queries whose ring could reach across
        # the antimeridian or a pole (a point 2 km away at lon ∓180-ε is
        # thousands of cells away in gx) — such queries are never marked
        # complete and fall through to the brute-force residual
        margin = (ring + 1) * cell_deg
        wrap_safe = (F.abs(F.col(q_lon)) <= 180.0 - margin) & (
            F.abs(F.col(q_lat)) <= 90.0 - margin
        )
    else:  # euclidean_deg2: dist² ≥ (r·cell_deg)²; the metric itself is
        # planar-degree, so no wraparound concern
        bound = F.lit((ring * cell_deg) ** 2)
        wrap_safe = F.lit(True)
    ok = stats.where(
        (F.col("n_cand") >= k) & (F.col("kth_dist") <= bound) & wrap_safe
    ).select(q_id)
    complete = topk.join(F.broadcast(ok), q_id)

    residual_q = queries.join(F.broadcast(ok), q_id, "left_anti").select(q_id, q_lon, q_lat)
    brute = (
        residual_q.crossJoin(points.select(p_id, p_lon, p_lat))
        .withColumn("dist_km", dist_expr())
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
    )
    return complete.select(q_id, q_lon, q_lat, p_id, p_lon, p_lat, "dist_km", "rn").unionByName(
        brute.select(q_id, q_lon, q_lat, p_id, p_lon, p_lat, "dist_km", "rn")
    )


def knn_join_hex(
    queries: DataFrame,
    points: DataFrame,
    k: int,
    *,
    ring: int = 2,
    res: int | str = "auto",
    q_id: str = "q_id",
    p_id: str = "p_id",
    q_lon: str = "q_lon",
    q_lat: str = "q_lat",
    p_lon: str = "p_lon",
    p_lat: str = "p_lat",
    exact: bool = True,
) -> DataFrame:
    """kNN via hex k-ring expansion (the north star's 'kNN via H3 k-ring
    expansion with distance re-rank'), squared-degree metric.

    Queries explode to their ring-``ring`` hex neighborhood (NumPy k_ring in
    one Arrow batch), equi-join points on hex cell, window re-rank. With
    ``exact``, completeness uses the lattice bound: hexes at hex-distance
    > r have center separation ≥ r·√3·size, points deviate ≤ size from
    centers, so any point outside the ring is ≥ (r√3−2)·size away; failing
    queries fall back to brute force.

    ``res="auto"`` picks the finest resolution whose ring-``ring``
    neighborhood is expected to hold ~4k points at the measured global
    density — a fixed fine res on sparse data sends every query down the
    brute-force fallback (same rationale as knn_join's auto ring).
    """
    from pyspark.sql.window import Window

    from geojson_spark.functions.cells import _hex_size, hex_k_ring
    from geojson_spark.functions.spark_funcs import hex_cell_udf

    if res == "auto":
        n_points = points.count()
        ring_cells = 1 + 3 * ring * (ring + 1)
        res = 0
        for r in range(15, -1, -1):  # finest acceptable wins
            cell_area = 1.5 * (3.0**0.5) * _hex_size(r) ** 2
            if n_points * cell_area / 64800.0 * ring_cells >= 4.0 * k:
                res = r
                break

    @F.pandas_udf(ArrayType(LongType()))
    def _ring(lon: pd.Series, lat: pd.Series) -> pd.Series:
        cells = _cells.hex_cell_id(lon.to_numpy(np.float64), lat.to_numpy(np.float64), res)
        rings = hex_k_ring(cells, ring)
        return pd.Series([row.tolist() for row in rings])

    q = queries.select(q_id, q_lon, q_lat, F.explode(_ring(F.col(q_lon), F.col(q_lat))).alias("hex_id"))
    p = points.select(p_id, p_lon, p_lat, hex_cell_udf(res)(F.col(p_lon), F.col(p_lat)).alias("hex_id"))
    dx = F.col(p_lon) - F.col(q_lon)
    dy = F.col(p_lat) - F.col(q_lat)
    cand = q.join(p, "hex_id").withColumn("dist2", dx * dx + dy * dy)
    w = Window.partitionBy(q_id).orderBy(F.col("dist2").asc(), F.col(p_id).asc())
    topk = cand.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)
    if not exact:
        return topk.select(q_id, p_id, "dist2", "rn")
    topk = topk.localCheckpoint(eager=True)  # GC-reclaimable, unlike cache()
    size = _hex_size(res)
    # a point outside hex-ring r has hex-distance ≥ r+1; center separation
    # per unit hex distance is MINIMIZED along the lattice diagonal at
    # 1.5·size (the √3·size axis value is the maximum, not the minimum, so
    # √3·r − 2 over-promises for r ≥ 7); points deviate ≤ size from their
    # centers
    bound2 = max(0.0, (1.5 * (ring + 1) - 2.0) * size) ** 2
    stats = topk.groupBy(q_id, q_lon, q_lat).agg(
        F.count("*").alias("n_cand"), F.max("dist2").alias("kth")
    )
    ok = stats.where((F.col("n_cand") >= k) & (F.col("kth") <= F.lit(bound2))).select(q_id)
    complete = topk.join(F.broadcast(ok), q_id)
    residual = queries.join(F.broadcast(ok), q_id, "left_anti").select(q_id, q_lon, q_lat)
    brute = (
        residual.crossJoin(points.select(p_id, p_lon, p_lat))
        .withColumn("dist2", dx * dx + dy * dy)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
    )
    return complete.select(q_id, p_id, "dist2", "rn").unionByName(
        brute.select(q_id, p_id, "dist2", "rn")
    )


def distance_join(
    queries: DataFrame,
    points: DataFrame,
    radius: float,
    *,
    cpd: int = 8,
    metric: str = "euclidean_deg2",
    q_id: str = "q_id",
    p_id: str = "p_id",
    q_lon: str = "q_lon",
    q_lat: str = "q_lat",
    p_lon: str = "p_lon",
    p_lat: str = "p_lat",
    max_ring: int = 32,
) -> DataFrame:
    """Within-distance (radius) join: every (query, point) pair with
    distance ≤ ``radius`` — degrees for ``euclidean_deg2`` (compared as
    dist² ≤ radius², only IEEE +/−/× so a SQL oracle replays it
    bit-exactly), km for ``haversine``.

    Plan shape: points get their grid cell; queries explode to the
    Chebyshev cell ring that provably contains every point within the
    radius, equi-join on cell, exact predicate refines. Each point lies in
    exactly ONE cell, so a pair is emitted exactly once — no dedup shuffle.

    Completeness: with cells of 1/cpd degrees, |Δlon| ≤ dlon implies the
    cell x-indices differ by ≤ floor(dlon·cpd)+1 ≤ ceil(dlon·cpd)+1 — the
    ring radius used (same for lat). For haversine the lon radius scales by
    1/cos(lat_worst) (0.999 guards the sin(x)≈x bound, as in knn_join) and
    is a per-query Column — ``sequence`` takes Column bounds, so dense
    equatorial queries don't pay a polar query's fan-out. Queries whose
    ring could cross the antimeridian/pole, or whose lon fan-out exceeds
    ``max_ring`` cells, are re-solved by a brute-force residual (exactly
    knn_join's pattern; empty for equatorial workloads).

    Scale: one equi-join shuffle; fan-out = ring² cells per query; AQE
    skew-join splits dense cells. No UDF anywhere.
    """
    p = points.select(
        p_id, p_lon, p_lat, grid_cell(F.col(p_lon), F.col(p_lat), cpd).alias("cell_id")
    )
    q = queries.select(
        q_id,
        q_lon,
        q_lat,
        F.floor((F.col(q_lon) + 180.0) * cpd).cast("bigint").alias("qgx"),
        F.floor((F.col(q_lat) + 90.0) * cpd).cast("bigint").alias("qgy"),
    )
    dxc = F.col(p_lon) - F.col(q_lon)
    dyc = F.col(p_lat) - F.col(q_lat)
    if metric == "euclidean_deg2":
        ring = int(np.ceil(radius * cpd)) + 1
        rx = F.lit(ring).cast("bigint")
        ry = F.lit(ring).cast("bigint")
        pred = (dxc * dxc + dyc * dyc) <= F.lit(float(radius) * float(radius))
        # planar metric: no wraparound pairs, but the max_ring fan-out cap
        # still binds — a radius·cpd beyond it would explode (2·ring+1)²
        # cells per query, so those radii fall to the bounded brute-force
        # residual exactly like unsafe haversine queries (all-or-nothing
        # here since the planar ring is query-independent)
        safe = F.lit(ring <= max_ring)
    elif metric == "haversine":
        dlat_deg = radius / (0.999 * KM_PER_DEG_LAT)
        ry = F.lit(int(np.ceil(dlat_deg * cpd)) + 1).cast("bigint")
        lat_worst = F.least(F.lit(89.9), F.abs(F.col(q_lat)) + F.lit(dlat_deg))
        dlon_deg = F.lit(radius / (0.999 * KM_PER_DEG_LAT)) / F.cos(F.radians(lat_worst))
        rx = (F.ceil(dlon_deg * cpd) + 1).cast("bigint")
        pred = haversine_km(F.col(q_lon), F.col(q_lat), F.col(p_lon), F.col(p_lat)) <= F.lit(
            float(radius)
        )
        cell_deg = 1.0 / cpd
        safe = (
            (rx <= max_ring)
            & (F.abs(F.col(q_lon)) <= 180.0 - (dlon_deg + cell_deg))
            & (F.abs(F.col(q_lat)) <= 90.0 - (dlat_deg + cell_deg))
        )
    else:
        raise ValueError(f"unknown metric {metric!r}")

    ringed = q.where(safe).select(
        q_id, q_lon, q_lat, "qgx", "qgy", F.explode(F.sequence(-rx, rx)).alias("dx")
    ).select(q_id, q_lon, q_lat, "qgx", "qgy", "dx", F.explode(F.sequence(-ry, ry)).alias("dy"))
    cells = ringed.select(
        q_id,
        q_lon,
        q_lat,
        ((F.col("qgx") + F.col("dx")) * GRID_K + (F.col("qgy") + F.col("dy"))).alias("cell_id"),
    )
    near = cells.join(p, "cell_id").where(pred)

    out_cols = [q_id, q_lon, q_lat, p_id, p_lon, p_lat]
    result = near.select(*out_cols)
    # unsafe queries (wrap hazard or ring > max_ring) re-solve by brute
    # force; when `safe` is literally true Catalyst's PropagateEmptyRelation
    # prunes the entire crossJoin branch, so the common case pays nothing
    residual = q.where(~safe).select(q_id, q_lon, q_lat)
    brute = residual.crossJoin(p.drop("cell_id")).where(pred).select(*out_cols)
    return result.unionByName(brute)


def tile_join(
    points_with_cell: DataFrame,
    tiles: DataFrame,
    *,
    cell_col: str = "cell_id",
    tile_col: str = "tile_id",
    factor: int = 16,
) -> DataFrame:
    """Raster-tile ↔ vector-cell join: tile ids are coarser cells, so this
    is an equi-join on pure Column arithmetic (north rule; no UDF)."""
    keyed = points_with_cell.withColumn(tile_col, grid_parent(F.col(cell_col), factor))
    return keyed.join(tiles, tile_col)


def bbox_join(
    left: DataFrame,
    right: DataFrame,
    *,
    cpd: float = 1.0,
    a_box: tuple[str, str, str, str] = ("ax0", "ay0", "ax1", "ay1"),
    b_box: tuple[str, str, str, str] = ("bx0", "by0", "bx1", "by1"),
) -> DataFrame:
    """Rectangle-intersection join (PBSM — partition-based spatial merge).

    Both sides explode to the integer grid cells their boxes overlap
    (``sequence``/``explode`` on pure Column arithmetic), equi-join on
    (gx, gy), and the exact closed-box overlap predicate refines. A pair
    whose boxes straddle several cells would duplicate, so each pair is
    emitted EXACTLY ONCE by the reference-point rule: keep it only in the
    cell containing the intersection's min corner (max of the min
    corners) — the classic PBSM dedup, which costs a comparison instead
    of a global dropDuplicates shuffle. Returns all left+right columns.

    Scale notes: one shuffle (the cell equi-join); fan-out = box area in
    cells, so pick ``cpd`` (cells per degree) so typical boxes span a few
    cells; AQE skew-join handles dense cells. No crossJoin, no UDF — the
    whole operator is whole-stage codegen.
    """
    ax0, ay0, ax1, ay1 = (F.col(c) for c in a_box)
    bx0, by0, bx1, by1 = (F.col(c) for c in b_box)

    def gcell(v):
        return F.floor((v + 180.0) * cpd).cast("bigint")

    la = left.withColumn("gx", F.explode(F.sequence(gcell(ax0), gcell(ax1)))).withColumn(
        "gy", F.explode(F.sequence(gcell(ay0), gcell(ay1)))
    )
    rb = right.withColumn("gx", F.explode(F.sequence(gcell(bx0), gcell(bx1)))).withColumn(
        "gy", F.explode(F.sequence(gcell(by0), gcell(by1)))
    )
    overlap = (ax0 <= bx1) & (bx0 <= ax1) & (ay0 <= by1) & (by0 <= ay1)
    ref_ok = (gcell(F.greatest(ax0, bx0)) == F.col("gx")) & (
        gcell(F.greatest(ay0, by0)) == F.col("gy")
    )
    return la.join(rb, ["gx", "gy"]).where(overlap & ref_ok).drop("gx", "gy")


# ---------------------------------------------------------------------------
# temporal joins: as-of and range (interval) — single-shuffle patterns
# ---------------------------------------------------------------------------


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_time: str,
    right_time: str,
    right_cols: dict[str, str],
    right_tie: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: each left row picks the latest right row with
    ``right_time <= left_time`` (``direction="backward"``) or the earliest
    with ``right_time >= left_time`` (``"forward"``) for the same ``key``.
    Backward breaks right_time ties by the LARGEST ``right_tie``, forward
    by the SMALLEST. Unmatched left rows keep nulls.

    Scale path: the naive formulation (theta-join + row_number) shuffles a
    fat |left|x|right-per-key| intermediate. This implementation instead
    UNIONs both sides tagged, sorts once per key by (time, side, tie), and
    fills the right columns with ``last(..., ignorenulls)`` over an
    unbounded-preceding window (backward; forward uses ``first`` over
    unbounded-following) — ONE shuffle, linear intermediate, the same
    pattern Flink/KDB use for as-of. At equal timestamps the right row
    sorts on the inclusive side, giving ``<=`` / ``>=`` semantics.

    ``right_cols`` maps output name -> right column name.
    """
    from pyspark.sql.window import Window

    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r}")
    backward = direction == "backward"

    lt = left.withColumn("_t", F.col(left_time)).withColumn("_side", F.lit(1))
    # right rows sort before left at equal _t for backward (so last() sees
    # them), after left for forward (so first() sees them). Rows with a
    # NULL right_time can never satisfy <=/>= and are excluded (they would
    # otherwise sort nulls-first and forward-fill into everything).
    r_side = 0 if backward else 2
    r_sel = [F.col(key), F.col(right_time).alias("_t"), F.lit(r_side).alias("_side")]
    r_sel += [F.col(src).alias(f"_r_{out}") for out, src in right_cols.items()]
    order = [F.col("_t").asc(), F.col("_side").asc()]
    if right_tie is not None:
        r_sel.append(F.col(right_tie).alias("_tie"))
        # backward: last() picks max tie at equal time (asc order);
        # forward: first() picks min tie at equal time (asc order)
        order.append(F.col("_tie").asc_nulls_first())
    rt = right.where(F.col(right_time).isNotNull()).select(*r_sel)
    u = lt.unionByName(rt, allowMissingColumns=True)
    base = Window.partitionBy(key).orderBy(*order)
    # fill ONE struct holding the whole winning right row, then unpack:
    # per-column last(ignorenulls) would backfill a NULL inside the
    # matched row from an OLDER row, tearing values from different rows
    rs = F.when(
        F.col("_side") == r_side,
        F.struct(*[F.col(f"_r_{out}").alias(out) for out in right_cols]),
    )
    if backward:
        w = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        row_struct = F.last(rs, ignorenulls=True).over(w)
    else:
        w = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        row_struct = F.first(rs, ignorenulls=True).over(w)
    # a left row with NULL left_time can never satisfy <=/>= either — but
    # under asc() NULLS-FIRST ordering the FORWARD window would hand it the
    # key's earliest right row (backward happened to be safe only because
    # nulls sort to the head); null the fill explicitly so both directions
    # agree on dirty data
    row_struct = F.when(F.col("_t").isNotNull(), row_struct)
    fills = [row_struct[out].alias(out) for out in right_cols]
    filled = u.select(*[F.col(c) for c in left.columns], F.col("_side"), *fills)
    return filled.where(F.col("_side") == 1).drop("_side")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    key: str,
    point_time: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Interval join: pairs every interval row with the points of the same
    ``key`` whose ``point_time`` falls in ``[start_col, end_col)``.

    Scale path: a raw range condition forces a theta-join (broadcast
    nested-loop at cluster scale). Instead each interval explodes to the
    epoch buckets it covers (``sequence`` — pure Column arithmetic, fan-out
    = interval length / bucket), each point computes its single bucket, and
    the join is an equi-join on (key, bucket) that Catalyst plans as a
    hash join with AQE skew handling; the exact range predicate refines.
    Each (interval, point) pair meets in exactly one bucket, so no
    dedup pass is needed.
    """
    b = F.lit(int(bucket_seconds))
    iv = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / b),
                F.floor(F.unix_timestamp(F.col(end_col)) / b),
            )
        ),
    )
    pt = points.withColumn("_bkt", F.floor(F.unix_timestamp(F.col(point_time)) / b))
    joined = iv.join(pt, [key, "_bkt"]).where(
        (F.col(point_time) >= F.col(start_col)) & (F.col(point_time) < F.col(end_col))
    )
    return joined.drop("_bkt")
