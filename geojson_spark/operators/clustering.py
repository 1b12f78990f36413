"""Density clustering (DBSCAN) over point tables — grid-accelerated,
deterministic labels, no UDF on the hot path.

Spark has no density-clustering primitive (MLlib's KMeans is centroid
based); DBSCAN is the standard operator for deduplicating GPS jitter,
finding event hotspots, and pre-grouping spatial training data. This
implementation is the classic three-step decomposition, each step a
scale-correct relational plan:

1. **Neighbor pairs** via :func:`geojson_spark.operators.joins.
   distance_join` — cell-ring explode + equi-join + exact refine. One
   shuffle; fan-out bounded by the ring size (pick ``cpd ≈ 1/eps`` so a
   neighborhood spans ~3 cells per axis). No n² anywhere.
2. **Core points** = points with ≥ ``min_pts`` neighbors (the point
   itself counts, per the standard definition) — one groupBy count.
3. **Clusters** = connected components of the core-core neighbor graph,
   labeled by the component's minimum core id via
   :func:`geojson_spark.operators.dedup.assign_keepers` (iterative
   min-label propagation, rounds = component diameter, lineage truncated
   per round). Border points (non-core with a core neighbor) attach to
   the MINIMUM cluster label among their core neighbors — the standard
   DBSCAN order-dependence resolved deterministically. Noise gets
   cluster_id = -1.

Every rule is integer/min-based, so the full output replays in a SQL
oracle (theta-join neighbors + recursive-CTE reachability) — see
``__spark_entry__.py``'s ``dbscan`` entry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dbscan(
    points: DataFrame,
    *,
    eps: float,
    min_pts: int,
    cpd: int | None = None,
    id_col: str = "p_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    max_iters: int = 20,
) -> DataFrame:
    """DBSCAN under the squared-degree metric (``dist² ≤ eps²``).

    Returns (``id_col``, cluster_id, is_core): cluster_id is the minimum
    core-point id of the cluster, -1 for noise; is_core ∈ {0, 1}.

    ``cpd`` (cells per degree for the neighbor join) defaults to
    ``max(1, round(1/eps))`` so the ring join explodes ~5×5 cells per
    point regardless of eps — clamped to 22, the largest cells-per-degree
    ``grid_cell``'s GRID_K packing admits (a GPS-jitter eps of 1e-3°
    would otherwise request cpd=1000 and trip the packing guard; the
    ring join stays complete at ANY cpd since ring = ceil(eps·cpd)+1,
    the finer grid is purely a candidate-pruning win).
    """
    from geojson_spark.operators.joins import distance_join

    if cpd is None:
        cpd = min(22, max(1, int(round(1.0 / eps))))

    q = points.select(
        F.col(id_col).cast("bigint").alias("q_id"),
        F.col(lon_col).alias("q_lon"),
        F.col(lat_col).alias("q_lat"),
    )
    p = points.select(
        F.col(id_col).cast("bigint").alias("p_id"),
        F.col(lon_col).alias("p_lon"),
        F.col(lat_col).alias("p_lat"),
    )
    # all ordered neighbor pairs, INCLUDING the self pair (dist 0 ≤ eps),
    # so the groupBy count below is the standard |N_eps(p)| ≥ min_pts test.
    # Persisted: three branches (core count, core-core edges, border
    # attach) reference it — uncached, the ring join would re-run once per
    # branch at action time, on top of assign_keepers' eager consumption.
    pairs = (
        distance_join(q, p, radius=eps, metric="euclidean_deg2", cpd=cpd)
        .select("q_id", "p_id")
        .persist()
    )
    try:
        return _cluster(points, pairs, core_min=min_pts, id_col=id_col,
                        max_iters=max_iters)
    finally:
        # _cluster localCheckpoints (eager) the small label tables, so the
        # returned plan no longer references pairs and the blocks can go
        pairs.unpersist()


def _cluster(
    points: DataFrame,
    pairs: DataFrame,
    *,
    core_min: int,
    id_col: str,
    max_iters: int,
) -> DataFrame:
    from geojson_spark.operators.dedup import assign_keepers

    core = (
        pairs.groupBy("q_id")
        .agg(F.count("*").alias("n_nbr"))
        .where(F.col("n_nbr") >= core_min)
        .select(F.col("q_id").alias("id"))
    )

    # core-core edges → min-label connected components; an isolated core
    # point (no other core in range) is absent from the edge list and
    # becomes its own singleton cluster via the coalesce
    core_edges = (
        pairs.where(F.col("q_id") != F.col("p_id"))
        .join(core.withColumnRenamed("id", "q_id"), "q_id")
        .join(core.withColumnRenamed("id", "p_id"), "p_id")
        .select(F.col("q_id").alias("id_a"), F.col("p_id").alias("id_b"))
    )
    labels = assign_keepers(core_edges, max_iters=max_iters).select(
        F.col("doc_id").alias("id"), F.col("keeper_id").alias("cluster_id")
    )
    # eager localCheckpoint (same discipline as assign_keepers' rounds):
    # core_lbl feeds both the border attach and the final union, and the
    # caller unpersists `pairs` on return — materializing the small label
    # tables here cuts every later reference to the neighbor join
    core_lbl = (
        core.join(labels, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("cluster_id"), F.col("id")).alias("cluster_id"),
        )
        .localCheckpoint(eager=True)
    )

    # border points: non-core with ≥1 core neighbor → min neighbor cluster
    border = (
        pairs.where(F.col("q_id") != F.col("p_id"))
        .join(core.withColumnRenamed("id", "q_id"), "q_id", "left_anti")
        .join(
            core_lbl.select(
                F.col("id").alias("p_id"), F.col("cluster_id").alias("nbr_cluster")
            ),
            "p_id",
        )
        .groupBy("q_id")
        .agg(F.min("nbr_cluster").alias("cluster_id"))
        .select(F.col("q_id").alias("id"), "cluster_id")
        .localCheckpoint(eager=True)
    )

    ids = points.select(F.col(id_col).cast("bigint").alias("id"))
    assigned = core_lbl.withColumn("is_core", F.lit(1)).unionByName(
        border.withColumn("is_core", F.lit(0))
    )
    return (
        ids.join(assigned, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("cluster_id"), F.lit(-1).cast("bigint")).alias(
                "cluster_id"
            ),
            F.coalesce(F.col("is_core"), F.lit(0)).cast("int").alias("is_core"),
        )
    )
