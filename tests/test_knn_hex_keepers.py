"""Tests: hex k-ring kNN vs brute force; connected-component keepers."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from geojson_spark.operators.dedup import assign_keepers
from geojson_spark.operators.joins import knn_join_hex
from geojson_spark.sources.images import generate_images


def test_knn_hex_exact_vs_bruteforce(spark):
    images = generate_images(spark, 2000, skew=True)
    pts = images.select(
        F.col("image_id").alias("p_id"), F.col("lon").alias("p_lon"), F.col("lat").alias("p_lat")
    ).cache()
    queries = spark.createDataFrame(
        pd.DataFrame({"q_id": [0, 1, 2], "q_lon": [-74.0, 2.35, 100.0],
                      "q_lat": [40.71, 48.85, 0.0]})
    )
    got = knn_join_hex(queries, pts, k=5, ring=2).toPandas()
    qp = queries.toPandas()
    pp = pts.toPandas()
    for _, q in qp.iterrows():
        d = (pp.p_lon - q.q_lon) ** 2 + (pp.p_lat - q.q_lat) ** 2
        want = [pid for _, pid in sorted(zip(d, pp.p_id))[:5]]
        g = got[got.q_id == q.q_id].sort_values("rn").p_id.tolist()
        assert g == want, (q.q_id, g, want)


def test_assign_keepers_components(spark):
    # components: {1,2,3,7}, {10,11}, singleton edges absent
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 7), (10, 11)], "id_a long, id_b long"
    )
    out = {r.doc_id: r.keeper_id for r in assign_keepers(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 7: 1, 10: 10, 11: 10}


def test_assign_keepers_chain(spark):
    # long chain exercises multi-round propagation
    edges = [(i, i + 1) for i in range(30)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    out = {r.doc_id: r.keeper_id for r in assign_keepers(pairs).collect()}
    assert set(out.values()) == {0}
    assert len(out) == 31


def test_knn_hex_wide_ring_bound_is_safe(spark):
    """ring=8 stresses the completeness bound: the minimum center
    separation per unit hex distance is 1.5·size (lattice diagonal), not
    √3·size — an over-promising bound would mark incomplete queries
    complete and silently return wrong neighbors."""
    images = generate_images(spark, 1500)
    pts = images.select(
        F.col("image_id").alias("p_id"), F.col("lon").alias("p_lon"), F.col("lat").alias("p_lat")
    ).cache()
    queries = spark.createDataFrame(
        pd.DataFrame({"q_id": [0, 1], "q_lon": [-74.0, 10.0], "q_lat": [40.7, -20.0]})
    )
    got = knn_join_hex(queries, pts, k=4, ring=8, res=5).toPandas()
    qp = queries.toPandas()
    pp = pts.toPandas()
    for _, q in qp.iterrows():
        d = (pp.p_lon - q.q_lon) ** 2 + (pp.p_lat - q.q_lat) ** 2
        want = [pid for _, pid in sorted(zip(d, pp.p_id))[:4]]
        g = got[got.q_id == q.q_id].sort_values("rn").p_id.tolist()
        assert g == want, (q.q_id, g, want)


def _brute_within(qp, pp, pred):
    want = set()
    for _, q in qp.iterrows():
        for _, p in pp.iterrows():
            if pred(q, p):
                want.add((q.q_id, p.p_id))
    return want


def test_distance_join_deg2_vs_bruteforce(spark):
    from geojson_spark.operators.joins import distance_join

    images = generate_images(spark, 1500, skew=True)
    pts = images.select(
        F.col("image_id").alias("p_id"), F.col("lon").alias("p_lon"), F.col("lat").alias("p_lat")
    ).cache()
    queries = spark.createDataFrame(
        pd.DataFrame({"q_id": [0, 1, 2], "q_lon": [-74.0, 2.35, 100.0],
                      "q_lat": [40.71, 48.85, 0.0]})
    )
    got = {
        (r.q_id, r.p_id)
        for r in distance_join(queries, pts, radius=2.5, metric="euclidean_deg2").collect()
    }
    qp, pp = queries.toPandas(), pts.toPandas()
    want = _brute_within(
        qp, pp,
        lambda q, p: (p.p_lon - q.q_lon) ** 2 + (p.p_lat - q.q_lat) ** 2 <= 2.5**2,
    )
    assert got == want and len(want) > 0


def test_distance_join_haversine_residual_paths(spark):
    """Pole-adjacent and antimeridian-adjacent queries must fall to the
    brute-force residual and still return the exact haversine answer."""
    import numpy as np

    from geojson_spark.functions.spark_funcs import haversine_km as hav_col
    from geojson_spark.operators.joins import distance_join

    rng = np.random.default_rng(11)
    pp = pd.DataFrame({
        "p_id": np.arange(400),
        "p_lon": np.concatenate([rng.uniform(-180, 180, 300),
                                 rng.uniform(179, 180, 50), rng.uniform(-180, -179, 50)]),
        "p_lat": np.concatenate([rng.uniform(-60, 60, 300),
                                 rng.uniform(80, 89.9, 100)]),
    })
    pts = spark.createDataFrame(pp)
    queries = spark.createDataFrame(pd.DataFrame({
        "q_id": [0, 1, 2],
        "q_lon": [2.35, 179.9, 10.0],     # Paris, antimeridian, near-pole
        "q_lat": [48.85, 0.0, 88.5],
    }))
    got = {
        (r.q_id, r.p_id)
        for r in distance_join(queries, pts, radius=300.0, metric="haversine").collect()
    }

    def hav_km(q, p):
        from math import asin, cos, radians, sin, sqrt
        dphi = radians(p.p_lat - q.q_lat)
        dl = radians(p.p_lon - q.q_lon)
        a = sin(dphi / 2) ** 2 + cos(radians(q.q_lat)) * cos(radians(p.p_lat)) * sin(dl / 2) ** 2
        return 2 * 6371.0088 * asin(sqrt(a))

    want = _brute_within(queries.toPandas(), pp, lambda q, p: hav_km(q, p) <= 300.0)
    assert got == want and len(want) > 0
