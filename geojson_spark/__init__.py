"""geojson_spark — a PySpark-native spatial-join + tiling engine.

Fidelity layer re-implements the GeoJSON (RFC 7946) semantics of
georust/geojson v1.0.0 (see /root/reference, cited per-function); the query
layer (S2/H3-style cell index, point-in-polygon join, kNN, raster↔vector tile
join, salted skew handling, checkpoint/resume) is Spark-first: DataFrame ops
and vectorized Arrow UDFs, no per-row Python.

Package layout:
    functions/  pure NumPy/Python kernels (codec, cells, geometry, text, vectors)
    sources/    readers + synthetic generators (GeoJSON files, image table)
    operators/  DataFrame → DataFrame ops (joins, aggs, dedup, similarity)
    plans/      checkpoint / lineage / resume
    streaming/  structured-streaming windowed ops
"""

__version__ = "0.1.0"
