"""The north-rule packaging contract, tested for real: the engine must run
via ``spark-submit --py-files geojson_spark.zip`` with no repo on the
driver or executor path. Launches an actual spark-submit subprocess whose
script imports the engine ONLY from the shipped zip and runs a pandas-UDF
query (proving executor-side imports resolve from the zip too).
"""

from __future__ import annotations

import os
import subprocess
import sys
import zipfile

DRIVER_SCRIPT = """
import sys
from pyspark.sql import SparkSession, functions as F

out_path = sys.argv[1]
spark = (SparkSession.builder.appName("submit-smoke")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false").getOrCreate())
from geojson_spark.functions.spark_funcs import grid_cell, s2_cell_udf

li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
pts = li.select(
    ((F.col("l_orderkey") * 7919) % 360000 / 1000.0 - 180.0).alias("lon"),
    ((F.col("l_orderkey") * 104729) % 170000 / 1000.0 - 85.0).alias("lat"),
)
n_grid = pts.withColumn("c", grid_cell(F.col("lon"), F.col("lat"))).select("c").distinct().count()
n_s2 = pts.withColumn("c", s2_cell_udf(13)(F.col("lon"), F.col("lat"))).select("c").distinct().count()
with open(out_path, "w") as fh:
    fh.write(f"{n_grid},{n_s2}")
spark.stop()
"""


def test_spark_submit_py_files(tmp_path):
    import geojson_spark

    pkg_dir = os.path.dirname(os.path.abspath(geojson_spark.__file__))
    zpath = str(tmp_path / "geojson_spark.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    zf.write(full, os.path.join("geojson_spark", os.path.relpath(full, pkg_dir)))

    script = tmp_path / "driver.py"
    script.write_text(DRIVER_SCRIPT)
    out_file = tmp_path / "result.txt"
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    res = subprocess.run(
        [
            "spark-submit",
            "--master", "local[2]",
            "--py-files", zpath,
            str(script), str(out_file),
        ],
        cwd=str(tmp_path),  # NOT the repo — imports must come from the zip
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    n_grid, n_s2 = (int(v) for v in out_file.read_text().split(","))
    assert n_grid > 1000 and n_s2 > 1000
