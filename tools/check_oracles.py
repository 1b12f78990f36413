"""Local stand-in for the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same sf dir, compare
row count, column names, and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, ".")


def normalize(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c]
            if isinstance(v, float):
                # EXACT repr, no rounding: the driver hashes value reprs,
                # so a 1-ulp derivation drift must fail HERE too — a
                # round(v, 9) tolerance made this gate strictly weaker
                # than the thing it mimics
                v = "NaN" if math.isnan(v) else repr(v)
            elif isinstance(v, bool):
                # keep bools distinct from ints: repr(True) != repr(1)
                # under the driver's hash
                v = repr(v)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as E
    from geojson_spark.session import get_spark

    spark = get_spark(master="local[8]", app_name="oracle-check", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = E.queries()
    oracles = E.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # a typo'd name silently checking NOTHING and printing 'all oracle
        # checks passed' is a false green — fail loudly instead
        print(f"unknown query names: {sorted(unknown)}", file=sys.stderr)
        sys.exit(2)
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        import time

        t0 = time.time()
        sdf = fn(spark, sf_dir)
        spdf = sdf.toPandas()
        t1 = time.time()
        if name not in oracles:
            print(f"{name:22s} rows-only: {len(spdf):7d} rows  {t1-t0:6.1f}s")
            continue
        odf = con.execute(oracles[name]).fetchdf()
        cols = sorted(spdf.columns)
        ocols = sorted(odf.columns)
        status = []
        if cols != ocols:
            status.append(f"SCHEMA {cols} vs {ocols}")
        elif len(spdf) != len(odf):
            status.append(f"ROWS {len(spdf)} vs {len(odf)}")
        else:
            # The driver hashes value reprs, so a dtype *kind* flip (e.g.
            # DuckDB sum(BIGINT) -> HUGEINT -> float64 vs Spark int64 turns
            # 5 into 5.0) fails its hash_match even when rounded values
            # agree. Width-only differences (int32 vs int64) hash the same.
            def kind(d):
                # bool stays distinct from int: the driver's repr-hash
                # sees 'False' vs '0' even though False == 0 in Python
                k = d.kind
                return "i" if k in ("i", "u") else k

            dt = [
                (c, str(spdf[c].dtype), str(odf[c].dtype))
                for c in cols
                if kind(spdf[c].dtype) != kind(odf[c].dtype)
            ]
            if dt:
                status.append(f"DTYPE {dt}")
            a = normalize(spdf.to_dict("records"), cols)
            b = normalize(odf.to_dict("records"), cols)
            if a != b:
                diff = [x for x, y in zip(a, b) if x != y][:3]
                diffb = [y for x, y in zip(a, b) if x != y][:3]
                status.append(f"VALUES (first diffs: {diff} vs {diffb})")
        if status:
            failures.append(name)
            print(f"{name:22s} FAIL {'; '.join(status)}")
        else:
            print(f"{name:22s} OK   {len(spdf):7d} rows  {t1-t0:6.1f}s")
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all oracle checks passed")


if __name__ == "__main__":
    main()
