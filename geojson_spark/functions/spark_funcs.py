"""Spark Column helpers and vectorized UDFs for the spatial layer.

Design rule (SURVEY.md §4): anything expressible as built-in Column
arithmetic stays JVM-side inside whole-stage codegen — grid cells, parent
cells, haversine, salting. Only the S2/hex sphere math crosses into Python,
as Arrow-batched pandas UDFs over flat NumPy arrays.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from geojson_spark.functions import cells as _cells
from geojson_spark.functions.text import WS_SPLIT_RE

# SQL-reproducible grid (FIXTURES.md §4): the DuckDB-oracle stand-in index.
GRID_K = 4096
# single source of truth lives in geometry.py (the NumPy kernel); the
# Column expression and haversine_sql (via repr) share the SAME object so
# the three derivations of the radius cannot drift
from geojson_spark.functions.geometry import EARTH_RADIUS_KM  # noqa: E402


def words(text_col: Column) -> Column:
    """THE engine-wide whitespace tokenizer as a Column expression.

    Single definition (over ``text.WS_SPLIT_RE``) so the engine↔oracle
    whitespace contract — Java ``\\s`` ≡ the oracle's explicit
    ``[ \\t\\n\\x0B\\f\\r]+`` class — cannot drift between operators: every
    tokenizing operator (repetition_stats, bm25_topk, shingles) and every
    DuckDB oracle must split with this class, guarded by a pytest
    consistency check."""
    return F.filter(F.split(text_col, WS_SPLIT_RE), lambda x: x != F.lit(""))


def grid_cell(lon: Column, lat: Column, cells_per_degree: int = 8) -> Column:
    """floor-grid cell id — pure Column arithmetic, whole-stage codegen.

    Matches the oracle SQL exactly:
    ``cast(floor((lon+180)*c) as bigint)*4096 + cast(floor((lat+90)*c) as bigint)``

    The gx·GRID_K + gy packing is injective only while 180·c < GRID_K
    (gy's range must fit under the multiplier) — beyond c = 22 distant
    cells would silently SHARE an id, merging their aggregates in both
    the engine and the oracle (the oracle replays the same collision, so
    the hash gate could never catch it). Guarded loudly instead.
    """
    if 180 * cells_per_degree >= GRID_K:
        raise ValueError(
            f"cells_per_degree={cells_per_degree} overflows the GRID_K="
            f"{GRID_K} packing (needs 180*c < {GRID_K}, i.e. c <= 22)"
        )
    gx = F.floor((lon + F.lit(180.0)) * F.lit(float(cells_per_degree))).cast("bigint")
    gy = F.floor((lat + F.lit(90.0)) * F.lit(float(cells_per_degree))).cast("bigint")
    return (gx * F.lit(GRID_K) + gy).alias("cell_id")


def grid_parent(cell: Column, factor: int) -> Column:
    """Coarsen a grid cell by an integer factor — raster-tile ids are just
    coarser grid cells, so tile↔cell joins are equi-joins on this expression
    (north rule 'raster-tile ↔ vector-cell join'; no UDF, no shuffle skew)."""
    gx = F.floor(cell / F.lit(GRID_K)).cast("bigint")
    gy = (cell % F.lit(GRID_K)).cast("bigint")
    return (
        F.floor(gx / F.lit(factor)).cast("bigint") * F.lit(GRID_K)
        + F.floor(gy / F.lit(factor)).cast("bigint")
    )


def haversine_km(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Great-circle km as built-in Column trig — stays in codegen, and is
    byte-for-byte reproducible in the DuckDB oracle (same formula, same
    radius constant)."""
    rlat1 = F.radians(lat1)
    rlat2 = F.radians(lat2)
    dlat = (rlat2 - rlat1) / 2.0
    dlon = (F.radians(lon2) - F.radians(lon1)) / 2.0
    h = F.sin(dlat) * F.sin(dlat) + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon) * F.sin(dlon)
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.least(F.lit(1.0), F.sqrt(h)))


def haversine_sql(lon1: str, lat1: str, lon2: str, lat2: str) -> str:
    """The DuckDB-side twin of haversine_km (for oracle_sql strings)."""
    return (
        f"2.0 * {EARTH_RADIUS_KM!r} * asin(least(1.0, sqrt("
        f"pow(sin((radians({lat2}) - radians({lat1}))/2), 2) + "
        f"cos(radians({lat1})) * cos(radians({lat2})) * "
        f"pow(sin((radians({lon2}) - radians({lon1}))/2), 2))))"
    )


def salt(key: Column, n_salts: int = 16) -> Column:
    """Deterministic salt for two-stage skew aggregation — xxhash64 stays
    JVM-side (north rule 'salted two-stage aggregation')."""
    return F.pmod(F.xxhash64(key), F.lit(n_salts))


def s2_cell_udf(level: int = 13):
    """pandas UDF (lon, lat) → S2-style int64 cell id at ``level``."""

    @F.pandas_udf(LongType())
    def _s2(lon: pd.Series, lat: pd.Series) -> pd.Series:
        out = _cells.s2_cell_id(lon.to_numpy(np.float64), lat.to_numpy(np.float64), level)
        return pd.Series(out)

    return _s2


def s2_cell_xyz_udf(level: int = 13):
    """pandas UDF (x, y, z) → S2-style int64 cell id at ``level`` — the
    ECEF-direction entry point (``cells.xyz_to_cell_id``). Every op past
    the xyz inputs is SQL-replayable, so queries that derive xyz from a
    shared arithmetic can be hash-checked against a DuckDB oracle with no
    trig in the chain."""

    @F.pandas_udf(LongType())
    def _s2xyz(x: pd.Series, y: pd.Series, z: pd.Series) -> pd.Series:
        out = _cells.xyz_to_cell_id(
            x.to_numpy(np.float64), y.to_numpy(np.float64), z.to_numpy(np.float64), level
        )
        return pd.Series(out)

    return _s2xyz


def hex_cell_udf(res: int = 9):
    """pandas UDF (lon, lat) → hex cell id at ``res``."""

    @F.pandas_udf(LongType())
    def _hex(lon: pd.Series, lat: pd.Series) -> pd.Series:
        out = _cells.hex_cell_id(lon.to_numpy(np.float64), lat.to_numpy(np.float64), res)
        return pd.Series(out)

    return _hex


def s2_parent_col(cell: Column, level: int) -> Column:
    """S2 parent as pure Column bit arithmetic: (id & -lsb) | lsb."""
    lsb = int(_cells.s2_lsb(level))
    return cell.bitwiseAND(F.lit(-lsb)).bitwiseOR(F.lit(lsb))


def derived_lonlat(key: Column, prime_lon: int = 7919, prime_lat: int = 104729):
    """Deterministic lon/lat from an integer key — the SQL-expressible
    point synthesis shared by engine and oracle (FIXTURES.md §4):
    lon = mod(key*p1, 360000)/1000 - 180; lat = mod(key*p2, 170000)/1000 - 85.
    """
    lon = (F.pmod(key * F.lit(prime_lon), F.lit(360000)) / F.lit(1000.0)) - F.lit(180.0)
    lat = (F.pmod(key * F.lit(prime_lat), F.lit(170000)) / F.lit(1000.0)) - F.lit(85.0)
    return lon, lat


def derived_lonlat_sql(key: str, prime_lon: int = 7919, prime_lat: int = 104729):
    """DuckDB twin of :func:`derived_lonlat`. The double-mod makes % match
    Spark's pmod for NEGATIVE keys too (DuckDB % follows the dividend's
    sign, so a bare % would put lon outside [-180, 180) and hash-diverge
    from the engine on any fixture with negative keys)."""
    lon = f"((({key} * {prime_lon}) % 360000 + 360000) % 360000) / 1000.0 - 180.0"
    lat = f"((({key} * {prime_lat}) % 170000 + 170000) % 170000) / 1000.0 - 85.0"
    return lon, lat


def repartition_by_cell_prefix(
    df, prefix: Column, num_partitions: int
):
    """North-rule 'explicit repartitioning by H3 prefix': hash-partition on
    a coarse parent-cell expression (``s2_parent_col(cell, 7)``,
    ``grid_parent(cell, 16)``, or a hex parent) so spatially adjacent fine
    cells co-locate in one partition. Downstream per-tile aggregations and
    tile↔cell joins then reuse this partitioning (Catalyst sees the
    repartition as an existing hash distribution and elides its own
    Exchange), which is what keeps the shuffle volume flat when the
    executor count scales N→4N."""
    return df.repartition(num_partitions, prefix)


_WIDE_PLAN_TOKENS = (
    "Aggregate", "Join", "Sort", "Window", "Distinct",
    "Deduplicate", "GlobalLimit", "FlatMapGroupsInPandas",
)


def ensure_min_partitions(df) -> "DataFrame":  # noqa: F821 — forward ref
    """Guarantee ≥ defaultParallelism partitions for a downstream
    Python-UDF stage (one task per partition; a small-parquet scan arrives
    as 1 partition and would serialize the whole stage on one core).

    Asking ``df.rdd.getNumPartitions()`` is only safe when the plan is
    narrow: under AQE a plan with exchanges materializes its upstream
    query stages just to answer the question — doubling the work when the
    input is an expensive pipeline. So: inspect the optimized plan; narrow
    plans (pure scan + projections/filters) get the cheap exact check,
    anything with a wide operator is repartitioned unconditionally (the
    shuffle is bounded-cost next to the Python stage it feeds).
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # match operator NAMES at the head of each tree line, not substrings
    # anywhere in the plan text: a relation/column literally named
    # "Sort..." must not misfire, and a Repartition buried BELOW a wide
    # operator (whose output distribution the wide op destroys) must not
    # bypass the guarantee — only a top-of-plan repartition counts as the
    # caller having partitioned the final output explicitly
    nodes = [ln.lstrip(" +-:*(").partition("(")[0] for ln in plan.splitlines()]
    if nodes and nodes[0].startswith(("Repartition", "RebalancePartitions")):
        # the caller already partitioned the OUTPUT explicitly (e.g. a
        # cell-prefix hash distribution downstream ops reuse) — a blanket
        # round-robin here would both add a shuffle and erase it
        return df
    if any(n.startswith(tok) for n in nodes for tok in _WIDE_PLAN_TOKENS):
        return df.repartition(target)
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


# BPE-ish tokenizer pattern (GPT-2-style word/number/punct/space classes,
# restricted to constructs with identical semantics in Java regex (Spark),
# RE2 (DuckDB), and Python re: no lookahead, explicit whitespace class).
# Token count = number of non-overlapping matches.
BPE_TOKEN_PATTERN = (
    r"'(s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^ \t\n\r\fA-Za-z0-9]+|[ \t\n\r\f]+"
)


def bpe_token_count(text: Column) -> Column:
    """Training-pipeline token counting, BPE-ish: counts matches of the
    GPT-2-style pre-tokenization classes (contraction suffixes, letter
    runs, digit runs, punctuation runs, whitespace runs). JVM-side
    ``regexp_count`` — whole-stage codegen, no Python; the same pattern is
    SQL-oracle-reproducible in DuckDB's RE2."""
    return F.regexp_count(text, F.lit(BPE_TOKEN_PATTERN)).cast("bigint")


GEOHASH_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_cell(lon: Column, lat: Column, precision: int = 6) -> Column:
    """Geohash as a BIGINT of 5·precision interleaved bits (lon bit
    first, per the public geohash spec) — pure Column integer arithmetic,
    no UDF, identical in any SQL engine. Even ``precision`` only (odd
    precisions split the bit budget unevenly between axes).

    The integer form is the join/aggregation key; ``geohash_string``
    renders the base32 text."""
    if precision % 2 != 0:
        raise ValueError("geohash_cell supports even precision only")
    half = 5 * precision // 2
    lim = 1 << half
    # clamp BOTH bounds: lon=180/lat=90 land in the last cell, and
    # out-of-range/sentinel coordinates (e.g. -999) clamp to cell 0 instead
    # of interleaving a negative bigint into plausible-looking garbage bits
    # (shiftrightunsigned of a negative also diverges from the oracle's //)
    x = F.greatest(
        F.least(F.floor((lon + 180.0) / 360.0 * float(lim)).cast("bigint"), F.lit(lim - 1)),
        F.lit(0).cast("bigint"),
    )
    y = F.greatest(
        F.least(F.floor((lat + 90.0) / 180.0 * float(lim)).cast("bigint"), F.lit(lim - 1)),
        F.lit(0).cast("bigint"),
    )
    out = F.lit(0).cast("bigint")
    for i in range(half):
        out = (
            out
            + F.shiftleft(F.shiftrightunsigned(x, i).bitwiseAND(F.lit(1)), 2 * i + 1)
            + F.shiftleft(F.shiftrightunsigned(y, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return out


def geohash_string(lon: Column, lat: Column, precision: int = 6) -> Column:
    """Classic base32 geohash text of :func:`geohash_cell`'s bits."""
    cell = geohash_cell(lon, lat, precision)
    nbits = 5 * precision
    chars = []
    for c in range(precision):
        idx = F.shiftrightunsigned(cell, nbits - 5 * (c + 1)).bitwiseAND(F.lit(31))
        chars.append(F.substring(F.lit(GEOHASH_BASE32), 1, 32).substr(idx + 1, F.lit(1)))
    return F.concat(*chars)


def geohash_parent(cell: Column, precision: int, parent_precision: int) -> Column:
    """Coarsen a geohash cell — drop trailing bits (bit shift, no UDF);
    the geohash prefix property makes this the tile/rollup key."""
    drop = 5 * (precision - parent_precision)
    return F.shiftrightunsigned(cell, drop)


def repetition_stats(df, *, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document repetition signals (Gopher-style quality filters):
    duplicate word/bigram/trigram fractions and the top word's frequency.

    Everything is ONE zero-shuffle Project of built-in Columns — at the
    100 TB design point this is a single scan with no Exchange at all:

    - n-grams come from ``zip_with`` over shifted ``slice``s of the word
      array (never transform+element_at, which re-evaluates the split per
      element — see the Catalyst-inlining note in CLAUDE.md); repeated
      top-level references to the same split tree are collapsed by Spark's
      whole-stage-codegen subexpression elimination.
    - the top word frequency is an O(n) ``F.aggregate`` run-length fold
      over ``array_sort(words)`` — no explode, no per-doc groupBy.
    - dup ratios are integer millis (``1000·(n−distinct) div n``), exactly
      reproducible by a SQL oracle.
    """
    # NULL text ≡ empty text on BOTH sides (the oracle coalesces too):
    # without this, size(NULL array) = -1 on Spark vs NULL in SQL and every
    # count column diverges on a corpus with null documents
    t = F.coalesce(F.col(text_col), F.lit(""))
    ws = words(t)
    n = F.size(ws).cast("bigint")
    big = F.zip_with(
        F.slice(ws, 1, F.greatest(F.size(ws) - 1, F.lit(0))),
        F.slice(ws, 2, F.greatest(F.size(ws) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    tri = F.zip_with(
        F.slice(big, 1, F.greatest(F.size(ws) - 2, F.lit(0))),
        F.slice(ws, 3, F.greatest(F.size(ws) - 2, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    zero = F.lit(0).cast("bigint")
    one = F.lit(1).cast("bigint")
    top_freq = F.aggregate(
        F.array_sort(ws),
        F.struct(
            F.lit("").alias("prev"), zero.alias("run"), zero.alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + one).otherwise(one).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + one).otherwise(one),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )

    def dup_milli(arr):
        # floor((1000·(tot−dis))/tot) equals exact integer division here:
        # both operands are exact int64 ≤ 2^53, the true ratio's distance
        # to any integer is ≥ 1/tot ≫ double ULP at 1000, so the rounded
        # quotient can never cross an integer boundary. The oracle uses
        # BIGINT // BIGINT — same value by the same argument.
        tot = F.size(arr).cast("bigint")
        dis = F.size(F.array_distinct(arr)).cast("bigint")
        return F.when(
            tot > 0,
            F.floor((F.lit(1000).cast("bigint") * (tot - dis)) / tot).cast("bigint"),
        ).otherwise(zero)

    return df.select(
        F.col(id_col).alias("doc_id"),
        n.alias("n_words"),
        F.size(F.array_distinct(ws)).cast("bigint").alias("n_distinct_words"),
        # NULL text: F.aggregate over a NULL array yields NULL, but the
        # oracle's missing-tops-row COALESCE yields 0 — match it
        F.coalesce(top_freq, zero).alias("top_word_freq"),
        F.size(big).cast("bigint").alias("n_bigrams"),
        F.size(F.array_distinct(big)).cast("bigint").alias("n_distinct_bigrams"),
        F.size(tri).cast("bigint").alias("n_trigrams"),
        F.size(F.array_distinct(tri)).cast("bigint").alias("n_distinct_trigrams"),
        dup_milli(ws).alias("dup_word_milli"),
        dup_milli(big).alias("dup_bigram_milli"),
        dup_milli(tri).alias("dup_trigram_milli"),
    )
