"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship S2 PIP pipeline at sf0.001.
``queries()``/``oracle_sql()`` cover the operator inventory (SURVEY.md §2 +
north-rule §2.8 + training-pipeline ops); every SQL-expressible operator has
a DuckDB oracle. Determinism rules used throughout:

- derived points share one arithmetic form (key*prime % range / 1000 - off)
  computed identically by Spark Columns and DuckDB SQL — IEEE-exact.
- float aggregates are avoided in checked outputs: counts, integer cents,
  or floor-rounded scores only; kNN outputs (q_id, p_id, rn) with a
  squared-degree metric (+,* only) and id tie-breaks.
- every computed column is aliased identically on both sides.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

import pandas as pd  # noqa: F401 — needed to resolve pandas UDF type hints
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from geojson_spark.functions.spark_funcs import (  # noqa: E402
    derived_lonlat,
    derived_lonlat_sql,
    grid_cell,
    grid_parent,
)
from geojson_spark.functions.text import WORD_RE  # noqa: E402

GRID_SQL = (
    "(cast(floor((lon + 180.0) * 8.0) as bigint) * 4096 + "
    "cast(floor((lat + 90.0) * 8.0) as bigint))"
)


def _hex_oracle_sql() -> str:
    """DuckDB replica of the aperture-7 axial hex assignment (cells.py
    hex_cell_id): same IEEE expression tree (constants embedded via repr for
    shortest-round-trip exactness) and round_even to match np.round's
    banker's rounding. Verified bit-exact vs NumPy on sf0.01."""
    import numpy as np

    a = repr(float(np.sqrt(3.0) / 3.0))
    b = repr(1.0 / 3.0)
    c = repr(2.0 / 3.0)
    size = repr(30.0 * 7.0 ** (-4.5))  # HEX0_SIZE_DEG * 7^(-res/2), res=9
    off = 1 << 27
    lon, lat = derived_lonlat_sql("l_orderkey")
    return f"""
        WITH p AS (
          SELECT {lon} AS lon, {lat} AS lat FROM lineitem
        ), f AS (
          SELECT ({a} * lon - {b} * lat) / {size} AS qf,
                 ({c} * lat) / {size} AS rf FROM p
        ), r0 AS (
          SELECT qf, rf, -qf - rf AS sf,
                 round_even(qf, 0) AS q0, round_even(rf, 0) AS r0,
                 round_even(-qf - rf, 0) AS s0
          FROM f
        ), fx AS (
          SELECT *, abs(q0-qf) AS dq, abs(r0-rf) AS dr, abs(s0-sf) AS ds FROM r0
        ), q1t AS (
          SELECT *, CASE WHEN dq > dr AND dq > ds THEN -r0-s0 ELSE q0 END AS q1 FROM fx
        ), fin AS (
          SELECT q1,
                 CASE WHEN NOT (dq > dr AND dq > ds) AND dr > ds
                      THEN -q1-s0 ELSE r0 END AS r1
          FROM q1t
        )
        SELECT (9::BIGINT << 56) | ((q1::BIGINT + {off}) << 28) | (r1::BIGINT + {off})
                 AS hex_id,
               count(*) AS n_points
        FROM fin GROUP BY 1
    """


_HEX_CELL_COUNTS_SQL = _hex_oracle_sql()


def _attach(spark: SparkSession) -> None:
    from geojson_spark.session import attach_package

    attach_package(spark)


def _lineitem_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    lon, lat = derived_lonlat(F.col("l_orderkey").cast("bigint"))
    return li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).cast("bigint").alias("p_id"),
        lon.alias("lon"),
        lat.alias("lat"),
        F.col("l_quantity"),
    )


_LINEITEM_POINTS_SQL = """
    SELECT (l_orderkey * 10 + l_linenumber)::BIGINT AS p_id,
           {lon} AS lon, {lat} AS lat, l_quantity
    FROM lineitem
""".format(**dict(zip(("lon", "lat"), derived_lonlat_sql("l_orderkey"))))


def _nation_rects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """25 rectangle polygons derived from nation keys — as geometry structs.

    Bounds end in .0005 so no derived point (3-decimal grid) ever lands on
    a boundary: ray-casting and SQL BETWEEN agree exactly.
    """
    import pandas as pd

    nat = spark.read.parquet(f"{sf_dir}/nation.parquet").collect()
    rows = []
    for r in nat:
        x0 = (r.n_nationkey * 37) % 300 - 160 + 0.0005
        y0 = (r.n_nationkey * 53) % 140 - 75 + 0.0005
        x1, y1 = x0 + 12.0, y0 + 9.0
        rows.append(
            {
                "poly_id": int(r.n_nationkey),
                "coords": [x0, y0, x1, y0, x1, y1, x0, y1, x0, y0],
                "ring_offsets": [0, 5],
                "part_offsets": [0, 1],
                "dim": 2,
                "bbox": [x0, y0, x1, y1],
            }
        )
    return spark.createDataFrame(pd.DataFrame(rows))


# ---------------------------------------------------------------------------
# LSH oracle SQL generators: DuckDB replicas of the MinHash and SimHash
# pipelines, bit-exact. Both engines share md5 as the base string hash and
# integer mod-2^64 arithmetic, so candidacy (band / chunk collisions) —
# not just the exact-verify step — is reproduced in SQL. HUGEINT holds
# the unsigned 64-bit values; products that would exceed 2^127 use a
# 32-bit split multiply.
# ---------------------------------------------------------------------------

_P64 = "18446744073709551616"  # 2^64


def _sql_mulmod(x: str, a: str) -> str:
    """(x * a) mod 2^64 for x, a < 2^64 without overflowing HUGEINT."""
    return (
        f"((((({x}) // 4294967296) * ({a})) % {_P64} * 4294967296"
        f" + (({x}) % 4294967296) * ({a})) % {_P64})"
    )


def _sql_md5_u64(col: str) -> str:
    """First 8 md5 bytes little-endian as HUGEINT — matches
    ``_hash64_str`` (functions/text.py)."""

    def byte(b):
        c1 = f"substr({col}, {2 * b + 1}, 1)"
        c2 = f"substr({col}, {2 * b + 2}, 1)"
        return (
            f"((strpos('0123456789abcdef', {c1}) - 1) * 16"
            f" + (strpos('0123456789abcdef', {c2}) - 1))"
        )

    return "(" + " + ".join(f"{byte(b)}::HUGEINT * {1 << (8 * b)}" for b in range(8)) + ")"


def _sql_xorshift(e: str, k: int) -> str:
    """e XOR (e >> k) for a mod-2^64 HUGEINT expression (CLAUDE.md xor
    rule: route through UBIGINT, which holds the full unsigned range)."""
    return f"xor(({e})::UBIGINT, (({e}) // {1 << k})::UBIGINT)::HUGEINT"


def _sql_splitmix64_stages(x: str) -> list[str]:
    """splitmix64 of a mod-2^64 expression as three staged expressions
    (each references the previous stage's column exactly, so CTE staging
    keeps the SQL linear instead of 2^5 nested copies). Mirrors
    sources/images.py::_splitmix64 — same public constants."""
    s0 = f"(({x})::HUGEINT + 11400714819323198485::HUGEINT) % {_P64}"
    s1 = _sql_mulmod(_sql_xorshift("x0", 30), "13787848793156543929::HUGEINT")
    s2 = _sql_mulmod(_sql_xorshift("x1", 27), "10723151780598845931::HUGEINT")
    return [s0, s1, s2]  # final value = _sql_xorshift('x2', 31)


def _image_luma_oracle_sql(n: int = 192, bins: int = 16) -> str:
    """DuckDB replica of q_image_luma with NO input table: regenerates the
    deterministic image corpus arithmetically — splitmix64 (staged mod-2^64
    HUGEINT) reproduces each image's (w, h, fmt) and its full pixel stream,
    the q8 branch applies the same step-5 mid-bin quantization the lossy
    codec stores, and integer BT.601 luma bins + brightness_milli match the
    Spark side, which DECODES THE ACTUAL ENCODED BYTES (raw/rle/q8). A hash
    match therefore proves the whole codec round-trip pixel-exact, not just
    the histogram arithmetic."""
    p0, p1, p2 = _sql_splitmix64_stages("t.j + t.i * 16777216")
    h0, h1, h2 = _sql_splitmix64_stages("ids.i")
    return f"""
        WITH ids AS (SELECT unnest(range(0, {n})) AS i),
        ph0 AS (SELECT i, {h0} AS x0 FROM ids),
        ph1 AS (SELECT i, {h1} AS x1 FROM ph0),
        ph2 AS (SELECT i, {h2} AS x2 FROM ph1),
        dims AS (
          SELECT i,
                 cast(8 + ({_sql_xorshift("x2", 31)}) % 25 as bigint) AS w,
                 cast(8 + (({_sql_xorshift("x2", 31)}) // 256) % 25 as bigint) AS h,
                 CASE i % 3 WHEN 0 THEN 'raw' WHEN 1 THEN 'rle' ELSE 'q8' END AS fmt
          FROM ph2
        ),
        idx AS (SELECT i, fmt, unnest(range(0, w * h * 3)) AS j FROM dims),
        px0 AS (SELECT i, fmt, j, {p0} AS x0 FROM idx t),
        px1 AS (SELECT i, fmt, j, {p1} AS x1 FROM px0),
        px2 AS (SELECT i, fmt, j, {p2} AS x2 FROM px1),
        px AS (
          SELECT i, j,
                 CASE WHEN fmt = 'q8'
                      THEN least((({_sql_xorshift("x2", 31)}) % 256 // 5) * 5 + 2, 255)
                      ELSE ({_sql_xorshift("x2", 31)}) % 256
                 END AS p
          FROM px2
        ),
        tri AS (
          SELECT i, j // 3 AS pix,
                 max(CASE WHEN j % 3 = 0 THEN p END) AS r,
                 max(CASE WHEN j % 3 = 1 THEN p END) AS g,
                 max(CASE WHEN j % 3 = 2 THEN p END) AS b
          FROM px GROUP BY 1, 2
        ),
        luma AS (SELECT i, cast((299 * r + 587 * g + 114 * b) // 1000 as bigint) AS l FROM tri),
        named AS (SELECT 'img' || lpad(i::VARCHAR, 12, '0') AS image_id, l FROM luma)
        SELECT image_id, cast(l * {bins} // 256 as int) AS bin,
               cast(count(*) as bigint) AS n_px
        FROM named GROUP BY 1, 2
        UNION ALL
        SELECT image_id, -1 AS bin,
               cast(1000 * sum(l) // (count(*) * 255) as bigint) AS n_px
        FROM named GROUP BY 1
    """


def _image_cells_oracle_sql(n: int = 2000) -> str:
    """DuckDB replica of q_image_cells with NO input table: regenerates
    each image's derived (lon, lat) — four chained splitmix64 rounds in
    staged mod-2^64 HUGEINT SQL reproduce sources/images.py::lonlat_for
    exactly, including the 30% hotspot branch (integer compare), the
    hotspot jitter, and the IEEE double arithmetic (x/1000.0 - 180.0 is
    the same nearest-double in NumPy and DuckDB; hotspot centers embedded
    via repr) — then assigns the same grid cell and counts. A hash match
    proves the engine's distributed deterministic generation AND the
    salted two-stage aggregation over the skewed (city-hotspot) cells."""
    from geojson_spark.sources.images import HOTSPOTS

    def sm_ctes(tag: str, src: str, in_expr: str, keep: list[str], out: str) -> str:
        s0, s1, s2 = _sql_splitmix64_stages(in_expr)
        k = (", ".join(keep) + ", ") if keep else ""
        return (
            f"{tag}0 AS (SELECT {k}{s0} AS x0 FROM {src}),\n"
            f"{tag}1 AS (SELECT {k}{s1} AS x1 FROM {tag}0),\n"
            f"{tag}2 AS (SELECT {k}{s2} AS x2 FROM {tag}1),\n"
            f"{tag}f AS (SELECT {k}{_sql_xorshift('x2', 31)} AS {out} FROM {tag}2)"
        )

    lon0, lat0 = repr(HOTSPOTS[0][0]), repr(HOTSPOTS[0][1])
    lon1, lat1 = repr(HOTSPOTS[1][0]), repr(HOTSPOTS[1][1])
    lon2, lat2 = repr(HOTSPOTS[2][0]), repr(HOTSPOTS[2][1])
    return f"""
        WITH ids AS (SELECT unnest(range(0, {n})) AS i),
        {sm_ctes("sa", "ids", "i", ["i"], "h1")},
        {sm_ctes("sb", "saf", "h1", ["i", "h1"], "h2")},
        {sm_ctes("sc", "sbf", "h2", ["i", "h1", "h2"], "h3")},
        {sm_ctes("sd", "scf", "h3", ["i", "h1", "h2", "h3"], "h4")},
        pos AS (
          SELECT i,
                 (h1 % 360000)::DOUBLE / 1000.0 - 180.0 AS base_lon,
                 (h2 % 170000)::DOUBLE / 1000.0 - 85.0 AS base_lat,
                 (h3 % 1000) < 300 AS in_hot,
                 (h4 % 3) AS which,
                 ((h3 // 1024) % 2000)::DOUBLE / 100000.0 - 0.01 AS j_lon,
                 ((h3 // 16777216) % 2000)::DOUBLE / 100000.0 - 0.01 AS j_lat
          FROM sdf
        ),
        ll AS (
          SELECT CASE WHEN in_hot
                      THEN (CASE which WHEN 0 THEN {lon0} WHEN 1 THEN {lon1}
                                       ELSE {lon2} END) + j_lon
                      ELSE base_lon END AS lon,
                 CASE WHEN in_hot
                      THEN (CASE which WHEN 0 THEN {lat0} WHEN 1 THEN {lat1}
                                       ELSE {lat2} END) + j_lat
                      ELSE base_lat END AS lat
          FROM pos
        )
        SELECT {GRID_SQL} AS cell_id, count(*) AS n_images
        FROM ll GROUP BY 1
    """


def _minhash_oracle_sql(
    k: int = 5, n_hashes: int = 64, n_bands: int = 16, threshold: float = 0.5
) -> str:
    """DuckDB replica of minhash_lsh_dedup: shingle → md5 base → 64
    universal-hash remixes → per-band FNV fold → band-collision candidates
    → exact-Jaccard verify. Empty documents keep the '' shingle exactly
    like the engine's _shingle_sets verify path, so empty-doc pairs are
    emitted (jaccard 1.0) by BOTH sides; their band keys differ across
    engines (zero signature vs md5('') signature) but collide within each
    engine, and a spurious empty↔non-empty collision verifies to jaccard
    0 either way."""
    rows = n_hashes // n_bands
    fnv_off = 0xCBF29CE484222325
    fnv_prime = 0x100000001B3
    gold = 0x9E3779B97F4A7C15
    mix2 = 0xC2B2AE3D27D4EB4F
    fold_cols = [f"{fnv_off}::HUGEINT + band AS h0"]
    for r in range(rows):
        fold_cols.append(
            _sql_mulmod(f"xor(h{r}::UBIGINT, v{r + 1}::UBIGINT)::HUGEINT", str(fnv_prime))
            + f" AS h{r + 1}"
        )
    pivot_cols = ", ".join(
        f"max(CASE WHEN (i - 1) % {rows} = {r} THEN sig END) AS v{r + 1}"
        for r in range(rows)
    )
    return f"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(coalesce(text, '')), '[ \t\n\x0B\f\r]+'), x -> x <> '') AS words
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           CASE WHEN len(words) >= {k}
                THEN array_to_string(words[i:i+{k - 1}], ' ')
                ELSE coalesce(array_to_string(words, ' '), '') END AS shingle
    FROM w, LATERAL (
      SELECT unnest(generate_series(1, greatest(len(words) - {k - 1}, 1))) AS i
    )
  )
),
base AS (
  SELECT doc_id, {_sql_md5_u64('md5(shingle)')} AS b FROM sh
),
ab AS (
  SELECT i,
         CASE WHEN (i * {gold}::HUGEINT) % {_P64} % 2 = 0
              THEN (i * {gold}::HUGEINT) % {_P64} + 1
              ELSE (i * {gold}::HUGEINT) % {_P64} END AS a,
         (i * {mix2}::HUGEINT) % {_P64} AS bb
  FROM (SELECT unnest(generate_series(1, {n_hashes})) AS i)
),
sig AS (
  SELECT doc_id, i,
         min(({_sql_mulmod('base.b', 'ab.a')} + ab.bb) % {_P64}) AS sig
  FROM base CROSS JOIN ab
  GROUP BY doc_id, i
),
sig_bands AS (
  SELECT doc_id, (i - 1) // {rows} AS band, {pivot_cols}
  FROM sig GROUP BY doc_id, band
),
keys AS (
  SELECT doc_id, band, {', '.join(fold_cols)},
         ((h{rows}::UBIGINT & {0x7FFFFFFFFFFFFFFF}::UBIGINT)
          | (band::UBIGINT << 56))::BIGINT AS band_key
  FROM sig_bands
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM keys a JOIN keys b ON a.band_key = b.band_key AND a.doc_id < b.doc_id
),
counts AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS n_inter
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.id_a
  JOIN sh sb ON sb.doc_id = c.id_b AND sb.shingle = sa.shingle
  GROUP BY c.id_a, c.id_b
)
SELECT i.id_a, i.id_b,
       floor((i.n_inter::DOUBLE / greatest(1, ca.n + cb.n - i.n_inter)) * 1000) / 1000
         AS jaccard
FROM inter i
JOIN counts ca ON ca.doc_id = i.id_a
JOIN counts cb ON cb.doc_id = i.id_b
WHERE i.n_inter::DOUBLE / greatest(1, ca.n + cb.n - i.n_inter) >= {threshold!r}
"""


def _simhash_oracle_sql(max_hamming: int = 3) -> str:
    """DuckDB replica of simhash_dedup: md5-hashed unigram+bigram features
    → per-bit vote sums → 64-bit SimHash → pigeonhole chunk candidates →
    bit_count(xor) verify."""
    n_chunks = max_hamming + 1
    bounds = [round(i * 64 / n_chunks) for i in range(n_chunks + 1)]
    chunk_rows = []
    for i in range(n_chunks):
        lo, width = bounds[i], bounds[i + 1] - bounds[i]
        mask = (1 << width) - 1
        chunk_rows.append(
            f"SELECT doc_id, h, {i} AS chunk_no,"
            f" (h // {1 << lo}) % {mask + 1} AS chunk FROM hashes"
        )
    chunks_sql = " UNION ALL ".join(chunk_rows)
    return f"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(coalesce(text, '')), '[ \t\n\x0B\f\r]+'), x -> x <> '') AS words
  FROM documents
),
feats AS (
  SELECT doc_id, f FROM (
    SELECT doc_id, unnest(words) AS f FROM w
    UNION ALL
    SELECT doc_id, words[i] || ' ' || words[i + 1] AS f
    FROM w, LATERAL (SELECT unnest(generate_series(1, len(words) - 1)) AS i)
    WHERE len(words) >= 2
  )
),
fh AS (
  SELECT doc_id, {_sql_md5_u64('md5(f)')} AS b FROM feats
),
votes AS (
  SELECT doc_id, bit,
         sum(CASE WHEN (b // (1::HUGEINT << bit)) % 2 = 1 THEN 1 ELSE -1 END) AS v
  FROM fh CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS bit)
  GROUP BY doc_id, bit
),
hashes AS (
  SELECT doc_id,
         coalesce(sum(CASE WHEN v > 0 THEN (1::HUGEINT << bit) END), 0)::HUGEINT AS h
  FROM votes GROUP BY doc_id
  UNION ALL
  SELECT doc_id, 0::HUGEINT AS h FROM w WHERE len(words) = 0
),
chunks AS ({chunks_sql}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         a.h AS h_a, b.h AS h_b
  FROM chunks a JOIN chunks b
    ON a.chunk_no = b.chunk_no AND a.chunk = b.chunk AND a.doc_id < b.doc_id
)
SELECT id_a, id_b,
       bit_count(xor(h_a::UBIGINT, h_b::UBIGINT))::BIGINT AS hamming
FROM cand
WHERE bit_count(xor(h_a::UBIGINT, h_b::UBIGINT)) <= {max_hamming}
"""


def _sql_pow_chain(e_expr: str, base: int, prefix: str, mod: int, maxj: int = 27):
    """Lateral-alias chain computing base^(e_expr) mod ``mod`` via binary
    decomposition with Python-precomputed base^(2^j) constants — SQL has
    no modpow; ``maxj`` CASE-guarded multiplies cover exponents below
    2^maxj (default 2^27 = documents up to 128 MB — exponent bits above
    the cap would silently drop, so the cap is set far past any document
    the driver feeds this oracle)."""
    consts = []
    b = base % mod
    for _ in range(maxj):
        consts.append(b)
        b = b * b % mod
    cols = [f"1::BIGINT AS {prefix}0"]
    for j in range(maxj):
        cols.append(
            f"({prefix}{j} * (CASE WHEN (({e_expr}) // {1 << j}) % 2 = 1 "
            f"THEN {consts[j]} ELSE 1 END)) % {mod} AS {prefix}{j + 1}"
        )
    return ", ".join(cols), f"{prefix}{maxj}"


def _fp_oracle_sql(window: int = 64, mod: int = (1 << 31) - 1) -> str:
    """DuckDB replica of rolling_fingerprint: the SAME modular
    prefix-product derivation as functions/text.py — S[t] = Σ byte·inv257^t
    (a windowed SUM), window hash = (S[i+w]−S[i])·257^(i+w−1) mod p, min
    per document. The ≤window short-doc fold is the w_eff = L special case
    of the same formula; empty documents fingerprint to 0."""
    inv257 = pow(257, -1, mod)
    inv_chain, inv_alias = _sql_pow_chain("t", inv257, "iv", mod)
    pw_chain, pw_alias = _sql_pow_chain("i + weff - 1", 257, "pw", mod)
    return f"""
WITH b AS (
  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS L
  FROM documents
),
bytes AS (
  SELECT doc_id, t,
         ((strpos('0123456789ABCDEF', substr(hx, 2*t+1, 1)) - 1) * 16
          + (strpos('0123456789ABCDEF', substr(hx, 2*t+2, 1)) - 1))::BIGINT AS byte
  FROM b, LATERAL (SELECT unnest(generate_series(0, L - 1)) AS t)
  WHERE L > 0
),
terms AS (
  SELECT doc_id, t, {inv_chain},
         byte * {inv_alias} AS term
  FROM bytes
),
cums AS (
  SELECT doc_id, t,
         sum(term) OVER (PARTITION BY doc_id ORDER BY t
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM terms
),
wins AS (
  SELECT d.doc_id, i, least({window}, d.L) AS weff
  FROM (SELECT doc_id, L FROM b WHERE L > 0) d,
       LATERAL (SELECT unnest(generate_series(0, d.L - least({window}, d.L))) AS i)
),
h AS (
  SELECT w.doc_id, {pw_chain},
         (((hi.cum - coalesce(lo.cum, 0)) % {mod}) * {pw_alias}) % {mod} AS hh
  FROM wins w
  JOIN cums hi ON hi.doc_id = w.doc_id AND hi.t = w.i + w.weff - 1
  LEFT JOIN cums lo ON lo.doc_id = w.doc_id AND lo.t = w.i - 1
),
m AS (SELECT doc_id, min(hh) AS fp FROM h GROUP BY doc_id)
SELECT d.doc_id, coalesce(m.fp, 0)::BIGINT AS fingerprint
FROM documents d LEFT JOIN m ON m.doc_id = d.doc_id
"""


def _sql_md5_prefix32(key_sql: str, seed: int) -> str:
    """First 8 hex chars of md5(key ':seed') as a 32-bit integer —
    DuckDB replica of operators/splits._hash_unit."""
    h = f"md5({key_sql}::VARCHAR || ':{seed}')"
    terms = [
        f"(strpos('0123456789abcdef', substr({h}, {b}, 1)) - 1) * {16 ** (8 - b)}"
        for b in range(1, 9)
    ]
    return "(" + " + ".join(terms) + ")"


def _split_case_sql(key_sql: str, seed: int = 42, weights=None) -> str:
    """CASE expression assigning the hash_split name — thresholds computed
    with the SAME Python float accumulation as hash_split so both sides
    agree to the last integer."""
    if weights is None:
        weights = {"train": 0.9, "val": 0.05, "test": 0.05}
    total = float(sum(weights.values()))
    scale = float(1 << 32)
    items = list(weights.items())
    u = _sql_md5_prefix32(key_sql, seed)
    acc = 0.0
    # null ids route to the FIRST split, mirroring hash_split's policy
    whens = [f"WHEN {key_sql} IS NULL THEN '{items[0][0]}'"]
    for name, wgt in items[:-1]:
        acc += wgt / total
        whens.append(f"WHEN {u} < {int(acc * scale)} THEN '{name}'")
    return "CASE " + " ".join(whens) + f" ELSE '{items[-1][0]}' END"


def _shingle3_sql(src: str, extra_cols: str = "") -> str:
    """Distinct raw-text 3-word shingles per doc — replicates
    _shingle_sets (incl. the <k-word fallback to one joined shingle, and
    the empty-doc '' shingle)."""
    return f"""
  SELECT DISTINCT doc_id{extra_cols}, shingle FROM (
    SELECT doc_id{extra_cols},
           CASE WHEN len(words) >= 3
                THEN array_to_string(words[i:i+2], ' ')
                ELSE coalesce(array_to_string(words, ' '), '') END AS shingle
    FROM (
      SELECT doc_id{extra_cols},
             list_filter(string_split_regex(coalesce(text, ''), '[ \t\n\x0B\f\r]+'), x -> x <> '') AS words
      FROM {src}
    ), LATERAL (
      SELECT unnest(generate_series(1, greatest(len(words) - 2, 1))) AS i
    )
  )"""


def _stratified_oracle_sql(fractions: dict, seed: int = 7) -> str:
    """Replicates stratified_sample — thresholds via the SAME
    ``int(float(frac) * 2^32)`` conversion as the operator, including its
    domain-separated hash (':sample:' infix — see operators/splits)."""
    scale = float(1 << 32)
    u = _sql_md5_prefix32("doc_id", f"sample:{seed}")
    conds = " OR ".join(
        f"(lang = '{k}' AND {u} < {int(float(v) * scale)})"
        for k, v in fractions.items()
    )
    return f"SELECT doc_id, lang FROM documents WHERE {conds}"


def _contamination_oracle_sql() -> str:
    return f"""
WITH s AS (
  SELECT doc_id, text, {_split_case_sql('doc_id')} AS split FROM documents
),
sh AS ({_shingle3_sql('s', ', split')}),
train_sh AS (SELECT DISTINCT shingle FROM sh WHERE split = 'train'),
test_sh AS (SELECT doc_id, shingle FROM sh WHERE split <> 'train')
SELECT t.doc_id,
       count(*) AS n_shingles,
       count(tr.shingle) AS n_contaminated
FROM test_sh t LEFT JOIN train_sh tr ON tr.shingle = t.shingle
GROUP BY t.doc_id
"""


_NATION_RECTS_SQL = """
    SELECT n_nationkey AS poly_id,
           (n_nationkey * 37) % 300 - 160 + 0.0005 AS x0,
           (n_nationkey * 53) % 140 - 75 + 0.0005 AS y0,
           ((n_nationkey * 37) % 300 - 160 + 0.0005) + 12.0 AS x1,
           ((n_nationkey * 53) % 140 - 75 + 0.0005) + 9.0 AS y1
    FROM nation
"""


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def q_cell_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell aggregation through BOTH physical strategies, union-tagged
    by `src` (folds the former salted_counts query so zonal_stats fits in
    the driver's 50-slot oracle window): 'plain' = single hash aggregate,
    'salted' = the skew-defensive salted two-stage aggregate
    (operators/agg.salted_agg). Identical values, different plans — the
    oracle checks both legs against one SQL aggregation."""
    from geojson_spark.operators.agg import salted_agg

    pts = (
        _lineitem_points(spark, sf_dir)
        .withColumn("cell_id", grid_cell(F.col("lon"), F.col("lat")))
        .withColumn("qty_int", F.floor("l_quantity"))
    )
    plain = pts.groupBy("cell_id").agg(
        F.count("*").alias("n_points"), F.sum("qty_int").alias("sum_qty")
    )
    salted = salted_agg(
        pts, "cell_id", {"n_points": ("count", "p_id"), "sum_qty": ("sum", "qty_int")},
        salt_col="p_id", n_salts=8,
    )

    def shape(df, tag):
        return df.select(
            F.lit(tag).alias("src"),
            "cell_id",
            F.col("n_points").cast("bigint").alias("n_points"),
            F.col("sum_qty").cast("bigint").alias("sum_qty"),
        )

    return shape(plain, "plain").unionByName(shape(salted, "salted"))


def q_bbox_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    from geojson_spark.operators.agg import bbox_union_2d

    pts = _lineitem_points(spark, sf_dir).withColumn(
        "cell_id", grid_cell(F.col("lon"), F.col("lat"))
    )
    with_bbox = pts.withColumn("bbox", F.array("lon", "lat", "lon", "lat"))
    return bbox_union_2d(with_bbox, ["cell_id"])


def q_pip_rects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIP counts through BOTH index paths in one oracle slot, union-tagged
    by ``idx`` ('grid' = fixed cover-level ladder, 's2' = multi-level S2
    cover) — the former separate pip_rects_s2 entry folded in (round-5
    slot consolidation; frees a slot for stream_cell_counts). One SQL
    aggregation cross-joined with the two tags checks both plans."""
    from geojson_spark.operators.joins import pip_join

    pts = _lineitem_points(spark, sf_dir).select("p_id", "lon", "lat")
    polys = _nation_rects(spark, sf_dir)

    def leg(index: str) -> DataFrame:
        joined = pip_join(pts, polys, index=index)
        return joined.groupBy("poly_id").agg(F.count("*").alias("n_points")).select(
            F.lit(index).alias("idx"), "poly_id", "n_points"
        )

    return leg("grid").unionByName(leg("s2"))


def _cell_counts_from_features(feats: DataFrame) -> DataFrame:
    """Shared downstream of the STREAMING parse path: parsed feature rows →
    per-cell point counts. Used identically by the batch oracle query
    (q_stream_cell_counts) and the readStream pipeline in
    tests/test_streaming_source.py, so stream == batch == DuckDB is one
    three-way equality over the same aliased aggregation."""
    pts = feats.select(
        F.element_at(F.col("geometry.coords"), 1).alias("lon"),
        F.element_at(F.col("geometry.coords"), 2).alias("lat"),
    )
    return (
        pts.withColumn("cell_id", grid_cell(F.col("lon"), F.col("lat")))
        .groupBy("cell_id")
        .agg(F.count("*").alias("n_points"))
    )


def _customer_feature_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One ndjson Feature line per customer (column ``value``), built in
    SQL with the engine's float-repr cast — the exact line format
    read_geojson_stream consumes."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    lon, lat = derived_lonlat(F.col("c_custkey").cast("bigint"))
    return cust.select(
        F.concat(
            F.lit('{"type":"Feature","geometry":{"type":"Point","coordinates":['),
            lon.cast("string"),
            F.lit(","),
            lat.cast("string"),
            F.lit(']},"properties":{"k":'),
            F.col("c_custkey").cast("string"),
            F.lit("}}"),
        ).alias("value")
    )


def q_stream_cell_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch semantics of the streaming pipeline (readStream ndjson →
    parse_feature_udf → cell agg): builds the SAME feature lines the
    stream test writes to disk, parses them with the SAME single-feature
    UDF read_geojson_stream uses, and aggregates through the SAME
    _cell_counts_from_features — so the DuckDB oracle, this batch run,
    and the streaming run in tests/test_streaming_source.py check one
    aliased query three ways."""
    from geojson_spark.sources.geojson import parse_feature_udf

    lines = _customer_feature_lines(spark, sf_dir)
    feats = (
        lines.where(F.length(F.trim(F.col("value"))) > 0)
        .select(parse_feature_udf(F.col("value")).alias("f"))
        .select("f.*")
    )
    return _cell_counts_from_features(feats)


def _nation_rects_holes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation rectangles with a centered rectangular hole (ring 1) —
    exercises multi-ring ray casting through the oracle gate."""
    import pandas as pd

    nat = spark.read.parquet(f"{sf_dir}/nation.parquet").collect()
    rows = []
    for r in nat:
        x0 = (r.n_nationkey * 37) % 300 - 160 + 0.0005
        y0 = (r.n_nationkey * 53) % 140 - 75 + 0.0005
        x1, y1 = x0 + 12.0, y0 + 9.0
        hx0, hy0, hx1, hy1 = x0 + 3.0, y0 + 2.0, x0 + 9.0, y0 + 7.0
        rows.append(
            {
                "poly_id": int(r.n_nationkey),
                "coords": [x0, y0, x1, y0, x1, y1, x0, y1, x0, y0,
                           hx0, hy0, hx1, hy0, hx1, hy1, hx0, hy1, hx0, hy0],
                "ring_offsets": [0, 5, 10],
                "part_offsets": [0, 1],
                "dim": 2,
                "bbox": [x0, y0, x1, y1],
            }
        )
    return spark.createDataFrame(pd.DataFrame(rows))


def q_pip_holes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIP join against polygons WITH interior holes: counts per polygon of
    points inside the shell but outside the hole (multi-ring ray cast)."""
    from geojson_spark.operators.joins import pip_join

    pts = _lineitem_points(spark, sf_dir)
    polys = _nation_rects_holes(spark, sf_dir)
    joined = pip_join(pts.select("p_id", "lon", "lat"), polys, index="grid")
    return joined.groupBy("poly_id").agg(F.count("*").alias("n_points"))


def q_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from geojson_spark.operators.joins import knn_join

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").where(F.col("c_custkey") < 20)
    qlon, qlat = derived_lonlat(F.col("c_custkey").cast("bigint"))
    queries = cust.select(
        F.col("c_custkey").cast("bigint").alias("q_id"), qlon.alias("q_lon"), qlat.alias("q_lat")
    )
    pts = _lineitem_points(spark, sf_dir).select(
        "p_id", F.col("lon").alias("p_lon"), F.col("lat").alias("p_lat")
    )
    out = knn_join(queries, pts, k=5, metric="euclidean_deg2")
    return out.select("q_id", "p_id", F.col("rn").cast("bigint").alias("rn"))


def q_tile_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _lineitem_points(spark, sf_dir).withColumn(
        "cell_id", grid_cell(F.col("lon"), F.col("lat"))
    )
    return (
        pts.withColumn("tile_id", grid_parent(F.col("cell_id"), 16))
        .groupBy("tile_id")
        .agg(F.count("*").alias("n_points"), F.sum(F.floor("l_quantity")).alias("sum_qty"))
    )


def q_region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
    reg = spark.read.parquet(f"{sf_dir}/region.parquet")
    return (
        cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint")).alias("acctbal_cents"),
        )
    )


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from geojson_spark.operators.dedup import exact_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return exact_dedup(docs)


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc char/whitespace-token stats plus GPT-2-style BPE
    pre-tokenization counts in ONE projection (all JVM-side: length /
    replace / regexp_count; the identical RE2-safe pattern runs in
    DuckDB for the oracle). Folded from the former token_stats +
    bpe_token_stats queries so both stay inside the driver's 50-query
    oracle window."""
    from geojson_spark.functions.spark_funcs import bpe_token_count

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t = F.col("text")
    return docs.select(
        "doc_id",
        F.length(t).alias("n_chars"),
        (F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit(""))) + 1).alias("n_tokens"),
        (F.length(t) - F.length(F.replace(t, F.lit("."), F.lit("")))).alias("n_periods"),
        (F.length(t) - F.length(F.replace(t, F.lit(","), F.lit("")))).alias("n_commas"),
        bpe_token_count(t).alias("n_bpe_tokens"),
        # the ONE engine-wide word class (text.WORD_RE, includes \x0B) —
        # a hand-spelled variant omitting \x0B silently disagreed with
        # bm25 dl / repetition / shingle counts on vertical-tab docs
        F.regexp_count(t, F.lit(WORD_RE)).cast("bigint").alias("n_ws_tokens"),
    )


def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test decontamination signal: per held-out document, how many
    of its 3-word shingles appear anywhere in the train split. The train
    side reduces to its distinct shingle set before the equi-join."""
    from geojson_spark.operators.splits import contamination_check, hash_split

    docs = hash_split(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), seed=42
    )
    train = docs.where(F.col("split") == "train")
    test = docs.where(F.col("split") != "train")
    return contamination_check(train, test, k_shingle=3)


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy per-shard sequence packing (capacity 256 whitespace tokens,
    8 shards) — the sample-packing step before LLM training; the DuckDB
    oracle replays the same fold with a recursive CTE."""
    from geojson_spark.operators.splits import pack_sequences

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        (F.col("doc_id") % 8).alias("shard"),
        F.regexp_count(F.coalesce(F.col("text"), F.lit("")), F.lit(WORD_RE))
        .cast("long")
        .alias("n_tokens"),
    )
    return pack_sequences(docs, capacity=256)


def _doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, q_milli bigint, q_score double) — the quality-score
    derivation shared by q_text_signals and q_corpus_filter: len term +
    punctuation-rate term + word-length term, floor-rounded to integer
    millis so checked outputs are float-luck-free."""
    docs = q_token_stats(spark, sf_dir)
    n_chars = F.col("n_chars").cast("double")
    n_tok = F.col("n_tokens").cast("double")
    n_punct = (F.col("n_periods") + F.col("n_commas")).cast("double")
    len_term = F.least(n_chars / 200.0, F.lit(1.0))
    punct_term = F.least(n_punct / n_tok * 5.0, F.lit(1.0))
    wlen_term = F.greatest(
        F.lit(0.0), F.least(F.lit(1.0), 1.0 - F.abs((n_chars - (n_tok - 1)) / n_tok - 5.0) / 10.0)
    )
    milli = F.floor((0.4 * len_term + 0.3 * punct_term + 0.3 * wlen_term) * 1000.0)
    return docs.select(
        "doc_id",
        milli.cast("bigint").alias("q_milli"),
        (milli / 1000.0).alias("q_score"),
    )


def q_text_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two text-curation signals in one checked result (folded from the
    former quality_score + lang_distribution queries so the round-3 image
    queries fit inside the driver's 50-query oracle window): (a) per-doc
    quality score as exact integer millis — len term + punctuation-rate
    term + word-length term, arithmetic identical to the oracle SQL —
    and (b) language-ID heuristic counts (stopword-profile argmax; the
    DuckDB oracle replicates it via list_intersect, and accuracy vs the
    table's lang labels is additionally asserted in pytest). Legs tagged
    by `src` on a common (src, key, v) schema."""
    from pyspark.sql.types import StringType

    from geojson_spark.functions.text import lang_id

    quality = _doc_quality(spark, sf_dir).select(
        F.lit("quality").alias("src"),
        F.col("doc_id").cast("string").alias("key"),
        F.col("q_milli").alias("v"),
    )

    @F.pandas_udf(StringType())
    def _lang(texts: pd.Series) -> pd.Series:
        return pd.Series(lang_id(texts))

    raw = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lang = (
        raw.select(_lang(F.col("text")).alias("pred_lang"))
        .groupBy("pred_lang")
        .agg(F.count("*").alias("n_docs"))
        .select(
            F.lit("lang").alias("src"),
            F.col("pred_lang").alias("key"),
            F.col("n_docs").cast("bigint").alias("v"),
        )
    )
    return quality.unionByName(lang)


def q_events_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from geojson_spark.streaming.windows import windowed_cell_counts

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = windowed_cell_counts(ev, window="1 hour")
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "cell_id",
        "event_type",
        F.col("n_events").cast("bigint").alias("n_events"),
    )


def _quantize_embedding(col: Column) -> Column:
    """Shared-derivation cosine quantization (oracle rule): float32→float64
    is exact, ×65536 (a power of two) is exact, banker's round (Spark
    bround ≡ DuckDB round_even ≡ np.round) gives integer-valued doubles.
    With 64 dims and |x| ≤ ~1 every dot/norm sum stays far below 2^53, so
    the sums are EXACT regardless of accumulation order and the final
    cosine = dot/sqrt(na·nb) is one multiply + sqrt + divide — bit-identical
    between NumPy and DuckDB with no float luck."""
    return F.transform(col.cast("array<double>"), lambda x: F.bround(x * 65536.0))


_QUANT_SQL = "list_transform(embedding, x -> round_even(CAST(x AS DOUBLE) * 65536.0, 0))"
# cosine over quantized lists, mirroring similarity._cosine_col (JVM
# Columns) and the Gram kernel in cosine_pairs_blocked: num/sqrt(na*nb),
# 0 when den=0 — edits there must keep this SQL in lockstep
_COS_SQL = (
    "CASE WHEN sqrt(list_dot_product({a}, {a}) * list_dot_product({b}, {b})) > 0 "
    "THEN list_dot_product({a}, {b}) "
    "/ sqrt(list_dot_product({a}, {a}) * list_dot_product({b}, {b})) "
    "ELSE 0.0 END"
)


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k over QUANTIZED embeddings: the ×65536 banker's
    quantization (see _quantize_embedding) makes every dot/norm sum exact,
    so ranks no longer depend on NumPy-vs-DuckDB float derivation luck."""
    from geojson_spark.operators.similarity import cosine_topk_bruteforce

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", _quantize_embedding(F.col("embedding")).alias("embedding")
    )
    queries = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    out = cosine_topk_bruteforce(queries, emb, 10)
    return out.select("q_id", "vec_id", F.col("rank").cast("bigint").alias("rank"))


def q_geojson_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build GeoJSON Feature docs in SQL, parse them through the engine's
    vectorized parser, extract coordinates back out — parse fidelity vs an
    oracle that never sees JSON."""
    from geojson_spark.sources.geojson import parse_features_udf

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    lon, lat = derived_lonlat(F.col("c_custkey").cast("bigint"))
    docs = cust.select(
        F.col("c_custkey").cast("bigint").alias("c_custkey"),
        F.concat(
            F.lit('{"type":"Feature","geometry":{"type":"Point","coordinates":['),
            lon.cast("string"),
            F.lit(","),
            lat.cast("string"),
            F.lit(']},"properties":{"name":"'),
            F.col("c_name"),
            F.lit('"}}'),
        ).alias("doc"),
    )
    parsed = docs.select(
        "c_custkey", F.explode(parse_features_udf(F.col("doc"))).alias("f")
    )
    return parsed.select(
        "c_custkey",
        F.element_at(F.col("f.geometry.coords"), 1).alias("x"),
        F.element_at(F.col("f.geometry.coords"), 2).alias("y"),
        F.get_json_object(F.col("f.properties"), "$.name").alias("name"),
    )


def q_polygon_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polygon parse ⇄ serialize fidelity through the oracle gate: build
    Polygon Feature docs in SQL, parse with the engine, SERIALIZE the
    geometry back to GeoJSON, REPARSE that, and extract the ring corners —
    any drift in either direction breaks the value-hash match."""
    from geojson_spark.sources.geojson import parse_features_udf, to_geometry_json

    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
    x0 = (F.col("n_nationkey") * 37) % 300 - 160 + 0.0005
    y0 = (F.col("n_nationkey") * 53) % 140 - 75 + 0.0005
    x1, y1 = x0 + 12.0, y0 + 9.0

    def pos(x, y):
        return F.concat(F.lit("["), x.cast("string"), F.lit(","), y.cast("string"), F.lit("]"))

    ring = F.concat_ws(",", pos(x0, y0), pos(x1, y0), pos(x1, y1), pos(x0, y1), pos(x0, y0))
    doc = F.concat(
        F.lit('{"type":"Feature","geometry":{"type":"Polygon","coordinates":[['),
        ring,
        F.lit(']]},"properties":null}'),
    )
    parsed = nat.select(
        F.col("n_nationkey").cast("bigint").alias("poly_id"),
        F.explode(parse_features_udf(doc)).alias("f"),
    )
    reser = parsed.select(
        "poly_id",
        F.concat(
            F.lit('{"type":"Feature","geometry":'),
            to_geometry_json(F.col("f.geometry")),
            F.lit(',"properties":null}'),
        ).alias("doc2"),
    )
    round2 = reser.select(
        "poly_id", F.explode(parse_features_udf(F.col("doc2"))).alias("f")
    )
    c = F.col("f.geometry.coords")
    return round2.select(
        "poly_id",
        F.element_at(c, 1).alias("x0"),
        F.element_at(c, 2).alias("y0"),
        F.element_at(c, 5).alias("x1"),
        F.element_at(c, 6).alias("y1"),
        F.size(c).alias("n_coords"),
    )


def q_fidelity_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fidelity corners through the oracle gate (P9/S1): features carrying
    FOREIGN MEMBERS, 3-D positions, and string-vs-number ids, built in
    SQL, round-tripped parse → serialize → reparse, then reduced to
    scalars a DuckDB oracle reproduces. Any drift in foreign-member
    preservation, z-coordinate handling, or the id string|number union
    breaks the value hash."""
    from geojson_spark.sources.geojson import parse_features_udf, to_feature_json

    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
    k = F.col("n_nationkey")
    # exact binary fractions only: string round-trip is bit-identical
    x = (k * 37) % 300 - 160 + 0.25
    y = (k * 53) % 140 - 70 + 0.5
    z = k + 0.125
    id_json = F.when(k % 2 == 0, F.concat(F.lit('"nat-'), k.cast("string"), F.lit('"'))).otherwise(
        (k * 10).cast("string")
    )
    doc = F.concat(
        F.lit('{"type":"Feature","geometry":{"type":"Point","coordinates":['),
        F.concat_ws(",", x.cast("string"), y.cast("string"), z.cast("string")),
        F.lit(']},"properties":{"name":"p'),
        k.cast("string"),
        F.lit('"},"id":'),
        id_json,
        F.lit(',"rank":'),
        (k * 3).cast("string"),
        F.lit(',"src":"syn"}'),
    )
    parsed = nat.select(
        k.cast("bigint").alias("fid"), F.explode(parse_features_udf(doc)).alias("f")
    )
    reser = parsed.select("fid", to_feature_json(F.col("f")).alias("doc2"))
    round2 = reser.select("fid", F.explode(parse_features_udf(F.col("doc2"))).alias("f"))
    c = F.col("f.geometry.coords")
    return round2.select(
        "fid",
        F.element_at(c, 1).alias("x"),
        F.element_at(c, 2).alias("y"),
        F.element_at(c, 3).alias("z"),
        F.col("f.geometry.dim").cast("bigint").alias("dim"),
        F.col("f.id_json").alias("id_json"),
        F.get_json_object(F.col("f.foreign_members"), "$.rank").cast("bigint").alias("rank"),
        F.get_json_object(F.col("f.foreign_members"), "$.src").alias("src"),
        F.get_json_object(F.col("f.properties"), "$.name").alias("name"),
    )


def _s2_rollup_oracle_sql() -> str:
    """DuckDB replica of q_s2_tile_rollup, bit-exact with zero float luck.

    Chain shared with the engine: integer (a,b,c) → double (exact) →
    n = sqrt(a²+b²+c²) (sums of exact ints, one correctly-rounded sqrt) →
    x,y,z single divides → face by |·| comparisons → u,v single divides →
    S2 quadratic st (one sqrt + fixed multiplies) → i30 = trunc(st·2³⁰)
    clamped → i7 = i30 // 2²³ → 7 unrolled steps of the classic per-bit
    Hilbert (intermediates re-masked to [0, s) so SQL's division-based bit
    extraction matches NumPy's two's-complement &) → level-7 parent id =
    face·2⁶¹ + d₇·2⁴⁷ + 2⁴⁶ computed in HUGEINT and wrapped mod 2⁶⁴ to
    signed BIGINT, exactly the engine's int64 packing."""
    steps = []
    for k, s in enumerate((64, 32, 16, 8, 4, 2, 1)):
        p = f"h{k}"
        c = f"h{k + 1}"
        steps.append(f"""
        , {c} AS (
          SELECT face,
            CASE WHEN ry = 1 THEN x
                 WHEN rx = 1 THEN ((({s} - 1 - y) % {s}) + {s}) % {s}
                 ELSE y END AS x,
            CASE WHEN ry = 1 THEN y
                 WHEN rx = 1 THEN ((({s} - 1 - x) % {s}) + {s}) % {s}
                 ELSE x END AS y,
            d + {s * s} * (CASE WHEN rx = 0 THEN ry ELSE 3 - ry END) AS d
          FROM (
            SELECT face, x, y, d,
                   (x // {s}) % 2 AS rx, (y // {s}) % 2 AS ry
            FROM {p}
          )
        )""")
    hilbert = "".join(steps)
    return f"""
        WITH pid AS (
          SELECT (l_orderkey*10 + l_linenumber)::BIGINT AS p_id FROM lineitem
        ), abc AS (
          SELECT cast((p_id * 7919) % 2001 - 1000 as double) AS a,
                 cast((p_id * 104729) % 2001 - 1000 as double) AS b,
                 cast(((p_id * 1299709) % 1999 - 999) * 2 + 1 as double) AS c
          FROM pid
        ), xyz AS (
          SELECT a / n AS x, b / n AS y, c / n AS z FROM (
            SELECT a, b, c, sqrt(a*a + b*b + c*c) AS n FROM abc
          )
        ), f1 AS (
          SELECT x, y, z,
            CASE WHEN abs(x) >= abs(y)
                 THEN (CASE WHEN abs(x) >= abs(z) THEN 0 ELSE 2 END)
                 ELSE (CASE WHEN abs(y) >= abs(z) THEN 1 ELSE 2 END) END AS axis
          FROM xyz
        ), f2 AS (
          SELECT *, CASE axis WHEN 0 THEN x WHEN 1 THEN y ELSE z END AS major FROM f1
        ), f3 AS (
          SELECT *, CASE WHEN major < 0 THEN axis + 3 ELSE axis END AS face FROM f2
        ), f4 AS (
          SELECT face,
            (CASE face WHEN 0 THEN y WHEN 1 THEN -x WHEN 2 THEN -x
                       WHEN 3 THEN z WHEN 4 THEN z ELSE -y END) / major AS u,
            (CASE face WHEN 0 THEN z WHEN 1 THEN z WHEN 2 THEN -y
                       WHEN 3 THEN y WHEN 4 THEN -x ELSE -x END) / major AS v
          FROM f3
        ), st AS (
          SELECT face,
            CASE WHEN u >= 0 THEN 0.5*sqrt(abs(1.0 + 3.0*u))
                 ELSE 1.0 - 0.5*sqrt(abs(1.0 - 3.0*u)) END AS s,
            CASE WHEN v >= 0 THEN 0.5*sqrt(abs(1.0 + 3.0*v))
                 ELSE 1.0 - 0.5*sqrt(abs(1.0 - 3.0*v)) END AS t
          FROM f4
        ), h0 AS (
          SELECT face,
            least(greatest(cast(trunc(s * 1073741824.0) as bigint), 0), 1073741823)
              // 8388608 AS x,
            least(greatest(cast(trunc(t * 1073741824.0) as bigint), 0), 1073741823)
              // 8388608 AS y,
            0::BIGINT AS d
          FROM st
        ){hilbert}
        SELECT CASE WHEN t >= 9223372036854775808::HUGEINT
                    THEN cast(t - 18446744073709551616::HUGEINT as bigint)
                    ELSE cast(t as bigint) END AS tile7,
               count(*) AS n_points
        FROM (
          SELECT face::HUGEINT * 2305843009213693952::HUGEINT
                 + d::HUGEINT * 140737488355328::HUGEINT
                 + 70368744177664::HUGEINT AS t
          FROM h7
        )
        GROUP BY 1
    """


def _geohash_sql(lon_sql: str, lat_sql: str, precision: int) -> str:
    """DuckDB replica of geohash_string: same bit interleave + base32."""
    from geojson_spark.functions.spark_funcs import GEOHASH_BASE32

    half = 5 * precision // 2
    lim = 1 << half
    # both-bounds clamp mirrors geohash_cell (out-of-range → cell 0)
    x = f"greatest(least(cast(floor(({lon_sql} + 180.0) / 360.0 * {float(lim)}) as bigint), {lim - 1}), 0)"
    y = f"greatest(least(cast(floor(({lat_sql} + 90.0) / 180.0 * {float(lim)}) as bigint), {lim - 1}), 0)"
    terms = []
    for i in range(half):
        terms.append(f"(({x} // {1 << i}) % 2) * {1 << (2 * i + 1)}")
        terms.append(f"(({y} // {1 << i}) % 2) * {1 << (2 * i)}")
    cell = "(" + " + ".join(terms) + ")"
    nbits = 5 * precision
    chars = [
        f"substr('{GEOHASH_BASE32}', cast(({cell} // {1 << (nbits - 5 * (c + 1))}) % 32 + 1 as int), 1)"
        for c in range(precision)
    ]
    return " || ".join(chars)


def q_geohash_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geohash cell assignment (the fourth index family next to grid, S2,
    hex): pure Column bit interleave + base32, no UDF, whole-stage
    codegen; groupBy counts per precision-4 geohash. Verified against the
    classic bisection encoder in pytest and bit-replicated in SQL."""
    from geojson_spark.functions.spark_funcs import derived_lonlat, geohash_string

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    lon, lat = derived_lonlat(F.col("l_orderkey").cast("bigint"))
    return (
        li.select(geohash_string(lon, lat, 4).alias("geohash"))
        .groupBy("geohash")
        .agg(F.count("*").alias("n_points"))
    )


def q_tile_pyramid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-tile pyramid build: every point contributes to 3 zoom levels
    (base grid, ÷16, ÷256) via one explode + ONE aggregation pass —
    map-side combine collapses the fan-out so the shuffle carries ~tile
    cardinality, not points × levels."""
    from geojson_spark.functions.spark_funcs import grid_cell
    from geojson_spark.operators.agg import tile_pyramid

    pts = _lineitem_points(spark, sf_dir)
    keyed = pts.withColumn("cell_id", grid_cell(F.col("lon"), F.col("lat")))
    return tile_pyramid(keyed, factors=(1, 16, 256), value_col="l_quantity").select(
        "level",
        "tile_id",
        "n_points",
        F.col("sum_l_quantity").cast("bigint").alias("sum_qty"),
    )


def q_bbox_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rectangle-intersection join via PBSM grid partitioning with
    reference-point dedup (each pair emitted in exactly one cell — no
    dropDuplicates); the oracle is the plain theta join. Overlap areas
    come out as floor-milli integers with the derivation shared between
    engines."""
    from geojson_spark.operators.joins import bbox_join

    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
    k = F.col("n_nationkey")
    ax0 = (k * 37) % 300 - 160 + 0.0005
    ay0 = (k * 53) % 140 - 75 + 0.0005
    a = nat.select(
        k.cast("bigint").alias("id_a"),
        ax0.alias("ax0"), ay0.alias("ay0"),
        (ax0 + 12.0).alias("ax1"), (ay0 + 9.0).alias("ay1"),
    )
    bx0 = (k * 41) % 300 - 160 + 0.2505
    by0 = (k * 59) % 140 - 75 + 0.2505
    b = nat.select(
        k.cast("bigint").alias("id_b"),
        bx0.alias("bx0"), by0.alias("by0"),
        (bx0 + 15.0).alias("bx1"), (by0 + 10.0).alias("by1"),
    )
    j = bbox_join(a, b, cpd=0.25)
    w = F.least(F.col("ax1"), F.col("bx1")) - F.greatest(F.col("ax0"), F.col("bx0"))
    h = F.least(F.col("ay1"), F.col("by1")) - F.greatest(F.col("ay0"), F.col("by0"))
    return j.select(
        "id_a", "id_b", F.floor(w * h * 1000).cast("bigint").alias("ov_milli")
    )


def q_polygon_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometry measures under the oracle gate: triangles built with the
    C6 constructor, then shoelace area / perimeter / vertex centroid as
    pure Column folds (functions/measures). Integer-valued vertices make
    the area exact; sqrt is IEEE-correctly-rounded and the fold order is
    shared with the SQL, so the micro-rounded outputs hash-match."""
    from geojson_spark.functions.constructors import st_triangle
    from geojson_spark.functions.measures import st_area, st_centroid_xy, st_perimeter

    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
    k = F.col("n_nationkey")
    x1 = ((k * 13) % 100).cast("double")
    y1 = ((k * 17) % 80).cast("double")
    x2 = x1 + (3 + k % 5).cast("double")
    y2 = y1
    x3 = x1
    y3 = y1 + (4 + k % 7).cast("double")
    g = st_triangle(x1, y1, x2, y2, x3, y3)
    df = nat.select(k.cast("bigint").alias("poly_id"), g.alias("g"))
    cx, cy = st_centroid_xy(F.col("g"))
    metrics = df.select(
        "poly_id",
        F.floor(st_area(F.col("g")) * 1000).cast("bigint").alias("area_milli"),
        F.floor(st_perimeter(F.col("g")) * 1000000).cast("bigint").alias("perim_micro"),
        F.floor(cx * 1000000).cast("bigint").alias("cx_micro"),
        F.floor(cy * 1000000).cast("bigint").alias("cy_micro"),
    )
    # folded-in former rect_areas query (same poly_id key, keeps its own
    # pandas-UDF shoelace path under the oracle gate without costing a
    # slot in the driver's 50-query window)
    from pyspark.sql.types import DoubleType

    from geojson_spark.functions.geometry import polygon_area

    polys = _nation_rects(spark, sf_dir)

    @F.pandas_udf(DoubleType())
    def _area(coords: pd.Series, rings: pd.Series) -> pd.Series:
        import numpy as np

        return pd.Series(
            [polygon_area(np.asarray(c), np.asarray(r)) for c, r in zip(coords, rings)]
        )

    rect = polys.select(
        "poly_id",
        (F.round(_area(F.col("coords"), F.col("ring_offsets")) * 1000) / 1000).alias(
            "rect_area_deg2"
        ),
    )
    return metrics.join(rect, "poly_id")


def q_gc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GeometryCollection fidelity through the oracle gate: build
    GC-bearing Feature docs in SQL, parse (children land in geoms_json —
    Spark structs cannot recurse), explode to concrete child geometries
    (C7 flatten), and extract per-child scalars a DuckDB oracle
    reproduces. Exercises the GC codec path under the hash check, which
    previously lived only in pytest."""
    from geojson_spark.sources.geojson import explode_geometry_collections, parse_features_udf

    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
    k = F.col("n_nationkey")
    px = (k + 0.5).cast("string")
    py = (k * 2 + 0.25).cast("string")
    lx = (k - 0.5).cast("string")
    ly = (k + 0.125).cast("string")
    doc = F.concat(
        F.lit('{"type":"Feature","geometry":{"type":"GeometryCollection","geometries":['),
        F.lit('{"type":"Point","coordinates":['), px, F.lit(","), py, F.lit("]},"),
        F.lit('{"type":"LineString","coordinates":[['), lx, F.lit(","), ly,
        F.lit("],["), px, F.lit(","), ly, F.lit("]]}"),
        F.lit(']},"properties":null}'),
    )
    parsed = nat.select(
        k.cast("bigint").alias("fid"),
        F.explode(parse_features_udf(doc)).alias("f"),
    ).select("fid", F.col("f.geometry").alias("geometry"))
    exploded = explode_geometry_collections(parsed, "geometry")
    return exploded.select(
        "fid",
        F.col("child_idx").cast("bigint").alias("child_idx"),
        F.col("geometry.geom_type").alias("geom_type"),
        F.element_at("geometry.coords", 1).alias("x0"),
        F.element_at("geometry.coords", 2).alias("y0"),
        F.size("geometry.coords").cast("bigint").alias("n_coords"),
    )


def q_minhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs. Full DuckDB oracle: both engines share
    md5 as the base shingle hash and integer mod-2^64 remixes/FNV band
    folds, so the oracle reproduces candidacy AND verification bit-exactly
    (see _minhash_oracle_sql)."""
    from geojson_spark.operators.dedup import minhash_lsh_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return minhash_lsh_dedup(docs, threshold=0.5).select(
        "id_a", "id_b", (F.floor(F.col("jaccard") * 1000) / 1000).alias("jaccard")
    )


def q_simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (hamming <= 3), full DuckDB oracle
    (_simhash_oracle_sql: md5 feature hashes, bit votes, chunk
    collisions)."""
    from geojson_spark.operators.dedup import simhash_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return simhash_dedup(docs, max_hamming=3)


def q_hex_cell_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from geojson_spark.functions.spark_funcs import hex_cell_udf

    pts = _lineitem_points(spark, sf_dir)
    return (
        pts.withColumn("hex_id", hex_cell_udf(9)(F.col("lon"), F.col("lat")))
        .groupBy("hex_id")
        .agg(F.count("*").alias("n_points"))
    )


def q_s2_tile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 level-13 assignment rolled up to level-7 parents via pure bit
    arithmetic — the raster-tile↔vector-cell join shape on the real index.

    Fully DuckDB-oracle-able (no trig, no float luck): direction vectors
    come from a shared integer derivation (c is odd so the vector is never
    zero), and every op in ``xyz_to_cell_id`` past xyz — compares, single
    divides, sqrt, truncate, Hilbert bits — is replayed in SQL. The
    oracle computes the level-7 parent directly as the 7-level Hilbert
    prefix (verified prefix property of the classic per-bit curve)."""
    from geojson_spark.functions.spark_funcs import s2_cell_xyz_udf, s2_parent_col

    pts = _lineitem_points(spark, sf_dir)
    pid = F.col("p_id")
    a = ((pid * 7919) % 2001 - 1000).cast("double")
    b = ((pid * 104729) % 2001 - 1000).cast("double")
    c = (((pid * 1299709) % 1999 - 999) * 2 + 1).cast("double")
    n = F.sqrt(a * a + b * b + c * c)
    df = pts.select((a / n).alias("x"), (b / n).alias("y"), (c / n).alias("z"))
    return (
        df.withColumn("cell13", s2_cell_xyz_udf(13)(F.col("x"), F.col("y"), F.col("z")))
        .withColumn("tile7", s2_parent_col(F.col("cell13"), 7))
        .groupBy("tile7")
        .agg(F.count("*").alias("n_points"))
    )


def q_topk_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three plan families in one checked result (folded from the former
    window_topn + sort_limit + set_ops queries so the round-3 additions fit
    inside the driver's 50-query oracle window): (a) per-segment top-3
    orders via a ranking window, (b) global TopK via sort+limit, (c)
    EXCEPT/INTERSECT/UNION set algebra over customer keys. Legs are tagged
    by `src` and unioned on a common (src, seg, id, price_cents, rn)
    schema; each leg's physical plan is unchanged from the standalone
    queries (window rank / TakeOrderedAndProject / set-op exchanges)."""
    from pyspark.sql.window import Window

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    topn = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select(
            F.lit("topn").alias("src"),
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderkey").cast("bigint").alias("id"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("price_cents"),
            F.col("rn").cast("bigint").alias("rn"),
        )
    )

    sort_leg = (
        li.select(
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).cast("bigint").alias("id"),
            F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("price_cents"),
        )
        .orderBy(F.col("price_cents").desc(), F.col("id").asc())
        .limit(100)
        .select(
            F.lit("sort").alias("src"),
            F.lit("").alias("seg"),
            "id",
            "price_cents",
            F.lit(0).cast("bigint").alias("rn"),
        )
    )

    with_orders = orders.select(F.col("o_custkey").alias("k")).distinct()
    high_bal = cust.where(F.col("c_acctbal") > 5000).select(F.col("c_custkey").alias("k"))
    low_keys = cust.where(F.col("c_custkey") < 500).select(F.col("c_custkey").alias("k"))
    setop = (
        with_orders.exceptAll(high_bal)
        .intersect(low_keys)
        .union(cust.where(F.col("c_custkey") < 10).select(F.col("c_custkey").alias("k")))
        .distinct()
        .select(
            F.lit("setop").alias("src"),
            F.lit("").alias("seg"),
            F.col("k").cast("bigint").alias("id"),
            F.lit(0).cast("bigint").alias("price_cents"),
            F.lit(0).cast("bigint").alias("rn"),
        )
    )
    return topn.unionByName(sort_leg).unionByName(setop)


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary (sums as exact integer cents)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.floor("l_quantity")).alias("sum_qty"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias("sum_base_cents"),
            F.count("*").alias("count_order"),
        )
    )


def q_shingle_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-word-shingle Jaccard near-dup join — all built-in Column
    ops, integer outputs. The physical strategy is auto-selected from a
    shingle document-frequency probe: inverted-index count on modest-df
    corpora (the case here), prefix-filtered AllPairs when boilerplate
    shingles would make Σ df² explode."""
    from geojson_spark.operators.dedup import set_similarity_join

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return set_similarity_join(docs, threshold_milli=500, k_shingle=3)


def q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs within label blocks (deterministic
    blocking; the LSH variant is exercised in pytest). Runs over QUANTIZED
    embeddings so the ≥-threshold comparison is bit-identical between the
    block kernel's Gram-matrix cosine and the DuckDB oracle — no float
    derivation luck at the boundary. The quantization happens INSIDE the
    Arrow kernel (quantize_scale: np.round ≡ bround ≡ round_even on exact
    ×2^16 products), so raw float32 vectors cross the boundary once —
    round 3's F.transform pre-projection doubled the Arrow bytes and
    benched 2× slower for the same values."""
    from geojson_spark.operators.similarity import cosine_pairs_blocked

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "label", "embedding"
    )
    out = cosine_pairs_blocked(emb, threshold=0.40, quantize_scale=65536.0)
    return out.select("id_a", "id_b", F.col("block").cast("bigint").alias("block"))


def q_event_joins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal joins in one checked result (folded from the former
    asof_join + range_join queries so the round-3 image query fits inside
    the driver's 50-query oracle window): (a) as-of join — each event picks
    the user's latest order at/before the event time (single-shuffle
    union+window implementation), (b) interval join — clicks within 30 min
    after each error event of the same user (epoch-bucketed equi-join, no
    theta-join). Legs tagged by `src` on a common (src, event_id, k, v)
    schema; both operators' physical plans are unchanged."""
    from geojson_spark.operators.joins import asof_join, range_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
        "o_orderkey",
    )
    asof = asof_join(
        ev.select("event_id", "user_id", "ts"),
        orders,
        key="user_id",
        left_time="ts",
        right_time="o_orderdate",
        right_cols={"o_orderkey": "o_orderkey"},
        right_tie="o_orderkey",
    ).select(
        F.lit("asof").alias("src"),
        F.col("event_id").cast("bigint").alias("event_id"),
        F.col("user_id").cast("bigint").alias("k"),
        F.coalesce("o_orderkey", F.lit(-1)).cast("bigint").alias("v"),
    )

    errors = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("w_end"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    ranged = (
        range_join(
            clicks,
            errors,
            key="user_id",
            point_time="ts",
            start_col="w_start",
            end_col="w_end",
            bucket_seconds=1800,
        )
        .groupBy("error_id")
        .agg(F.count("*").alias("n_clicks"))
        .select(
            F.lit("range").alias("src"),
            F.col("error_id").cast("bigint").alias("event_id"),
            F.lit(0).cast("bigint").alias("k"),
            F.col("n_clicks").cast("bigint").alias("v"),
        )
    )
    return asof.unionByName(ranged)


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min gap): per-session rollup."""
    from geojson_spark.operators.sessions import session_stats

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = session_stats(ev, gap="30 minutes", value_col="value")
    return out.select(
        "user_id",
        F.col("session_id").cast("bigint").alias("session_id"),
        "n_events",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        "value_cents",
    )


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping sets: ROLLUP and CUBE over (orderstatus, orderpriority),
    unioned with a `src` marker (folded from the former rollup + cube
    queries so the round-3 additions fit inside the driver's 50-query
    oracle window). Both Expand-based plans are exercised unchanged."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")

    def agg(grouped, src: str) -> DataFrame:
        return grouped.agg(
            F.count("*").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("price_cents"),
        ).select(
            F.lit(src).alias("src"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("o_orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("o_orderpriority"),
            "n_orders",
            "price_cents",
        )

    return agg(orders.rollup("o_orderstatus", "o_orderpriority"), "rollup").unionByName(
        agg(orders.cube("o_orderstatus", "o_orderpriority"), "cube")
    )


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: 3-way join, filter on both sides, agg, top-10.
    Broadcast the filtered customer dim; revenue as exact integer cents."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").where(
        F.col("o_orderdate") < F.lit("1995-03-15")
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").where(
        F.col("l_shipdate") > F.lit("1995-03-15")
    )
    return (
        li.join(F.broadcast(orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)),
                li.l_orderkey == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("bigint")
            ).alias("revenue_cents")
        )
        .orderBy(F.col("revenue_cents").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select(
            F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
            "revenue_cents",
        )
    )


def q_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-type coverage: per-nation counts of customers WITH orders
    (left_semi) and WITHOUT orders (left_anti) side by side."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_custkey").alias("c_custkey")
    )
    with_o = (
        cust.join(orders, "c_custkey", "left_semi")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_with_orders"))
    )
    without_o = (
        cust.join(orders, "c_custkey", "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_without_orders"))
    )
    return (
        with_o.join(without_o, "c_nationkey", "full_outer")
        .select(
            F.col("c_nationkey").cast("bigint").alias("c_nationkey"),
            F.coalesce("n_with_orders", F.lit(0)).alias("n_with_orders"),
            F.coalesce("n_without_orders", F.lit(0)).alias("n_without_orders"),
        )
    )


def q_priority_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority order stats: status pivot (one column per order
    status) joined with the exact discrete median price (lower middle,
    id tie-break) — both aggregates share the o_orderpriority key, so
    the 5-row join is trivial. Folded from the former pivot_status +
    median_price queries so both stay inside the driver's 50-query
    oracle window; window formulation identical on both sides."""
    from pyspark.sql.window import Window

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    p = orders.groupBy("o_orderpriority").pivot("o_orderstatus", ["F", "O", "P"]).count()
    pivoted = p.select(
        "o_orderpriority",
        F.coalesce("F", F.lit(0)).alias("n_f"),
        F.coalesce("O", F.lit(0)).alias("n_o"),
        F.coalesce("P", F.lit(0)).alias("n_p"),
    )
    priced = orders.select(
        "o_orderpriority",
        F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("price_cents"),
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("price_cents").asc(), F.col("o_orderkey").asc()
    )
    wc = Window.partitionBy("o_orderpriority")
    median = (
        priced.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count("*").over(wc))
        .where(F.col("rn") == F.floor((F.col("n") + 1) / 2))
        .select("o_orderpriority", F.col("price_cents").alias("median_cents"))
    )
    return pivoted.join(median, "o_orderpriority")


def q_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Property algebra over the dynamic JSON column (SURVEY §2.5 A1/A5 on
    the events table): point lookup + aggregate of the extracted value."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.withColumn("k", F.get_json_object(F.col("props"), "$.k").cast("bigint"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


def q_corpus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-corpus filter: keep docs that are (a) the exact-
    dedup keeper of their content, (b) quality score ≥ 0.5, (c) classified
    'en' — the composed pipeline every stage already passes individually."""
    from pyspark.sql.types import StringType

    from geojson_spark.functions.text import lang_id
    from geojson_spark.operators.dedup import exact_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    keepers = exact_dedup(docs).select(F.col("keeper_id").alias("doc_id"))
    quality = _doc_quality(spark, sf_dir).select("doc_id", "q_score")

    @F.pandas_udf(StringType())
    def _lang(texts: pd.Series) -> pd.Series:
        return pd.Series(lang_id(texts))

    langs = docs.select("doc_id", _lang(F.col("text")).alias("pred_lang"))
    stats = q_token_stats(spark, sf_dir).select("doc_id", "n_tokens")
    return (
        docs.select("doc_id")
        .join(keepers, "doc_id", "left_semi")
        .join(quality, "doc_id")
        .join(langs, "doc_id")
        .join(stats, "doc_id")
        .where((F.col("q_score") >= 0.5) & (F.col("pred_lang") == "en"))
        .select("doc_id", "n_tokens", "q_score")
    )


def q_dedup_keepers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-components keeper assignment over the near-dup pair graph
    (iterative min-label propagation in Spark; recursive-CTE transitive
    closure in the oracle)."""
    from geojson_spark.operators.dedup import assign_keepers

    pairs = q_shingle_jaccard(spark, sf_dir).select("id_a", "id_b")
    return assign_keepers(pairs).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("keeper_id").cast("bigint").alias("keeper_id"),
    )


def q_top_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary stats: top-20 words by document frequency (word
    tie-break) — explode → two-level agg → TopK."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != F.lit("")))
        ).alias("word"),
    )
    return (
        words.groupBy("word")
        .agg(F.count("*").alias("doc_freq"))
        .orderBy(F.col("doc_freq").desc(), F.col("word").asc())
        .limit(20)
    )


def q_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zlib compression-ratio quality signal (floor-rounded 1e-3) — no SQL
    oracle (DuckDB has no zlib); deterministic rows-only check + pytest."""
    from pyspark.sql.types import DoubleType

    from geojson_spark.functions.text import compression_ratio

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    @F.pandas_udf(DoubleType())
    def _cr(texts: pd.Series) -> pd.Series:
        return pd.Series(compression_ratio(texts))

    return docs.select(
        "doc_id", (F.floor(_cr(F.col("text")) * 1000) / 1000).alias("c_ratio")
    )


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprint (winnowing-lite). DuckDB oracle
    shares the modular prefix-product derivation (_fp_oracle_sql);
    parity vs a pure-Python reference is additionally asserted in
    pytest."""
    from pyspark.sql.types import LongType

    from geojson_spark.functions.text import rolling_fingerprint

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    @F.pandas_udf(LongType())
    def _fp(texts: pd.Series) -> pd.Series:
        return pd.Series([rolling_fingerprint(t or "") for t in texts])

    return docs.select("doc_id", _fp(F.col("text")).alias("fingerprint"))


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k (probe 4 of 16 inverted lists) — rows-only
    check (approximate by design); recall vs brute force asserted in
    pytest."""
    from geojson_spark.operators.similarity import ivf_topk, train_centroids

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    C = train_centroids(emb, n_centroids=16)
    out = ivf_topk(queries, emb, 10, centroids=C, n_probe=4)
    return out.select("q_id", "vec_id", F.col("rank").cast("bigint").alias("rank"))


# BM25 query set — ONE Python constant feeds both the Spark DataFrame and
# the oracle's VALUES list, so the two sides can never drift. Mixed-df
# terms: 'dup' is the corpus's one rare token (idf contrast).
_BM25_QUERIES = [
    (0, "spark join table"),
    (1, "dup merge batch"),
    (2, "window sort key order"),
    (3, "vector stream filter"),
]
_BM25_TERMS = [(q, w) for q, s in _BM25_QUERIES for w in s.split()]


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rational-idf BM25 top-5 retrieval (integer-exact scoring; see
    operators/retrieval.py for the derivation that removes ln from the
    idf so a SQL oracle replays the BIGINT scores bit-identically)."""
    from geojson_spark.operators.retrieval import bm25_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    qt = spark.createDataFrame(_BM25_TERMS, "q_id int, term string")
    return bm25_topk(docs, qt, k=5)


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style per-doc repetition signals: duplicate word/bigram/
    trigram fractions (integer millis) + top-word frequency — one
    zero-shuffle Project, no Exchange anywhere (see
    functions/spark_funcs.repetition_stats)."""
    from geojson_spark.functions.spark_funcs import repetition_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return repetition_stats(docs)


def q_distance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-radius spatial join (all points within 3° of each query) —
    cell-ring explode + equi-join + exact squared-degree refine; every
    pair emitted exactly once (a point lies in one cell), so no dedup
    shuffle. The oracle is the plain theta join with the identical IEEE
    dist² arithmetic."""
    from geojson_spark.operators.joins import distance_join

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").where(F.col("c_custkey") < 20)
    qlon, qlat = derived_lonlat(F.col("c_custkey").cast("bigint"))
    queries = cust.select(
        F.col("c_custkey").cast("bigint").alias("q_id"), qlon.alias("q_lon"), qlat.alias("q_lat")
    )
    pts = _lineitem_points(spark, sf_dir).select(
        "p_id", F.col("lon").alias("p_lon"), F.col("lat").alias("p_lat")
    )
    out = distance_join(queries, pts, radius=3.0, metric="euclidean_deg2")
    return out.select("q_id", "p_id")


def q_image_luma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-payload query with a FULL DuckDB oracle: generate the
    deterministic image corpus (raw/rle/q8 codecs), DECODE THE ENCODED
    BYTES in a mapInPandas stage, and emit integer BT.601 luma histograms
    + brightness_milli per image. The oracle (_image_luma_oracle_sql)
    regenerates every pixel arithmetically — splitmix64 replayed in staged
    mod-2^64 HUGEINT SQL, q8's mid-bin quantization applied in SQL — so a
    hash match proves the codec encode→decode round-trip pixel-exact, not
    just the histogram math. sf_dir is unused: the corpus is fixed-size
    (192 images) because the oracle string cannot depend on it."""
    from geojson_spark.operators.multimodal import luma_histogram
    from geojson_spark.sources.images import generate_images

    imgs = generate_images(spark, 192, skew=True)
    h = luma_histogram(imgs, bins=16)
    hist_rows = (
        h.select("image_id", F.posexplode("hist").alias("bin", "n_px"))
        .where(F.col("n_px") > 0)
        .select(
            "image_id",
            F.col("bin").cast("int").alias("bin"),
            F.col("n_px").cast("bigint").alias("n_px"),
        )
    )
    bright = h.select(
        "image_id",
        F.lit(-1).cast("int").alias("bin"),
        F.col("brightness_milli").cast("bigint").alias("n_px"),
    )
    return hist_rows.unionByName(bright)


def q_image_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The north rule's core op, driver-checked end to end: generate the
    deterministic image+caption corpus DISTRIBUTED (mapInPandas over
    spark.range — same rows at any parallelism), assign each image to its
    grid cell, and count per cell through the salted two-stage aggregation
    (30% of images land in 3 city-hotspot cells, the exact skew salting
    exists for). The oracle (_image_cells_oracle_sql) regenerates every
    image's derived lon/lat arithmetically — four chained splitmix64
    rounds in SQL including the hotspot branch — so a hash match proves
    the distributed generation, the cell assignment, and the skew-safe
    aggregation all at once. sf_dir is unused: the corpus is fixed-size
    (2000 images) because the oracle string cannot depend on it."""
    from geojson_spark.operators.agg import salted_agg
    from geojson_spark.sources.images import generate_images

    imgs = generate_images(spark, 2000, skew=True)
    cells = imgs.select(
        "image_id", grid_cell(F.col("lon"), F.col("lat")).alias("cell_id")
    )
    out = salted_agg(
        cells, "cell_id", {"n_images": ("count", "image_id")},
        salt_col="image_id", n_salts=8,
    )
    return out.select(
        F.col("cell_id").cast("bigint").alias("cell_id"),
        F.col("n_images").cast("bigint").alias("n_images"),
    )


def q_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fold of the two image queries (q_image_luma + q_image_cells) into
    one driver slot — same full oracles UNION ALLed — freeing a window
    slot for a new oracled query while keeping both checks hash-hard:
    luma rows are (image_id, bin≥-1, value); cell rows are
    (cell_id-as-text, bin=-2, n_images)."""
    luma = q_image_luma(spark, sf_dir).select(
        F.col("image_id").alias("key"), "bin", F.col("n_px").alias("val")
    )
    cells = q_image_cells(spark, sf_dir).select(
        F.col("cell_id").cast("string").alias("key"),
        F.lit(-2).cast("int").alias("bin"),
        F.col("n_images").cast("bigint").alias("val"),
    )
    return luma.unionByName(cells)


def q_splits_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fold of q_hash_split + q_stratified_sample into one driver slot:
    every document carries its deterministic md5 split AND a flag for
    whether the class-balanced sampler kept it ('zh' has no fraction →
    always 0). Both original oracles compose in one LEFT JOIN."""
    from geojson_spark.operators.splits import hash_split, stratified_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    splits = hash_split(docs, seed=42).select("doc_id", "lang", "split")
    sampled = stratified_sample(
        docs,
        strata_col="lang",
        fractions={"en": 0.3, "de": 0.9, "fr": 0.9, "es": 0.5},
        seed=7,
    ).select("doc_id", F.lit(1).alias("in_sample"))
    return splits.join(sampled, "doc_id", "left").select(
        "doc_id",
        "lang",
        "split",
        F.coalesce(F.col("in_sample"), F.lit(0)).cast("int").alias("in_sample"),
    )


# dbscan subset sizing: keep the clustered subset ~constant (≈ 60k/16
# points) across scale factors so the density regime — and therefore the
# cluster structure and CC round count — doesn't drift with sf. The SAME
# integer derivation runs as a scalar subquery in the oracle.
_DBSCAN_EPS = 2.0
_DBSCAN_MIN_PTS = 3


def _dbscan_modulus(n_lineitem: int) -> int:
    return 16 * max(1, n_lineitem // 60000)


def q_dbscan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-accelerated DBSCAN over a fixed-density subset of the derived
    points — neighbor pairs via the cell-ring distance_join, core test by
    count, clusters = min-label connected components, border points to
    their minimum core neighbor's cluster (operators/clustering.py). The
    oracle replays the exact rules: theta-join neighbors with identical
    IEEE dist² arithmetic + recursive-CTE reachability over core points."""
    from geojson_spark.operators.clustering import dbscan

    pts = _lineitem_points(spark, sf_dir)
    k = _dbscan_modulus(
        spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    )
    sub = pts.where(F.col("p_id") % k == 0)
    return dbscan(
        sub, eps=_DBSCAN_EPS, min_pts=_DBSCAN_MIN_PTS, cpd=1
    ).select("p_id", "cluster_id", "is_core")


def q_density_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector→raster: render every derived point into 1°×1° density image
    tiles (32×32 px, raw codec) and emit the per-tile integer stats. The
    checksum is computed FROM THE ENCODED BYTES (decode → Σ idx·pixel),
    so the oracle — which regenerates pixel counts arithmetically from
    the raw points — proves the whole render+encode+decode path, not just
    the aggregation."""
    from geojson_spark.operators.rasterize import rasterize_density

    pts = _lineitem_points(spark, sf_dir)
    out = rasterize_density(pts, cpd=1, res=32, out_fmt="raw")
    return out.select(
        "tile_id",
        F.col("n_points").cast("bigint").alias("n_points"),
        F.col("nonzero_px").cast("bigint").alias("nonzero_px"),
        F.col("max_count").cast("bigint").alias("max_count"),
        F.col("checksum").cast("bigint").alias("checksum"),
    )


def q_zonal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster→vector zonal statistics, end-to-end through real image
    bytes: rasterize the derived points into raw-codec density tiles,
    DECODE the stored bytes back to sparse pixels, reconstruct each
    pixel's center coordinate, PIP-join against the nation rectangles,
    and aggregate integer (n_px, sum_val, max_val) per polygon. The
    oracle regenerates the pixel grid arithmetically from the raw points
    (the proven density_tiles derivation) and applies the pip_rects
    predicate — a hash match proves render + encode + decode + inverse
    pixel mapping + PIP + agg in one chain. Pixel centers are
    (k + 0.5)/32 grids; rect bounds end in .0005, so no center ever lands
    on a boundary (64·(m + 0.0005) is never an odd integer)."""
    from geojson_spark.operators.rasterize import rasterize_density, zonal_stats

    pts = _lineitem_points(spark, sf_dir)
    tiles = rasterize_density(pts, cpd=1, res=32, out_fmt="raw")
    polys = _nation_rects(spark, sf_dir)
    out = zonal_stats(tiles, polys, cpd=1)
    return out.select(
        F.col("poly_id").cast("bigint").alias("poly_id"),
        F.col("n_px").cast("bigint").alias("n_px"),
        F.col("sum_val").cast("bigint").alias("sum_val"),
        F.col("max_val").cast("bigint").alias("max_val"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: derived points → S2 PIP join vs nation rects → per-polygon
    count + bbox (parse → cell assign → cover explode → equi-join →
    ray-cast refine → agg)."""
    _attach(spark)
    sf_dir = "/root/testdata/sf0.001"
    from geojson_spark.operators.joins import pip_join

    pts = _lineitem_points(spark, sf_dir)
    polys = _nation_rects(spark, sf_dir)
    joined = pip_join(pts.select("p_id", "lon", "lat"), polys, index="s2")
    return joined.groupBy("poly_id").agg(
        F.count("*").alias("n_points"),
        F.min("lon").alias("min_x"),
        F.min("lat").alias("min_y"),
        F.max("lon").alias("max_x"),
        F.max("lat").alias("max_y"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def wrap(fn):
        def inner(spark, sf_dir):
            _attach(spark)
            return fn(spark, sf_dir)

        return inner

    return {
        "cell_counts": wrap(q_cell_counts),
        "bbox_union": wrap(q_bbox_union),
        "pip_rects": wrap(q_pip_rects),
        "stream_cell_counts": wrap(q_stream_cell_counts),
        "pip_holes": wrap(q_pip_holes),
        "knn": wrap(q_knn),
        "tile_counts": wrap(q_tile_counts),
        "region_rollup": wrap(q_region_rollup),
        "exact_dedup": wrap(q_exact_dedup),
        "token_stats": wrap(q_token_stats),
        "splits_sample": wrap(q_splits_sample),
        "contamination": wrap(q_contamination),
        "pack_sequences": wrap(q_pack_sequences),
        "polygon_metrics": wrap(q_polygon_metrics),
        "bbox_join": wrap(q_bbox_join),
        "geohash_counts": wrap(q_geohash_counts),
        "tile_pyramid": wrap(q_tile_pyramid),
        "text_signals": wrap(q_text_signals),
        "events_windows": wrap(q_events_windows),
        "ann_topk": wrap(q_ann_topk),
        "geojson_parse": wrap(q_geojson_parse),
        "polygon_roundtrip": wrap(q_polygon_roundtrip),
        "fidelity_roundtrip": wrap(q_fidelity_roundtrip),
        "gc_roundtrip": wrap(q_gc_roundtrip),
        "minhash_near_dups": wrap(q_minhash_near_dups),
        "simhash_near_dups": wrap(q_simhash_near_dups),
        "hex_cell_counts": wrap(q_hex_cell_counts),
        "topk_sets": wrap(q_topk_sets),
        "grouping_sets": wrap(q_grouping_sets),
        "pricing_summary": wrap(q_pricing_summary),
        "shingle_jaccard": wrap(q_shingle_jaccard),
        "embedding_near_dups": wrap(q_embedding_near_dups),
        "event_joins": wrap(q_event_joins),
        "sessionize": wrap(q_sessionize),
        "shipping_priority": wrap(q_shipping_priority),
        "semi_anti": wrap(q_semi_anti),
        "corpus_filter": wrap(q_corpus_filter),
        "top_words": wrap(q_top_words),
        "dedup_keepers": wrap(q_dedup_keepers),
        "priority_stats": wrap(q_priority_stats),
        "props_extract": wrap(q_props_extract),
        "doc_fingerprint": wrap(q_doc_fingerprint),
        "s2_tile_rollup": wrap(q_s2_tile_rollup),
        # --- round-3 additions, fully oracled; they fit inside the driver's
        # 50-entry check window because window_topn+sort_limit+set_ops were
        # folded into topk_sets and rollup+cube into grouping_sets above.
        "bm25_topk": wrap(q_bm25_topk),
        "repetition_stats": wrap(q_repetition_stats),
        "distance_join": wrap(q_distance_join),
        "image_stats": wrap(q_image_stats),
        "dbscan": wrap(q_dbscan),
        "density_tiles": wrap(q_density_tiles),
        # round 4: fits because salted_counts folded into cell_counts
        "zonal_stats": wrap(q_zonal_stats),
        # --- rows-only entries (no DuckDB oracle, by documented design) go
        # LAST: the driver checks the first 50 dict entries, and every slot
        # inside that window must carry a full oracle. compression_ratio
        # needs zlib (absent in DuckDB) and ann_ivf is approximate by
        # construction; each has its invariant asserted in pytest instead.
        "compression_ratio": wrap(q_compression_ratio),
        "ann_ivf": wrap(q_ann_ivf),
    }


def oracle_sql() -> dict[str, str]:
    lon, lat = derived_lonlat_sql("l_orderkey")
    clon, clat = derived_lonlat_sql("c_custkey")
    pts = f"(SELECT (l_orderkey*10 + l_linenumber)::BIGINT AS p_id, {lon} AS lon, {lat} AS lat, l_quantity FROM lineitem)"
    rects = f"({_NATION_RECTS_SQL})"
    return {
        "cell_counts": f"""
            WITH agg AS (
              SELECT {GRID_SQL} AS cell_id, count(*) AS n_points,
                     cast(sum(floor(l_quantity)) AS BIGINT) AS sum_qty
              FROM {pts} GROUP BY 1
            )
            SELECT 'plain' AS src, * FROM agg
            UNION ALL
            SELECT 'salted' AS src, * FROM agg
        """,
        "bbox_union": f"""
            SELECT {GRID_SQL} AS cell_id,
                   min(lon) AS min_x, min(lat) AS min_y,
                   max(lon) AS max_x, max(lat) AS max_y
            FROM {pts} GROUP BY 1
        """,
        "pip_rects": f"""
            SELECT i.idx AS idx, r.poly_id AS poly_id, count(*) AS n_points
            FROM {pts} p JOIN {rects} r
              ON p.lon > r.x0 AND p.lon < r.x1 AND p.lat > r.y0 AND p.lat < r.y1
            CROSS JOIN (SELECT 'grid' AS idx UNION ALL SELECT 's2') i
            GROUP BY 1, 2
        """,
        "stream_cell_counts": f"""
            SELECT {GRID_SQL} AS cell_id, count(*) AS n_points
            FROM (SELECT {clon} AS lon, {clat} AS lat FROM customer)
            GROUP BY 1
        """,
        "pip_holes": f"""
            SELECT r.poly_id AS poly_id, count(*) AS n_points
            FROM {pts} p JOIN {rects} r
              ON p.lon > r.x0 AND p.lon < r.x1 AND p.lat > r.y0 AND p.lat < r.y1
             AND NOT (p.lon > r.x0 + 3.0 AND p.lon < r.x0 + 9.0
                      AND p.lat > r.y0 + 2.0 AND p.lat < r.y0 + 7.0)
            GROUP BY 1
        """,
        "knn": f"""
            WITH q AS (
              SELECT c_custkey::BIGINT AS q_id, {clon} AS q_lon, {clat} AS q_lat
              FROM customer WHERE c_custkey < 20
            ), scored AS (
              SELECT q.q_id, p.p_id,
                     row_number() OVER (
                       PARTITION BY q.q_id
                       ORDER BY (p.lon - q.q_lon)*(p.lon - q.q_lon)
                              + (p.lat - q.q_lat)*(p.lat - q.q_lat) ASC,
                              p.p_id ASC
                     ) AS rn
              FROM q CROSS JOIN {pts} p
            )
            SELECT q_id, p_id, rn FROM scored WHERE rn <= 5
        """,
        "tile_counts": f"""
            WITH c AS (
              SELECT {GRID_SQL} AS cell_id, l_quantity FROM {pts}
            )
            SELECT cast(floor(floor(cell_id / 4096) / 16) as bigint) * 4096
                   + cast(floor((cell_id % 4096) / 16) as bigint) AS tile_id,
                   count(*) AS n_points,
                   cast(sum(floor(l_quantity)) as bigint) AS sum_qty
            FROM c GROUP BY 1
        """,
        "region_rollup": """
            SELECT r_name, count(*) AS n_customers,
                   cast(sum(cast(round(c_acctbal * 100) as bigint)) as bigint) AS acctbal_cents
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
        "exact_dedup": """
            SELECT md5(text) AS text_hash, min(doc_id) AS keeper_id,
                   count(*) AS dup_count
            FROM documents GROUP BY 1
        """,
        "token_stats": r"""
            SELECT doc_id,
                   length(text) AS n_chars,
                   length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens,
                   length(text) - length(replace(text, '.', '')) AS n_periods,
                   length(text) - length(replace(text, ',', '')) AS n_commas,
                   len(regexp_extract_all(text,
                     '''(s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^ \t\n\r\fA-Za-z0-9]+|[ \t\n\r\f]+'
                   ))::BIGINT AS n_bpe_tokens,
                   len(regexp_extract_all(text, '[^ \t\n\x0B\f\r]+'))::BIGINT AS n_ws_tokens
            FROM documents
        """,
        "text_signals": r"""
            WITH t AS (
              SELECT doc_id,
                     length(text)::DOUBLE AS n_chars,
                     (length(text) - length(replace(text, ' ', '')) + 1)::DOUBLE AS n_tokens,
                     (length(text) - length(replace(text, '.', ''))
                      + length(text) - length(replace(text, ',', '')))::DOUBLE AS n_punct
              FROM documents
            ),
            w AS (
              SELECT doc_id, list_distinct(list_transform(
                  (list_filter(string_split_regex(text, '[ \t\n\x0B\f\r]+'), x -> x <> ''))[1:200],
                  x -> lower(x))) AS words
              FROM documents
            ), h AS (
              SELECT doc_id,
                len(list_intersect(words, ['the','and','of','to','in','is','that','it','was','for'])) AS en,
                len(list_intersect(words, ['der','die','und','das','ist','nicht','ein','mit','von','zu'])) AS de,
                len(list_intersect(words, ['le','la','et','les','des','est','un','une','du','que'])) AS fr,
                len(list_intersect(words, ['el','la','de','que','los','es','un','una','las','por'])) AS es
              FROM w
            )
            SELECT 'quality' AS src, doc_id::VARCHAR AS key,
                   cast(floor((0.4 * least(n_chars / 200.0, 1.0)
                        + 0.3 * least(n_punct / n_tokens * 5.0, 1.0)
                        + 0.3 * greatest(0.0, least(1.0,
                              1.0 - abs((n_chars - (n_tokens - 1)) / n_tokens - 5.0) / 10.0))
                         ) * 1000.0) as bigint) AS v
            FROM t
            UNION ALL
            SELECT 'lang', pred_lang, n_docs FROM (
              SELECT CASE WHEN greatest(en,de,fr,es) = 0 THEN 'und'
                          WHEN en = greatest(en,de,fr,es) THEN 'en'
                          WHEN de = greatest(en,de,fr,es) THEN 'de'
                          WHEN fr = greatest(en,de,fr,es) THEN 'fr'
                          ELSE 'es' END AS pred_lang, count(*) AS n_docs
              FROM h GROUP BY 1
            )
        """,
        "events_windows": """
            WITH e AS (
              SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
                     ((user_id * 7919) % 360000 + 360000) % 360000 / 1000.0 - 180.0 AS lon,
                     ((user_id * 104729) % 170000 + 170000) % 170000 / 1000.0 - 85.0 AS lat,
                     event_type
              FROM events
            )
            SELECT window_start,
                   cast(floor((lon + 180.0) * 8.0) as bigint) * 4096
                   + cast(floor((lat + 90.0) * 8.0) as bigint) AS cell_id,
                   event_type, count(*) AS n_events
            FROM e GROUP BY 1, 2, 3
        """,
        "ann_topk": f"""
            WITH eq AS (
              SELECT vec_id, {_QUANT_SQL} AS qv FROM embeddings
            ), q AS (
              SELECT vec_id AS q_id, qv AS q_vec FROM eq WHERE vec_id < 8
            ), scored AS (
              SELECT q.q_id, e.vec_id,
                     row_number() OVER (
                       PARTITION BY q.q_id
                       ORDER BY {_COS_SQL.format(a="q.q_vec", b="e.qv")} DESC,
                                e.vec_id ASC
                     ) AS rank
              FROM q CROSS JOIN eq e
            )
            SELECT q_id, vec_id, rank FROM scored WHERE rank <= 10
        """,
        "geojson_parse": f"""
            SELECT c_custkey::BIGINT AS c_custkey, {clon} AS x, {clat} AS y,
                   c_name AS name
            FROM customer
        """,
        "polygon_roundtrip": """
            -- ::DOUBLE on the fractional literals: DuckDB otherwise runs
            -- this in exact DECIMAL, which lands one ulp away from
            -- Spark's double arithmetic on some corners (y0 + 9.0 gave
            -- -12.9995 vs double's -12.999500000000001)
            SELECT n_nationkey::BIGINT AS poly_id,
                   (n_nationkey * 37) % 300 - 160 + 0.0005::DOUBLE AS x0,
                   (n_nationkey * 53) % 140 - 75 + 0.0005::DOUBLE AS y0,
                   ((n_nationkey * 37) % 300 - 160 + 0.0005::DOUBLE) + 12.0::DOUBLE AS x1,
                   ((n_nationkey * 53) % 140 - 75 + 0.0005::DOUBLE) + 9.0::DOUBLE AS y1,
                   10 AS n_coords
            FROM nation
        """,
        "gc_roundtrip": """
            SELECT n_nationkey::BIGINT AS fid, 0::BIGINT AS child_idx,
                   'Point' AS geom_type,
                   n_nationkey + 0.5 AS x0,
                   n_nationkey * 2 + 0.25 AS y0,
                   2::BIGINT AS n_coords
            FROM nation
            UNION ALL
            SELECT n_nationkey::BIGINT AS fid, 1::BIGINT AS child_idx,
                   'LineString' AS geom_type,
                   n_nationkey - 0.5 AS x0,
                   n_nationkey + 0.125 AS y0,
                   4::BIGINT AS n_coords
            FROM nation
        """,
        "fidelity_roundtrip": """
            SELECT n_nationkey::BIGINT AS fid,
                   (n_nationkey * 37) % 300 - 160 + 0.25 AS x,
                   (n_nationkey * 53) % 140 - 70 + 0.5 AS y,
                   n_nationkey + 0.125 AS z,
                   3::BIGINT AS dim,
                   CASE WHEN n_nationkey % 2 = 0
                        THEN '"nat-' || n_nationkey || '"'
                        ELSE cast(n_nationkey * 10 as varchar) END AS id_json,
                   (n_nationkey * 3)::BIGINT AS rank,
                   'syn' AS src,
                   'p' || n_nationkey AS name
            FROM nation
        """,
        "topk_sets": """
            WITH j AS (
              SELECT c_mktsegment, o_orderkey::BIGINT AS o_orderkey,
                     cast(round(o_totalprice * 100) as bigint) AS price_cents,
                     row_number() OVER (
                       PARTITION BY c_mktsegment
                       ORDER BY o_totalprice DESC, o_orderkey ASC
                     ) AS rn
              FROM orders JOIN customer ON o_custkey = c_custkey
            ),
            wo AS (SELECT DISTINCT o_custkey AS k FROM orders),
            hb AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000),
            lk AS (SELECT c_custkey AS k FROM customer WHERE c_custkey < 500)
            SELECT 'topn' AS src, c_mktsegment AS seg, o_orderkey AS id,
                   price_cents, rn::BIGINT AS rn
            FROM j WHERE rn <= 3
            UNION ALL
            SELECT 'sort', '', id, price_cents, 0::BIGINT FROM (
              SELECT (l_orderkey * 10 + l_linenumber)::BIGINT AS id,
                     cast(round(l_extendedprice * 100) as bigint) AS price_cents
              FROM lineitem
              ORDER BY price_cents DESC, id ASC
              LIMIT 100
            )
            UNION ALL
            SELECT 'setop', '', custkey::BIGINT, 0::BIGINT, 0::BIGINT FROM (
              SELECT DISTINCT custkey FROM (
                SELECT k AS custkey FROM (
                  SELECT k FROM (SELECT k FROM wo EXCEPT ALL SELECT k FROM hb)
                  INTERSECT SELECT k FROM lk
                )
                UNION ALL
                SELECT c_custkey FROM customer WHERE c_custkey < 10
              )
            )
        """,
        "grouping_sets": """
            SELECT 'rollup' AS src,
                   coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
                   coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
                   count(*) AS n_orders,
                   cast(sum(cast(round(o_totalprice * 100) as bigint)) as bigint) AS price_cents
            FROM orders
            GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
            UNION ALL
            SELECT 'cube',
                   coalesce(o_orderstatus, 'ALL'),
                   coalesce(o_orderpriority, 'ALL'),
                   count(*),
                   cast(sum(cast(round(o_totalprice * 100) as bigint)) as bigint)
            FROM orders
            GROUP BY CUBE (o_orderstatus, o_orderpriority)
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   cast(sum(floor(l_quantity)) as bigint) AS sum_qty,
                   cast(sum(cast(round(l_extendedprice * 100) as bigint)) as bigint) AS sum_base_cents,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "shipping_priority": """
            SELECT o_orderkey::BIGINT AS o_orderkey,
                   strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
                   o_orderpriority,
                   cast(sum(cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint))
                     as bigint) AS revenue_cents
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
              AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
            GROUP BY 1, 2, 3
            ORDER BY revenue_cents DESC, o_orderkey ASC
            LIMIT 10
        """,
        "top_words": """
            SELECT word, count(*) AS doc_freq FROM (
              SELECT DISTINCT doc_id, unnest(list_filter(
                string_split_regex(text, '[ \t\n\x0B\f\r]+'), x -> x <> '')) AS word
              FROM documents
            )
            GROUP BY word
            ORDER BY doc_freq DESC, word ASC
            LIMIT 20
        """,
        "corpus_filter": r"""
            WITH t AS (
              SELECT doc_id, text,
                     length(text)::DOUBLE AS n_chars,
                     (length(text) - length(replace(text, ' ', '')) + 1) AS n_tokens,
                     (length(text) - length(replace(text, '.', ''))
                      + length(text) - length(replace(text, ',', '')))::DOUBLE AS n_punct
              FROM documents
            ), q AS (
              SELECT doc_id, n_tokens,
                     floor((0.4 * least(n_chars / 200.0, 1.0)
                          + 0.3 * least(n_punct / n_tokens::DOUBLE * 5.0, 1.0)
                          + 0.3 * greatest(0.0, least(1.0,
                                1.0 - abs((n_chars - (n_tokens - 1)) / n_tokens::DOUBLE - 5.0) / 10.0))
                           ) * 1000.0) / 1000.0 AS q_score
              FROM t
            ), w AS (
              SELECT doc_id, list_distinct(list_transform(
                  (list_filter(string_split_regex(text, '[ \t\n\x0B\f\r]+'), x -> x <> ''))[1:200],
                  x -> lower(x))) AS words
              FROM documents
            ), h AS (
              SELECT doc_id,
                len(list_intersect(words, ['the','and','of','to','in','is','that','it','was','for'])) AS en,
                len(list_intersect(words, ['der','die','und','das','ist','nicht','ein','mit','von','zu'])) AS de,
                len(list_intersect(words, ['le','la','et','les','des','est','un','une','du','que'])) AS fr,
                len(list_intersect(words, ['el','la','de','que','los','es','un','una','las','por'])) AS es
              FROM w
            ), lang AS (
              SELECT doc_id,
                     CASE WHEN greatest(en,de,fr,es) = 0 THEN 'und'
                          WHEN en = greatest(en,de,fr,es) THEN 'en'
                          WHEN de = greatest(en,de,fr,es) THEN 'de'
                          WHEN fr = greatest(en,de,fr,es) THEN 'fr'
                          ELSE 'es' END AS pred_lang
              FROM h
            ), keepers AS (
              SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
            )
            SELECT q.doc_id, q.n_tokens, q.q_score
            FROM q JOIN lang USING (doc_id)
            WHERE q.doc_id IN (SELECT doc_id FROM keepers)
              AND q.q_score >= 0.5 AND lang.pred_lang = 'en'
        """,
        "dedup_keepers": r"""
            WITH RECURSIVE w AS (
              SELECT doc_id,
                     list_filter(string_split_regex(coalesce(text, ''), '[ \t\n\x0B\f\r]+'), x -> x <> '') AS words
              FROM documents
            ), t AS (
              SELECT doc_id,
                     list_distinct(
                       CASE WHEN len(words) < 3 THEN [coalesce(array_to_string(words, ' '), '')]
                       ELSE list_transform(generate_series(1, len(words) - 2),
                                           i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])
                       END) AS sh
              FROM w
            ), pairs AS (
              SELECT id_a, id_b FROM (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       len(list_intersect(a.sh, b.sh)) AS n_inter,
                       len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS n_union
                FROM t a JOIN t b ON a.doc_id < b.doc_id
              ) WHERE n_inter * 1000 >= 500 * n_union
            ), edges AS (
              SELECT id_a AS a, id_b AS b FROM pairs
              UNION SELECT id_b, id_a FROM pairs
            ), nodes AS (
              SELECT DISTINCT a AS id FROM edges
            ), reach(id, r) AS (
              SELECT id, id FROM nodes
              UNION
              SELECT e.a, reach.r FROM edges e JOIN reach ON reach.id = e.b
            )
            SELECT id::BIGINT AS doc_id, min(r)::BIGINT AS keeper_id
            FROM reach GROUP BY 1
        """,
        "semi_anti": """
            WITH w AS (
              SELECT c_nationkey, count(*) AS n_with_orders
              FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)
              GROUP BY 1
            ), wo AS (
              SELECT c_nationkey, count(*) AS n_without_orders
              FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
              GROUP BY 1
            )
            SELECT coalesce(w.c_nationkey, wo.c_nationkey)::BIGINT AS c_nationkey,
                   coalesce(n_with_orders, 0) AS n_with_orders,
                   coalesce(n_without_orders, 0) AS n_without_orders
            FROM w FULL OUTER JOIN wo ON w.c_nationkey = wo.c_nationkey
        """,
        "priority_stats": """
            WITH t AS (
              SELECT o_orderpriority, o_orderkey::BIGINT AS o_orderkey,
                     cast(round(o_totalprice * 100) as bigint) AS price_cents,
                     row_number() OVER (
                       PARTITION BY o_orderpriority
                       ORDER BY cast(round(o_totalprice * 100) as bigint) ASC,
                                o_orderkey ASC) AS rn,
                     count(*) OVER (PARTITION BY o_orderpriority) AS n
              FROM orders
            ), m AS (
              SELECT o_orderpriority, price_cents AS median_cents
              FROM t WHERE rn = (n + 1) // 2
            ), p AS (
              SELECT o_orderpriority,
                     count(*) FILTER (o_orderstatus = 'F') AS n_f,
                     count(*) FILTER (o_orderstatus = 'O') AS n_o,
                     count(*) FILTER (o_orderstatus = 'P') AS n_p
              FROM orders GROUP BY 1
            )
            SELECT p.o_orderpriority AS o_orderpriority,
                   p.n_f, p.n_o, p.n_p, m.median_cents
            FROM p JOIN m USING (o_orderpriority)
        """,
        "props_extract": """
            SELECT event_type, count(*) AS n_events,
                   cast(sum(cast(props->>'$.k' as bigint)) as bigint) AS sum_k,
                   min(cast(props->>'$.k' as bigint)) AS min_k,
                   max(cast(props->>'$.k' as bigint)) AS max_k
            FROM events GROUP BY 1
        """,
        "hex_cell_counts": _HEX_CELL_COUNTS_SQL,
        "s2_tile_rollup": _s2_rollup_oracle_sql(),
        "doc_fingerprint": _fp_oracle_sql(),
        "contamination": _contamination_oracle_sql(),
        # fold of the hash_split + stratified_sample oracles (one LEFT
        # JOIN) — frees a driver-window slot, keeps both checks hash-hard
        "splits_sample": f"""
            SELECT d.doc_id, d.lang,
                   {_split_case_sql('d.doc_id')} AS split,
                   cast(CASE WHEN s.doc_id IS NOT NULL THEN 1 ELSE 0 END
                        AS INT) AS in_sample
            FROM documents d
            LEFT JOIN ({_stratified_oracle_sql(
                {"en": 0.3, "de": 0.9, "fr": 0.9, "es": 0.5}, seed=7
            )}) s ON d.doc_id = s.doc_id
        """,
        "geohash_counts": f"""
            SELECT {_geohash_sql("lon", "lat", 4)} AS geohash,
                   count(*) AS n_points
            FROM {pts} GROUP BY 1
        """,
        "tile_pyramid": f"""
            WITH c AS (
              SELECT {GRID_SQL} AS cell_id, l_quantity FROM {pts}
            )
            SELECT 0 AS level, cell_id AS tile_id, count(*) AS n_points,
                   cast(sum(floor(l_quantity)) as bigint) AS sum_qty
            FROM c GROUP BY 2
            UNION ALL
            SELECT 1 AS level,
                   cast(floor(floor(cell_id / 4096) / 16) as bigint) * 4096
                   + cast(floor((cell_id % 4096) / 16) as bigint) AS tile_id,
                   count(*) AS n_points,
                   cast(sum(floor(l_quantity)) as bigint) AS sum_qty
            FROM c GROUP BY 2
            UNION ALL
            SELECT 2 AS level,
                   cast(floor(floor(cell_id / 4096) / 256) as bigint) * 4096
                   + cast(floor((cell_id % 4096) / 256) as bigint) AS tile_id,
                   count(*) AS n_points,
                   cast(sum(floor(l_quantity)) as bigint) AS sum_qty
            FROM c GROUP BY 2
        """,
        "bbox_join": """
            WITH a AS (
              SELECT n_nationkey::BIGINT AS id_a,
                     (n_nationkey * 37) % 300 - 160 + 0.0005::DOUBLE AS ax0,
                     (n_nationkey * 53) % 140 - 75 + 0.0005::DOUBLE AS ay0,
                     ((n_nationkey * 37) % 300 - 160 + 0.0005::DOUBLE) + 12.0 AS ax1,
                     ((n_nationkey * 53) % 140 - 75 + 0.0005::DOUBLE) + 9.0 AS ay1
              FROM nation
            ), b AS (
              SELECT n_nationkey::BIGINT AS id_b,
                     (n_nationkey * 41) % 300 - 160 + 0.2505::DOUBLE AS bx0,
                     (n_nationkey * 59) % 140 - 75 + 0.2505::DOUBLE AS by0,
                     ((n_nationkey * 41) % 300 - 160 + 0.2505::DOUBLE) + 15.0 AS bx1,
                     ((n_nationkey * 59) % 140 - 75 + 0.2505::DOUBLE) + 10.0 AS by1
              FROM nation
            )
            SELECT id_a, id_b,
                   cast(floor((least(ax1, bx1) - greatest(ax0, bx0))
                              * (least(ay1, by1) - greatest(ay0, by0)) * 1000)
                        as bigint) AS ov_milli
            FROM a JOIN b
              ON ax0 <= bx1 AND bx0 <= ax1 AND ay0 <= by1 AND by0 <= ay1
        """,
        "polygon_metrics": f"""
            WITH v AS (
              SELECT n_nationkey::BIGINT AS poly_id,
                     ((n_nationkey*13) % 100)::DOUBLE AS x1,
                     ((n_nationkey*17) % 80)::DOUBLE AS y1,
                     ((n_nationkey*13) % 100)::DOUBLE
                       + (3 + n_nationkey % 5)::DOUBLE AS x2,
                     ((n_nationkey*17) % 80)::DOUBLE AS y2,
                     ((n_nationkey*13) % 100)::DOUBLE AS x3,
                     ((n_nationkey*17) % 80)::DOUBLE
                       + (4 + n_nationkey % 7)::DOUBLE AS y3
              FROM nation
            )
            SELECT m.poly_id, m.area_milli, m.perim_micro, m.cx_micro,
                   m.cy_micro, r.rect_area_deg2
            FROM (
              SELECT poly_id,
                     cast(floor(abs(0 + (x1*y2 - x2*y1) + (x2*y3 - x3*y2)
                                      + (x3*y1 - x1*y3)) / 2.0 * 1000) as bigint)
                       AS area_milli,
                     cast(floor((0 + sqrt((x2-x1)*(x2-x1) + (y2-y1)*(y2-y1))
                                   + sqrt((x3-x2)*(x3-x2) + (y3-y2)*(y3-y2))
                                   + sqrt((x1-x3)*(x1-x3) + (y1-y3)*(y1-y3)))
                                * 1000000) as bigint) AS perim_micro,
                     cast(floor((0 + x1 + x2 + x3) / 3.0 * 1000000) as bigint) AS cx_micro,
                     cast(floor((0 + y1 + y2 + y3) / 3.0 * 1000000) as bigint) AS cy_micro
              FROM v
            ) m JOIN (
              SELECT poly_id, round((x1 - x0) * (y1 - y0) * 1000) / 1000 AS rect_area_deg2
              FROM ({_NATION_RECTS_SQL})
            ) r USING (poly_id)
        """,
        "pack_sequences": r"""
            WITH RECURSIVE t AS (
              SELECT doc_id, doc_id % 8 AS shard,
                     coalesce(len(regexp_extract_all(text, '[^ \t\n\x0B\f\r]+')), 0)::BIGINT AS tok,
                     row_number() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id) AS rn
              FROM documents
            ), r AS (
              SELECT shard, rn, doc_id, tok, 0::BIGINT AS bin_no, tok AS fill
              FROM t WHERE rn = 1
              UNION ALL
              SELECT t.shard, t.rn, t.doc_id, t.tok,
                     CASE WHEN r.fill > 0 AND r.fill + t.tok > 256
                          THEN r.bin_no + 1 ELSE r.bin_no END,
                     CASE WHEN r.fill > 0 AND r.fill + t.tok > 256
                          THEN t.tok ELSE r.fill + t.tok END
              FROM r JOIN t ON t.shard = r.shard AND t.rn = r.rn + 1
            )
            SELECT doc_id, shard, bin_no FROM r
        """,
        "minhash_near_dups": _minhash_oracle_sql(),
        "simhash_near_dups": _simhash_oracle_sql(),
        "shingle_jaccard": r"""
            WITH w AS (
              SELECT doc_id,
                     list_filter(string_split_regex(coalesce(text, ''), '[ \t\n\x0B\f\r]+'), x -> x <> '') AS words
              FROM documents
            ), t AS (
              SELECT doc_id,
                     list_distinct(
                       CASE WHEN len(words) < 3 THEN [coalesce(array_to_string(words, ' '), '')]
                       ELSE list_transform(generate_series(1, len(words) - 2),
                                           i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])
                       END) AS sh
              FROM w
            )
            SELECT id_a, id_b, n_inter, n_union FROM (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     len(list_intersect(a.sh, b.sh)) AS n_inter,
                     len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS n_union
              FROM t a JOIN t b ON a.doc_id < b.doc_id
            ) WHERE n_inter * 1000 >= 500 * n_union
        """,
        "embedding_near_dups": f"""
            WITH eq AS (
              SELECT vec_id, label, {_QUANT_SQL} AS qv FROM embeddings
              WHERE label IS NOT NULL AND embedding IS NOT NULL
            )
            SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label::BIGINT AS block
            FROM eq a JOIN eq b
              ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE {_COS_SQL.format(a="a.qv", b="b.qv")} >= 0.40
        """,
        "event_joins": """
            SELECT 'asof' AS src, event_id, user_id AS k,
                   coalesce(o_orderkey, -1)::BIGINT AS v FROM (
              SELECT e.event_id, e.user_id, o.o_orderkey,
                     row_number() OVER (
                       PARTITION BY e.event_id
                       ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
                     ) AS rn
              FROM events e LEFT JOIN orders o
                ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
            ) WHERE rn = 1
            UNION ALL
            SELECT 'range', error_id, 0::BIGINT, n_clicks FROM (
              SELECT er.event_id AS error_id, count(*) AS n_clicks
              FROM events er JOIN events c
                ON c.user_id = er.user_id AND c.event_type = 'click'
               AND c.ts >= er.ts AND c.ts < er.ts + INTERVAL 30 MINUTE
              WHERE er.event_type = 'error'
              GROUP BY 1
            )
        """,
        "sessionize": """
            WITH s AS (
              SELECT user_id, ts, event_id, value,
                     CASE WHEN lag(ts) OVER w IS NULL
                               OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS new_s
              FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), x AS (
              SELECT user_id, ts, value,
                     sum(new_s) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS session_id
              FROM s
            )
            SELECT user_id, session_id::BIGINT AS session_id,
                   count(*) AS n_events,
                   strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
                   strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
                   cast(sum(cast(round(value * 100) as bigint)) as bigint) AS value_cents
            FROM x GROUP BY 1, 2
        """,
        # rational-idf BM25 (operators/retrieval.py): every factor is an
        # exact BIGINT and both divisions are integer divisions, so the
        # score replays bit-identically; qt comes from the SAME Python
        # constant the Spark query builds its DataFrame from
        "bm25_topk": f"""
            WITH sized AS (
              -- coalesce(text,'') matches the Spark side: a null doc has
              -- dl = 0 and counts toward n_corpus (never dl = -1/NULL)
              SELECT doc_id,
                     cast(len(list_filter(string_split_regex(coalesce(text, ''), '[ \t\n\x0B\f\r]+'),
                                          x -> x <> '')) AS BIGINT) AS dl,
                     list_filter(string_split_regex(coalesce(text, ''), '[ \t\n\x0B\f\r]+'),
                                 x -> x <> '') AS ws
              FROM documents
            ), stats AS (
              SELECT cast(count(*) AS BIGINT) AS n_corpus,
                     cast(sum(dl) AS BIGINT) AS t_corpus FROM sized
            ), qt(q_id, w) AS (
              VALUES {", ".join(f"({q}, '{w}')" for q, w in _BM25_TERMS)}
            ), terms AS (SELECT DISTINCT w FROM qt),
            tf AS (
              SELECT doc_id, dl, w, cast(count(*) AS BIGINT) AS tf
              FROM (SELECT doc_id, dl, unnest(ws) AS w FROM sized) u
              JOIN terms USING (w)
              GROUP BY 1, 2, 3
            ), dfreq AS (
              SELECT w, cast(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
            ), ts AS (
              SELECT tf.doc_id, tf.w,
                     ((1000 * (2*s.n_corpus - 2*d.df + 1)) // (2*d.df + 1))
                     * ((1000 * 22 * s.t_corpus * tf.tf)
                        // (10*s.t_corpus*tf.tf + 3*s.t_corpus + 9*tf.dl*s.n_corpus)) AS sc
              FROM tf JOIN dfreq d USING (w), stats s
            ), scores AS (
              SELECT q.q_id, t.doc_id, cast(sum(t.sc) AS BIGINT) AS score
              FROM ts t JOIN qt q USING (w) GROUP BY 1, 2
            )
            SELECT q_id, doc_id, score, rn::INT AS rn FROM (
              SELECT *, row_number() OVER (
                PARTITION BY q_id ORDER BY score DESC, doc_id) AS rn
              FROM scores
            ) WHERE rn <= 5
        """,
        # repetition signals: n-grams via list_transform over index series
        # (cheap in DuckDB — no Catalyst-inlining hazard there); the milli
        # ratios use BIGINT // which equals Spark's floor(double-div) for
        # these ranges (see functions/spark_funcs.repetition_stats)
        "repetition_stats": """
            WITH w AS (
              SELECT doc_id,
                     list_filter(string_split_regex(coalesce(text, ''),
                                                    '[ \t\n\x0B\f\r]+'),
                                 x -> x <> '') AS ws
              FROM documents
            ), b AS (
              SELECT doc_id, ws,
                     list_transform(generate_series(1, len(ws)-1),
                                    i -> ws[i] || ' ' || ws[i+1]) AS bg,
                     list_transform(generate_series(1, len(ws)-2),
                                    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS tg
              FROM w
            ), tops AS (
              SELECT doc_id, cast(max(c) AS BIGINT) AS top_word_freq FROM (
                SELECT doc_id, wd, count(*) AS c
                FROM (SELECT doc_id, unnest(ws) AS wd FROM w) GROUP BY 1, 2
              ) GROUP BY 1
            )
            SELECT b.doc_id,
                   cast(len(ws) AS BIGINT) AS n_words,
                   cast(len(list_distinct(ws)) AS BIGINT) AS n_distinct_words,
                   coalesce(t.top_word_freq, 0) AS top_word_freq,
                   cast(len(bg) AS BIGINT) AS n_bigrams,
                   cast(len(list_distinct(bg)) AS BIGINT) AS n_distinct_bigrams,
                   cast(len(tg) AS BIGINT) AS n_trigrams,
                   cast(len(list_distinct(tg)) AS BIGINT) AS n_distinct_trigrams,
                   CASE WHEN len(ws) > 0
                        THEN (1000*(len(ws) - len(list_distinct(ws)))) // len(ws)
                        ELSE 0 END AS dup_word_milli,
                   CASE WHEN len(bg) > 0
                        THEN (1000*(len(bg) - len(list_distinct(bg)))) // len(bg)
                        ELSE 0 END AS dup_bigram_milli,
                   CASE WHEN len(tg) > 0
                        THEN (1000*(len(tg) - len(list_distinct(tg)))) // len(tg)
                        ELSE 0 END AS dup_trigram_milli
            FROM b LEFT JOIN tops t USING (doc_id)
        """,
        # within-radius join: the oracle is the naive theta join with the
        # SAME squared-degree IEEE arithmetic the engine's refine uses
        "distance_join": f"""
            WITH q AS (
              SELECT c_custkey::BIGINT AS q_id, {clon} AS q_lon, {clat} AS q_lat
              FROM customer WHERE c_custkey < 20
            )
            SELECT q.q_id, p.p_id
            FROM q JOIN {pts} p
              ON (p.lon - q.q_lon)*(p.lon - q.q_lon)
               + (p.lat - q.q_lat)*(p.lat - q.q_lat) <= 9.0
        """,
        # fold of the image_luma + image_cells oracles into one slot:
        # luma rows keep bin ≥ -1, cell rows are tagged bin = -2
        "image_stats": f"""
            SELECT image_id AS key, bin, n_px AS val
            FROM ({_image_luma_oracle_sql(192, 16)})
            UNION ALL
            SELECT cast(cell_id AS VARCHAR) AS key,
                   cast(-2 AS INT) AS bin,
                   cast(n_images AS BIGINT) AS val
            FROM ({_image_cells_oracle_sql(2000)})
        """,
        # DBSCAN replay: theta-join neighbors (identical IEEE dist²
        # arithmetic, self pair included), degree test, recursive-CTE
        # reachability over the core-core subgraph labeled by min id,
        # border points to their minimum core neighbor's cluster. The
        # subset modulus is the same integer derivation the Spark query
        # computes (operators/clustering.py).
        "dbscan": f"""
            WITH RECURSIVE p AS (
              SELECT p_id, lon, lat FROM ({_LINEITEM_POINTS_SQL})
              WHERE p_id % (SELECT 16 * greatest(1, count(*) // 60000)
                            FROM lineitem) = 0
            ),
            pairs AS (
              SELECT a.p_id AS qa, b.p_id AS qb
              FROM p a JOIN p b
                ON (b.lon - a.lon)*(b.lon - a.lon)
                 + (b.lat - a.lat)*(b.lat - a.lat)
                   <= {_DBSCAN_EPS * _DBSCAN_EPS!r}
            ),
            deg AS (SELECT qa, count(*) AS c FROM pairs GROUP BY 1),
            core AS (SELECT qa AS id FROM deg WHERE c >= {_DBSCAN_MIN_PTS}),
            edges AS (
              SELECT pr.qa AS a, pr.qb AS b FROM pairs pr
              JOIN core c1 ON pr.qa = c1.id
              JOIN core c2 ON pr.qb = c2.id
              WHERE pr.qa <> pr.qb
            ),
            reach(id, r) AS (
              SELECT id, id FROM core
              UNION
              SELECT e.a, reach.r FROM edges e JOIN reach ON reach.id = e.b
            ),
            core_lbl AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY 1),
            border AS (
              SELECT pr.qa AS id, min(cl.cluster_id) AS cluster_id
              FROM pairs pr JOIN core_lbl cl ON pr.qb = cl.id
              WHERE pr.qa <> pr.qb
                AND pr.qa NOT IN (SELECT id FROM core)
              GROUP BY 1
            )
            SELECT p.p_id,
                   cast(coalesce(c.cluster_id, b.cluster_id, -1) AS BIGINT)
                     AS cluster_id,
                   cast(CASE WHEN c.id IS NOT NULL THEN 1 ELSE 0 END AS INT)
                     AS is_core
            FROM p
            LEFT JOIN core_lbl c ON p.p_id = c.id
            LEFT JOIN border b ON p.p_id = b.id
        """,
        # rasterizer replay: one float multiply + floor (the engine-wide
        # derivation), then pure integer tile/pixel arithmetic; checksum
        # = Σ (py·res+px+1)·min(count,255) — the Spark side computes it
        # from the DECODED image bytes, so a match proves the codec path
        "density_tiles": f"""
            WITH g AS (
              -- closed-domain filter + edge clamp, shared with
              -- rasterize_density (no-op on the in-range derived points)
              SELECT least(cast(floor((lon + 180.0) * 32.0) AS BIGINT), 360*32 - 1) AS gx,
                     least(cast(floor((lat + 90.0) * 32.0) AS BIGINT), 180*32 - 1) AS gy
              FROM ({_LINEITEM_POINTS_SQL})
              WHERE lon >= -180 AND lon <= 180 AND lat >= -90 AND lat <= 90
            ), c AS (
              SELECT gx // 32 AS tx, gy // 32 AS ty,
                     gx % 32 AS px, gy % 32 AS py, count(*) AS c
              FROM g GROUP BY 1, 2, 3, 4
            )
            SELECT tx * 4096 + ty AS tile_id,
                   cast(sum(c) AS BIGINT) AS n_points,
                   cast(count(*) AS BIGINT) AS nonzero_px,
                   cast(max(c) AS BIGINT) AS max_count,
                   cast(sum((py * 32 + px + 1) * least(c, 255)) AS BIGINT)
                     AS checksum
            FROM c GROUP BY 1
        """,
        # zonal stats replay: regenerate the pixel grid from the raw points
        # (the density_tiles derivation), value = least(count, 255) exactly
        # as the raw codec stores it, pixel center = (g + 0.5)/32 − offset
        # (one add + divide + subtract, IEEE-identical to the Spark
        # Columns), then the pip_rects strict-inequality predicate and an
        # all-integer per-polygon aggregate
        "zonal_stats": f"""
            WITH g AS (
              -- closed-domain filter + edge clamp shared with
              -- rasterize_density (no-op on the in-range derived points)
              SELECT least(cast(floor((lon + 180.0) * 32.0) AS BIGINT), 360*32 - 1) AS gx,
                     least(cast(floor((lat + 90.0) * 32.0) AS BIGINT), 180*32 - 1) AS gy
              FROM ({_LINEITEM_POINTS_SQL})
              WHERE lon >= -180 AND lon <= 180 AND lat >= -90 AND lat <= 90
            ), c AS (
              SELECT gx // 32 AS tx, gy // 32 AS ty,
                     gx % 32 AS px, gy % 32 AS py, count(*) AS c
              FROM g GROUP BY 1, 2, 3, 4
            ), px AS (
              SELECT least(c, 255) AS val,
                     (CAST(tx * 32 + px AS DOUBLE) + 0.5) / 32.0 - 180.0 AS lon,
                     (CAST(ty * 32 + py AS DOUBLE) + 0.5) / 32.0 - 90.0 AS lat
              FROM c
            )
            SELECT cast(r.poly_id AS BIGINT) AS poly_id,
                   cast(count(*) AS BIGINT) AS n_px,
                   cast(sum(p.val) AS BIGINT) AS sum_val,
                   cast(max(p.val) AS BIGINT) AS max_val
            FROM px p JOIN ({_NATION_RECTS_SQL}) r
              ON p.lon > r.x0 AND p.lon < r.x1 AND p.lat > r.y0 AND p.lat < r.y1
            GROUP BY 1
        """,
    }


if __name__ == "__main__":
    from geojson_spark.session import get_spark

    s = get_spark(app_name="entry-smoke")
    entry(s).show(10, truncate=False)
