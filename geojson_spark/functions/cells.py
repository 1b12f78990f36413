"""Spherical cell indexes, vectorized NumPy — the engine's spatial keys.

Three index families behind one convention (cell ids are int64, hierarchical,
with cheap parent/children/neighbor arithmetic):

* **S2-style quadtree** (``s2_cell_id``): the published S2 construction —
  lat/lon → unit sphere XYZ → cube face + (u,v) → quadratic S/T transform →
  30-bit (i,j) leaf coordinates → Hilbert-curve position bits → 64-bit id
  ``face(3b) | position(2·level bits) | trailing-1 marker``. Implemented from
  the public algorithm description (S2 geometry docs; Hilbert xy↔d is the
  classic Hacker's-Delight iteration), fully vectorized: the bit loop is 30
  numpy passes regardless of row count. Level 13 is the north-rule default
  (~1.27 km² mean cell area).

* **H3-inspired aperture-7 hex index** (``hex_cell_id``): pointy-top axial
  hex lattice on the equirectangular plane; each resolution scales the
  lattice by √7 (aperture 7 in area) and ``hex_parent`` assigns by CENTER
  CONTAINMENT in the coarser, unrotated lattice — hexagons cannot nest
  exactly, the same approximate-containment H3 itself has. NOT
  bit-compatible with Uber H3 (the icosahedral projection is out of scope
  — documented in SURVEY.md §7.3); same functional surface: k_ring,
  parent. Res-9 center-to-vertex size ≈ 0.0047° (~525 m at the equator).

* **Grid cells** (``grid_cell`` lives in the Spark layer as pure Column
  arithmetic) — the SQL-reproducible stand-in used for DuckDB oracles
  (FIXTURES.md §4).

No reference-crate counterpart exists (georust/geojson has no index); the
north rule (BASELINE.json) specifies this layer.
"""

from __future__ import annotations

import numpy as np

S2_MAX_LEVEL = 30
_S2_LIMIT = np.int64(1) << S2_MAX_LEVEL  # 2^30 leaf cells per face axis


# ---------------------------------------------------------------------------
# S2-style quadtree
# ---------------------------------------------------------------------------


def lonlat_to_xyz(lon_deg: np.ndarray, lat_deg: np.ndarray):
    """Unit-sphere direction. Two trig calls instead of four: the cosines
    come from √(1−sin²) with quadrant sign fixes (lat ∈ [-90,90] → cos≥0;
    cos(lon) ≥ 0 iff |lon| ≤ 90). Transcendentals dominate on this host."""
    lon_deg = np.asarray(lon_deg, dtype=np.float64)
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lon = np.radians(lon_deg)
    sin_lat = np.sin(lat)
    cos_lat = np.sqrt(1.0 - sin_lat * sin_lat)
    sin_lon = np.sin(lon)
    cos_lon = np.sqrt(np.maximum(0.0, 1.0 - sin_lon * sin_lon))
    cos_lon = np.where(np.abs(lon_deg) > 90.0, -cos_lon, cos_lon)
    return cos_lat * cos_lon, cos_lat * sin_lon, sin_lat


def _xyz_to_face_uv(x, y, z):
    """Cube face (0..5) + gnomonic (u,v) in [-1,1].

    Face frames (our own consistent convention; inverted in
    ``s2_cell_center``):
      f0 (+x): u=y/x  v=z/x     f3 (-x): u=z/x  v=y/x
      f1 (+y): u=-x/y v=z/y     f4 (-y): u=z/y  v=-x/y
      f2 (+z): u=-x/z v=-y/z    f5 (-z): u=-y/z v=-x/z
    Pure arithmetic selection — no masked loops, one pass per array.
    """
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    axis = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    major = np.choose(axis, [x, y, z])
    face = np.where(major < 0, axis + 3, axis).astype(np.int64)
    nx, ny, nz = -x, -y, -z
    with np.errstate(divide="ignore", invalid="ignore"):
        u = np.choose(face, [y, nx, nx, z, z, ny]) / major
        v = np.choose(face, [z, z, ny, y, nx, nx]) / major
    return face, u, v


def _uv_to_st(u):
    """S2 quadratic projection — equalizes cell areas across a face."""
    with np.errstate(invalid="ignore"):
        return np.where(
            u >= 0, 0.5 * np.sqrt(np.abs(1.0 + 3.0 * u)), 1.0 - 0.5 * np.sqrt(np.abs(1.0 - 3.0 * u))
        )


def _st_to_uv(s):
    return np.where(
        s >= 0.5, (1.0 / 3.0) * (4.0 * s * s - 1.0), (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s))
    )


def _hilbert_xy_to_d_ref(order: int, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Classic per-bit Hilbert (x,y) → d (reference implementation).

    One numpy pass per bit level — correct but slow; used to build and
    verify the table-driven fast path below.
    """
    x = x.astype(np.int64)
    y = y.astype(np.int64)
    d = np.zeros_like(x)
    s = np.int64(1) << (order - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant — branch-free (np.where, no fancy-index copies)
        inv_x = s - 1 - x
        inv_y = s - 1 - y
        nx = np.where(ry == 1, x, np.where(rx == 1, inv_y, y))
        ny = np.where(ry == 1, y, np.where(rx == 1, inv_x, x))
        x, y = nx, ny
        s >>= 1
    return d


# --- table-driven Hilbert: 5 levels per step via 1024-entry lookups --------
#
# The Hilbert curve is self-similar under the dihedral group of the square:
# after consuming the top 5 bit-levels, the remaining curve is the same
# curve pre-composed with a dihedral transform ("state"). Dihedral
# transforms act bitwise-independently on (x, y) (complement and/or swap),
# so 30 levels = 6 table steps:
#
#   d    = M[T(x_hi, y_hi)]  appended 10 bits at a time
#   T'   = S[T(x_hi, y_hi)] ∘ T
#
# M (block → 10-bit d), S (block → sub-state) are derived empirically from
# an order-6 enumeration of the per-bit reference; COMPOSE/APPLY tables are
# computed from the 8 dihedral transforms directly. Verified exhaustively
# against the reference at import-build time in tests.

_CHUNK = 5
_CSIZE = 1 << _CHUNK  # 32
_CMASK = np.int64(_CSIZE - 1)


def _dihedral_apply(t: int, x, y, bits: int):
    """Apply dihedral transform index t (bit0 swap, bit1 neg-x, bit2 neg-y)."""
    mx = (1 << bits) - 1
    if t & 1:
        x, y = y, x
    if t & 2:
        x = mx - x
    if t & 4:
        y = mx - y
    return x, y


def _build_hilbert_tables():
    # order-6 enumeration with the reference impl: top 5 levels give M,
    # the 6th level's 1-level map identifies each block's sub-state.
    n = 1 << 6
    xx, yy = np.meshgrid(np.arange(n, dtype=np.int64), np.arange(n, dtype=np.int64), indexing="ij")
    xf, yf = xx.ravel(), yy.ravel()
    d6 = _hilbert_xy_to_d_ref(6, xf, yf)

    x_hi, x_lo = xf >> 1, xf & 1
    y_hi, y_lo = yf >> 1, yf & 1
    d_hi, d_lo = d6 >> 2, d6 & 3

    key = (x_hi << _CHUNK) | y_hi  # 10-bit block key
    M = np.zeros(1 << (2 * _CHUNK), dtype=np.int64)
    M[key] = d_hi  # constant per block by construction

    # base 1-level map M1 and its composition with each dihedral transform
    m1 = {}
    for t in range(8):
        sig = []
        for xb in (0, 1):
            for yb in (0, 1):
                tx, ty = _dihedral_apply(t, xb, yb, 1)
                # M1: (0,0)→0 (0,1)→1 (1,1)→2 (1,0)→3
                sig.append({(0, 0): 0, (0, 1): 1, (1, 1): 2, (1, 0): 3}[(tx, ty)])
        m1[tuple(sig)] = t

    # per-block 1-level signature → sub-state
    S = np.zeros(1 << (2 * _CHUNK), dtype=np.int64)
    sig_arr = np.zeros((1 << (2 * _CHUNK), 4), dtype=np.int64)
    sig_arr[key, (x_lo << 1) | y_lo] = d_lo
    for k in range(1 << (2 * _CHUNK)):
        S[k] = m1[tuple(sig_arr[k])]

    # APPLY[t][key] = key after transform t (on 5-bit coords)
    ks = np.arange(1 << (2 * _CHUNK), dtype=np.int64)
    kx, ky = ks >> _CHUNK, ks & _CMASK
    APPLY = np.zeros((8, 1 << (2 * _CHUNK)), dtype=np.int64)
    INV_APPLY = np.zeros_like(APPLY)
    for t in range(8):
        tx, ty = _dihedral_apply(t, kx, ky, _CHUNK)
        APPLY[t] = (tx << _CHUNK) | ty
        INV_APPLY[t, (tx << _CHUNK) | ty] = ks

    # COMPOSE[a][b] = a ∘ b (apply b first)
    COMPOSE = np.zeros((8, 8), dtype=np.int64)
    probe = [(0, 1), (1, 0), (1, 1)]  # faithful on these
    for a in range(8):
        for b in range(8):
            res = [_dihedral_apply(a, *_dihedral_apply(b, px, py, _CHUNK), _CHUNK) for px, py in probe]
            for c in range(8):
                if all(_dihedral_apply(c, px, py, _CHUNK) == r for (px, py), r in zip(probe, res)):
                    COMPOSE[a][b] = c
                    break

    Minv = np.zeros_like(M)
    Minv[M] = ks
    return M, Minv, S, APPLY, INV_APPLY, COMPOSE


_M, _MINV, _S, _APPLY, _INV_APPLY, _COMPOSE = _build_hilbert_tables()


def _hilbert_xy_to_d(order: int, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Table-driven Hilbert (x,y) → d; ``order`` must be a multiple of 5.

    6 table steps for order 30 (vs 30 arithmetic passes) — ~10× fewer numpy
    passes, which matters on this box (see BENCH notes).
    """
    assert order % _CHUNK == 0
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    d = np.zeros_like(x)
    state = np.zeros_like(x)
    for step in range(order // _CHUNK - 1, -1, -1):
        sh = np.int64(step * _CHUNK)
        key = (((x >> sh) & _CMASK) << _CHUNK) | ((y >> sh) & _CMASK)
        tkey = _APPLY[state, key]
        d = (d << np.int64(2 * _CHUNK)) | _M[tkey]
        state = _COMPOSE[_S[tkey], state]
    return d


def _hilbert_d_to_xy(order: int, d: np.ndarray):
    """Table-driven inverse Hilbert; ``order`` must be a multiple of 5."""
    assert order % _CHUNK == 0
    d = np.asarray(d, dtype=np.int64)
    x = np.zeros_like(d)
    y = np.zeros_like(d)
    state = np.zeros_like(d)
    for step in range(order // _CHUNK - 1, -1, -1):
        dh = (d >> np.int64(2 * _CHUNK * step)) & np.int64((1 << (2 * _CHUNK)) - 1)
        q = _MINV[dh]
        xy = _INV_APPLY[state, q]
        x = (x << np.int64(_CHUNK)) | (xy >> _CHUNK)
        y = (y << np.int64(_CHUNK)) | (xy & _CMASK)
        state = _COMPOSE[_S[q], state]
    return x, y


def s2_lsb(level: int) -> np.int64:
    return np.int64(1) << (2 * (S2_MAX_LEVEL - level))


def xyz_to_cell_id(x, y, z, level: int = 13) -> np.ndarray:
    """Unit-sphere (or any nonzero) direction vectors → int64 S2-style cell
    ids at ``level``. The ECEF-direction entry point: every operation after
    the caller's xyz derivation is comparisons / divides / sqrt / truncate
    (IEEE-correctly-rounded, engine-independent), which is what makes this
    path SQL-oracle-replayable bit-for-bit when the xyz themselves come
    from a shared derivation. Non-finite or zero vectors map to the
    sentinel -1 (never a valid id)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    ok = (
        np.isfinite(x) & np.isfinite(y) & np.isfinite(z)
        & ((x != 0.0) | (y != 0.0) | (z != 0.0))
    )
    face, u, v = _xyz_to_face_uv(
        np.where(ok, x, 1.0), np.where(ok, y, 0.0), np.where(ok, z, 0.0)
    )
    i = np.clip((_uv_to_st(u) * float(_S2_LIMIT)).astype(np.int64), 0, _S2_LIMIT - 1)
    j = np.clip((_uv_to_st(v) * float(_S2_LIMIT)).astype(np.int64), 0, _S2_LIMIT - 1)
    d = _hilbert_xy_to_d(S2_MAX_LEVEL, i, j)
    leaf = (face << np.int64(61)) | (d << np.int64(1)) | np.int64(1)
    return np.where(ok, s2_parent(leaf, level), np.int64(-1))


def s2_cell_id(lon_deg, lat_deg, level: int = 13) -> np.ndarray:
    """lon/lat arrays → int64 S2-style cell ids at ``level``. Non-finite
    OR out-of-range coordinates (|lon| > 180, |lat| > 90) map to the
    sentinel -1 (never a valid id — valid ids carry the trailing level
    marker), so dirty rows cannot silently join to a real cell:
    ``lonlat_to_xyz``'s √(1−sin²) cosine reconstruction is only valid
    inside the range (a finite lon = 360 would otherwise land on the
    ANTIPODAL cell, a silently wrong join key)."""
    lon = np.asarray(lon_deg, dtype=np.float64)
    lat = np.asarray(lat_deg, dtype=np.float64)
    with np.errstate(invalid="ignore"):
        valid = (
            np.isfinite(lon) & np.isfinite(lat)
            & (np.abs(lon) <= 180.0) & (np.abs(lat) <= 90.0)
        )
    x, y, z = lonlat_to_xyz(np.where(valid, lon, 0.0), np.where(valid, lat, 0.0))
    cell = xyz_to_cell_id(x, y, z, level)
    return np.where(valid, cell, np.int64(-1))


def s2_parent(cell_id: np.ndarray, level: int) -> np.ndarray:
    """Truncate to ``level`` — pure bit arithmetic (also valid as a Spark
    Column expression: (id & -lsb) | lsb)."""
    lsb = s2_lsb(level)
    return (np.asarray(cell_id, dtype=np.int64) & np.int64(-lsb)) | lsb


def s2_level(cell_id) -> np.ndarray:
    """Level from the trailing-1 position."""
    c = np.asarray(cell_id, dtype=np.int64)
    lsb = c & (-c)
    return (S2_MAX_LEVEL - (np.round(np.log2(lsb.astype(np.float64))) / 2).astype(np.int64)).astype(
        np.int64
    )


def s2_to_face_ij(cell_id, level: int):
    """Cell id → (face, i, j) at ``level`` resolution (i,j in [0, 2^level))."""
    c = np.asarray(cell_id, dtype=np.int64)
    face = (c >> np.int64(61)) & np.int64(7)
    # (c >> 1) keeps the trailing level marker — a valid leaf inside the cell
    d = (c >> np.int64(1)) & ((np.int64(1) << np.int64(60)) - 1)
    i30, j30 = _hilbert_d_to_xy(S2_MAX_LEVEL, d)
    sh = np.int64(S2_MAX_LEVEL - level)
    return face, i30 >> sh, j30 >> sh


def s2_from_face_ij(face, i, j, level: int) -> np.ndarray:
    sh = np.int64(S2_MAX_LEVEL - level)
    i30 = np.asarray(i, dtype=np.int64) << sh
    j30 = np.asarray(j, dtype=np.int64) << sh
    d = _hilbert_xy_to_d(S2_MAX_LEVEL, i30, j30)
    leaf = (np.asarray(face, dtype=np.int64) << np.int64(61)) | (d << np.int64(1)) | np.int64(1)
    return s2_parent(leaf, level)


def s2_cell_center(cell_id, level: int):
    """Cell id → (lon, lat) of cell center (degrees). Sentinel (-1) or
    corrupt ids whose face decodes to 6/7 return (NaN, NaN) — the fill
    loop below only covers faces 0..5, and uninitialized slots would
    otherwise leak garbage coordinates. NOTE: a negative int64 id is NOT
    itself a sentinel — faces 4 and 5 set the sign bit legitimately; the
    -1 sentinel decodes to face 7, so ``face > 5`` is the one test."""
    face, i, j = s2_to_face_ij(cell_id, level)
    bad = np.atleast_1d(face > 5)
    n = float(np.int64(1) << level)
    s = (i.astype(np.float64) + 0.5) / n
    t = (j.astype(np.float64) + 0.5) / n
    u = np.atleast_1d(_st_to_uv(s))
    v = np.atleast_1d(_st_to_uv(t))
    face = np.atleast_1d(face)
    one = np.ones_like(u)
    # invert the face frames of _xyz_to_face_uv exactly:
    #  f0: u=y/x, v=z/x, x>0      →  (1, u, v)
    #  f1: u=-x/y, v=z/y, y>0     →  (-u, 1, v)
    #  f2: u=-x/z, v=-y/z, z>0    →  (-u, -v, 1)
    #  f3: u=z/x, v=y/x, x<0      →  (-1, -v, -u)
    #  f4: u=z/y, v=-x/y, y<0     →  (v, -1, -u)
    #  f5: u=-y/z, v=-x/z, z<0    →  (v, u, -1)
    xyz = np.full((3, u.shape[0]), np.nan, dtype=np.float64)
    frames = [
        (one, u, v),
        (-u, one, v),
        (-u, -v, one),
        (-one, -v, -u),
        (v, -one, -u),
        (v, u, -one),
    ]
    for f in range(6):
        m = face == f
        if np.any(m):
            fx, fy, fz = frames[f]
            xyz[0][m] = fx[m]
            xyz[1][m] = fy[m]
            xyz[2][m] = fz[m]
    with np.errstate(invalid="ignore"):
        norm = np.sqrt((xyz**2).sum(axis=0))
        xn, yn, zn = xyz[0] / norm, xyz[1] / norm, xyz[2] / norm
        lon = np.where(bad, np.nan, np.degrees(np.arctan2(yn, xn)))
        lat = np.where(bad, np.nan, np.degrees(np.arcsin(np.clip(zn, -1, 1))))
    return lon, lat


def s2_k_ring(cell_id, level: int, k: int = 1) -> np.ndarray:
    """(2k+1)² same-face neighborhood per cell, clamped at face edges.

    Returns shape (n, (2k+1)**2) int64; out-of-face slots repeat the center
    cell (harmless duplicates for join fan-out). Cross-face adjacency is a
    documented limitation (SURVEY.md §7.3); the kNN operator widens rings
    until satisfied, and oracle-checked kNN uses the grid index instead.
    Sentinel (-1) / corrupt-face ids propagate as all-(-1) rows — like
    ``hex_k_ring`` — instead of fabricating face-7 neighbor ids that could
    equi-join to nothing or, worse, each other.
    """
    cid_in = np.atleast_1d(np.asarray(cell_id, dtype=np.int64))
    face, i, j = s2_to_face_ij(cid_in, level)
    # faces 4/5 set the int64 sign bit legitimately; the -1 sentinel (and
    # any corrupt id) decodes to face 6/7, so face > 5 is the one test
    sentinel = face > 5
    n = np.int64(1) << level
    out = []
    for di in range(-k, k + 1):
        for dj in range(-k, k + 1):
            ii = i + di
            jj = j + dj
            ok = (ii >= 0) & (ii < n) & (jj >= 0) & (jj < n)
            cid = s2_from_face_ij(
                np.where(sentinel, 0, face),
                np.clip(ii, 0, n - 1),
                np.clip(jj, 0, n - 1),
                level,
            )
            out.append(np.where(sentinel, np.int64(-1), np.where(ok, cid, cid_in)))
    return np.stack(out, axis=1)


# ---------------------------------------------------------------------------
# H3-inspired aperture-7 hex index (axial coords, equirectangular plane)
# ---------------------------------------------------------------------------

# res-0 hex "size" (center-to-vertex) in degrees; res r size = HEX0 * 7^(-r/2)
HEX0_SIZE_DEG = 30.0
_SQRT3 = np.sqrt(3.0)


def _hex_size(res: int) -> float:
    return HEX0_SIZE_DEG * (7.0 ** (-res / 2.0))


def _cube_round(qf, rf):
    sf = -qf - rf
    q = np.round(qf)
    r = np.round(rf)
    s = np.round(sf)
    dq = np.abs(q - qf)
    dr = np.abs(r - rf)
    ds = np.abs(s - sf)
    fix_q = (dq > dr) & (dq > ds)
    fix_r = ~fix_q & (dr > ds)
    q = np.where(fix_q, -r - s, q)
    r = np.where(fix_r, -q - s, r)
    return q.astype(np.int64), r.astype(np.int64)


def hex_axial(lon_deg, lat_deg, res=9):
    """lon/lat → axial (q, r) on the pointy-top hex lattice at ``res``
    (scalar or per-element array)."""
    size = HEX0_SIZE_DEG * (7.0 ** (-np.asarray(res, dtype=np.float64) / 2.0))
    x = np.asarray(lon_deg, dtype=np.float64)
    y = np.asarray(lat_deg, dtype=np.float64)
    qf = (_SQRT3 / 3.0 * x - 1.0 / 3.0 * y) / size
    rf = (2.0 / 3.0 * y) / size
    return _cube_round(qf, rf)


def hex_pack(q: np.ndarray, r: np.ndarray, res) -> np.ndarray:
    """(q, r, res) → int64: res(4b) | q+OFF(28b) | r+OFF(28b). ``res`` may
    be a scalar or a per-element array (mixed-resolution ids)."""
    OFF = np.int64(1) << 27
    return (
        (np.asarray(res, dtype=np.int64) << np.int64(56))
        | ((q.astype(np.int64) + OFF) << np.int64(28))
        | (r.astype(np.int64) + OFF)
    )


def hex_unpack(cell_id):
    c = np.asarray(cell_id, dtype=np.int64)
    OFF = np.int64(1) << 27
    res = (c >> np.int64(56)) & np.int64(0xF)
    q = ((c >> np.int64(28)) & np.int64((1 << 28) - 1)) - OFF
    r = (c & np.int64((1 << 28) - 1)) - OFF
    return res, q, r


def hex_cell_id(lon_deg, lat_deg, res=9) -> np.ndarray:
    """Non-finite coordinates map to the sentinel -1 (the res nibble 0xF…
    sign bit set — never produced by hex_pack), mirroring s2_cell_id."""
    lon = np.asarray(lon_deg, dtype=np.float64)
    lat = np.asarray(lat_deg, dtype=np.float64)
    finite = np.isfinite(lon) & np.isfinite(lat)
    q, r = hex_axial(np.where(finite, lon, 0.0), np.where(finite, lat, 0.0), res)
    return np.where(finite, hex_pack(q, r, res), np.int64(-1))


def hex_center(cell_id):
    res, q, r = hex_unpack(cell_id)
    sizes = HEX0_SIZE_DEG * (7.0 ** (-res.astype(np.float64) / 2.0))
    x = sizes * (_SQRT3 * q.astype(np.float64) + _SQRT3 / 2.0 * r.astype(np.float64))
    y = sizes * (1.5 * r.astype(np.float64))
    return x, y


def hex_parent(cell_id, parent_res: int | None = None) -> np.ndarray:
    """Aperture-7 parent: the ``parent_res`` cell containing this cell's
    center. Adjacent resolutions differ by the √7 size ratio, so each parent
    covers ~7 children — the same approximate-containment semantics H3 has
    (hexagons cannot nest exactly; H3's children also only approximately
    tile their parent)."""
    cid = np.atleast_1d(np.asarray(cell_id, dtype=np.int64))
    sentinel = cid < 0  # hex_unpack(-1) decodes a plausible-looking cell;
    # propagate the null sentinel instead (it must never equi-join to real
    # parents), mirroring hex_cell_id
    res, _, _ = hex_unpack(cid)
    target = np.full_like(res, parent_res) if parent_res is not None else res - 1
    if np.any(target[~sentinel] < 0):
        raise ValueError("hex_parent below resolution 0")
    cx, cy = hex_center(cid)
    return np.where(sentinel, np.int64(-1), hex_cell_id(cx, cy, np.where(target < 0, 0, target)))


def hex_k_ring(cell_id, k: int = 1) -> np.ndarray:
    """All cells within hex distance k: shape (n, 1+3k(k+1)) int64."""
    cid = np.atleast_1d(np.asarray(cell_id, dtype=np.int64))
    sentinel = cid < 0  # see hex_parent: sentinels propagate, never decode
    res, q, r = hex_unpack(cid)
    deltas = [
        (dq, dr)
        for dq in range(-k, k + 1)
        for dr in range(max(-k, -dq - k), min(k, -dq + k) + 1)
    ]
    # per-element res: a mixed-resolution input gets each cell's ring in
    # its OWN lattice (ids self-encode res precisely to allow mixing)
    cols = [hex_pack(q + dq, r + dr, res) for dq, dr in deltas]
    return np.where(sentinel[:, None], np.int64(-1), np.stack(cols, axis=1))
