"""Vectorized S2 cell index (public S2 geometry scheme) — the second cell
provider next to the Bing quadkey (`geo/mercator.py`) and the gated H3
provider (`geo/cells.py`), giving the engine the "H3/S2 index with quadkey
fallback" surface. Pure numpy, batch-at-a-time; no S2 library exists in
this container, so the bit layout follows the published scheme (cube-face
projection, quadratic ST transform, Hilbert curve position, trailing
sentinel bit) and is pinned by structural invariants in
tests/test_s2.py — NOT by goldens from an external implementation.

Scheme (all public: the S2 geometry library docs/papers):
- lat/lon -> unit XYZ; face = axis with the largest |component|
  (0..5 = +x,+y,+z,-x,-y,-z) with the standard per-face (u,v) projection;
- quadratic u->s transform: s = sqrt(1+3u)/2 for u>=0 else 1-sqrt(1-3u)/2;
- (s,t) -> 30-bit integer (i,j); the Hilbert curve over the face grid
  yields a 60-bit position via 4-bit lookup-table steps;
- 64-bit cell id = [3 face bits][2*level position bits][1 sentinel][0s];
  the sentinel 1 marks the level. Ids are stored as SIGNED int64 (Spark
  has no uint64): faces 4-5 wrap negative, which keeps equality joins and
  within-face range scans exact (same-sign two's-complement order) — the
  same convention public SQL engines use for their S2 functions.
"""

from __future__ import annotations

import numpy as np

LOOKUP_BITS = 4
SWAP_MASK = 1
INVERT_MASK = 2
MAX_LEVEL = 30

# Hilbert sub-cell orders/orientations (the standard S2 tables)
POS_TO_ORIENTATION = (SWAP_MASK, 0, 0, INVERT_MASK + SWAP_MASK)
POS_TO_IJ = ((0, 1, 3, 2), (0, 2, 3, 1), (3, 2, 0, 1), (3, 1, 0, 2))

_LOOKUP_POS = np.zeros(1 << (2 * LOOKUP_BITS + 2), dtype=np.int64)
_LOOKUP_IJ = np.zeros(1 << (2 * LOOKUP_BITS + 2), dtype=np.int64)


def _init_lookup(level: int, i: int, j: int, orig: int, pos: int, orientation: int):
    if level == LOOKUP_BITS:
        ij = (i << LOOKUP_BITS) + j
        _LOOKUP_POS[(ij << 2) + orig] = (pos << 2) + orientation
        _LOOKUP_IJ[(pos << 2) + orig] = (ij << 2) + orientation
        return
    level += 1
    i <<= 1
    j <<= 1
    pos <<= 2
    r = POS_TO_IJ[orientation]
    for index in range(4):
        _init_lookup(
            level,
            i + (r[index] >> 1),
            j + (r[index] & 1),
            orig,
            pos + index,
            orientation ^ POS_TO_ORIENTATION[index],
        )


for _o in range(4):
    _init_lookup(0, 0, 0, _o, 0, _o)


def _face_uv(lon_deg: np.ndarray, lat_deg: np.ndarray):
    """(face, u, v) per point — cube-face projection of the unit vector."""
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    cl = np.cos(lat)
    x, y, z = cl * np.cos(lon), cl * np.sin(lon), np.sin(lat)
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    fx = (ax >= ay) & (ax >= az)
    fy = ~fx & (ay >= az)
    face = np.where(
        fx,
        np.where(x >= 0, 0, 3),
        np.where(fy, np.where(y >= 0, 1, 4), np.where(z >= 0, 2, 5)),
    ).astype(np.int64)
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (ue, ve, de) in enumerate(
        [
            (y, z, x),  # face 0: +x
            (-x, z, y),  # face 1: +y
            (-x, -y, z),  # face 2: +z
            (z, y, x),  # face 3: -x  (u=z/x, v=y/x with x<0)
            (z, -x, y),  # face 4: -y
            (-y, -x, z),  # face 5: -z
        ]
    ):
        m = face == f
        u[m] = ue[m] / de[m]
        v[m] = ve[m] / de[m]
    return face, u, v


def _st(u: np.ndarray) -> np.ndarray:
    """Quadratic UV->ST transform (the library default); written through
    |u| so both np.where branches stay in sqrt's domain."""
    half = 0.5 * np.sqrt(1.0 + 3.0 * np.abs(u))
    return np.where(u >= 0.0, half, 1.0 - half)


def _ij(s: np.ndarray) -> np.ndarray:
    return np.clip(
        np.floor(s * float(1 << MAX_LEVEL)).astype(np.int64),
        0,
        (1 << MAX_LEVEL) - 1,
    )


def leaf_from_lonlat(lon_deg, lat_deg) -> np.ndarray:
    """Level-30 (leaf) S2 cell ids as int64 (uint64 bit pattern)."""
    face, u, v = _face_uv(lon_deg, lat_deg)
    i, j = _ij(_st(u)), _ij(_st(v))
    return leaf_from_face_ij(face, i, j)


def leaf_from_face_ij(
    face: np.ndarray, i: np.ndarray, j: np.ndarray
) -> np.ndarray:
    """(face, i, j) -> leaf cell id via 8 lookup-table Hilbert steps."""
    fu = face.astype(np.uint64)
    n = fu << np.uint64(2 * MAX_LEVEL)  # 3 face bits above 60 position bits
    bits = (fu & np.uint64(SWAP_MASK)).astype(np.int64)
    iu = np.asarray(i, dtype=np.int64)
    ju = np.asarray(j, dtype=np.int64)
    mask = (1 << LOOKUP_BITS) - 1
    pos = np.zeros(len(fu), dtype=np.uint64)
    for k in range(7, -1, -1):
        bits += ((iu >> (k * LOOKUP_BITS)) & mask) << (LOOKUP_BITS + 2)
        bits += ((ju >> (k * LOOKUP_BITS)) & mask) << 2
        bits = _LOOKUP_POS[bits]
        pos |= (bits >> 2).astype(np.uint64) << np.uint64(k * 2 * LOOKUP_BITS)
        bits &= SWAP_MASK | INVERT_MASK
    leaf = ((n | pos) << np.uint64(1)) | np.uint64(1)
    return leaf.view(np.int64)


def leaf_to_face_ij(ids) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Inverse of :func:`leaf_from_face_ij` (tests pin the round trip)."""
    leaf = np.asarray(ids, dtype=np.int64).view(np.uint64)
    pos = (leaf >> np.uint64(1)) & np.uint64((1 << (2 * MAX_LEVEL)) - 1)
    face = (leaf >> np.uint64(2 * MAX_LEVEL + 1)).astype(np.int64)
    bits = face & SWAP_MASK
    i = np.zeros(len(leaf), dtype=np.int64)
    j = np.zeros(len(leaf), dtype=np.int64)
    mask = (1 << LOOKUP_BITS) - 1
    for k in range(7, -1, -1):
        bits += (
            ((pos >> np.uint64(k * 2 * LOOKUP_BITS)).astype(np.int64))
            & ((1 << (2 * LOOKUP_BITS)) - 1)
        ) << 2
        bits = _LOOKUP_IJ[bits]
        i += (bits >> (LOOKUP_BITS + 2)) << (k * LOOKUP_BITS)
        j += ((bits >> 2) & mask) << (k * LOOKUP_BITS)
        bits &= SWAP_MASK | INVERT_MASK
    return face, i, j


def cell_at_level(leaf_ids, level: int) -> np.ndarray:
    """Truncate leaf ids to ``level`` (sentinel bit marks the level)."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError("level must be 0..30")
    u = np.asarray(leaf_ids, dtype=np.int64).view(np.uint64)
    lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    return (((u & ~(lsb - np.uint64(1))) | lsb)).view(np.int64)


def cell_level(ids) -> np.ndarray:
    """Level of each cell id (from the position of the sentinel bit)."""
    u = np.asarray(ids, dtype=np.int64).view(np.uint64)
    lsb = u & (~u + np.uint64(1))
    out = MAX_LEVEL - (np.round(np.log2(lsb.astype(np.float64))) / 2).astype(
        np.int64
    )
    return out


def cell_range(ids) -> tuple[np.ndarray, np.ndarray]:
    """[range_min, range_max] of leaf ids covered by each cell — the
    containment predicate for range joins (child BETWEEN min AND max),
    valid in int64 because a cell's range never crosses the face sign
    boundary."""
    u = np.asarray(ids, dtype=np.int64).view(np.uint64)
    lsb = u & (~u + np.uint64(1))
    return ((u - (lsb - np.uint64(1))).view(np.int64),
            (u + (lsb - np.uint64(1))).view(np.int64))


def cells_from_lonlat(lon_deg, lat_deg, level: int) -> np.ndarray:
    """Vectorized lon/lat -> S2 cell id at ``level`` (int64)."""
    return cell_at_level(leaf_from_lonlat(lon_deg, lat_deg), level)
