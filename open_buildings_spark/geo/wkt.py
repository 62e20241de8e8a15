"""WKT / WKB geometry codec (Point / Polygon / MultiPolygon), no shapely.

The reference carries geometry as WKT text in the Google CSV path
(open_buildings/google/process.py:213) and as WKB blobs in the Overture path
(open_buildings/download_buildings.py:245,250; overture/add_columns.py:62).
This module provides both encodings over a single flat batch representation
(``GeomBatch``) designed for numpy-vectorized kernels.

Batch layout (ragged arrays, one struct for N geometries):
  coords       : (M, 2) float64, all vertices in row order
  ring_offsets : (R+1,) int64, ring i spans coords[ring_offsets[i]:ring_offsets[i+1]]
  ring_geom    : (R,) int32, owning geometry index of ring i
  ring_is_hole : (R,) bool, True for interior rings
  gtype        : (N,) int8, 1=Point 3=Polygon 6=MultiPolygon, -1=missing/invalid

Parsing has a fully vectorized fast path for single-ring ``POLYGON ((...))``
rows (the overwhelmingly common shape in building footprints) and a general
recursive-descent fallback for multipolygons / holes.
"""

from __future__ import annotations

import struct
import warnings
from dataclasses import dataclass

import numpy as np
import pandas as pd

GT_POINT = 1
GT_POLYGON = 3
GT_MULTIPOLYGON = 6
GT_MISSING = -1


@dataclass
class GeomBatch:
    coords: np.ndarray
    ring_offsets: np.ndarray
    ring_geom: np.ndarray
    ring_is_hole: np.ndarray
    gtype: np.ndarray

    @property
    def n_geoms(self) -> int:
        return len(self.gtype)

    @property
    def n_rings(self) -> int:
        return len(self.ring_geom)

    def ring(self, i: int) -> np.ndarray:
        return self.coords[self.ring_offsets[i] : self.ring_offsets[i + 1]]

    def geom_rings(self, g: int) -> list[int]:
        return np.nonzero(self.ring_geom == g)[0].tolist()


def _floats(text: str) -> np.ndarray:
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return np.fromstring(text.replace(",", " "), dtype=np.float64, sep=" ")


def _floats_bulk(text: str, expected: int) -> np.ndarray | None:
    """Parse a big "x y, x y, ..." blob. pyarrow's CSV float parser is ~2.5x
    faster than np.fromstring and bit-identical; single-threaded on purpose
    (this runs inside a Spark python worker — spawning a thread pool per
    batch would oversubscribe the executor). Falls back to the numpy parser;
    returns None when NEITHER parser yields exactly ``expected`` finite
    floats — the caller must then reroute row-by-row, because a short/long
    result reshaped against precomputed offsets would silently shift every
    later row's coordinates."""
    import io

    import pyarrow as pa
    import pyarrow.csv as pacsv

    try:
        csv = text.replace(", ", "\n").replace(",", "\n")
        t = pacsv.read_csv(
            io.BytesIO(csv.encode()),
            read_options=pacsv.ReadOptions(use_threads=False, column_names=["x", "y"]),
            parse_options=pacsv.ParseOptions(delimiter=" "),
            convert_options=pacsv.ConvertOptions(
                column_types={"x": pa.float64(), "y": pa.float64()}
            ),
        )
        out = np.column_stack(
            [t.column("x").to_numpy(zero_copy_only=False),
             t.column("y").to_numpy(zero_copy_only=False)]
        ).ravel()
        if len(out) == expected and not np.isnan(out).any():
            return out
    except Exception:
        pass
    out = _floats(text)
    if len(out) == expected and not np.isnan(out).any():
        return out
    return None


def _parse_one(wkt: str, g: int, rings: list, ring_geom: list, ring_hole: list) -> int:
    """General parser for one WKT string; appends rings; returns gtype."""
    s = wkt.strip()
    up = s[:20].upper()
    if up.startswith("POINT"):
        body = s[s.index("(") + 1 : s.rindex(")")]
        xy = _floats(body)
        if len(xy) != 2:
            raise ValueError(f"non-2D POINT: {s[:40]!r}")
        rings.append(xy.reshape(1, 2))
        ring_geom.append(g)
        ring_hole.append(False)
        return GT_POINT
    if up.startswith("MULTIPOLYGON"):
        gtype = GT_MULTIPOLYGON
    elif up.startswith("POLYGON"):
        gtype = GT_POLYGON
    else:
        raise ValueError(f"unsupported WKT: {s[:40]!r}")
    body = s[s.index("(") + 1 : s.rindex(")")]
    # Walk parenthesis groups: depth-1 groups within a polygon body are rings;
    # for multipolygon, depth-1 groups are polygons whose depth-2 groups are rings.
    depth = 0
    start = 0
    ring_idx_in_part = 0
    for i, ch in enumerate(body):
        if ch == "(":
            depth += 1
            if (gtype == GT_POLYGON and depth == 1) or (
                gtype == GT_MULTIPOLYGON and depth == 2
            ):
                start = i + 1
            if gtype == GT_MULTIPOLYGON and depth == 1:
                ring_idx_in_part = 0
        elif ch == ")":
            if (gtype == GT_POLYGON and depth == 1) or (
                gtype == GT_MULTIPOLYGON and depth == 2
            ):
                seg = body[start:i]
                xy = _floats(seg)
                # 2 floats per comma-separated vertex, exactly — unmarked-3D
                # or malformed coordinates would otherwise re-pair silently
                if len(xy) != 2 * (seg.count(",") + 1):
                    raise ValueError(f"non-2D/malformed ring: {seg[:40]!r}")
                rings.append(xy.reshape(-1, 2))
                ring_geom.append(g)
                ring_hole.append(ring_idx_in_part > 0)
                ring_idx_in_part += 1
            depth -= 1
    return gtype


def parse_wkt_batch(series: pd.Series) -> GeomBatch:
    """Parse a Series of WKT strings into a GeomBatch.

    Vectorized fast path for simple single-ring polygons; general fallback
    otherwise. Null / empty strings become gtype=GT_MISSING with no rings.
    """
    n = len(series)
    vals = series.to_numpy(dtype=object)
    gtype = np.full(n, GT_MISSING, dtype=np.int8)

    is_str = np.array([isinstance(v, str) and len(v) > 0 for v in vals], dtype=bool)
    s = series.where(pd.Series(is_str, index=series.index), "")
    # simple = "POLYGON ((" + paren-free body + "))": first '(' pair at 8-9,
    # no further '(' anywhere, first ')' is the penultimate char — same set
    # as the old ^POLYGON \(\([^()]+\)\)$ regex at ~half the scan cost
    slen = s.str.len().to_numpy()
    simple_mask = (
        s.str.startswith("POLYGON ((").to_numpy()
        & (s.str.find("(", 10).to_numpy() == -1)
        & (s.str.find(")").to_numpy() == slen - 2)
    )

    # fast path: one shell ring per geom; the whole batch's coordinates are
    # parsed in ONE bulk pass and kept as ONE contiguous block (no per-ring
    # views, no re-concatenation)
    simple_idx = np.nonzero(simple_mask)[0]
    parsed = None
    if len(simple_idx):
        inner = s.iloc[simple_idx].str.slice(10, -2)
        counts = (inner.str.count(",") + 1).to_numpy(dtype=np.int64)
        blob = inner.str.cat(sep=",")
        parsed = _floats_bulk(blob, int(counts.sum()) * 2)
    if parsed is not None:
        fast_coords = parsed.reshape(-1, 2)
        fast_offs = np.concatenate([[0], np.cumsum(counts)])
        gtype[simple_idx] = GT_POLYGON
    else:
        # one malformed 'simple' row (e.g. unmarked-3D coordinates) would
        # misalign the shared contiguous block for every other simple row;
        # reroute the whole set through the per-row path, which degrades
        # exactly the bad rows to GT_MISSING
        simple_mask[:] = False
        simple_idx = np.empty(0, dtype=np.int64)
        fast_coords = np.empty((0, 2), dtype=np.float64)
        fast_offs = np.zeros(1, dtype=np.int64)

    # general path (multipolygons, holes, points): per-geom recursive descent.
    # Parse failures (EMPTY geometries, unsupported types, malformed text)
    # degrade that ROW to GT_MISSING instead of killing the whole Spark
    # stage — the reference's shapely/DuckDB path degrades per-row too.
    gen_rings: list = []
    gen_geom: list = []
    gen_hole: list = []
    for gi in np.nonzero(is_str & ~simple_mask)[0]:
        n_before = len(gen_rings)
        try:
            gtype[gi] = _parse_one(vals[gi], int(gi), gen_rings, gen_geom, gen_hole)
        except (ValueError, IndexError):
            del gen_rings[n_before:], gen_geom[n_before:], gen_hole[n_before:]
            gtype[gi] = GT_MISSING

    if gen_rings:
        # merge the two blocks back into geometry order: several kernels
        # (geom_coord_offsets -> reduceat grouping) require coords contiguous
        # per geometry in ascending index order. Both blocks are themselves
        # geom-sorted, so a stable argsort is a cheap 2-way merge, and the
        # coordinate gather is one vectorized fancy-index pass.
        gen_coords = np.concatenate(gen_rings, axis=0)
        gen_sizes = np.array([len(r) for r in gen_rings], dtype=np.int64)
        all_coords = np.concatenate([fast_coords, gen_coords], axis=0)
        sizes_cat = np.concatenate([np.diff(fast_offs), gen_sizes])
        src_offs = np.concatenate([[0], np.cumsum(sizes_cat)])
        geom_cat = np.concatenate(
            [simple_idx.astype(np.int32), np.array(gen_geom, dtype=np.int32)]
        )
        hole_cat = np.concatenate(
            [np.zeros(len(simple_idx), dtype=bool), np.array(gen_hole, dtype=bool)]
        )
        order = np.argsort(geom_cat, kind="stable")
        sizes = sizes_cat[order]
        ring_offsets = np.concatenate([[0], np.cumsum(sizes)])
        vidx = (
            np.repeat(src_offs[:-1][order] - ring_offsets[:-1], sizes)
            + np.arange(int(ring_offsets[-1]), dtype=np.int64)
        )
        coords = all_coords[vidx]
        ring_geom = geom_cat[order]
        ring_hole = hole_cat[order]
    else:
        coords = fast_coords
        ring_offsets = fast_offs
        ring_geom = simple_idx.astype(np.int32)
        ring_hole = np.zeros(len(simple_idx), dtype=bool)
    return GeomBatch(
        coords=coords,
        ring_offsets=ring_offsets.astype(np.int64),
        ring_geom=ring_geom,
        ring_is_hole=ring_hole,
        gtype=gtype,
    )


def _fmt(v: float) -> str:
    """shapely-compatible coordinate formatting (python repr round-trips)."""
    r = repr(float(v))
    return r[:-2] if r.endswith(".0") else r


def _ring_wkt(coords) -> str:
    return "(" + ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in coords) + ")"


def polygon_wkt(rings: list) -> str:
    """rings: list of (K,2) arrays/lists, shell first."""
    return "POLYGON (" + ", ".join(_ring_wkt(r) for r in rings) + ")"


def multipolygon_wkt(polys: list) -> str:
    """polys: list of list-of-rings."""
    return (
        "MULTIPOLYGON ("
        + ", ".join("(" + ", ".join(_ring_wkt(r) for r in rings) + ")" for rings in polys)
        + ")"
    )


def point_wkt(x: float, y: float) -> str:
    return f"POINT ({_fmt(x)} {_fmt(y)})"


def geojson_geometry_to_wkt(geometry: dict) -> str:
    """GeoJSON geometry dict -> WKT, matching shapely's text format.

    Reference: geojson_to_wkt at open_buildings/download_buildings.py:33-35,
    golden string at tests/test_open_buildings.py:60.
    """
    t = geometry["type"]
    c = geometry["coordinates"]
    if t == "Point":
        return point_wkt(c[0], c[1])
    if t == "Polygon":
        return polygon_wkt(c)
    if t == "MultiPolygon":
        return multipolygon_wkt(c)
    raise ValueError(f"unsupported geometry type {t}")


# ---------------------------------------------------------------------------
# WKB (little-endian, 2D) — used for the countries table / GeoParquet parity.
# ---------------------------------------------------------------------------


def _wkb_ring(coords) -> bytes:
    arr = np.asarray(coords, dtype="<f8")
    return struct.pack("<I", len(arr)) + arr.tobytes()


def polygon_wkb(rings: list) -> bytes:
    return (
        b"\x01" + struct.pack("<I", GT_POLYGON) + struct.pack("<I", len(rings))
        + b"".join(_wkb_ring(r) for r in rings)
    )


def multipolygon_wkb(polys: list) -> bytes:
    return (
        b"\x01" + struct.pack("<I", GT_MULTIPOLYGON) + struct.pack("<I", len(polys))
        + b"".join(polygon_wkb(rings) for rings in polys)
    )


def point_wkb(x: float, y: float) -> bytes:
    return b"\x01" + struct.pack("<I", GT_POINT) + struct.pack("<dd", x, y)


def parse_wkb(buf: bytes):
    """WKB -> (gtype, list of (rings, ...)); returns same shapes as parser.

    Returns (gtype, rings) where rings is list[(coords(K,2), is_hole)].
    """
    if buf is None or len(buf) == 0:
        return GT_MISSING, []
    bo = "<" if buf[0] == 1 else ">"
    (raw,) = struct.unpack_from(f"{bo}I", buf, 1)
    # ISO WKB Z/M/ZM codes (base + 1000/2000/3000) carry extra doubles per
    # point: read the true point width and project to 2D — decoding them as
    # 2D would walk the byte stream misaligned and yield garbage coordinates
    extra = 0
    code = raw
    if 1000 <= raw < 4000:
        extra = (1, 1, 2)[raw // 1000 - 1]
        code = raw % 1000
    dims = 2 + extra
    psz = 8 * dims
    off = 5
    if code == GT_POINT:
        vals = struct.unpack_from(f"{bo}{dims}d", buf, off)
        return GT_POINT, [(np.array([[vals[0], vals[1]]]), False)]
    if code == GT_POLYGON:
        (nr,) = struct.unpack_from(f"{bo}I", buf, off)
        off += 4
        rings = []
        for i in range(nr):
            (npts,) = struct.unpack_from(f"{bo}I", buf, off)
            off += 4
            arr = np.frombuffer(
                buf, dtype=f"{bo}f8", count=npts * dims, offset=off
            ).reshape(-1, dims)[:, :2]
            off += npts * psz
            rings.append((arr, i > 0))
        return GT_POLYGON, rings
    if code == GT_MULTIPOLYGON:
        (nparts,) = struct.unpack_from(f"{bo}I", buf, off)
        off += 4
        rings = []
        for _ in range(nparts):
            off += 5  # nested byte order + type
            (nr,) = struct.unpack_from(f"{bo}I", buf, off)
            off += 4
            for i in range(nr):
                (npts,) = struct.unpack_from(f"{bo}I", buf, off)
                off += 4
                arr = np.frombuffer(
                    buf, dtype=f"{bo}f8", count=npts * dims, offset=off
                ).reshape(-1, dims)[:, :2]
                off += npts * psz
                rings.append((arr, i > 0))
        return GT_MULTIPOLYGON, rings
    raise ValueError(f"unsupported WKB geometry code {raw}")


def wkb_from_batch(batch: GeomBatch) -> np.ndarray:
    """Serialize each geometry of a batch to WKB bytes (None for missing).

    Holes follow their shell; multipolygon parts are split on shell rings.
    """
    out = np.full(batch.n_geoms, None, dtype=object)
    rings_of: dict[int, list[tuple[np.ndarray, bool]]] = {}
    for r in range(batch.n_rings):
        rings_of.setdefault(int(batch.ring_geom[r]), []).append(
            (batch.ring(r), bool(batch.ring_is_hole[r]))
        )
    for g in range(batch.n_geoms):
        gt = batch.gtype[g]
        if gt == GT_MISSING:
            continue
        rings = rings_of.get(g, [])
        if gt == GT_POINT:
            out[g] = point_wkb(rings[0][0][0, 0], rings[0][0][0, 1])
        elif gt == GT_POLYGON:
            out[g] = polygon_wkb([c for c, _ in rings])
        else:  # multipolygon: new part at each shell
            parts: list[list] = []
            for coords, hole in rings:
                if not hole or not parts:
                    parts.append([coords])
                else:
                    parts[-1].append(coords)
            out[g] = multipolygon_wkb(parts)
    return out


def parse_wkb_batch(series: pd.Series) -> GeomBatch:
    n = len(series)
    gtype = np.full(n, GT_MISSING, dtype=np.int8)
    all_rings, ring_geom, ring_hole = [], [], []
    for gi, buf in enumerate(series.to_numpy(dtype=object)):
        gt, rings = parse_wkb(buf if buf is not None else b"")
        gtype[gi] = gt
        for coords, hole in rings:
            all_rings.append(np.asarray(coords, dtype=np.float64))
            ring_geom.append(gi)
            ring_hole.append(hole)
    if all_rings:
        coords = np.concatenate(all_rings, axis=0)
        sizes = np.array([len(r) for r in all_rings], dtype=np.int64)
        ring_offsets = np.concatenate([[0], np.cumsum(sizes)])
    else:
        coords = np.empty((0, 2), dtype=np.float64)
        ring_offsets = np.zeros(1, dtype=np.int64)
    return GeomBatch(
        coords=coords,
        ring_offsets=ring_offsets.astype(np.int64),
        ring_geom=np.array(ring_geom, dtype=np.int32),
        ring_is_hole=np.array(ring_hole, dtype=bool),
        gtype=gtype,
    )
