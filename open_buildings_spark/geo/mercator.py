"""Web-Mercator tile & quadkey math, scalar + numpy-vectorized.

Reimplements (from the public Bing tile / mercantile algorithm, no code copied)
the semantics the reference engine relies on:

- ``lat_lon_to_quadkey`` (reference: open_buildings/overture/add_columns.py:19-25)
- ``geojson_to_quadkey`` zoom-scan 12->0 (reference: open_buildings/download_buildings.py:22-31)
- ``quadkey_to_geojson`` tile bounds polygon (reference: open_buildings/download_buildings.py:37-59)

Golden values pinned by the reference test suite
(reference: tests/test_open_buildings.py:58-68): Seychelles AOI ->
quadkey ``301001330310``; quadkey ``031313131112`` -> London tile bounds.

Scalar functions are driver-side helpers (one AOI per query); the ``*_np``
variants are the Arrow-batch kernels used inside pandas UDFs — pure numpy,
no per-row Python.
"""

from __future__ import annotations

import math

import numpy as np

# Tie-break epsilons matching mercantile's public behavior: points within
# EPSILON of a tile's right/bottom edge count toward the next tile; bbox
# enumeration shrinks the box by LL_EPSILON so edge-aligned boxes do not
# spill into neighbor tiles.
EPSILON = 1e-14
LL_EPSILON = 1e-11

MERCATOR_LAT_LIMIT = 85.051129  # web-mercator clamp


def _xy01(lng: float, lat: float) -> tuple[float, float]:
    """Project lon/lat (deg) to web-mercator unit square [0,1]^2. Latitude
    clamps to the mercator limit like the vectorized twin (tiles_np) —
    lat=±90 would otherwise divide by zero / take log(0)."""
    x = lng / 360.0 + 0.5
    lat = max(-MERCATOR_LAT_LIMIT, min(MERCATOR_LAT_LIMIT, lat))
    sinlat = math.sin(math.radians(lat))
    y = 0.5 - 0.25 * math.log((1.0 + sinlat) / (1.0 - sinlat)) / math.pi
    return x, y


def tile(lng: float, lat: float, zoom: int) -> tuple[int, int]:
    """Tile (x, y) containing the point at ``zoom`` (Bing/mercantile semantics)."""
    x, y = _xy01(lng, lat)
    z2 = 1 << zoom
    if x <= 0:
        xt = 0
    elif x >= 1:
        xt = z2 - 1
    else:
        xt = int(math.floor((x + EPSILON) * z2))
        xt = min(xt, z2 - 1)
    if y <= 0:
        yt = 0
    elif y >= 1:
        yt = z2 - 1
    else:
        yt = int(math.floor((y + EPSILON) * z2))
        yt = min(yt, z2 - 1)
    return xt, yt


def quadkey_from_tile(x: int, y: int, zoom: int) -> str:
    """Base-4 quadkey string, one digit per zoom level (MSB first)."""
    digits = []
    for i in range(zoom, 0, -1):
        mask = 1 << (i - 1)
        d = 0
        if x & mask:
            d += 1
        if y & mask:
            d += 2
        digits.append(chr(48 + d))
    return "".join(digits)


def tile_from_quadkey(qk: str) -> tuple[int, int, int]:
    x = y = 0
    z = len(qk)
    for i, c in enumerate(qk):
        mask = 1 << (z - 1 - i)
        d = ord(c) - 48
        if d & 1:
            x |= mask
        if d & 2:
            y |= mask
    return x, y, z


def tile_bounds(x: int, y: int, z: int) -> tuple[float, float, float, float]:
    """(west, south, east, north) of tile in degrees."""
    z2 = float(1 << z)
    west = x / z2 * 360.0 - 180.0
    east = (x + 1) / z2 * 360.0 - 180.0
    north = math.degrees(math.atan(math.sinh(math.pi * (1.0 - 2.0 * y / z2))))
    south = math.degrees(math.atan(math.sinh(math.pi * (1.0 - 2.0 * (y + 1) / z2))))
    return west, south, east, north


def lat_lon_to_quadkey(lat: float, lon: float, level: int) -> str:
    """Reference UDF semantics (overture/add_columns.py:19-25): point -> quadkey."""
    xt, yt = tile(lon, lat, level)
    return quadkey_from_tile(xt, yt, level)


def _geom_coords(geometry: dict):
    t = geometry["type"]
    cs = geometry["coordinates"]
    if t == "Point":
        yield cs
    elif t in ("MultiPoint", "LineString"):
        yield from cs
    elif t in ("Polygon", "MultiLineString"):
        for ring in cs:
            yield from ring
    elif t == "MultiPolygon":
        for poly in cs:
            for ring in poly:
                yield from ring
    else:  # pragma: no cover
        raise ValueError(f"unsupported geometry type {t}")


def geometry_bounds(geometry: dict) -> tuple[float, float, float, float]:
    xs, ys = zip(*((c[0], c[1]) for c in _geom_coords(geometry)))
    return min(xs), min(ys), max(xs), max(ys)


def bbox_tile_range(
    west: float, south: float, east: float, north: float, zoom: int
) -> tuple[int, int, int, int]:
    """Inclusive tile index range (x0, y0, x1, y1) covering a bbox at ``zoom``."""
    w = max(-180.0, west)
    s = max(-MERCATOR_LAT_LIMIT, south)
    e = min(180.0, east)
    n = min(MERCATOR_LAT_LIMIT, north)
    x0, y0 = tile(w, n, zoom)
    x1, y1 = tile(e - LL_EPSILON, s + LL_EPSILON, zoom)
    return x0, y0, x1, y1


def geojson_to_quadkey(data: dict) -> str:
    """Covering quadkey of an AOI Feature: scan zoom 12->0, return the first
    zoom at which the AOI bbox fits in exactly one tile; '' if none.

    Reference: open_buildings/download_buildings.py:22-31.
    Golden: Seychelles AOI -> '301001330310' (tests/test_open_buildings.py:64).
    """
    w, s, e, n = geometry_bounds(data["geometry"])
    for zoom in range(12, -1, -1):
        x0, y0, x1, y1 = bbox_tile_range(w, s, e, n, zoom)
        if x0 == x1 and y0 == y1:
            return quadkey_from_tile(x0, y0, zoom)
    return ""


def quadkey_to_geojson(quadkey: str) -> dict:
    """Quadkey -> tile bounds as a GeoJSON Feature (closed CCW-from-SW ring).

    Reference: open_buildings/download_buildings.py:37-59.
    Golden: '031313131112' -> London tile (tests/test_open_buildings.py:66-68).
    """
    x, y, z = tile_from_quadkey(quadkey)
    west, south, east, north = tile_bounds(x, y, z)
    return {
        "type": "Feature",
        "geometry": {
            "type": "Polygon",
            "coordinates": [
                [
                    [west, south],
                    [east, south],
                    [east, north],
                    [west, north],
                    [west, south],
                ]
            ],
        },
    }


# ---------------------------------------------------------------------------
# Vectorized (numpy) kernels — the hot path inside pandas UDFs.
# ---------------------------------------------------------------------------


def tiles_np(lon: np.ndarray, lat: np.ndarray, zoom: int) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized ``tile`` over float64 arrays. Returns int64 (x, y)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    z2 = float(1 << zoom)
    x01 = lon / 360.0 + 0.5
    sinlat = np.sin(np.radians(lat))
    with np.errstate(divide="ignore", invalid="ignore"):
        y01 = 0.5 - 0.25 * np.log((1.0 + sinlat) / (1.0 - sinlat)) / np.pi
    bad = np.isnan(x01) | np.isnan(y01)
    x01 = np.where(bad, 0.5, x01)
    y01 = np.where(bad, 0.5, y01)
    xt = np.floor((x01 + EPSILON) * z2).astype(np.int64)
    yt = np.floor((y01 + EPSILON) * z2).astype(np.int64)
    np.clip(xt, 0, int(z2) - 1, out=xt)
    np.clip(yt, 0, int(z2) - 1, out=yt)
    xt = np.where(x01 <= 0, 0, np.where(x01 >= 1, int(z2) - 1, xt))
    yt = np.where(y01 <= 0, 0, np.where(y01 >= 1, int(z2) - 1, yt))
    xt[bad] = -1
    yt[bad] = -1
    return xt, yt


def quadkeys_from_tiles_np(x: np.ndarray, y: np.ndarray, zoom: int) -> np.ndarray:
    """Vectorized tile -> quadkey. Returns an object array of python strings."""
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    n = x.shape[0]
    if n == 0:
        return np.empty(0, dtype=object)
    digits = np.empty((n, zoom), dtype=np.uint8)
    for i in range(zoom):
        mask = 1 << (zoom - 1 - i)
        d = ((x & mask) != 0).astype(np.uint8) + 2 * ((y & mask) != 0).astype(np.uint8)
        digits[:, i] = d + 48
    flat = np.ascontiguousarray(digits).view(f"S{zoom}").ravel()
    out = flat.astype(str).astype(object)
    bad = (x < 0) | (y < 0)
    if bad.any():
        out[bad] = None
    return out


def lonlat_to_quadkey_np(lon: np.ndarray, lat: np.ndarray, zoom: int) -> np.ndarray:
    xt, yt = tiles_np(lon, lat, zoom)
    return quadkeys_from_tiles_np(xt, yt, zoom)


def tile_neighbors(x: int, y: int, z: int, ring: int = 1) -> list[tuple[int, int]]:
    """Tiles within ``ring`` Chebyshev distance (incl. center), x wrapping, y clamped."""
    z2 = 1 << z
    out = []
    for dy in range(-ring, ring + 1):
        yy = y + dy
        if yy < 0 or yy >= z2:
            continue
        for dx in range(-ring, ring + 1):
            out.append(((x + dx) % z2, yy))
    return out
