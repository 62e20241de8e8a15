"""Open Location Code (Plus Code) encoder, numpy-vectorized.

Implements the public OLC spec (https://github.com/google/open-location-code,
spec v1.0) from scratch. The reference calls ``olc.encode(centroid.y,
centroid.x, 12)`` when splitting multipolygons
(open_buildings/google/process.py:112-113,250-251); code length 12 means 8
digits + '+' + 4 digits (13 chars total).

Golden vectors from the public spec test suite pin the implementation
(see tests/test_olc.py).
"""

from __future__ import annotations

import numpy as np

_ALPHABET = "23456789CFGHJMPQRVWX"
_SEP_POS = 8
_PAIR_CODE_LEN = 10
_GRID_COLS = 4
_GRID_ROWS = 5
_LAT_MAX = 90.0
_LON_MAX = 180.0


def _clip_lat(lat: np.ndarray) -> np.ndarray:
    return np.clip(lat, -_LAT_MAX, _LAT_MAX)


def _norm_lon(lon: np.ndarray) -> np.ndarray:
    out = np.mod(lon + _LON_MAX, 2 * _LON_MAX) - _LON_MAX
    return out


def encode_np(lat: np.ndarray, lon: np.ndarray, code_length: int = 10) -> np.ndarray:
    """Vectorized OLC encode. Returns object array of code strings."""
    if code_length < 2 or (code_length < _PAIR_CODE_LEN and code_length % 2 == 1):
        raise ValueError(f"invalid code length {code_length}")
    lat = _clip_lat(np.asarray(lat, dtype=np.float64)).copy()
    lon = _norm_lon(np.asarray(lon, dtype=np.float64))
    n = lat.shape[0]

    # per spec: latitude 90 is nudged into the highest cell
    if code_length <= _PAIR_CODE_LEN:
        final_prec = 20.0 ** int(np.floor(code_length / -2.0 + 2.0))
    else:
        final_prec = (20.0**-3) / (5.0 ** (code_length - _PAIR_CODE_LEN))
    lat[lat >= _LAT_MAX] = _LAT_MAX - final_prec

    # integer-based algorithm from the spec implementations (public domain math):
    # work at the finest grid resolution to avoid float drift.
    lat_val = np.floor(np.round((lat + _LAT_MAX) * 2.5e7, 6)).astype(np.int64)  # 20^3 * 5^5 * ... per deg
    lon_val = np.floor(np.round((lon + _LON_MAX) * 8.192e6, 6)).astype(np.int64)
    # 2.5e7 = 8000 * 3125 (pairs resolution 20^-3 deg => *8000; grid rows 5^5)
    # 8.192e6 = 8000 * 1024 (grid cols 4^5)

    grid_chars = np.zeros((n, 5), dtype=np.int64)
    if code_length > _PAIR_CODE_LEN:
        lat_g = lat_val.copy()
        lon_g = lon_val.copy()
        for i in range(4, -1, -1):
            row = np.mod(lat_g, _GRID_ROWS)
            col = np.mod(lon_g, _GRID_COLS)
            grid_chars[:, i] = row * _GRID_COLS + col
            lat_g //= _GRID_ROWS
            lon_g //= _GRID_COLS
        lat_pair = lat_g
        lon_pair = lon_g
    else:
        lat_pair = lat_val // (5**5)
        lon_pair = lon_val // (4**5)

    # 10 pair digits (5 lat + 5 lon interleaved), most significant first
    pair_digits = np.zeros((n, 10), dtype=np.int64)
    la = lat_pair.copy()
    lo = lon_pair.copy()
    for i in range(4, -1, -1):
        pair_digits[:, 2 * i + 1] = np.mod(lo, 20)
        pair_digits[:, 2 * i] = np.mod(la, 20)
        la //= 20
        lo //= 20

    # vectorized string assembly: fixed-width char matrix viewed as bytes
    alpha_bytes = np.frombuffer(_ALPHABET.encode(), dtype=np.uint8)
    ncode = code_length
    npair = min(ncode, _PAIR_CODE_LEN)
    width = max(ncode, _SEP_POS) + 1  # digits (+ zero padding) + separator
    mat = np.full((n, width), ord("0"), dtype=np.uint8)
    pos = 0
    for j in range(npair):
        col = pos if pos < _SEP_POS else pos + 1
        mat[:, col] = alpha_bytes[pair_digits[:, j]]
        pos += 1
    mat[:, _SEP_POS] = ord("+")
    if ncode > _PAIR_CODE_LEN:
        for j in range(ncode - _PAIR_CODE_LEN):
            mat[:, _PAIR_CODE_LEN + 1 + j] = alpha_bytes[grid_chars[:, j]]
    flat = np.ascontiguousarray(mat).view(f"S{width}").ravel()
    return flat.astype(str).astype(object)


def encode(lat: float, lon: float, code_length: int = 10) -> str:
    return encode_np(np.array([lat]), np.array([lon]), code_length)[0]
