"""Pure-Python, row-at-a-time, obviously-correct oracle — independent of the
engine kernels (winding-number PIP instead of raycast; digit-by-digit
quadkey). Used by the Spark tests to verify engine results row-for-row."""

from __future__ import annotations

import math


def quadkey_z12(lon: float, lat: float) -> str:
    x01 = lon / 360.0 + 0.5
    s = math.sin(math.radians(lat))
    y01 = 0.5 - 0.25 * math.log((1.0 + s) / (1.0 - s)) / math.pi
    z2 = 4096
    xt = 0 if x01 <= 0 else (z2 - 1 if x01 >= 1 else min(int((x01 + 1e-14) * z2), z2 - 1))
    yt = 0 if y01 <= 0 else (z2 - 1 if y01 >= 1 else min(int((y01 + 1e-14) * z2), z2 - 1))
    digits = []
    for i in range(12, 0, -1):
        d = 0
        if xt & (1 << (i - 1)):
            d += 1
        if yt & (1 << (i - 1)):
            d += 2
        digits.append(str(d))
    return "".join(digits)


def winding_inside(px: float, py: float, ring: list) -> bool:
    wn = 0
    for i in range(len(ring) - 1):
        x0, y0 = ring[i][0], ring[i][1]
        x1, y1 = ring[i + 1][0], ring[i + 1][1]
        if y0 <= py:
            if y1 > py and (x1 - x0) * (py - y0) - (y1 - y0) * (px - x0) > 0:
                wn += 1
        elif y1 <= py and (x1 - x0) * (py - y0) - (y1 - y0) * (px - x0) < 0:
            wn -= 1
    return wn != 0


def rect_within(minx, miny, maxx, maxy, w, s, e, n) -> bool:
    """Footprint-bbox within rect AOI (exact for rectangle footprints/AOIs)."""
    return minx >= w and maxx <= e and miny >= s and maxy <= n
