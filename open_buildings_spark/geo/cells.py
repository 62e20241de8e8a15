"""Cell-index abstraction: one interface, pluggable spatial-index providers.

The north-star asks for H3/S2 cell indexing with a quadkey fallback matching
the reference's partitioning scheme. No H3/S2 library is installable in this
environment, so:

- :class:`QuadkeyIndex` is the primary provider — pure numpy, exactly the
  reference's Bing-tile scheme (prefix containment = spatial containment,
  which H3 cells do NOT give you; the engine's prefix pushdown and adaptive
  prefix splitting are quadkey-specific strengths);
- :class:`S2Index` is the from-scratch S2 provider (geo/s2.py) — int64
  cell ids in the public bit layout; containment is a numeric RANGE
  predicate (``cell_range``) instead of a string prefix, neighbor rings
  wrap exactly across cube-face seams, and bbox covers come from exact
  per-face UV bounds;
- :class:`H3Index` activates automatically if ``import h3`` ever succeeds,
  mapping the same interface onto H3 cells (resolution ≈ zoom); ring
  expansion uses ``h3.grid_disk``. Until then it raises ImportError.

Operators take a provider via ``cell_index(name)``; everything else
(cover cells, neighbor rings, parent cells) is provider-agnostic.
"""

from __future__ import annotations

import numpy as np

from . import mercator
from . import s2 as _s2


class QuadkeyIndex:
    """Bing/quadkey cells (reference scheme: overture/add_columns.py:40-47)."""

    name = "quadkey"
    hierarchical_prefix = True  # parent(cell) == cell[:k]

    def cell_of(self, lon: np.ndarray, lat: np.ndarray, level: int) -> np.ndarray:
        return mercator.lonlat_to_quadkey_np(lon, lat, level)

    def cell_of_scalar(self, lon: float, lat: float, level: int) -> str:
        return mercator.lat_lon_to_quadkey(lat, lon, level)

    def parent(self, cell: str, level: int) -> str:
        return cell[:level]

    def neighbors(self, cell: str, ring: int = 1) -> list[str]:
        x, y, z = mercator.tile_from_quadkey(cell)
        return [
            mercator.quadkey_from_tile(nx, ny, z)
            for nx, ny in mercator.tile_neighbors(x, y, z, ring)
        ]

    def cover_bbox(self, w: float, s: float, e: float, n: float, level: int) -> list[str]:
        x0, y0, x1, y1 = mercator.bbox_tile_range(w, s, e, n, level)
        return [
            mercator.quadkey_from_tile(x, y, level)
            for x in range(x0, x1 + 1)
            for y in range(y0, y1 + 1)
        ]


class S2Index:
    """S2 cells (geo/s2.py: cube-face + Hilbert curve, int64 ids). Cells
    are python ints; parent containment is the range predicate
    ``leaf BETWEEN cell_range(parent)``, not a string prefix."""

    name = "s2"
    hierarchical_prefix = False  # containment is numeric-range, not prefix

    def cell_of(self, lon: np.ndarray, lat: np.ndarray, level: int) -> np.ndarray:
        return _s2.cells_from_lonlat(lon, lat, level)

    def cell_of_scalar(self, lon: float, lat: float, level: int) -> int:
        return int(_s2.cells_from_lonlat(np.array([lon]), np.array([lat]), level)[0])

    def parent(self, cell: int, level: int) -> int:
        return int(_s2.cell_at_level(np.array([cell]), level)[0])

    def neighbors(self, cell: int, ring: int = 1) -> list[int]:
        return _s2.neighbor_cells(cell, ring)

    def cover_bbox(self, w: float, s: float, e: float, n: float, level: int) -> list[int]:
        return _s2.cover_bbox(w, s, e, n, level)


class H3Index:  # pragma: no cover - h3 not installed in this environment
    """H3 provider; available only when the h3 package is importable."""

    name = "h3"
    hierarchical_prefix = False  # H3 parents are not string prefixes

    def __init__(self):
        import h3  # raises ImportError when unavailable

        self._h3 = h3

    def cell_of(self, lon, lat, level):
        h3 = self._h3
        return np.array(
            [h3.latlng_to_cell(la, lo, level) for lo, la in zip(lon, lat)],
            dtype=object,
        )

    def cell_of_scalar(self, lon, lat, level):
        return self._h3.latlng_to_cell(lat, lon, level)

    def parent(self, cell, level):
        return self._h3.cell_to_parent(cell, level)

    def neighbors(self, cell, ring=1):
        return list(self._h3.grid_disk(cell, ring))

    def cover_bbox(self, w, s, e, n, level):
        h3 = self._h3
        poly = h3.LatLngPoly([(s, w), (s, e), (n, e), (n, w)])
        return list(h3.polygon_to_cells(poly, level))


_PROVIDERS = {"quadkey": QuadkeyIndex, "s2": S2Index}
try:  # pragma: no cover
    import h3  # noqa: F401

    _PROVIDERS["h3"] = H3Index
except Exception:
    pass


def cell_index(name: str = "quadkey"):
    """Provider factory; 'h3' only if the library is importable."""
    if name not in _PROVIDERS:
        raise ImportError(
            f"cell index provider {name!r} unavailable; have: {sorted(_PROVIDERS)}"
        )
    return _PROVIDERS[name]()
