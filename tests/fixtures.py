"""Shared AOI fixtures, verbatim from the reference test suite
(reference: tests/test_open_buildings.py:23-68) plus engine edge-case AOIs."""

SEYCHELLES_AOI = {
    "type": "Feature",
    "properties": {},
    "geometry": {
        "type": "Polygon",
        "coordinates": [
            [
                [55.45280573412927, -4.6227964300457245],
                [55.45280573412927, -4.623440862045413],
                [55.453376761871795, -4.623440862045413],
                [55.453376761871795, -4.6227964300457245],
                [55.45280573412927, -4.6227964300457245],
            ]
        ],
    },
}

SEYCHELLES_QUADKEY = "301001330310"

SEYCHELLES_WKT = (
    "POLYGON ((55.45280573412927 -4.6227964300457245, "
    "55.45280573412927 -4.623440862045413, "
    "55.453376761871795 -4.623440862045413, "
    "55.453376761871795 -4.6227964300457245, "
    "55.45280573412927 -4.6227964300457245))"
)

LONDON_QUADKEY = "031313131112"

LONDON_TILE_FEATURE = {
    "type": "Feature",
    "geometry": {
        "type": "Polygon",
        "coordinates": [
            [
                [-0.17578125, 51.50874245880333],
                [-0.087890625, 51.50874245880333],
                [-0.087890625, 51.56341232867588],
                [-0.17578125, 51.56341232867588],
                [-0.17578125, 51.50874245880333],
            ]
        ],
    },
}

# AOI straddling the prime meridian/equator corner -> zoom scan bottoms out
# at z=0 with >1 tile at every level, covering quadkey '' (reference
# download_buildings.py:26-31 returns '').
GLOBAL_STRADDLE_AOI = {
    "type": "Feature",
    "properties": {},
    "geometry": {
        "type": "Polygon",
        "coordinates": [
            [
                [-1.0, -1.0],
                [1.0, -1.0],
                [1.0, 1.0],
                [-1.0, 1.0],
                [-1.0, -1.0],
            ]
        ],
    },
}
