"""kNN lookup via quadkey cell-ring expansion (north_star J3; absent in the
reference, which the engine adds as a first-class operator).

Plan: for each query point, gather candidate buildings from the z12 tiles in
a growing Chebyshev ring around the query tile (broadcast equi-join on
quadkey — prunes the scan exactly like the AOI prefix filter), then exact
haversine + windowed top-k. The ring is grown until every query's kth
distance is provably smaller than the distance to the ring boundary, so the
result equals brute force (verified against the DuckDB oracle).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import haversine_m
from ..geo import mercator

ZOOM = 12
# conservative meters-per-degree LOWER bounds for the ring-boundary
# distance. The haversine sphere (R=6371 km) gives 111194.9 m/deg, so the
# lon term must use a constant BELOW that — the WGS84 equatorial 111320
# overestimated the boundary distance by ~0.1% and could end ring growth
# one neighbor too early
_M_PER_DEG_LAT = 110574.0
_M_PER_DEG_LON_EQ = 111000.0


def corpus_anchor_offset_m(buildings: DataFrame) -> float:
    """Upper bound (meters) on dist(quadkey anchor, ranked point) over the
    corpus — the safety margin kNN ring growth needs for exactness on
    footprints whose centroid differs from their bbox midpoint.

    One native aggregate, no Python:

    - **tight** when bbox columns are stored (``minx..maxy`` + lon/lat):
      max haversine(bbox midpoint, centroid) — the exact quantity;
    - **conservative** otherwise (quadkey + lon/lat): the anchor lies
      inside tile(quadkey) by construction, so per row
      dist(anchor, centroid) <= max corner distance of that tile from the
      centroid. The tile coords come from the quadkey string natively
      (translate '0123'->x/y bit strings, conv base 2). A 5% slack covers
      the corner-vs-edge maximization of the geodesic rectangle. For point
      corpora this still reports ~a tile diagonal — at z12 a few km, far
      below any ring margin, so it never costs a growth iteration.
    """
    cols = set(buildings.columns)
    if {"minx", "miny", "maxx", "maxy", "lon", "lat"} <= cols:
        d = haversine_m(
            (F.col("minx") + F.col("maxx")) / 2.0,
            (F.col("miny") + F.col("maxy")) / 2.0,
            F.col("lon"),
            F.col("lat"),
        )
        row = buildings.agg(F.max(d).alias("m")).collect()[0]
        return float(row["m"] or 0.0)
    if {"quadkey", "lon", "lat"} <= cols:
        z2 = float(1 << ZOOM)
        tx = F.conv(F.translate(F.col("quadkey"), "0123", "0101"), 2, 10).cast("long")
        ty = F.conv(F.translate(F.col("quadkey"), "0123", "0011"), 2, 10).cast("long")
        west = tx / z2 * 360.0 - 180.0
        east = (tx + 1) / z2 * 360.0 - 180.0
        pi = float(math.pi)
        north = F.degrees(F.atan(F.sinh(pi * (1.0 - 2.0 * ty / z2))))
        south = F.degrees(F.atan(F.sinh(pi * (1.0 - 2.0 * (ty + 1) / z2))))
        d = F.greatest(
            *[
                haversine_m(cx, cy, F.col("lon"), F.col("lat"))
                for cx in (west, east)
                for cy in (south, north)
            ]
        )
        row = buildings.agg(F.max(d).alias("m")).collect()[0]
        return float(row["m"] or 0.0) * 1.05
    raise ValueError(
        "anchor_offset_m='auto' needs (minx,miny,maxx,maxy,lon,lat) or "
        "(quadkey,lon,lat) columns to bound the anchor-centroid offset"
    )


def _ring_cells(qlon: float, qlat: float, ring: int) -> list[str]:
    x, y = mercator.tile(qlon, qlat, ZOOM)
    return [
        mercator.quadkey_from_tile(tx, ty, ZOOM)
        for tx, ty in mercator.tile_neighbors(x, y, ZOOM, ring)
    ]


def _boundary_margin_m(qlon: float, qlat: float, ring: int) -> float:
    """Lower bound on distance from the query point to outside the ring."""
    import math

    x, y = mercator.tile(qlon, qlat, ZOOM)
    w, s0, e0, n0 = mercator.tile_bounds(x - ring, y - ring, ZOOM)
    w2, s, e, n = mercator.tile_bounds(x + ring, y + ring, ZOOM)
    west, east = w, e
    north, south = n0, s
    dlon = min(qlon - west, east - qlon)
    dlat = min(qlat - south, north - qlat)
    coslat = math.cos(math.radians(max(abs(north), abs(south))))
    return max(0.0, min(dlon * _M_PER_DEG_LON_EQ * coslat, dlat * _M_PER_DEG_LAT))


def knn(
    spark: SparkSession,
    buildings: DataFrame | None,
    queries: list[tuple[int, float, float]],
    k: int = 5,
    initial_ring: int = 8,
    max_ring: int = 256,
    anchor_offset_m: float | str = "auto",
    table_root: str | None = None,
) -> DataFrame:
    """Exact k nearest buildings (haversine meters) per query point.

    ``buildings``: DataFrame with (doc_id, quadkey, lon, lat) — the enriched
    docs table. ``queries``: small list of (query_id, lon, lat), broadcast.
    Returns (query_id, doc_id, rank); ordering ties broken by doc_id.

    ``initial_ring`` is a pure performance knob (exactness holds at any
    ring via the boundary-margin check): every grow iteration costs a full
    job round-trip, so starting wider usually wins — measured 11.7s
    (ring 2, three iterations) vs 3.5s (ring 8, one) on 1.8M docs. Tune
    down only for extremely dense cells where candidate volume dominates.

    ``table_root``: serving-path mode — ignore ``buildings`` and
    manifest-prune the scan per ring to the iceberg-lite files overlapping
    the ring cells. Wins when the table has many cells (planet scale: an
    AOI-sized kNN touches a handful of files regardless of table size);
    at small cell counts a cached ``buildings`` DataFrame is faster
    (pruning can't beat an in-memory table of 10 files).

    ``anchor_offset_m``: upper bound (meters) on the distance between a
    building's quadkey anchor (bbox midpoint) and its ranked point
    (centroid). Candidates are gathered by anchor tile but ranked by
    centroid, so a true neighbor whose anchor sits just outside the ring
    would otherwise be silently missed; the growth criterion therefore
    requires kth + anchor_offset_m < ring margin. The default ``"auto"``
    derives the bound from the corpus itself (one native aggregate,
    :func:`corpus_anchor_offset_m`) or, in ``table_root`` mode, reads the
    ``max_anchor_offset_m`` metric the table writer stored in the manifest
    — exact-by-default for arbitrary footprints. Pass an explicit float
    (e.g. 0.0 for point corpora) to skip the aggregate.
    """
    anchor_future = None
    if anchor_offset_m == "auto":
        if table_root is not None:
            from ..table.iceberg_lite import current_manifest, read_table

            m = current_manifest(table_root)
            stored = (m or {}).get("metrics", {}).get("max_anchor_offset_m")
            if stored is not None:
                anchor_offset_m = float(stored)
            else:
                # fallback: one column-pruned pass over the table (planet
                # tables should store the metric at write time instead)
                anchor_offset_m = corpus_anchor_offset_m(read_table(spark, table_root))
        else:
            # the bound is only consumed by the growth check AFTER the
            # first top-k — run the corpus aggregate as a CONCURRENT job
            # so its scan back-fills executors behind the candidate
            # join's stages instead of serializing in front of them
            from concurrent.futures import ThreadPoolExecutor

            _pool = ThreadPoolExecutor(1)
            anchor_future = _pool.submit(corpus_anchor_offset_m, buildings)
            _pool.shutdown(wait=False)
    ring = initial_ring
    grew = False
    while True:
        cells = []
        for qid, qlon, qlat in queries:
            for c in _ring_cells(float(qlon), float(qlat), ring):
                cells.append((int(qid), float(qlon), float(qlat), c))
        cells_df = spark.createDataFrame(
            cells, "query_id long, qlon double, qlat double, quadkey string"
        )
        if table_root is not None:
            # serving path: manifest-prune the scan to files overlapping
            # THIS ring's cells — an AOI-sized kNN touches a handful of
            # files regardless of table size (the reference's partitioned
            # archive gives it the same property for AOI queries)
            from ..table.iceberg_lite import read_table_cells

            src = read_table_cells(
                spark, table_root, sorted({c[-1] for c in cells})
            ).select("doc_id", "quadkey", "lon", "lat")
        else:
            src = buildings
        cand = src.join(F.broadcast(cells_df), "quadkey")
        dist = haversine_m(F.col("lon"), F.col("lat"), F.col("qlon"), F.col("qlat"))
        scored = cand.withColumn("dist_m", dist)
        # two-stage salted top-k: a plain Window.partitionBy(query_id) would
        # funnel every candidate of a query into ONE reducer (queries are
        # few, candidate sets can be huge in dense cells). Stage 1 takes a
        # local top-k per (query, salt) shard; stage 2 merges k*SALTS rows.
        SALTS = 16
        salted = scored.withColumn(
            "salt", F.pmod(F.hash(F.col("doc_id")), F.lit(SALTS))
        )
        w1 = Window.partitionBy("query_id", "salt").orderBy(
            F.col("dist_m").asc(), F.col("doc_id").asc()
        )
        local = (
            salted.withColumn("r1", F.row_number().over(w1))
            .filter(F.col("r1") <= k)
            .drop("r1", "salt")
        )
        w = Window.partitionBy("query_id").orderBy(F.col("dist_m").asc(), F.col("doc_id").asc())
        topk = (
            local.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "doc_id", "rank", "dist_m")
        )
        # exactness check: kth distance must beat the ring boundary for
        # every query that could still gain candidates from outside
        kth = {
            r["query_id"]: (r["cnt"], r["kth"])
            for r in topk.groupBy("query_id")
            .agg(F.count("*").alias("cnt"), F.max("dist_m").alias("kth"))
            .collect()
        }
        if anchor_future is not None:
            anchor_offset_m = anchor_future.result()
            anchor_future = None
        ok = True
        for qid, qlon, qlat in queries:
            cnt, kd = kth.get(qid, (0, None))
            margin = _boundary_margin_m(qlon, qlat, ring)
            if cnt < k or (kd is not None and kd + anchor_offset_m >= margin):
                ok = False
                break
        if ok or ring >= max_ring:
            return topk.drop("dist_m")
        ring *= 4
        if not grew and buildings is not None and not buildings.storageLevel.useMemory:
            # cache lazily, only once growth proves the corpus will be
            # re-scanned — the common single-iteration call never pays the
            # cache materialization
            buildings = buildings.cache()
            grew = True


# ---------------------------------------------------------------------------
# Distributed kNN JOIN — both sides are tables
# ---------------------------------------------------------------------------

# conservative meters-per-degree on the haversine sphere (actual pi*R/180 =
# 111195): dividing by the SMALLER constant yields a LARGER degree margin,
# so the cover can only over-include tiles, never drop a true neighbor
_M_PER_DEG_SAFE = 111000.0
_MAX_ABS_LAT = 85.05  # web-mercator clip


def _tile_x_col(lon, zoom: int):
    """UNCLAMPED x tile index — may be < 0 or >= 2^zoom when the radius
    margin crosses the antimeridian; the cover explode wraps it with pmod
    (clamping instead would silently drop true neighbors across lon=±180,
    where the x axis is cyclic)."""
    n = 1 << zoom
    return F.floor((lon + 180.0) / 360.0 * n).cast("long")


def _tile_y_col(lat, zoom: int):
    n = 1 << zoom
    y01 = (1.0 - F.asinh(F.tan(F.radians(lat))) / math.pi) / 2.0
    t = F.floor(y01 * n).cast("long")
    return F.greatest(F.lit(0).cast("long"), F.least(t, F.lit(n - 1).cast("long")))


def knn_join(
    points: DataFrame,
    docs: DataFrame,
    k: int = 3,
    radius_m: float = 3000.0,
    point_id: str = "place_id",
    anchor_offset_m: float | str = "auto",
    salts: int = 16,
) -> DataFrame:
    """Distributed radius-bounded kNN JOIN: for EVERY row of ``points`` the
    ``k`` nearest rows of ``docs`` (haversine meters, centroid-ranked) within
    ``radius_m`` — both sides DataFrames, neither collected nor broadcast.
    This generalizes :func:`knn` (driver-side query list, absent in the
    reference, which only serves one-AOI downloads) to the table-x-table
    shape a feature-enrichment pipeline needs: millions of POIs against a
    planet footprint archive.

    Plan shape (scale audit):
      1. points side: each point natively computes the z12 tile range of its
         radius disc (degree margins from conservative sphere constants, so
         the cover can only over-include) and explodes to those cells —
         plan size O(1) in the point count, cover rows per point =
         ceil(2r/tile)^2 (~4 cells at r=3 km).
      2. hash shuffle equi-join cells x docs on the z12 quadkey (shuffle_hash
         hint: no sort, no broadcast; AQE splits skewed megacity cells).
      3. native haversine + radius filter, then the same two-stage salted
         top-k as :func:`knn`, partitioned by point id — a dense cell never
         funnels one point's candidates into a single reducer.

    Exactness: a doc whose centroid lies within ``radius_m`` has its quadkey
    anchor within radius_m + anchor_offset_m (``"auto"`` = one corpus
    aggregate, :func:`corpus_anchor_offset_m`), and the cover bbox contains
    every anchor tile within that margin — so the k results per point equal
    brute force over the radius (points with fewer than k docs in range
    return fewer rows; grow ``radius_m`` for unbounded kNN semantics).

    ``points`` needs (point_id, lon, lat); ``docs`` needs
    (doc_id, quadkey[z12], lon, lat). Returns (point_id, doc_id, rank).
    """
    keep = [
        c
        for c in ("doc_id", "quadkey", "lon", "lat", "minx", "miny", "maxx", "maxy")
        if c in docs.columns
    ]
    docs = docs.select(*keep)
    if anchor_offset_m == "auto":
        if docs.storageLevel.useMemory is False:
            # the auto-offset aggregate and the join would otherwise each
            # re-run the upstream plan (for parse-enriched corpora that is
            # the whole Arrow parse pass); cache the pruned projection
            # once. With an explicit offset the join is the only scan, so
            # no cache is needed (and none materializes).
            docs = docs.cache()
        anchor_offset_m = corpus_anchor_offset_m(docs)
    margin_m = float(radius_m) + float(anchor_offset_m) + 1.0
    dlat = margin_m / _M_PER_DEG_SAFE  # python float: same margin for all rows
    lat_edge = F.least(F.abs(F.col("_plat")) + dlat, F.lit(_MAX_ABS_LAT))
    dlon = F.lit(margin_m) / (_M_PER_DEG_SAFE * F.cos(F.radians(lat_edge)))

    from ..functions import quadkey_from_tiles_col

    p = points.select(
        F.col(point_id).alias("_pid"),
        F.col("lon").alias("_plon"),
        F.col("lat").alias("_plat"),
    )
    n_tiles = 1 << ZOOM
    p = (
        p.withColumn("_x0", _tile_x_col(F.col("_plon") - dlon, ZOOM))
        # cap the x span at one full ring so a degenerate margin (huge
        # radius at extreme latitude) covers each tile at most once
        .withColumn(
            "_x1",
            F.least(
                _tile_x_col(F.col("_plon") + dlon, ZOOM),
                F.col("_x0") + F.lit(n_tiles - 1).cast("long"),
            ),
        )
        # clamp the margin latitudes to the mercator band BEFORE the tile
        # math: past 90 deg, tan() flips sign and _y0 lands at n-1 while
        # _y1 is 0 — Spark's sequence(4095, 0) then DESCENDS (it is never
        # empty), exploding one polar point into a full 4096-row tile column
        .withColumn(
            "_y0",
            _tile_y_col(
                F.least(
                    F.col("_plat") + dlat, F.lit(mercator.MERCATOR_LAT_LIMIT)
                ),
                ZOOM,
            ),
        )
        .withColumn(
            "_y1",
            _tile_y_col(
                F.greatest(
                    F.col("_plat") - dlat, F.lit(-mercator.MERCATOR_LAT_LIMIT)
                ),
                ZOOM,
            ),
        )
    )
    cells = (
        p.withColumn("_ctx_raw", F.explode(F.sequence("_x0", "_x1")))
        # wrap at the antimeridian: x is cyclic, so tile -1 is tile n-1
        .withColumn("_ctx", F.pmod(F.col("_ctx_raw"), F.lit(n_tiles).cast("long")))
        .withColumn("_cty", F.explode(F.sequence("_y0", "_y1")))
        .withColumn("quadkey", quadkey_from_tiles_col(F.col("_ctx"), F.col("_cty"), ZOOM))
        .select("_pid", "_plon", "_plat", "quadkey")
    )
    d = docs.select("doc_id", "quadkey", "lon", "lat")
    cand = d.join(cells.hint("shuffle_hash"), "quadkey")
    dist = haversine_m(F.col("lon"), F.col("lat"), F.col("_plon"), F.col("_plat"))
    scored = cand.withColumn("_dist", dist).filter(F.col("_dist") <= radius_m)
    w1 = Window.partitionBy("_pid", "_salt").orderBy(
        F.col("_dist").asc(), F.col("doc_id").asc()
    )
    local = (
        scored.withColumn("_salt", F.pmod(F.hash(F.col("doc_id")), F.lit(salts)))
        .withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
    )
    w = Window.partitionBy("_pid").orderBy(F.col("_dist").asc(), F.col("doc_id").asc())
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("_pid").alias(point_id), "doc_id", "rank")
    )
