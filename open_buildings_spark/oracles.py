"""DuckDB oracle SQL for every engine query (driver correctness gate).

Each SQL string is independent of the engine: it reproduces results from the
shared arithmetic derivation (datagen.buildings_sql_cte) using integer
quadkey math and closed-form geometry on the rectangle footprints — no
engine kernels involved. Column names/aliases match the Spark side exactly.
"""

from __future__ import annotations

import math

from . import datagen
from .functions import haversine_sql

MAX_PER_FILE = 100
KNN_K = 5
KNN_JOIN_K = 3
KNN_JOIN_RADIUS_M = 3000.0

# EPSG:6933 constants (keep in sync with geo.kernels)
_A = 6378137.0
_E2 = 0.0066943799901413165
_E = math.sqrt(_E2)
_K0 = math.cos(math.radians(30.0)) / math.sqrt(1.0 - _E2 * math.sin(math.radians(30.0)) ** 2)


def knn_queries() -> list[tuple[int, float, float]]:
    """Deterministic query points: the center of tile (tx+32, ty+32) of each
    city block, plus one point 20 tiles east of city 0 (forces ring growth)."""
    pts = []
    for i, (tx, ty) in enumerate(datagen.CITY_TILES):
        pts.append((i, datagen._tile_lon(tx + 32.5), datagen._tile_lat(ty + 32.5)))
    tx0, ty0 = datagen.CITY_TILES[0]
    pts.append((5, datagen._tile_lon(tx0 + 84.5), datagen._tile_lat(ty0 + 32.5)))
    return pts


def _aoi_bounds_sql() -> tuple[str, str, str, str]:
    w, s, e, n = datagen.aoi_bounds(datagen.city_aoi())
    return repr(w), repr(s), repr(e), repr(n)


def _fp_bounds() -> str:
    """SQL fragment: footprint bbox columns for bld rows (multi = two squares,
    second centered at lon + 6r)."""
    return (
        "lon - r AS fminx, lat - r AS fminy, "
        "CASE WHEN is_multi THEN lon + 7e0 * r ELSE lon + r END AS fmaxx, "
        "lat + r AS fmaxy"
    )


def _d(v: float) -> str:
    """Double literal that DuckDB cannot mistake for DECIMAL."""
    return f"CAST({v!r} AS DOUBLE)"


def _q6933(lat: str) -> str:
    s = f"sin(radians({lat}))"
    e, e2 = _d(_E), _d(_E2)
    return (
        f"(1e0 - {e2}) * ({s} / (1e0 - {e2} * {s} * {s}) "
        f"- (1e0 / (2e0 * {e})) * ln((1e0 - {e} * {s}) / (1e0 + {e} * {s})))"
    )


def _x6933(lon: str) -> str:
    return f"{_d(_A)} * {_d(_K0)} * radians({lon})"


def _y6933(lat: str) -> str:
    return f"{_d(_A)} * {_q6933(lat)} / (2e0 * {_d(_K0)})"


def _s2_cell_ctes(prefix: str, src_sql: str, keys: str, level: int) -> tuple[str, str]:
    """CTE chain computing the S2 (face, level-``level`` Hilbert position)
    for each row of ``src_sql`` — FROM SCRATCH in SQL: cube-face projection
    of the unit vector, the quadratic ST transform, then one unrolled
    Hilbert-curve step per level. The sub-cell order/orientation tables are
    the published S2 scheme constants, hard-coded here independently of
    geo/s2.py, so engine and oracle only hash-match if both implement the
    curve correctly. Emitting (face, position) instead of the full 64-bit
    id keeps every intermediate in signed BIGINT range (faces 4-5 wrap
    negative in the id encoding).

    ``src_sql`` must select ``{keys}, plon, plat`` (degrees); every CTE
    name carries ``prefix`` so the chain can be instantiated several times
    in one statement. Returns ``(cte_text, final_name)``; the final CTE has
    columns ``{keys}, face, pos``.
    """
    p = prefix
    ij2pos = "[0,1,3,2, 0,3,1,2, 2,3,1,0, 2,1,3,0]"
    ij2ori = "[1,0,3,0, 0,2,1,1, 2,1,2,3, 3,3,0,2]"
    shift = 30 - level
    steps = ""
    prev = f"{p}h0"
    for n, k in enumerate(range(level - 1, -1, -1), start=1):
        idx = f"o*4 + ((ii>>{k})&1)*2 + ((jj>>{k})&1) + 1"
        steps += (
            f",\n{p}h{n} AS (SELECT {keys}, face, ii, jj, "
            f"pos*4 + ({ij2pos})[{idx}] AS pos, ({ij2ori})[{idx}] AS o "
            f"FROM {prev})"
        )
        prev = f"{p}h{n}"
    text = f"""{p}pt AS (
  SELECT {keys}, radians(plon) AS rlon, radians(plat) AS rlat
  FROM ({src_sql})
),
{p}xyz AS (
  SELECT {keys}, cos(rlat)*cos(rlon) AS x, cos(rlat)*sin(rlon) AS y,
         sin(rlat) AS z
  FROM {p}pt
),
{p}fc AS (
  SELECT {keys}, x, y, z,
    CASE WHEN abs(x) >= abs(y) AND abs(x) >= abs(z)
              THEN CASE WHEN x >= 0e0 THEN 0 ELSE 3 END
         WHEN abs(y) >= abs(z) THEN CASE WHEN y >= 0e0 THEN 1 ELSE 4 END
         ELSE CASE WHEN z >= 0e0 THEN 2 ELSE 5 END END AS face
  FROM {p}xyz
),
{p}uv AS (
  SELECT {keys}, face,
    CASE face WHEN 0 THEN y/x WHEN 1 THEN -x/y WHEN 2 THEN -x/z
              WHEN 3 THEN z/x WHEN 4 THEN z/y ELSE -y/z END AS u,
    CASE face WHEN 0 THEN z/x WHEN 1 THEN z/y WHEN 2 THEN -y/z
              WHEN 3 THEN y/x WHEN 4 THEN -x/y ELSE -x/z END AS v
  FROM {p}fc
),
{p}st AS (
  SELECT {keys}, face,
    CASE WHEN u >= 0e0 THEN 5e-1*sqrt(1e0+3e0*u)
         ELSE 1e0 - 5e-1*sqrt(1e0-3e0*u) END AS s,
    CASE WHEN v >= 0e0 THEN 5e-1*sqrt(1e0+3e0*v)
         ELSE 1e0 - 5e-1*sqrt(1e0-3e0*v) END AS t
  FROM {p}uv
),
{p}h0 AS (
  SELECT {keys}, face,
    LEAST(GREATEST(CAST(floor(s * 1073741824e0) AS BIGINT), 0), 1073741823) >> {shift} AS ii,
    LEAST(GREATEST(CAST(floor(t * 1073741824e0) AS BIGINT), 0), 1073741823) >> {shift} AS jj,
    CAST(0 AS BIGINT) AS pos, face & 1 AS o
  FROM {p}st
){steps}"""
    return text, prev


def oracle_sql() -> dict[str, str]:
    bld = datagen.buildings_sql_cte()
    w, s, e, n = _aoi_bounds_sql()
    countries = datagen.countries_sql_values()
    hav = haversine_sql(
        "CASE WHEN b.is_multi THEN b.lon + 3e0 * b.r ELSE b.lon END",
        "b.lat",
        "q.qlon",
        "q.qlat",
    )
    qpts = ", ".join(
        f"(CAST({qid} AS BIGINT), {lon!r}, {lat!r})" for qid, lon, lat in knn_queries()
    )

    sqls: dict[str, str] = {}

    sqls["g_enrich_quadkey"] = f"""
WITH {bld}
SELECT doc_id, qk AS quadkey FROM bld WHERE has_geom
"""

    # places are points: country containment is a point-in-rect test and the
    # quadkey is the integer (tx, ty) interleave (jitter margin guarantees
    # the float mercator round trip in the engine can't flip a tile)
    sqls["g_places_enrich"] = f"""
WITH {datagen.places_sql_cte()}
SELECT p.place_id, p.category, p.qk AS quadkey, MIN(c.iso) AS country_iso
FROM pl p LEFT JOIN {countries}
  ON p.lon >= c.w AND p.lon <= c.e AND p.lat >= c.s AND p.lat <= c.n
GROUP BY 1, 2, 3
"""

    # MERGE by key: docs ending '33' move (whole-quadkey translate — always
    # a different cell since the first digit flips), docs ending '77'
    # insert under 'up-' ids, everything else passes through
    sqls["g_upsert_table"] = f"""
WITH {bld},
base AS (SELECT doc_id, qk AS quadkey FROM bld WHERE has_geom)
SELECT doc_id, quadkey FROM base WHERE doc_id NOT LIKE '%33'
UNION ALL
SELECT doc_id, translate(quadkey, '0123', '1032') AS quadkey
FROM base WHERE doc_id LIKE '%33'
UNION ALL
SELECT 'up-' || doc_id AS doc_id, quadkey FROM base WHERE doc_id LIKE '%77'
"""

    # keyed (hive country_iso=XX-style) lifecycle: build with a partition
    # key, stream-append one batch ('ap-' docs ending '55'), then MERGE
    # (docs ending '33' move to key '09'; docs ending '77' insert as
    # 'up-'). The key column round-trips through directory names.
    sqls["g_keyed_upsert"] = f"""
WITH {bld},
base AS (SELECT doc_id, qk AS quadkey, '0' || substr(qk, 4, 1) AS ckey
         FROM bld WHERE has_geom)
SELECT doc_id, quadkey, ckey FROM base WHERE doc_id NOT LIKE '%33'
UNION ALL
SELECT 'ap-' || doc_id AS doc_id, quadkey, ckey FROM base WHERE doc_id LIKE '%55'
UNION ALL
SELECT doc_id, quadkey, '09' AS ckey FROM base WHERE doc_id LIKE '%33'
UNION ALL
SELECT 'up-' || doc_id AS doc_id, quadkey, ckey FROM base WHERE doc_id LIKE '%77'
"""

    # table-level DELETE (copy-on-write cell rewrite): docs ending '33'
    # removed; survivors unchanged
    sqls["g_delete_table"] = f"""
WITH {bld}
SELECT doc_id, qk AS quadkey FROM bld WHERE has_geom AND doc_id NOT LIKE '%33'
"""

    # sharded-FGB window query: shards pruned by cell, features through
    # each shard's packed Hilbert R-tree; semantics = geometry bbox
    # INTERSECTS the window (overlap, not containment like g_aoi_query)
    sqls["g_sharded_window"] = f"""
WITH {bld},
fp AS (SELECT doc_id, qk, {_fp_bounds()} FROM bld WHERE has_geom)
SELECT doc_id, qk AS quadkey FROM fp
WHERE fminx <= {e} AND fmaxx >= {w} AND fminy <= {n} AND fmaxy >= {s}
"""

    # sharded-GPKG window query: identical bbox-INTERSECTS semantics,
    # answered through each shard's gpkg_rtree_index instead of FGB's
    # packed Hilbert R-tree; window = a city-1 rect (distinct from the
    # city-0 flagship window)
    gw, gs, ge, gn = (
        repr(v) for v in datagen.aoi_bounds(datagen._rect_aoi(1, 5, 10, 40, 45))
    )
    sqls["g_gpkg_window"] = f"""
WITH {bld},
fp AS (SELECT doc_id, qk, {_fp_bounds()} FROM bld WHERE has_geom)
SELECT doc_id, qk AS quadkey FROM fp
WHERE fminx <= {ge} AND fmaxx >= {gw} AND fminy <= {gn} AND fmaxy >= {gs}
"""

    # streaming enrichment runs the identical logical plan, so its oracle
    # is the batch enrichment SQL; the table ingest (foreachBatch ->
    # append_rows) must land the same rows in the manifest table
    sqls["g_stream_enrich"] = sqls["g_enrich_quadkey"]
    sqls["g_stream_table"] = sqls["g_enrich_quadkey"]

    # FGB round-trip must reproduce the exact enrichment quadkeys: the sink
    # and reader are lossless over f64 coordinates, so the oracle is the
    # same SQL as g_enrich_quadkey
    sqls["g_fgb_roundtrip"] = sqls["g_enrich_quadkey"]
    sqls["g_gpkg_roundtrip"] = sqls["g_enrich_quadkey"]
    sqls["g_shp_roundtrip"] = sqls["g_enrich_quadkey"]

    sqls["g_quadkey_hist"] = f"""
WITH {bld}
SELECT qk AS quadkey, COUNT(*) AS n_docs FROM bld WHERE has_geom GROUP BY 1
"""

    sqls["g_aoi_query"] = f"""
WITH {bld},
fp AS (SELECT doc_id, qk, {_fp_bounds()} FROM bld WHERE has_geom)
SELECT doc_id, qk AS quadkey FROM fp
WHERE fminx >= {w} AND fmaxx <= {e} AND fminy >= {s} AND fmaxy <= {n}
"""

    # stored-table serving path returns the same row set as the raw scan
    sqls["g_aoi_table"] = sqls["g_aoi_query"]

    # pure-SQL surface (sqlapi.register): the same flagship AOI query and
    # quadkey enrichment expressed as spark.sql over ob_* functions must
    # return the identical row sets
    sqls["g_sql_aoi"] = sqls["g_aoi_query"]
    sqls["g_sql_enrich"] = sqls["g_enrich_quadkey"]

    sqls["g_country_join"] = f"""
WITH {bld},
fp AS (SELECT doc_id, {_fp_bounds()} FROM bld WHERE has_geom)
SELECT fp.doc_id, MIN(c.iso) AS country_iso
FROM fp LEFT JOIN {countries}
  ON fp.fmaxx >= c.w AND fp.fminx <= c.e AND fp.fmaxy >= c.s AND fp.fminy <= c.n
GROUP BY fp.doc_id
"""

    sqls["g_tile_assignment"] = f"""
WITH {bld}
SELECT doc_id, qk AS quadkey, qk_media AS media_qk,
       (qk = qk_media) AS tile_match
FROM bld WHERE has_geom
"""

    sqls["g_tile_rollup"] = f"""
WITH {bld}
SELECT qk AS quadkey, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN qk <> qk_media THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch
FROM bld WHERE has_geom GROUP BY 1
"""

    # S2 oracles: the centroid source rows both S2 queries quantize.
    s2_docs_src = (
        "SELECT doc_id, CASE WHEN is_multi THEN lon + 3e0 * r ELSE lon END"
        " AS plon, lat AS plat FROM bld WHERE has_geom"
    )
    # Level-10 rollup: per-cell doc counts. Level-10 quantization absorbs
    # the known ~1e-14 lat divergence between the engine's and DuckDB's
    # mercator inverses (cell ~0.1 deg; a flip needs the centroid within
    # ~1e-14 deg of a cell edge).
    d_ctes, d_fin = _s2_cell_ctes("s2d_", s2_docs_src, "doc_id", 10)
    sqls["g_s2_rollup"] = f"""
WITH {bld},
{d_ctes}
SELECT CAST(face AS BIGINT) AS s2_face, pos AS s2_pos, COUNT(*) AS n_docs
FROM {d_fin} GROUP BY 1, 2
"""

    # Range-containment lookup: docs in the same level-8 S2 cell as each
    # query point. The ENGINE evaluates this as a numeric range predicate
    # (leaf id BETWEEN cell range_min AND range_max — the predicate that
    # prunes range-partitioned files at scale); the oracle re-derives both
    # sides' cells in SQL and equi-joins, so the two mechanisms must agree.
    qvals = ", ".join(
        f"(CAST({qid} AS BIGINT), CAST({lon!r} AS DOUBLE), CAST({lat!r} AS DOUBLE))"
        for qid, lon, lat in knn_queries()
    )
    rq_src = f"SELECT qid, plon, plat FROM (VALUES {qvals}) qv(qid, plon, plat)"
    rd_ctes, rd_fin = _s2_cell_ctes("r8d_", s2_docs_src, "doc_id", 8)
    rq_ctes, rq_fin = _s2_cell_ctes("r8q_", rq_src, "qid", 8)
    sqls["g_s2_range"] = f"""
WITH {bld},
{rd_ctes},
{rq_ctes}
SELECT q.qid, CAST(q.face AS BIGINT) AS s2_face, q.pos AS s2_pos,
       COUNT(d.doc_id) AS n_docs
FROM {rq_fin} q LEFT JOIN {rd_fin} d ON d.face = q.face AND d.pos = q.pos
GROUP BY 1, 2, 3
"""

    # S2-ordered layout serve: the ENGINE answers via cover cells ->
    # merged leaf-id ranges -> manifest file pruning -> pushed BETWEENs ->
    # native refine; the ORACLE is the bare centroid-in-bbox predicate, so
    # any cover gap, bad range merge, or over-eager file prune mismatches.
    sqls["g_s2_scan"] = f"""
WITH {bld}
SELECT doc_id, qk AS quadkey FROM bld
WHERE has_geom
  AND (CASE WHEN is_multi THEN lon + 3e0 * r ELSE lon END) BETWEEN {w} AND {e}
  AND lat BETWEEN {s} AND {n}
"""

    # S2 TABLE-LAYER gate (table/s2table.py): the oracle replays the
    # merge arithmetic (movers LIKE '%33' flip lon sign; inserts clone
    # '%77' docs under 's2-' ids), takes each snapshot's window rows with
    # the bare centroid-in-bbox predicate, and re-derives each row's
    # level-10 S2 (face, pos) FROM SCRATCH — so the engine's stored key
    # strings (substr/conv-decoded), the cover-prefix pruning, the
    # copy-on-write MERGE and time travel must all agree at once.
    st_src = (
        "SELECT snap, doc_id, plon, plat FROM ("
        "  SELECT 1 AS snap, doc_id, plon, plat FROM s2t_base"
        "  UNION ALL"
        "  SELECT 2, doc_id, plon, plat FROM s2t_merged"
        f") WHERE plon BETWEEN {w} AND {e} AND plat BETWEEN {s} AND {n}"
    )
    st_ctes, st_fin = _s2_cell_ctes("s2t10_", st_src, "snap, doc_id", 10)
    sqls["g_s2_table"] = f"""
WITH {bld},
s2t_base AS ({s2_docs_src}),
s2t_merged AS (
  SELECT doc_id,
         CASE WHEN doc_id LIKE '%33' THEN -plon ELSE plon END AS plon,
         plat
  FROM s2t_base
  UNION ALL
  SELECT 's2-' || doc_id, plon, plat FROM s2t_base WHERE doc_id LIKE '%77'
),
{st_ctes}
SELECT snap, doc_id, CAST(face AS BIGINT) AS s2_face, pos AS s2_pos
FROM {st_fin}
"""

    sqls["g_partition_plan"] = f"""
WITH {bld},
h12 AS (SELECT qk AS c, COUNT(*) AS n FROM bld WHERE has_geom GROUP BY 1),
lv AS (
  SELECT l, substr(c, 1, CAST(l AS INT)) AS p, SUM(n) AS n
  FROM h12, (SELECT unnest(range(1, 13)) AS l) levels
  GROUP BY 1, 2
),
leafpick AS (
  SELECT h.c, MIN(v.l) AS lf
  FROM h12 h JOIN lv v ON substr(h.c, 1, CAST(v.l AS INT)) = v.p AND v.n <= {MAX_PER_FILE}
  GROUP BY h.c
)
SELECT COALESCE(substr(h.c, 1, CAST(lp.lf AS INT)), h.c) AS cell,
       CAST(SUM(h.n) AS BIGINT) AS n_rows
FROM h12 h LEFT JOIN leafpick lp ON h.c = lp.c
GROUP BY 1
"""

    sqls["g_knn"] = f"""
WITH {bld},
q(query_id, qlon, qlat) AS (VALUES {qpts}),
d AS (
  SELECT q.query_id, b.doc_id, {hav} AS dist
  FROM bld b CROSS JOIN q WHERE b.has_geom
),
r AS (
  SELECT query_id, doc_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dist, doc_id) AS rank
  FROM d
)
SELECT query_id, doc_id, CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= {KNN_K}
"""

    # kNN JOIN (both sides tables): brute-force places x docs with the
    # identical haversine, radius filter BEFORE ranking (k nearest within r)
    hav_pl = haversine_sql(
        "CASE WHEN b.is_multi THEN b.lon + 3e0 * b.r ELSE b.lon END",
        "b.lat",
        "p.lon",
        "p.lat",
    )
    sqls["g_knn_join"] = f"""
WITH {bld},
{datagen.places_sql_cte()},
d AS (
  SELECT p.place_id, b.doc_id, {hav_pl} AS dist
  FROM bld b CROSS JOIN pl p WHERE b.has_geom
),
f AS (SELECT * FROM d WHERE dist <= {_d(KNN_JOIN_RADIUS_M)}),
r AS (
  SELECT place_id, doc_id,
         ROW_NUMBER() OVER (PARTITION BY place_id ORDER BY dist, doc_id) AS rank
  FROM f
)
SELECT place_id, doc_id, CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= {KNN_JOIN_K}
"""

    # explode: part 0 = square at lon, part 1 (multi only) = square at lon+6r
    def part_area(loncenter: str) -> str:
        x0 = _x6933(f"({loncenter}) - r")
        x1 = _x6933(f"({loncenter}) + r")
        y0 = _y6933("lat - r")
        y1 = _y6933("lat + r")
        return f"(({x1}) - ({x0})) * (({y1}) - ({y0}))"

    sqls["g_explode_parts"] = f"""
WITH {bld},
p0 AS (
  SELECT doc_id, 0 AS part_idx, round({part_area('lon')}, 1) AS area_r1
  FROM bld WHERE has_geom
),
p1 AS (
  SELECT doc_id, 1 AS part_idx, round({part_area('lon + 6e0 * r')}, 1) AS area_r1
  FROM bld WHERE is_multi
)
SELECT * FROM p0 UNION ALL SELECT * FROM p1
"""

    aoi_rows = ", ".join(
        f"({aid}, {w!r}, {s!r}, {e!r}, {n!r})"
        for aid, feat in datagen.multi_aois()
        for w, s, e, n in [datagen.aoi_bounds(feat)]
    )
    sqls["g_multi_aoi"] = f"""
WITH {bld},
fp AS (SELECT doc_id, {_fp_bounds()} FROM bld WHERE has_geom),
aois(aoi_id, aw, asx, ae, an) AS (VALUES {aoi_rows})
SELECT fp.doc_id, CAST(a.aoi_id AS INT) AS aoi_id
FROM fp JOIN aois a
  ON fp.fminx >= a.aw AND fp.fmaxx <= a.ae AND fp.fminy >= a.asx AND fp.fmaxy <= a.an
"""

    # big-big join: every AOI sits inside ONE z10 tile (datagen contract),
    # so a doc within it shares that tile's quadkey prefix — hash equi-join
    # on qk10, then bbox containment (ST_Within for axis-aligned rects)
    sqls["g_big_aoi_join"] = f"""
WITH {bld},
{datagen.big_aois_sql_cte()},
fp AS (SELECT doc_id, substr(qk, 1, 10) AS qk10, {_fp_bounds()} FROM bld WHERE has_geom)
SELECT fp.doc_id, a.aoi_id
FROM fp JOIN aoi a ON fp.qk10 = a.qk10
WHERE fp.fminx >= a.aw AND fp.fmaxx <= a.ae AND fp.fminy >= a.asx AND fp.fmaxy <= a.an
"""

    # deep-cover gate: same within semantics on the 1-in-20 AOI subset —
    # the ENGINE runs it at cover_level 13 (native anchor cells + the
    # expansion ring), and must land on the cover-level-independent rows
    sqls["g_deep_cover"] = f"""
WITH {bld},
{datagen.big_aois_sql_cte()},
fp AS (SELECT doc_id, substr(qk, 1, 10) AS qk10, {_fp_bounds()} FROM bld WHERE has_geom)
SELECT fp.doc_id, a.aoi_id
FROM fp JOIN aoi a ON fp.qk10 = a.qk10
WHERE a.aoi_id % 20 = 0
  AND fp.fminx >= a.aw AND fp.fmaxx <= a.ae AND fp.fminy >= a.asx AND fp.fmaxy <= a.an
"""

    sqls["e_pivot"] = """
SELECT event_type,
""" + ",\n".join(
        f"       CAST(SUM(CASE WHEN date_part('hour', ts) = {h} THEN 1 ELSE 0 END) AS BIGINT) AS \"{h}\""
        for h in range(24)
    ) + """
FROM events GROUP BY event_type
"""

    sqls["g_span_kinds"] = f"""
WITH {bld}
SELECT doc_id,
       CASE WHEN has_geom THEN 4 ELSE 2 END AS n_spans,
       CASE WHEN has_geom THEN 'text,geometry,attr:confidence,media'
            ELSE 'text,attr:confidence' END AS kinds
FROM bld
"""
    return sqls
