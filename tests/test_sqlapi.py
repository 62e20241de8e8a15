"""SQL surface (sqlapi): the ob_* functions registered on a session must
reproduce the kernel goldens and the DataFrame operators' results from pure
``spark.sql`` text — the entry point a reference (DuckDB-SQL) user expects.
"""

import pytest

from open_buildings_spark import sqlapi
from open_buildings_spark.geo import mercator


@pytest.fixture(scope="module")
def sql_spark(spark):
    sqlapi.register(spark)
    return spark


def _one(spark, expr_sql: str):
    return spark.sql(f"SELECT {expr_sql} AS v").collect()[0]["v"]


def test_ob_point_quadkey_golden(sql_spark):
    # center of the London z12 tile golden (F4): round-trips to the tile id
    gj = mercator.quadkey_to_geojson("031313131112")
    ring = gj["geometry"]["coordinates"][0]
    lon = (ring[0][0] + ring[2][0]) / 2
    lat = (ring[0][1] + ring[2][1]) / 2
    assert _one(sql_spark, f"ob_point_quadkey({lon!r}, {lat!r})") == "031313131112"


def test_ob_quadkey_matches_enrichment(sql_spark):
    # bbox-midpoint anchor semantics: a polygon whose bbox midpoint is the
    # London tile center must map to the tile id
    gj = mercator.quadkey_to_geojson("031313131112")
    ring = gj["geometry"]["coordinates"][0]
    lon = (ring[0][0] + ring[2][0]) / 2
    lat = (ring[0][1] + ring[2][1]) / 2
    d = 1e-4
    wkt = (
        f"POLYGON (({lon - d} {lat - d}, {lon + d} {lat - d}, "
        f"{lon + d} {lat + d}, {lon - d} {lat + d}, {lon - d} {lat - d}))"
    )
    assert _one(sql_spark, f"ob_quadkey('{wkt}')") == "031313131112"
    assert _one(sql_spark, "ob_quadkey('not wkt')") is None


SQUARE = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"


def test_ob_within_and_intersects(sql_spark):
    inner = "POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))"
    crossing = "POLYGON ((8 8, 12 8, 12 12, 8 12, 8 8))"
    outside = "POLYGON ((20 20, 21 20, 21 21, 20 21, 20 20))"
    assert _one(sql_spark, f"ob_within('{inner}', '{SQUARE}')") is True
    assert _one(sql_spark, f"ob_within('{crossing}', '{SQUARE}')") is False
    assert _one(sql_spark, f"ob_intersects('{crossing}', '{SQUARE}')") is True
    assert _one(sql_spark, f"ob_intersects('{outside}', '{SQUARE}')") is False


def test_ob_area_and_centroid(sql_spark):
    import numpy as np
    import pandas as pd

    from open_buildings_spark.geo import kernels
    from open_buildings_spark.geo.wkt import parse_wkt_batch

    batch = parse_wkt_batch(pd.Series([SQUARE]))
    expect = float(kernels.area_6933(batch)[0])
    got = _one(sql_spark, f"ob_area_m2('{SQUARE}')")
    assert got == pytest.approx(expect, rel=0) and got > 0
    assert _one(sql_spark, f"ob_centroid_lon('{SQUARE}')") == pytest.approx(5.0)
    assert _one(sql_spark, f"ob_centroid_lat('{SQUARE}')") == pytest.approx(5.0)
    bad = _one(sql_spark, "ob_area_m2('nope')")
    assert bad is None or np.isnan(bad)


def test_ob_plus_code_spec_golden(sql_spark):
    # OLC spec vector, truncated to the shared 10-digit prefix at length 12
    code = _one(sql_spark, "ob_plus_code(CAST(20.3700625 AS DOUBLE), CAST(2.7821875 AS DOUBLE))")
    assert code.startswith("7FG49QCJ+2V") and len(code) == 13


def test_sql_aoi_query_matches_dataframe_path(sql_spark, docs):
    """The pure-SQL flagship returns exactly the DataFrame path's rows."""
    from open_buildings_spark import datagen
    from open_buildings_spark.geo.mercator import geojson_to_quadkey
    from open_buildings_spark.geo.wkt import geojson_geometry_to_wkt
    from open_buildings_spark.operators import aoi as aoi_op
    from open_buildings_spark.operators import enrich

    feat = datagen.city_aoi()
    expect = sorted(
        r["doc_id"] for r in aoi_op.aoi_query(docs, feat).select("doc_id").collect()
    )
    g = enrich.add_geo_columns(docs, drop_nongeo=True)
    g.select("doc_id", "quadkey", "wkt").createOrReplaceTempView("t_sql_aoi")
    qk = geojson_to_quadkey(feat)
    wkt = geojson_geometry_to_wkt(feat["geometry"])
    got = sorted(
        r["doc_id"]
        for r in sql_spark.sql(
            f"SELECT doc_id FROM t_sql_aoi "
            f"WHERE quadkey LIKE '{qk}%' AND ob_within(wkt, '{wkt}')"
        ).collect()
    )
    assert got == expect and len(got) > 0


def test_create_view_time_travel(sql_spark, tmp_path, docs):
    from open_buildings_spark.operators import enrich
    from open_buildings_spark.table import iceberg_lite as tbl

    root = str(tmp_path / "t")
    g = enrich.add_geo_columns(docs.limit(2000), drop_nongeo=True)
    m1 = tbl.write_partitioned(g, root, max_per_file=10_000)
    sqlapi.create_view(sql_spark, root, "v_current")
    n_cur = sql_spark.sql("SELECT COUNT(*) AS n FROM v_current").collect()[0]["n"]
    assert n_cur == g.count()
    # schema evolution makes a new snapshot; a view pinned to snapshot 1
    # keeps the old schema while the current view gains the column
    tbl.add_column(root, "source", "string")
    sqlapi.create_view(sql_spark, root, "v_now")
    assert "source" in sql_spark.table("v_now").columns
    sqlapi.create_view(sql_spark, root, "v_snap", snapshot_id=m1["snapshot_id"])
    snap = sql_spark.table("v_snap")
    assert "source" not in snap.columns
    assert sql_spark.sql("SELECT COUNT(*) AS n FROM v_snap").collect()[0]["n"] == n_cur


def test_ob_s2_cell(sql_spark):
    import numpy as np

    from open_buildings_spark.geo import s2

    exp = int(s2.cells_from_lonlat(np.array([12.5]), np.array([41.9]), 10)[0])
    got = _one(sql_spark, "ob_s2_cell(CAST(12.5 AS DOUBLE), CAST(41.9 AS DOUBLE), 10)")
    assert got == exp
    # per-row level works and NULL coords stay NULL
    lv30 = _one(sql_spark, "ob_s2_cell(CAST(12.5 AS DOUBLE), CAST(41.9 AS DOUBLE), 30)")
    assert lv30 == int(s2.cells_from_lonlat(np.array([12.5]), np.array([41.9]), 30)[0])
    assert _one(sql_spark, "ob_s2_cell(CAST(NULL AS DOUBLE), CAST(41.9 AS DOUBLE), 10)") is None
    # NULL / out-of-range level -> NULL row, not an executor ValueError
    assert _one(sql_spark, "ob_s2_cell(CAST(12.5 AS DOUBLE), CAST(41.9 AS DOUBLE), CAST(NULL AS INT))") is None
    assert _one(sql_spark, "ob_s2_cell(CAST(12.5 AS DOUBLE), CAST(41.9 AS DOUBLE), 31)") is None


def test_ob_s2_cell_leaf_exact_with_null_in_batch(sql_spark):
    """Regression: one NULL coordinate in an Arrow batch must not
    float64-round the other rows' leaf-level ids (mask-before-astype bug)."""
    import numpy as np

    from open_buildings_spark.geo import s2

    rows = sql_spark.sql(
        "SELECT ob_s2_cell(lon, lat, 30) AS c FROM VALUES "
        "(CAST(12.5 AS DOUBLE), CAST(41.9 AS DOUBLE)), "
        "(CAST(NULL AS DOUBLE), CAST(10.0 AS DOUBLE)), "
        "(CAST(-70.66 AS DOUBLE), CAST(-33.45 AS DOUBLE)) t(lon, lat)"
    ).collect()
    got = [r["c"] for r in rows]
    exp = s2.leaf_from_lonlat(np.array([12.5, -70.66]), np.array([41.9, -33.45]))
    assert got[0] == int(exp[0]) and got[2] == int(exp[1]) and got[1] is None
    assert got[0] & 1 == 1


def test_ob_s2_key(sql_spark):
    """ob_s2_key mirrors the table layer's routing key: equals
    key_strings(cells_from_lonlat(...)), is a PREFIX-extension of its
    parent's key, and NULLs propagate."""
    import numpy as np

    from open_buildings_spark.geo import s2

    ids = s2.cells_from_lonlat(np.array([12.5]), np.array([41.9]), 14)
    exp = str(s2.key_strings(ids, 14)[0])
    got = _one(sql_spark, "ob_s2_key(CAST(12.5 AS DOUBLE), CAST(41.9 AS DOUBLE), 14)")
    assert got == exp
    parent = _one(sql_spark, "ob_s2_key(CAST(12.5 AS DOUBLE), CAST(41.9 AS DOUBLE), 8)")
    assert got.startswith(parent) and len(parent) == 9
    assert _one(sql_spark, "ob_s2_key(CAST(NULL AS DOUBLE), CAST(41.9 AS DOUBLE), 14)") is None
    assert _one(sql_spark, "ob_s2_key(CAST(12.5 AS DOUBLE), CAST(41.9 AS DOUBLE), 31)") is None
