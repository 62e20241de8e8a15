"""GeoParquet / GeoJSON sinks + WKB countries ingestion path."""

import json

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from open_buildings_spark import datagen
from open_buildings_spark.operators import enrich, sinks


@pytest.fixture(scope="module")
def small_geo(spark, docs):
    return (
        enrich.add_geo_columns(docs, drop_nongeo=True)
        .select("doc_id", "wkt", "quadkey")
        .limit(200)
    )


def test_write_geoparquet_roundtrip(spark, small_geo, tmp_path):
    path = str(tmp_path / "gpq")
    n_files = sinks.write_geoparquet(small_geo, path)
    assert n_files > 0
    # footer metadata per spec
    import glob

    f = sorted(glob.glob(f"{path}/*.parquet"))[0]
    meta = pq.read_schema(f).metadata
    geo = json.loads(meta[b"geo"])
    assert geo["primary_column"] == "geometry"
    assert geo["columns"]["geometry"]["encoding"] == "WKB"
    # WKB round-trips through the engine's own parser
    back = spark.read.parquet(path)
    assert back.count() == small_geo.count()
    row = back.first()
    from open_buildings_spark.geo.wkt import parse_wkb_batch
    import pandas as pd

    b = parse_wkb_batch(pd.Series([bytes(row.geometry)]))
    assert b.gtype[0] in (3, 6)
    assert b.n_rings >= 1


def test_wkb_multipolygon_roundtrip(spark, docs):
    multi = (
        enrich.extract_geometry(docs)
        .filter(F.col("wkt").startswith("MULTIPOLYGON"))
        .limit(5)
    )
    out = sinks.add_wkb_column(multi).select("wkt", "geometry").collect()
    import pandas as pd

    from open_buildings_spark.geo.wkt import parse_wkb_batch, parse_wkt_batch

    for r in out:
        a = parse_wkt_batch(pd.Series([r.wkt]))
        b = parse_wkb_batch(pd.Series([bytes(r.geometry)]))
        assert b.gtype[0] == 6
        assert a.n_rings == b.n_rings
        assert (a.coords == b.coords).all()


def test_write_geojson(spark, small_geo, tmp_path):
    path = str(tmp_path / "out.json")
    n = sinks.write_geojson(small_geo.limit(20), path)
    fc = json.load(open(path))
    assert fc["type"] == "FeatureCollection"
    assert len(fc["features"]) == n == 20
    f0 = fc["features"][0]
    assert f0["geometry"]["type"] in ("Polygon", "MultiPolygon")
    assert "doc_id" in f0["properties"]


def test_country_join_from_wkb_table(spark, docs):
    cdf = datagen.countries_df(spark)
    out = enrich.add_country_iso_from_table(docs, cdf)
    got = (
        out.filter(F.col("wkt").isNotNull())
        .groupBy("country_iso")
        .count()
        .toPandas()
        .set_index("country_iso")["count"]
    )
    # every building lands in a country; the overlap country A0 wins its
    # west-half region of city 0 (min-ISO tie-break)
    assert got.sum() == out.filter(F.col("wkt").isNotNull()).count()
    assert "A0" in got.index and got["A0"] > 0
    assert set(got.index) <= {"A0", "AA", "BB", "CC", "DD", "EE"}
