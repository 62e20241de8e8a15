"""Enrichment pipeline over the interleaved-docs table: extract the geometry
span, add quadkey / centroid / bbox / area columns, assign country_iso.

Spark-first re-expression of the reference's archive-build enrichment
(``ob overture add_columns``: open_buildings/overture/add_columns.py:30-63):
the reference mutates a DuckDB table in place with per-row Python UDFs and a
correlated spatial UPDATE; here it is one declarative pass — a single
Arrow-batched parse UDF plus native exprs, no shuffle at all. The ``spans``
column rides along untouched (per-row span-sequence invariant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..udfs import geom_summary, make_country_assign


def extract_geometry(docs: DataFrame) -> DataFrame:
    """Add a ``wkt`` column = text of the first kind='geometry' span.

    Pure native expressions (higher-order ``filter`` + ``element_at``) — the
    spans array is never exploded or reassembled.
    """
    geom_spans = F.filter(F.col("spans"), lambda s: s["kind"] == F.lit("geometry"))
    wkt = F.when(F.size(geom_spans) > 0, F.element_at(geom_spans, 1)["text"])
    return docs.withColumn("wkt", wkt)


def extract_media_tiles(docs: DataFrame) -> DataFrame:
    """Add ``media_qk`` = quadkey parsed out of the first media span's
    ``media_ref`` ('tile/z12/<quadkey>'); NULL when the doc has no media."""
    media = F.filter(F.col("spans"), lambda s: s["kind"] == F.lit("media"))
    ref = F.when(F.size(media) > 0, F.element_at(media, 1)["media_ref"])
    return docs.withColumn("media_qk", F.element_at(F.split(ref, "/"), -1))


def add_geo_columns(docs: DataFrame, keep_bbox: bool = False) -> DataFrame:
    """quadkey (z12, bbox-midpoint anchor — reference semantics), centroid
    lon/lat, equal-area m^2; docs without geometry get NULLs but are KEPT."""
    df = docs if "wkt" in docs.columns else extract_geometry(docs)
    df = df.withColumn("_gs", geom_summary(F.col("wkt")))
    out = (
        df.withColumn("quadkey", F.col("_gs.quadkey"))
        .withColumn("lon", F.col("_gs.cx"))
        .withColumn("lat", F.col("_gs.cy"))
        .withColumn("area_m2", F.col("_gs.area_m2"))
        .withColumn("n_parts", F.col("_gs.n_parts"))
    )
    if keep_bbox:
        out = (
            out.withColumn("minx", F.col("_gs.minx"))
            .withColumn("miny", F.col("_gs.miny"))
            .withColumn("maxx", F.col("_gs.maxx"))
            .withColumn("maxy", F.col("_gs.maxy"))
        )
    return out.drop("_gs")


def add_country_iso(docs: DataFrame, country_list: list[tuple[str, list]]) -> DataFrame:
    """Assign ``country_iso`` by ST_Intersects against the (small, broadcast)
    countries table — deterministic min-ISO tie-break on overlap.

    Scale shape: countries are a classic broadcast dimension (~200 rows at
    planet scale); shipping them in the UDF closure avoids any shuffle. For
    big-big spatial joins use operators.spatial_join instead.
    """
    df = docs if "wkt" in docs.columns else extract_geometry(docs)
    assign = make_country_assign(country_list)
    return df.withColumn("country_iso", assign(F.col("wkt")))
