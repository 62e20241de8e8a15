"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes each implemented operator from SURVEY.md §2 over the
deterministic interleaved-docs derivation (open_buildings_spark.datagen);
``oracle_sql()`` returns independent DuckDB SQL producing identical values
(open_buildings_spark.oracles).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_buildings_spark import datagen, oracles
from open_buildings_spark.operators import aoi as aoi_op
from open_buildings_spark.operators import enrich, explode, knn, partition, tiles


def _geo_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interleaved docs -> enriched (quadkey/lon/lat/area) via the real
    engine path: spans -> WKT extraction -> Arrow-batched parse kernels."""
    docs = datagen.interleaved_docs(spark, sf_dir)
    return enrich.add_geo_columns(docs)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: AOI query (get_buildings) over the sf0.001 docs table."""
    docs = datagen.interleaved_docs(spark, "/root/testdata/sf0.001")
    hit = aoi_op.aoi_query(docs, datagen.city_aoi())
    return hit.select("doc_id", "quadkey", "spans")


# ---------------------------------------------------------------------------


def _q_enrich_quadkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _geo_docs(spark, sf_dir)
    return g.filter(F.col("quadkey").isNotNull()).select("doc_id", "quadkey")


def _q_quadkey_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _geo_docs(spark, sf_dir)
    return (
        g.filter(F.col("quadkey").isNotNull())
        .groupBy("quadkey")
        .agg(F.count("*").alias("n_docs"))
    )


def _q_aoi_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = datagen.interleaved_docs(spark, sf_dir)
    hit = aoi_op.aoi_query(docs, datagen.city_aoi())
    return hit.select("doc_id", "quadkey")


def _q_country_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = datagen.interleaved_docs(spark, sf_dir)
    clist = [
        (iso, [([[w, s], [e, s], [e, n], [w, n], [w, s]], False)])
        for iso, (w, s, e, n) in datagen.countries()
    ]
    out = enrich.add_country_iso(docs, clist)
    return out.filter(F.col("wkt").isNotNull()).select("doc_id", "country_iso")


def _q_tile_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = datagen.interleaved_docs(spark, sf_dir)
    return tiles.tile_assignment(docs)


def _q_tile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = datagen.interleaved_docs(spark, sf_dir)
    return tiles.tile_rollup(docs)


def _q_partition_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _geo_docs(spark, sf_dir).filter(F.col("quadkey").isNotNull())
    return partition.partition_plan(g, oracles.MAX_PER_FILE)


def _q_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _geo_docs(spark, sf_dir).filter(F.col("quadkey").isNotNull())
    b = g.select("doc_id", "quadkey", "lon", "lat").cache()
    try:
        return knn.knn(spark, b, oracles.knn_queries(), k=oracles.KNN_K).withColumn(
            "rank", F.col("rank").cast("long")
        )
    finally:
        pass


def _q_explode_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = datagen.interleaved_docs(spark, sf_dir)
    parts = explode.explode_multipolygons(docs)
    return parts.select(
        "doc_id", "part_idx", F.round(F.col("part_area_m2"), 1).alias("area_r1")
    )


def _q_span_kinds(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = datagen.interleaved_docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.size("spans").alias("n_spans"),
        F.concat_ws(",", F.transform("spans", lambda s: s["kind"])).alias("kinds"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "g_enrich_quadkey": _q_enrich_quadkey,
        "g_quadkey_hist": _q_quadkey_hist,
        "g_aoi_query": _q_aoi_query,
        "g_country_join": _q_country_join,
        "g_tile_assignment": _q_tile_assignment,
        "g_tile_rollup": _q_tile_rollup,
        "g_partition_plan": _q_partition_plan,
        "g_knn": _q_knn,
        "g_explode_parts": _q_explode_parts,
        "g_span_kinds": _q_span_kinds,
    }


def oracle_sql() -> dict[str, str]:
    return oracles.oracle_sql()
