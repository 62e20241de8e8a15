"""Raster-tile <-> vector assignment (north_star J4).

Every geometry gets its covering z12 tile (exactly the reference's tiling:
open_buildings/download_buildings.py:22-31 / overture/add_columns.py:40-47);
media spans carry ``media_ref = 'tile/z12/<quadkey>'`` naming an imagery
tile. The operator joins the two: per doc, does the imagery tile match the
geometry tile, and which docs reference a neighboring tile (off-by-one
imagery) — the raster/vector reconciliation pass a training pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .enrich import add_geo_columns, extract_media_tiles


def tile_assignment(docs: DataFrame) -> DataFrame:
    """(doc_id, quadkey, media_qk, tile_match) for docs having geometry.

    ``tile_match`` is true when the imagery tile equals the geometry's z12
    tile. Pure native exprs after the single enrichment parse.
    """
    df = docs
    enriched_here = "quadkey" not in df.columns
    if enriched_here:
        df = add_geo_columns(df, drop_nongeo=True)
    if "media_qk" not in df.columns:
        df = extract_media_tiles(df)
    # quadkey filter is only needed (and only cheap/native) on stored tables;
    # after drop_nongeo enrichment every row has a quadkey and filtering on
    # the UDF output would split the python eval in two
    qk_pred = F.lit(True) if enriched_here else F.col("quadkey").isNotNull()
    return (
        df.filter(qk_pred & F.col("media_qk").isNotNull())
        .withColumn("tile_match", (F.col("quadkey") == F.col("media_qk")))
        .select("doc_id", "quadkey", "media_qk", "tile_match")
    )


def tile_rollup(docs: DataFrame) -> DataFrame:
    """Per-tile rollup over docs CARRYING a media span: imagery-bearing doc
    count + mismatched-imagery count per z12 quadkey (tile_assignment
    filters media_qk IS NOT NULL, so docs without imagery are not counted
    here — use partition.cell_histogram for all-rows per-cell counts)."""
    t = tile_assignment(docs)
    return t.groupBy("quadkey").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(~F.col("tile_match"), 1).otherwise(0)).alias("n_mismatch"),
    )
