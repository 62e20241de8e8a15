"""Generic filter-and-refine spatial join: docs x AOI-table.

The reference's only join is one-polygon-at-a-time (download_buildings.py
AOI query) or a correlated UPDATE against a tiny countries table. The
engine generalizes both to the classic cell-cover equi-join:

  1. explode each AOI polygon to its covering quadkey cells at a chosen
     level (driver-side — AOI tables are small; for AOI tables too large
     to enumerate at the driver, the same expansion runs as a Spark job),
  2. broadcast-join docs on the cell key (substring of the stored quadkey
     — no geometry touched yet, fully JVM-side),
  3. exact ST_Within refinement per AOI on the surviving candidates only
     (one Arrow batch pass, AOIs grouped within each batch).

This is the engine's scalable join shape: the shuffle-free broadcast path
for small AOI sets, and a plain shuffle equi-join on `cell` when both
sides are large.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

from ..geo import kernels, mercator
from ..geo.wkt import parse_wkt_batch
from .enrich import add_geo_columns, extract_geometry

ZOOM = 12


def polygon_cover_cells(feature: dict, level: int) -> list[str]:
    """Quadkey cells at ``level`` covering the AOI's bbox (coarse cover;
    exactness comes from the refinement step)."""
    w, s, e, n = mercator.geometry_bounds(feature["geometry"])
    x0, y0, x1, y1 = mercator.bbox_tile_range(w, s, e, n, level)
    return [
        mercator.quadkey_from_tile(x, y, level)
        for x in range(x0, x1 + 1)
        for y in range(y0, y1 + 1)
    ]


def _make_within_by_aoi(aois: list[tuple[int, dict]]):
    """pandas UDF testing within against a per-row AOI id (AOIs grouped
    per batch so each AOI's kernel runs vectorized over its rows)."""
    from ..udfs import aoi_rings

    rings_by_id = {int(aid): aoi_rings(feat["geometry"]) for aid, feat in aois}

    @F.pandas_udf(BooleanType())
    def within_by_aoi(wkt: pd.Series, aoi_id: pd.Series) -> pd.Series:
        batch = parse_wkt_batch(wkt)
        ids = aoi_id.to_numpy()
        out = np.zeros(len(wkt), dtype=bool)
        from ..udfs import _subset_batch

        for aid in np.unique(ids):
            idx = np.nonzero(ids == aid)[0]
            sub = _subset_batch(batch, idx)
            m = kernels.within_mask(sub, rings_by_id[int(aid)])
            m[sub.gtype == -1] = False
            out[idx] = m
        return pd.Series(out)

    return within_by_aoi


def aoi_join(
    docs: DataFrame,
    aois: list[tuple[int, dict]],
    cover_level: int = 10,
) -> DataFrame:
    """Rows of ``docs`` within ANY of the AOIs, tagged with ``aoi_id``
    (a doc inside two overlapping AOIs appears once per AOI).

    ``docs`` needs doc_id+spans (or pre-enriched quadkey/wkt columns);
    ``aois``: [(aoi_id, GeoJSON feature)]."""
    spark = docs.sparkSession
    cells = [
        (int(aid), c) for aid, feat in aois for c in polygon_cover_cells(feat, cover_level)
    ]
    cells_df = spark.createDataFrame(cells, "aoi_id int, cell string")

    df = docs
    if "quadkey" not in df.columns:
        # native wkt pre-filter only — a quadkey filter here would reference
        # the enrichment UDF's output and split it into two python evals
        df = add_geo_columns(df, drop_nongeo=True)
    else:
        if "wkt" not in df.columns:
            df = extract_geometry(df)
        df = df.filter(F.col("quadkey").isNotNull())  # stored column: native
    df = df.withColumn("cell", F.substring("quadkey", 1, cover_level))
    cand = df.join(F.broadcast(cells_df), "cell")
    refine = _make_within_by_aoi(aois)
    return cand.filter(refine(F.col("wkt"), F.col("aoi_id"))).drop("cell")
