"""Multipolygon split (= ``ob google convert`` F10): one row per component
polygon, with per-part equal-area m^2 and Plus Code recomputed.

Reference does this with a driver-side fetchall loop, shapely parse, and
per-row INSERT/DELETE (open_buildings/google/process.py:76-149) — explicitly
its slow path. Engine shape: one Arrow-batched parse UDF emitting an
array<struct> of parts, a native ``posexplode``, then vectorized area/OLC
kernels. The original multi-row is replaced by its parts (the reference's
DELETE at google/process.py:149) — expressed immutably.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from ..geo import kernels
from ..geo.wkt import GeomBatch, parse_wkt_batch, polygon_wkt
from ..udfs import plus_code12

PART_TYPE = ArrayType(
    StructType(
        [
            StructField("part_wkt", StringType()),
            StructField("area_m2", DoubleType()),
            StructField("cx", DoubleType()),
            StructField("cy", DoubleType()),
        ]
    )
)


@F.pandas_udf(PART_TYPE)
def split_parts(wkt: pd.Series) -> pd.Series:
    """Parse batch once; emit each shell (with its holes) as its own polygon
    part with equal-area area and centroid."""
    batch = parse_wkt_batch(wkt)
    out: list = [None] * batch.n_geoms
    # group rings into (geom, part): a part = shell ring + following holes
    part_rings: dict[tuple[int, int], list] = {}
    part_no = {}
    for r in range(batch.n_rings):
        g = int(batch.ring_geom[r])
        if not batch.ring_is_hole[r]:
            part_no[g] = part_no.get(g, -1) + 1
        if part_no.get(g, -1) < 0:  # malformed: hole before shell
            continue
        part_rings.setdefault((g, part_no[g]), []).append(batch.ring(r))
    # vectorized area/centroid per part via a sub-batch
    keys = sorted(part_rings)
    if keys:
        rings, ring_geom, ring_hole = [], [], []
        for i, key in enumerate(keys):
            for j, coords in enumerate(part_rings[key]):
                rings.append(coords)
                ring_geom.append(i)
                ring_hole.append(j > 0)
        coords = np.concatenate(rings)
        sizes = np.array([len(r) for r in rings], dtype=np.int64)
        sub = GeomBatch(
            coords=coords,
            ring_offsets=np.concatenate([[0], np.cumsum(sizes)]).astype(np.int64),
            ring_geom=np.array(ring_geom, dtype=np.int32),
            ring_is_hole=np.array(ring_hole, dtype=bool),
            gtype=np.full(len(keys), 3, dtype=np.int8),
        )
        areas = kernels.area_6933(sub)
        cents = kernels.centroids(sub)
        for i, (g, _p) in enumerate(keys):
            if out[g] is None:
                out[g] = []
            out[g].append(
                {
                    "part_wkt": polygon_wkt(part_rings[keys[i][0], keys[i][1]]),
                    "area_m2": float(areas[i]),
                    "cx": float(cents[i, 0]),
                    "cy": float(cents[i, 1]),
                }
            )
    return pd.Series(out)


def explode_multipolygons(docs: DataFrame) -> DataFrame:
    """One output row per polygon part; single-polygon rows pass through as
    part_idx=0. Adds part_wkt, part area_m2, plus_code (OLC-12 of the part
    centroid), part_idx. Docs without geometry are dropped (this operator's
    contract is the reference's converted-buildings output)."""
    from .enrich import extract_geometry

    df = docs if "wkt" in docs.columns else extract_geometry(docs)
    df = df.filter(F.col("wkt").isNotNull())
    df = df.withColumn("_parts", split_parts(F.col("wkt")))
    df = df.select(
        "*", F.posexplode(F.col("_parts")).alias("part_idx", "_part")
    ).drop("_parts")
    return (
        df.withColumn("part_wkt", F.col("_part.part_wkt"))
        .withColumn("part_area_m2", F.col("_part.area_m2"))
        .withColumn("plus_code", plus_code12(F.col("_part.cy"), F.col("_part.cx")))
        .drop("_part")
    )
