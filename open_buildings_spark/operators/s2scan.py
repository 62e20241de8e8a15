"""S2-ordered parquet layout + range-pruned bbox scan — the numeric-range
serving path that complements the quadkey table's string-prefix pruning
(table/iceberg_lite.py). The reference serves spatial windows off files
clustered by quadkey ORDER BY (reference: download_buildings.py:281-311);
this module is the same idea re-expressed over the S2 id space, where
containment is `leaf BETWEEN cell_range(cover_cell)`:

- :func:`write_s2_layout` range-partitions the corpus by leaf-level S2 id
  and sorts within files, so every file (and every parquet row group)
  owns a tight, disjoint id interval; a one-pass distributed aggregation
  (groupBy input_file_name) records each file's [min, max] in a manifest.
- :func:`s2_bbox_scan` turns a lat/lon window into a conservative cell
  cover (geo/s2.py cover_bbox), coalesces it into a few leaf-id ranges,
  prunes the FILE LIST against the manifest before Spark ever lists or
  opens a file, and pushes the surviving OR-of-BETWEEN to the parquet
  reader so row-group min/max statistics prune inside each file too. An
  exact native lon/lat refine keeps the result independent of how
  conservative the cover was.

At 100 TB the wins compound: manifest pruning bounds the planner's work
by the window size (not the corpus size), the pushed range predicate
bounds IO by row-group stats, and nothing ever funnels through the
driver except the manifest (KB) and the cover (driver-enumerated cells,
bounded by ``cover_level``).
"""

from __future__ import annotations

import json
import os
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..geo import s2

MANIFEST_NAME = "_s2_manifest.json"


def write_s2_layout(
    df: DataFrame,
    path: str,
    num_files: int = 16,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> dict:
    """Write ``df`` as parquet range-partitioned and sorted by leaf-level
    S2 id (column ``s2_cell`` is added from the centroid lon/lat), then
    record per-file [min, max] id stats in ``_s2_manifest.json``.

    The stats pass is a distributed single-column aggregation over the
    written files (groupBy input_file_name) — no driver-side footer
    parsing, no per-file loop; only the final (num_files × 3)-row stat
    table is collected. Returns the manifest dict."""
    from .enrich import add_s2_cell

    with_id = add_s2_cell(df, level=s2.MAX_LEVEL, lon_col=lon_col, lat_col=lat_col)
    # materialize BEFORE repartitionByRange: the RangePartitioner's sampling
    # job would otherwise re-execute the whole Python enrich/S2 pipeline a
    # second time (the global-sort-above-UDF trap). At petabyte scale swap
    # the persist for an intermediate parquet stage.
    with_id = with_id.persist()
    try:
        with_id.count()
        (
            with_id.repartitionByRange(num_files, "s2_cell")
            .sortWithinPartitions("s2_cell")
            .write.mode("overwrite")
            .parquet(path)
        )
    finally:
        with_id.unpersist()
    spark = df.sparkSession
    stats = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("file"))
        .agg(
            F.min("s2_cell").alias("lo"),
            F.max("s2_cell").alias("hi"),
            F.count(F.lit(1)).alias("rows"),
        )
        .collect()
    )
    files = sorted(
        (
            {
                "name": os.path.basename(r["file"]),
                "lo": r["lo"],
                "hi": r["hi"],
                "rows": r["rows"],
            }
            for r in stats
        ),
        key=lambda f: f["name"],
    )
    manifest = {
        "version": 1,
        "id_col": "s2_cell",
        "lon_col": lon_col,
        "lat_col": lat_col,
        "files": files,
    }
    # atomic: existence of the manifest is the build-complete marker for
    # callers, so a kill mid-dump must never leave a truncated file behind
    tmp = os.path.join(path, f"{MANIFEST_NAME}.{os.getpid()}.inprogress")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, os.path.join(path, MANIFEST_NAME))
    return manifest


def _range_predicate(ranges: Sequence[tuple[int, int]], id_col: str):
    c = F.col(id_col)
    pred = None
    for lo, hi in ranges:
        term = (c >= F.lit(lo)) & (c <= F.lit(hi))
        pred = term if pred is None else pred | term
    return pred if pred is not None else F.lit(False)


def s2_bbox_scan(
    spark: SparkSession,
    path: str,
    w: float,
    s: float,
    e: float,
    n: float,
    cover_level: int = 8,
    max_ranges: int = 32,
) -> DataFrame:
    """Rows of an S2 layout whose centroid lies in [w..e] x [s..n]:
    manifest file pruning -> pushed OR-of-BETWEEN on the sorted id column
    (parquet row-group pruning) -> exact native lon/lat refine. The refine
    makes the result exact regardless of cover slack, so the coarse stage
    is free to be conservative."""
    cover = s2.cover_bbox(w, s, e, n, cover_level)
    ranges = s2.merge_ranges(cover, max_ranges=max_ranges)

    with open(os.path.join(path, MANIFEST_NAME)) as fh:
        manifest = json.load(fh)
    keep = [
        os.path.join(path, f["name"])
        for f in manifest["files"]
        # all-null-id files carry lo/hi None; a range predicate can never
        # match a null id, so skipping them is exact
        if f["lo"] is not None
        and any(f["lo"] <= hi and lo <= f["hi"] for lo, hi in ranges)
    ]
    # the column names come FROM the manifest, so a layout written with
    # custom lon/lat/id columns reads back against the same columns
    id_col = manifest["id_col"]
    lon_col = manifest.get("lon_col", "lon")
    lat_col = manifest.get("lat_col", "lat")
    if not keep:
        return spark.read.parquet(path).where(F.lit(False))
    return (
        spark.read.parquet(*keep)
        .where(_range_predicate(ranges, id_col))
        .where(
            (F.col(lon_col) >= F.lit(float(w)))
            & (F.col(lon_col) <= F.lit(float(e)))
            & (F.col(lat_col) >= F.lit(float(s)))
            & (F.col(lat_col) <= F.lit(float(n)))
        )
    )
