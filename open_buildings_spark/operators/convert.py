"""Google-CSV conversion pipeline (= ``ob google convert``).

Reference (open_buildings/google/process.py:55-206): read the Google Open
Buildings CSV (WKT geometry + latitude/longitude/area/confidence/plus-code
columns), split MULTIPOLYGONs into one row per polygon recomputing
area_in_meters (EPSG:6933) and full_plus_code (OLC-12 of the centroid),
drop the original multis, write parquet/GeoJSON.

Engine shape: one `spark.read.csv` scan -> the Arrow-native explode operator
-> sinks. The reference's per-row fetchall/INSERT/DELETE loop (its measured
slow path, README.md:131-143) becomes a single distributed pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .explode import explode_multipolygons

GOOGLE_CSV_COLUMNS = [
    "latitude",
    "longitude",
    "area_in_meters",
    "confidence",
    "geometry",
    "full_plus_code",
]


# the published Google Open Buildings CSV layout (reference
# google/process.py:68-70) — when the header matches exactly, the scan
# uses this schema directly instead of paying inference's full extra
# pass over the data (inference on this layout yields the same types)
GOOGLE_CSV_SCHEMA = (
    "latitude double, longitude double, area_in_meters double, "
    "confidence double, geometry string, full_plus_code string"
)


def read_google_csv(spark: SparkSession, path: str) -> DataFrame:
    """CSV scan (reference S3 operator, google/process.py:68-70), dropping
    redundant lat/lon like the reference's `EXCLUDE (latitude,
    longitude)`. The known Google column layout skips schema inference
    (header-only probe, then a typed single-pass scan); any other header
    falls back to full inference unchanged."""
    probe = spark.read.csv(path, header=True)
    if probe.columns == GOOGLE_CSV_COLUMNS:
        df = spark.read.schema(GOOGLE_CSV_SCHEMA).option("header", True).csv(
            path
        )
    else:
        df = spark.read.csv(path, header=True, inferSchema=True)
    return df.drop("latitude", "longitude")


def convert_google(df: DataFrame, split_multipolygons: bool = True) -> DataFrame:
    """Split multipolygons; every output row carries recomputed
    area_in_meters + full_plus_code; single-polygon rows pass through
    (with their derived values recomputed identically).

    ``split_multipolygons=False`` passes geometries through unchanged —
    the reference's ogr engine mode, which cannot split
    (google/process.py:342-344)."""
    if not split_multipolygons:
        return df
    src = df.withColumnRenamed("geometry", "wkt")
    out = explode_multipolygons(src)
    return (
        out.withColumn("area_in_meters", F.col("part_area_m2"))
        .withColumn("full_plus_code", F.col("plus_code"))
        .withColumn("geometry", F.col("part_wkt"))
        .drop("wkt", "part_wkt", "part_area_m2", "plus_code")
    )


def convert_google_csv(
    spark: SparkSession,
    csv_path: str,
    dst: str | None = None,
    split_multipolygons: bool = True,
) -> DataFrame:
    out = convert_google(read_google_csv(spark, csv_path), split_multipolygons)
    if dst:
        out.write.mode("overwrite").option("compression", "snappy").parquet(dst)
    return out
