"""Deterministic sampling operators for training-data mixes — stratified
per-stratum quotas and hash-based train/val/test splits.

Not in the reference (geospatial-only); these are the data-mixing steps a
corpus pipeline runs after dedup/quality filtering. Engine discipline: pure
JVM expressions (md5 + window / string compare), no Python, no RNG — every
row's fate is a function of its id, so the sample is reproducible across
runs, engines (DuckDB oracle parity), cluster sizes, and partitionings —
unlike ``df.sample()``, whose output depends on partition layout.

Scale shape: stratified_sample is one hash shuffle on the stratum key with a
two-stage salted top-n (a giant stratum never funnels into one reducer);
hash_split is a map-only projection (no shuffle at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


TRAIN_PER_4096 = 3686  # ~90%
VAL_PER_4096 = 205  # ~5%


def _id_hash(id_col: str):
    """Lowercase-hex md5 of the row id — identical in Spark and DuckDB
    (``md5(CAST(id AS VARCHAR))``), the deterministic stand-in for a RNG."""
    return F.md5(F.col(id_col).cast("string").cast("binary"))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    id_col: str = "doc_id",
    salts: int = 16,
) -> DataFrame:
    """At most ``n_per_stratum`` rows per distinct ``strata_col`` value,
    chosen deterministically: rows ranked by (md5(id), id) within each
    stratum — an unbiased fixed-quota draw that is stable under reruns and
    repartitioning. Adds ``sample_rank`` (1-based within the stratum).

    Two-stage top-n: stage 1 ranks per (stratum, salt) shard and keeps n,
    stage 2 merges n*salts survivors — the same skew-bounded pattern as the
    kNN top-k, so a stratum with 10^9 rows costs its reducers only
    n*salts rows each.
    """
    h = _id_hash(id_col)
    salted = df.withColumn("_h", h).withColumn(
        "_salt", F.pmod(F.hash(F.col(id_col)), F.lit(salts))
    )
    w1 = Window.partitionBy(strata_col, "_salt").orderBy(
        F.col("_h").asc(), F.col(id_col).asc()
    )
    local = (
        salted.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= n_per_stratum)
        .drop("_r1", "_salt")
    )
    w = Window.partitionBy(strata_col).orderBy(F.col("_h").asc(), F.col(id_col).asc())
    return (
        local.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n_per_stratum)
        .drop("_h")
    )


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_per_4096: int = TRAIN_PER_4096,
    val_per_4096: int = VAL_PER_4096,
) -> DataFrame:
    """Adds a ``split`` column ('train' | 'val' | 'test') keyed on the first
    3 hex chars of md5(id) compared lexicographically — granularity 1/4096
    (defaults ~90% / 5% / 5%). Map-only (no shuffle), deterministic, and
    membership is a pure function of the id: adding or removing other rows
    never moves a document between splits (the property random splits lack).
    """
    if train_per_4096 < 0 or val_per_4096 < 0:
        raise ValueError("split quotas must be non-negative")
    if train_per_4096 + val_per_4096 > 4096:
        raise ValueError("train_per_4096 + val_per_4096 must be <= 4096")
    # compare the 3-hex-digit prefix as an INTEGER: a boundary of exactly
    # 4096 formats to the 4-char '1000', which a 3-char prefix can never
    # reach lexicographically ('f00' < '1000' is false) — string compare
    # would silently dump ~94% of an all-train split into 'test'
    pfx = F.conv(F.substring(_id_hash(id_col), 1, 3), 16, 10).cast("int")
    return df.withColumn(
        "split",
        F.when(pfx < F.lit(train_per_4096), F.lit("train"))
        .when(pfx < F.lit(train_per_4096 + val_per_4096), F.lit("val"))
        .otherwise(F.lit("test")),
    )
