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


def _ranked_draw(
    df: DataFrame,
    strata_col: str,
    quota,
    id_col: str,
    salts: int,
    rank_name: str,
) -> DataFrame:
    """THE deterministic per-stratum draw (shared by stratified_sample and
    mixture_sample so the device — hash, salt, tie-break — can never
    diverge between them): rows ranked by (md5(id), id) within each
    stratum, kept while rank <= ``quota`` (an int or a per-row Column).

    Two-stage top-n: stage 1 ranks per (stratum, salt) shard and keeps
    quota, stage 2 merges the survivors — the same skew-bounded pattern
    as the kNN top-k, so a stratum with 10^9 rows costs its reducers only
    quota*salts rows each. Adds ``rank_name`` (1-based in-stratum)."""
    q = F.lit(quota) if isinstance(quota, int) else quota
    h = _id_hash(id_col)
    salted = df.withColumn("_h", h).withColumn(
        "_salt", F.pmod(F.hash(F.col(id_col)), F.lit(salts))
    )
    w1 = Window.partitionBy(strata_col, "_salt").orderBy(
        F.col("_h").asc(), F.col(id_col).asc()
    )
    local = (
        salted.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= q)
        .drop("_r1", "_salt")
    )
    w = Window.partitionBy(strata_col).orderBy(F.col("_h").asc(), F.col(id_col).asc())
    return (
        local.withColumn(rank_name, F.row_number().over(w))
        .filter(F.col(rank_name) <= q)
        .drop("_h")
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    id_col: str = "doc_id",
    salts: int = 16,
) -> DataFrame:
    """At most ``n_per_stratum`` rows per distinct ``strata_col`` value,
    chosen deterministically — an unbiased fixed-quota draw stable under
    reruns and repartitioning (:func:`_ranked_draw`). Adds
    ``sample_rank`` (1-based within the stratum)."""
    return _ranked_draw(
        df, strata_col, n_per_stratum, id_col, salts, "sample_rank"
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


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    strata_col: str = "source",
    id_col: str = "doc_id",
    salts: int = 16,
) -> DataFrame:
    """Deterministic dataset-mixture draw: the largest subset whose
    per-``strata_col`` composition matches the target ``weights``
    (fractions summing to ~1) WITHOUT upsampling any source — the
    datasets-mixing step that turns filtered corpora into a pretraining
    mix with pinned domain proportions.

        n_total = min over sources of floor(available_s / w_s)
        take_s  = floor(w_s * n_total)

    so the scarcest source (relative to its target share) binds the mix
    and every other source downsamples to proportion. Within each source
    the take is rank-based on (md5(id), id) — the engine's deterministic
    RNG stand-in — so the mix is reproducible across runs, engines and
    partitionings. Sources absent from ``weights`` (or weighted 0) drop.

    Returns df's columns + ``mix_rank`` (1-based within the source).

    Scale shape: per-source availability is one map-side-combinable
    count collected at |sources| rows (bounded driver state); the draw is
    the same salted two-stage top-n as :func:`stratified_sample`, with
    the per-source quota joined in as a broadcast column — a 10^9-row
    source costs its reducers only quota-bounded shards."""
    for s, w in weights.items():
        if w < 0:
            raise ValueError(f"negative weight for {s!r}")
    pos = {s: w for s, w in weights.items() if w > 0}
    if not pos:
        raise ValueError("weights must contain at least one positive entry")
    counts = {
        r[strata_col]: r["n"]
        for r in df.filter(F.col(strata_col).isin(list(pos)))
        .groupBy(strata_col)
        .agg(F.count("*").alias("n"))
        .collect()
    }
    import math

    n_total = min(
        math.floor(counts.get(s, 0) / w) for s, w in pos.items()
    )
    takes = [(s, int(math.floor(w * n_total))) for s, w in pos.items()]
    spark = df.sparkSession
    # quota frame keyed with the strata column's ACTUAL type — a string
    # literal schema broke non-string strata (e.g. int source ids)
    sdt = df.schema[strata_col].dataType.simpleString()
    quota = spark.createDataFrame(takes, f"`{strata_col}` {sdt}, _quota long")
    joined = df.join(F.broadcast(quota), strata_col)
    return _ranked_draw(
        joined, strata_col, F.col("_quota"), id_col, salts, "mix_rank"
    ).drop("_quota")


def leakage_safe_split(
    df: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "canonical_id",
    train_per_4096: int = TRAIN_PER_4096,
    val_per_4096: int = VAL_PER_4096,
) -> DataFrame:
    """Train/val/test assignment that cannot leak near-duplicates across
    splits: the split key is the doc's DUPLICATE-CLUSTER canonical id
    (``clusters`` = dedup.neardup_clusters / exact groups), so every
    member of a cluster lands in the SAME split — the eval-contamination
    hole a plain per-doc :func:`hash_split` leaves open (a near-copy of a
    val doc in train is exactly how benchmarks leak into pretraining).

    Same determinism contract as hash_split (membership is a pure
    function of the canonical id; adding/removing other docs never moves
    a cluster); docs absent from ``clusters`` fall back to their own id
    (a missing row means the clusterer saw no duplicate evidence).

    Scale shape: one broadcast-or-shuffle equi-join on the id plus the
    map-only split expression — the cluster table is the dedup pass's
    existing output, not a new computation."""
    c = clusters.select(
        F.col(id_col), F.col(cluster_col).alias("_ccanon")
    )
    j = df.join(c, id_col, "left").withColumn(
        "_skey", F.coalesce(F.col("_ccanon"), F.col(id_col))
    )
    return (
        hash_split(j, id_col="_skey", train_per_4096=train_per_4096,
                   val_per_4096=val_per_4096)
        .withColumn(cluster_col, F.col("_skey"))
        .drop("_skey", "_ccanon")
    )
