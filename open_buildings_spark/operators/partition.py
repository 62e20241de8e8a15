"""Adaptive quadkey partitioner (= ``ob overture partition``).

Reference semantics (open_buildings/overture/partition.py:132-152): per
country, starting at prefix length 1, recursively split any quadkey cell
holding more than ``max_per_file`` rows; leaf cells are written as files
sorted by quadkey. The reference issues one DISTINCT + one COUNT query per
cell (O(cells) scans); the engine computes ONE z12 histogram in a single
shuffle and resolves the whole recursion on that histogram — same output
cells, one pass over the data.

Split cap: prefixes stop at length 12 (a z12 cell denser than max_per_file
cannot be split further — the reference would loop forever on it;
documented deviation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_LEVEL = 12


def cell_histogram(df: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """One-pass per-z12-cell row counts: groupBy(quadkey[, keys]).count().

    NULL quadkeys (parse-degraded rows that survived an upstream filter)
    are excluded — a None in the histogram would crash the driver-side
    argsort and such rows can't be routed to any cell anyway."""
    keys = keys or []
    return (
        df.filter(F.col("quadkey").isNotNull())
        .groupBy(*keys, F.substring("quadkey", 1, MAX_LEVEL).alias("qk12"))
        .agg(F.count("*").alias("n"))
    )


COARSE_LEVEL = 8


def hier_histogram(
    df: DataFrame,
    max_per_file: int,
    keys: list[str] | None = None,
    coarse_level: int = COARSE_LEVEL,
):
    """Driver-memory-bounded histogram for the partition planner.

    One shuffle over the DATA builds the (cached, distributed) z12
    aggregate; the driver then collects
      1. the z{coarse_level} rollup (a tiny second shuffle over the cached
         aggregate, never the data), and
      2. z12 rows ONLY inside over-cap coarse cells
    so collected rows = O(4^coarse + over-cap cells x 4^(12-coarse))
    instead of every z12 cell x key value (a planet-scale table with
    mostly-sparse geography collects a small fraction of its z12 cells).

    Returns (pandas DataFrame with columns keys... qk n — ``qk`` of length
    coarse_level for under-cap regions, 12 inside over-cap ones — ,
    n_collected). Regions are represented EITHER by their coarse row OR by
    their z12 rows, never both, so prefix-range sums over the mixed rows
    are exact.
    """
    import pandas as pd

    keys = keys or []
    agg12 = cell_histogram(df, keys).persist()
    try:
        h8 = (
            agg12.groupBy(
                *keys, F.substring("qk12", 1, coarse_level).alias("qk")
            )
            .agg(F.sum("n").alias("n"))
            .toPandas()
        )
        over = h8[h8["n"] > max_per_file]
        if len(over):
            # InSet on coarse cells: bounded by 4^coarse (65k at z8) keys,
            # independent of table size
            cells8 = sorted(set(over["qk"]))
            h12 = (
                agg12.filter(
                    F.substring("qk12", 1, coarse_level).isin(cells8)
                )
                .withColumnRenamed("qk12", "qk")
                .toPandas()
            )
        else:
            h12 = h8.iloc[0:0].copy()
    finally:
        agg12.unpersist()
    n_collected = len(h8) + len(h12)
    if len(h12) == 0:
        return h8, n_collected
    # keep the coarse row only where that (keys, coarse cell) is UNDER cap
    # (per key group a coarse cell can be over for one key, under for
    # another — the isin prefetch is a superset; resolve exactly here)
    h8 = h8.copy()
    h12 = h12.copy()
    h12["_c"] = h12["qk"].str[:coarse_level]
    over_keys = set(
        map(tuple, over[[*keys, "qk"]].itertuples(index=False, name=None))
    )
    keep8 = ~h8[[*keys, "qk"]].apply(
        lambda r: tuple(r) in over_keys, axis=1
    )
    keep12 = h12[[*keys, "_c"]].apply(lambda r: tuple(r) in over_keys, axis=1)
    hist = pd.concat(
        [h8[keep8], h12[keep12].drop(columns="_c")], ignore_index=True
    )
    return hist, n_collected


def partition_plan(
    df: DataFrame, max_per_file: int, keys: list[str] | None = None
) -> DataFrame:
    """Leaf-cell plan: (keys..., cell, n_rows) with reference split semantics.

    One data shuffle computes the histogram (hierarchically collected, see
    :func:`hier_histogram`); the recursion itself runs driver-side in
    pandas (like the reference's driver-side loop, but on the histogram
    instead of per-cell COUNT queries). A cell is a LEAF iff its count <=
    max_per_file and every ancestor is over the cap (or level 1); over-cap
    level-12 cells become leaves (cap).

    The recursion never needs sub-coarse detail for under-cap coarse cells
    (an under-cap node is a leaf at or above the coarse level), which is
    exactly what hier_histogram omits.
    """
    keys = keys or []
    spark = df.sparkSession
    hist, _ = hier_histogram(df, max_per_file, keys)
    if keys and hist[keys].isna().any().any():
        # Spark's groupBy KEEPS null key groups, so the collected histogram
        # surfaces them for free — but pandas' groupby below would drop
        # them and tag_cells' inner join would then silently lose every
        # such row from the written table; refuse instead
        raise ValueError(
            f"partition keys {keys} contain NULL values; fill or filter "
            "them first (rows with null keys cannot be routed to a "
            "partition and would be silently dropped)"
        )

    import numpy as np

    out_rows: list[tuple] = []
    for key_vals, grp in (
        hist.groupby(keys, sort=False) if keys else [((), hist)]
    ):
        if keys and not isinstance(key_vals, tuple):
            key_vals = (key_vals,)
        order = np.argsort(grp["qk"].to_numpy())
        cells = grp["qk"].to_numpy()[order]
        counts = grp["n"].to_numpy()[order]
        csum = np.concatenate([[0], np.cumsum(counts)])

        def node_count(prefix: str) -> int:
            # cells with this prefix form a contiguous range in sorted order
            lo = np.searchsorted(cells, prefix)
            hi = np.searchsorted(cells, prefix + "\x7f")
            return int(csum[hi] - csum[lo]), lo, hi

        stack = [""]
        while stack:
            prefix = stack.pop()
            lvl = len(prefix)
            n, lo, hi = node_count(prefix)
            if n == 0:
                continue
            if (n <= max_per_file and lvl >= 1) or lvl >= MAX_LEVEL:
                out_rows.append((*key_vals, prefix, n))
                continue
            children = np.unique(
                np.frompyfunc(lambda s: s[: lvl + 1], 1, 1)(cells[lo:hi])
            )
            stack.extend(children[::-1].tolist())
    schema = (
        ", ".join(f"{k} string" for k in keys) + (", " if keys else "")
    ) + "cell string, n_rows long"
    return spark.createDataFrame(out_rows, schema)


def tag_cells(
    df: DataFrame, plan: DataFrame, keys: list[str] | None = None
) -> DataFrame:
    """Tag each row with its leaf cell via a broadcast HASH equi-join.

    Leaf cells live at quadkey prefix levels 1..MAX_LEVEL, so each row is
    exploded into its <=12 ancestor prefixes and inner-joined against the
    (broadcast) plan on ``prefix = cell`` plus key equality. Leaves are
    prefix-disjoint within a key group, so each covered row matches exactly
    one plan entry; rows whose cells are absent from ``plan`` (e.g. already
    committed on resume) simply drop out.

    Scale: plan size affects only the broadcast hash table — never codegen
    (the old path chained one ``startswith``/``when`` branch per cell, which
    blows up Catalyst at ~10^5 planet-scale leaves) and never a nested-loop
    probe (O(rows x cells) compares). Probe cost is O(12 x rows) hash lookups.
    Extra plan columns (e.g. ``n_rows``) pass through onto each tagged row.
    """
    keys = keys or []
    prefixes = F.array_distinct(
        F.expr(
            f"transform(sequence(1, {MAX_LEVEL}), l -> substring(quadkey, 1, l))"
        )
    )
    exploded = df.withColumn("cell", F.explode(prefixes))
    return exploded.join(F.broadcast(plan), on=[*keys, "cell"], how="inner")


def apply_partition_plan(
    df: DataFrame, plan: DataFrame, keys: list[str] | None = None
) -> DataFrame:
    """Tag each row with its leaf cell (broadcast hash join via
    :func:`tag_cells`) and return the DataFrame hash-partitioned by cell,
    quadkey-sorted within partitions — the reference's `ORDER BY quadkey`
    clustered write (overture/partition.py:149,182) without a global sort."""
    keys = keys or []
    tagged = tag_cells(df, plan.select(*keys, "cell"), keys)
    return tagged.repartition(F.col("cell")).sortWithinPartitions("quadkey")
