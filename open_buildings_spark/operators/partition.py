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

from ..functions import cell_at

MAX_LEVEL = 12


def cell_histogram(df: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """One-pass per-z12-cell row counts: groupBy(quadkey[, keys]).count()."""
    keys = keys or []
    return df.groupBy(*keys, F.substring("quadkey", 1, MAX_LEVEL).alias("qk12")).agg(
        F.count("*").alias("n")
    )


def partition_plan(
    df: DataFrame, max_per_file: int, keys: list[str] | None = None
) -> DataFrame:
    """Leaf-cell plan: (keys..., cell, n_rows) with reference split semantics.

    Implemented entirely as DataFrame ops over the (small) z12 histogram:
    for each level l, a cell is a LEAF iff its own count <= max_per_file and
    every ancestor's count > max_per_file (or l == 1). Cells still over the
    cap at level 12 become level-12 leaves.
    """
    keys = keys or []
    hist = cell_histogram(df, keys).cache()

    level_counts = []
    for lvl in range(1, MAX_LEVEL + 1):
        level_counts.append(
            hist.groupBy(*keys, cell_at(F.col("qk12"), lvl).alias("cell"))
            .agg(F.sum("n").alias("n"))
            .withColumn("lvl", F.lit(lvl))
        )
    allc = level_counts[0]
    for lc in level_counts[1:]:
        allc = allc.unionByName(lc)

    parent = allc.select(
        *keys,
        F.col("cell").alias("pcell"),
        F.col("lvl").alias("plvl"),
        F.col("n").alias("pn"),
    )
    joined = allc.join(
        parent,
        on=[allc[k] == parent[k] for k in keys]
        + [
            parent["plvl"] == allc["lvl"] - 1,
            parent["pcell"] == F.expr(f"substring(cell, 1, lvl - 1)"),
        ]
        if keys
        else [
            parent["plvl"] == allc["lvl"] - 1,
            parent["pcell"] == F.expr("substring(cell, 1, lvl - 1)"),
        ],
        how="left",
    ).select(*[allc[k] for k in keys], "cell", "lvl", "n", "pn")

    leaves = joined.filter(
        ((F.col("n") <= max_per_file) | (F.col("lvl") == MAX_LEVEL))
        & ((F.col("lvl") == 1) | (F.col("pn") > max_per_file))
    )
    # a level-12 over-cap leaf and a level-12 at-cap leaf are both leaves; dedup
    return leaves.select(*keys, "cell", F.col("n").alias("n_rows")).distinct()


def apply_partition_plan(
    df: DataFrame, plan: DataFrame, keys: list[str] | None = None
) -> DataFrame:
    """Tag each row with its leaf cell (broadcast prefix-match join) and
    return the DataFrame hash-partitioned by cell, quadkey-sorted within
    partitions — the reference's `ORDER BY quadkey` clustered write
    (overture/partition.py:149,182) without a global sort."""
    keys = keys or []
    plan_small = F.broadcast(plan.select(*keys, "cell"))
    cond = [F.col("quadkey").startswith(plan_small["cell"])]
    for key in keys:
        cond.append(df[key] == plan_small[key])
    import functools

    tagged = df.join(plan_small, functools.reduce(lambda a, b: a & b, cond), "left")
    return tagged.repartition(F.col("cell")).sortWithinPartitions("quadkey")
