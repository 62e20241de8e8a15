"""S2 as a first-class cell provider for the iceberg_lite table layer.

Round-5 left S2 serving on a bespoke sidecar layout (operators/s2scan.py)
parallel to the table engine, so the fastest serve in the suite forfeited
snapshots, time travel, keyed maintenance and compaction. This module
closes that: an S2 table IS an iceberg_lite table whose routing column
holds S2 KEY STRINGS (geo/s2.py key_strings — face digit + one base-4
Hilbert digit per level) instead of mercator quadkeys. Because those
strings are prefix-hierarchical (ancestor = prefix) and lexicographically
ordered like the numeric cell id, every piece of the engine works
unchanged and for the same reason it works on quadkeys:

- the adaptive partition planner splits dense cells by substring depth,
- manifests prune on cell-prefix overlap,
- files sort by the key, so a window's pushed ``startswith`` cover
  predicates prune parquet row groups via string min/max stats (the
  string twin of s2scan's OR-of-BETWEEN on the numeric id),
- append/upsert/delete/compact/expire and time travel are byte-for-byte
  the same code paths (tag_cells routes on prefix equality).

The manifest records ``cell_provider: s2`` + the key level so maintenance
batches and readers can't silently mix providers. The reference's
partitioner is one engine over one cell scheme (overture/partition.py:
155-187); this keeps ours one engine over two.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..geo import s2
from . import iceberg_lite

KEY_LEVEL = 14  # default key depth: ~600 m cells, 15-char keys


def add_s2_key(
    df: DataFrame,
    level: int = KEY_LEVEL,
    lon_col: str = "lon",
    lat_col: str = "lat",
    key_col: str = "quadkey",
) -> DataFrame:
    """Add (or replace) the table routing column with the S2 key string of
    each row's (lon, lat). The column keeps the engine-wide routing name
    (``quadkey`` — the table layer's historical column name for "the
    cell-provider sort key") so every downstream path applies unchanged."""
    from ..udfs import make_s2_key

    cols = [c for c in df.columns if c != key_col]
    return df.select(
        *cols, make_s2_key(level)(F.col(lon_col), F.col(lat_col)).alias(key_col)
    )


def write_s2_table(
    df: DataFrame,
    root: str,
    max_per_file: int,
    level: int = KEY_LEVEL,
    keys: list[str] | None = None,
    lon_col: str = "lon",
    lat_col: str = "lat",
    **kwargs,
) -> dict:
    """Build an S2-layout iceberg_lite table: enrich with the S2 key and
    run the standard adaptive-cell partitioned write (snapshots, resume,
    salted dense cells — table/iceberg_lite.py write_partitioned).
    ``store_anchor_offset`` is forced off: that metric decodes the routing
    column as a MERCATOR tile, which an S2 key is not."""
    g = add_s2_key(df, level=level, lon_col=lon_col, lat_col=lat_col)
    opts = provider_write_opts(level)
    extra = dict(kwargs.pop("extra_metrics", None) or {})
    extra.update(opts.pop("extra_metrics"))
    return iceberg_lite.write_partitioned(
        g,
        root,
        max_per_file,
        keys=keys,
        extra_metrics=extra,
        **opts,
        **kwargs,
    )


def provider_write_opts(level: int) -> dict:
    """THE single definition of "what stamps a table as an S2 layout":
    the provider metrics table_key_level()/window_read key off, plus
    store_anchor_offset=False (that metric decodes the routing column as
    a MERCATOR tile, which an S2 key is not). Shared by write_s2_table
    and the streaming ingest so the two build paths cannot drift."""
    return {
        "store_anchor_offset": False,
        "extra_metrics": {"cell_provider": "s2", "s2_key_level": int(level)},
    }


def table_key_level(root: str) -> int:
    """The S2 key level a table was built with (raises on non-S2 tables —
    a mercator-quadkey table pruned with S2 cover prefixes would silently
    return garbage)."""
    m = iceberg_lite.current_manifest(root)
    if m is None:
        raise FileNotFoundError(f"no committed snapshot at {root}")
    metrics = m.get("metrics", {})
    if metrics.get("cell_provider") != "s2":
        raise ValueError(
            f"table at {root} is not an S2 layout "
            f"(cell_provider={metrics.get('cell_provider', 'quadkey')!r})"
        )
    return int(metrics["s2_key_level"])


def cover_prefixes(
    w: float, s: float, e: float, n: float, cover_level: int
) -> list[str]:
    """Conservative S2 cover of the window as key-string prefixes."""
    ids = s2.cover_bbox(w, s, e, n, cover_level)
    import numpy as np

    return [str(k) for k in s2.key_strings(np.asarray(ids, np.int64), cover_level)]


def window_read(
    spark: SparkSession,
    root: str,
    w: float,
    s: float,
    e: float,
    n: float,
    cover_level: int = 8,
    lon_col: str = "lon",
    lat_col: str = "lat",
    snapshot_id: int | None = None,
    max_cover_cells: int = 64,
    **key_filters: str,
) -> DataFrame:
    """Exact window serve off an S2 table: cover prefixes -> manifest cell
    pruning (read_table) -> pushed ``startswith`` cover predicate (parquet
    row-group pruning on the sorted key's string stats) -> exact native
    lon/lat refine. Time travel and hive-key filters pass straight
    through to read_table — the whole point of being one engine.

    ``cover_level`` clamps two ways, both exactness-preserving because
    the lon/lat refine decides membership: to the table's stored key
    level (a deeper cover emits prefixes LONGER than every stored key,
    matches no row, and would silently return empty — the cliff the
    spatial joins guard), and COARSER until the cover holds at most
    ``max_cover_cells`` prefixes (a big window at a fine level covers
    thousands of cells; a thousand-term OR both overflows the plan-tree
    stack and bloats the pushed filter list)."""
    cover_level = min(cover_level, table_key_level(root))  # provider guard too
    prefixes = cover_prefixes(w, s, e, n, cover_level)
    while len(prefixes) > max_cover_cells and cover_level > 0:
        cover_level -= 1
        prefixes = cover_prefixes(w, s, e, n, cover_level)
    df = iceberg_lite.read_table(
        spark, root, quadkey_prefix=prefixes, snapshot_id=snapshot_id,
        **key_filters,
    )
    cov = None
    for p in prefixes:
        term = F.col("quadkey").startswith(p)
        cov = term if cov is None else cov | term
    if cov is not None:
        df = df.where(cov)
    return df.where(
        (F.col(lon_col) >= F.lit(float(w)))
        & (F.col(lon_col) <= F.lit(float(e)))
        & (F.col(lat_col) >= F.lit(float(s)))
        & (F.col(lat_col) <= F.lit(float(n)))
    )


def ingest_stream_to_s2_table(
    spark: SparkSession,
    docs_dir: str,
    table_root: str,
    checkpoint_dir: str,
    level: int = KEY_LEVEL,
    max_per_file: int = 200_000,
    max_files_per_trigger: int = 4,
):
    """Structured-Streaming ingest straight into an S2-layout table — the
    last table-surface the quadkey layout had exclusively. Same
    exactly-once contract as streaming/geo.py ingest_to_table (checkpoint
    replay + the manifest batch-id guard); the per-batch transform
    re-keys the enriched stream with the S2 key string, and the bootstrap
    stamps the provider metrics so every later maintenance call and
    window read recognizes the layout. Returns the streaming query."""
    from ..streaming.geo import ingest_to_table

    return ingest_to_table(
        spark,
        docs_dir,
        table_root,
        checkpoint_dir,
        max_per_file=max_per_file,
        max_files_per_trigger=max_files_per_trigger,
        transform=lambda df: add_s2_key(df, level=level),
        write_opts=provider_write_opts(level),
    )
