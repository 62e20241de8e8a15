"""Iceberg-style table layer: parquet data files + JSON manifest metadata.

No Iceberg jar exists in this sandbox, so the engine implements the subset of
Iceberg semantics the north_rule needs, over plain ``spark.read/write.parquet``:

- **snapshots**: ``metadata/v{N}.json`` manifests, each listing data files
  with per-file partition values, row counts and quadkey bounds;
- **atomic commit**: manifest written to a temp file then ``os.replace``'d,
  then the ``VERSION`` pointer swapped the same way (single-writer);
- **partition pruning**: readers plan the file list from the manifest
  (quadkey-prefix and key-equality predicates) before Spark ever lists
  a directory — the reference gets this from hive partitioning + quadkey
  file clustering (open_buildings/settings.py:26-35, overture/partition.py);
- **resume**: per-partition lineage (cell -> files, row counts) means a
  killed build job recomputes only uncommitted cells — the reference's
  skip-if-exists file gates (overture/partition.py:146-147,172-174)
  expressed as manifest state (P10).

Determinism: manifests carry a monotone snapshot counter, no wall-clock.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _meta_dir(root: str) -> str:
    return os.path.join(root, "metadata")


def _version_file(root: str) -> str:
    return os.path.join(_meta_dir(root), "VERSION")


def current_manifest(root: str) -> dict | None:
    vf = _version_file(root)
    if not os.path.exists(vf):
        return None
    with open(vf) as f:
        v = f.read().strip()
    with open(os.path.join(_meta_dir(root), v)) as f:
        return json.load(f)


def _commit_manifest(root: str, manifest: dict) -> None:
    """Atomic: temp-write manifest, rename, then swap the VERSION pointer."""
    os.makedirs(_meta_dir(root), exist_ok=True)
    name = f"v{manifest['snapshot_id']}.json"
    tmp = os.path.join(_meta_dir(root), f".{name}.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(_meta_dir(root), name))
    vtmp = _version_file(root) + ".tmp"
    with open(vtmp, "w") as f:
        f.write(name)
    os.replace(vtmp, _version_file(root))


def committed_cells(root: str, keys: list[str] | None = None) -> set:
    m = current_manifest(root)
    if m is None:
        return set()
    keys = keys or []
    out = set()
    for part in m["partitions"]:
        out.add(tuple(part["values"].get(k) for k in keys) + (part["cell"],))
    return out


def _manifest_keys(m: dict) -> list[str]:
    """Partition key columns of a table, in hive-directory order. Stored
    explicitly since r4 (``m['keys']``); older manifests fall back to the
    insertion-ordered ``values`` dict of any keyed partition."""
    if "keys" in m:
        return m["keys"]
    for p in m["partitions"]:
        if p["values"]:
            return list(p["values"].keys())
    return []


def _part_dir(data_dir: str, keys: list[str], values: dict, cell: str) -> str:
    """Hive directory of one partition: data/<k>=<v>/.../cell=<c>."""
    d = data_dir
    for k in keys:
        d = os.path.join(d, f"{k}={values[k]}")
    return os.path.join(d, f"cell={cell}")


def _part_key(part: dict, keys: list[str]) -> tuple:
    return tuple(part["values"].get(k) for k in keys) + (part["cell"],)


def _rows_per_file(
    paths: list[str], spark: SparkSession | None = None
) -> list[int]:
    """Exact per-file row counts from the parquet footers, stored in the
    manifest as ``file_rows`` so compaction can find individual over-cap
    files — the per-cell aggregate can't see 999+1 skew. Metadata-only
    reads: small commits read at the driver; above a threshold (a planet
    build's final commit can reference 10^5+ files) the footer reads fan
    out as one Spark job."""
    import pyarrow.parquet as pq

    if spark is not None and len(paths) > 256:
        def read_meta(it):
            import pandas as pd

            for pdf in it:
                yield pd.DataFrame(
                    {
                        "path": pdf["path"],
                        "n": [
                            pq.ParquetFile(p).metadata.num_rows
                            for p in pdf["path"]
                        ],
                    }
                )

        pdf = (
            spark.createDataFrame([(p,) for p in paths], "path string")
            .repartition(min(len(paths) // 64 + 1, 64))
            .mapInPandas(read_meta, "path string, n long")
            .toPandas()
        )
        by_path = dict(zip(pdf["path"], pdf["n"]))
        return [int(by_path[p]) for p in paths]
    return [pq.ParquetFile(p).metadata.num_rows for p in paths]


def _keyed_reader(spark: SparkSession, m: dict, keys: list[str], root: str):
    """Reader for a KEYED table's files: explicit schema with the key
    columns (and ``cell``) as strings plus ``basePath``, so Spark recovers
    the hive-directory values verbatim — inference would coerce '0300' to
    the integer 300. Caller must ``.drop('cell')``."""
    if not m.get("schema"):
        raise ValueError(
            f"keyed table at {root} has no stored schema; rewrite it"
        )
    from pyspark.sql.types import StringType, StructField, StructType

    fields = [
        f for f in _schema_struct(m).fields if f.name not in keys
    ] + [StructField(k, StringType(), True) for k in keys] + [
        StructField("cell", StringType(), True)
    ]
    return spark.read.schema(StructType(fields)).option(
        "basePath", os.path.join(root, "data")
    )


def _check_key_types(df: DataFrame, keys: list[str]) -> None:
    """Partition key columns must be STRING-typed: the hive layout stores
    key values as directory-name text and :func:`_keyed_reader` recovers
    them as strings verbatim, so a non-string key column would silently
    change type on read and then type-clash (or coerce) when a later
    merge unions recovered survivors with a batch. Refuse up front."""
    bad = [
        f"{f.name} ({f.dataType.simpleString()})"
        for f in df.schema.fields
        if f.name in keys and f.dataType.simpleString() != "string"
    ]
    if bad:
        raise ValueError(
            "partition key columns must be string-typed (hive directory "
            f"values read back as strings): cast {', '.join(bad)} to "
            "string first"
        )


def write_partitioned(
    df: DataFrame,
    root: str,
    max_per_file: int,
    keys: list[str] | None = None,
    cells_per_commit: int = 0,
    fail_after_commits: int = -1,
    store_anchor_offset: bool = True,
    extra_metrics: dict | None = None,
) -> dict:
    """Adaptive-cell partitioned write with manifest commits.

    1. plan leaf cells (one-pass histogram, reference split semantics),
    2. skip cells already committed (resume),
    3. tag rows with their leaf cell, hash-partition by cell, write one
       parquet directory per cell, quadkey-sorted within files (the
       reference's ORDER BY quadkey clustered write),
    4. commit the manifest atomically every ``cells_per_commit`` cells
       (0 = single commit at the end).

    ``fail_after_commits`` >= 0 raises after that many commits — the
    kill/resume test hook. ``extra_metrics`` merges into the FINAL
    commit's metrics only (never intermediate group commits), so a caller
    can stamp bookkeeping — e.g. the streaming bootstrap's
    ``last_append_batch_id`` — atomically with the data becoming visible.
    Returns the final manifest.
    """
    from ..operators.partition import partition_plan

    keys = keys or []
    if keys:
        _check_key_types(df, keys)
    plan = partition_plan(df, max_per_file, keys).collect()
    done = committed_cells(root, keys)
    pending = [
        r
        for r in plan
        if (tuple(r[k] for k in keys) + (r["cell"],)) not in done
    ]
    m = current_manifest(root)
    if m is None:
        m = {
            "snapshot_id": 0,
            "parent_id": None,
            "keys": keys,
            "partitions": [],
            "metrics": {"rows_written": 0, "recomputed_cells": 0},
        }
    elif _manifest_keys(m) != keys:
        raise ValueError(
            f"table at {root} is partitioned by {_manifest_keys(m)}, "
            f"not {keys}"
        )

    if not pending:
        return m

    groups: list[list] = (
        [pending]
        if cells_per_commit <= 0
        else [
            pending[i : i + cells_per_commit]
            for i in range(0, len(pending), cells_per_commit)
        ]
    )
    data_dir = os.path.join(root, "data")
    os.makedirs(data_dir, exist_ok=True)
    commits = 0
    # per-snapshot schema (data files only: partition key columns and the
    # cell live in directory names) — the schema-evolution anchor
    data_schema = [
        f.jsonValue() for f in df.schema.fields if f.name not in keys
    ]
    from ..operators.partition import tag_cells

    spark = df.sparkSession
    plan_schema = _plan_schema(keys, ", n_rows long")
    for group in groups:
        # Tag rows with their leaf cell via a broadcast hash equi-join on
        # quadkey-prefix = cell (tag_cells). The inner join doubles as the
        # pending-cells filter: rows of already-committed cells match no
        # plan entry and drop out. Plan size stays out of codegen — the
        # previous per-cell startswith/when chains were O(#cells) Catalyst
        # expressions, fatal at planet scale (~10^5-10^6 leaves).
        group_df = spark.createDataFrame(
            [tuple(r[k] for k in keys) + (r["cell"], r["n_rows"]) for r in group],
            plan_schema,
        )
        sub = tag_cells(df, group_df, keys)
        # Salted repartitioning for over-dense cells (north_rule): a z12
        # cell denser than max_per_file cannot be split spatially any
        # further (the reference would loop forever on it), so its rows are
        # sharded across ceil(n/max_per_file) writer tasks by a doc-hash
        # salt — bounding BOTH the task size (no straggler writes a
        # megacity alone) and the output file size. Normal cells get
        # salt 0 and behave exactly as before. n_rows rides in from the
        # plan join, so the salt is one expression, not a per-cell chain.
        shards = F.ceil(F.col("n_rows") / F.lit(max_per_file)).cast("int")
        sub = sub.withColumn(
            "_salt",
            F.when(
                F.col("n_rows") > max_per_file,
                F.pmod(F.hash(F.col("doc_id")), shards),
            ).otherwise(F.lit(0)),
        ).drop("n_rows")
        # snapshot immutability: files are only ever ADDED (append mode +
        # job-unique part names); the manifest's per-cell file list is the
        # diff of the cell dir across the job, so files from an earlier
        # KILLED (uncommitted) attempt are never referenced — they sit
        # orphaned until expire_snapshots reclaims them, and every older
        # snapshot keeps reading exactly the files it committed.
        pre_files: dict[str, set] = {}
        for r in group:
            part_dir = data_dir
            for k in keys:
                part_dir = os.path.join(part_dir, f"{k}={r[k]}")
            part_dir = os.path.join(part_dir, f"cell={r['cell']}")
            pre_files[part_dir] = set(glob.glob(os.path.join(part_dir, "*.parquet")))
        # explicit partition count: ceil(rows/max_per_file) writer tasks at
        # minimum — an explicit repartition(n, ...) is exempt from AQE
        # partition coalescing, which would otherwise merge the salt shards
        # right back into one oversized task
        shuffle_parts = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
        n_writers = max(shuffle_parts, -(-sum(r["n_rows"] for r in group) // max_per_file))
        (
            sub.repartition(
                n_writers, F.col("cell"), F.col("_salt"), *[F.col(k) for k in keys]
            )
            # sort by (partition cols, quadkey): the dynamic-partition writer
            # requires rows grouped by partition cols and would inject its
            # own quadkey-destroying sort otherwise; this way one sort gives
            # both the grouping and the reference's ORDER BY quadkey
            # clustering (overture/partition.py:149,182)
            .sortWithinPartitions(*keys, "cell", "quadkey")
            .drop("_salt")
            # append, never overwrite: Spark's dynamic-partition overwrite
            # would delete the files older snapshots reference (in-place
            # rewrite broke time travel across resumes); part names carry
            # the job UUID so parallel/retried attempts cannot collide
            .write.mode("append")
            .partitionBy(*keys, "cell")
            .option("compression", "snappy")
            .parquet(data_dir)
        )
        group_files: list[list[str]] = []
        for r in group:
            part_dir = data_dir
            for k in keys:
                part_dir = os.path.join(part_dir, f"{k}={r[k]}")
            part_dir = os.path.join(part_dir, f"cell={r['cell']}")
            group_files.append(
                sorted(
                    set(glob.glob(os.path.join(part_dir, "*.parquet")))
                    - pre_files[part_dir]
                )
            )
        # one batched footer pass for the whole commit group (fans out as
        # a Spark job when the group wrote many files)
        flat = [p for fl in group_files for p in fl]
        flat_rows = iter(_rows_per_file(flat, spark))
        new_parts = []
        for r, files in zip(group, group_files):
            new_parts.append(
                {
                    "cell": r["cell"],
                    "values": {k: r[k] for k in keys},
                    "n_rows": r["n_rows"],
                    "files": [os.path.relpath(p, root) for p in files],
                    "file_rows": [next(flat_rows) for _ in files],
                }
            )
        is_final_group = group is groups[-1]
        m = {
            "snapshot_id": m["snapshot_id"] + 1,
            "parent_id": m["snapshot_id"],
            "keys": keys,
            "schema": data_schema,
            "partitions": m["partitions"] + new_parts,
            "metrics": {
                **m["metrics"],
                "rows_written": m["metrics"]["rows_written"]
                + sum(r["n_rows"] for r in group),
                "recomputed_cells": m["metrics"]["recomputed_cells"] + len(group),
                "max_per_file": max_per_file,
                # final commit only: a partially-committed build must not
                # carry caller bookkeeping that marks it complete
                **(extra_metrics if is_final_group and extra_metrics else {}),
            },
        }
        if is_final_group and store_anchor_offset:
            data_cols = set(df.columns) - set(keys) - {"cell"}
            files = [
                os.path.join(root, f) for p in m["partitions"] for f in p["files"]
            ]
            if {"quadkey", "lon", "lat"} <= data_cols and files:
                # kNN exactness metric (corpus_anchor_offset_m): one
                # column-pruned scan of the written files, FOLDED INTO the
                # final commit's manifest (committing it after would mutate
                # an already-committed snapshot in place, and a crash
                # between the two commits would leave a complete table
                # permanently missing the metric)
                from ..operators.knn import corpus_anchor_offset_m

                m["metrics"]["max_anchor_offset_m"] = corpus_anchor_offset_m(
                    spark.read.parquet(*files)
                )
        _commit_manifest(root, m)
        commits += 1
        if fail_after_commits >= 0 and commits >= fail_after_commits:
            raise RuntimeError(f"injected failure after {commits} commits")
    return m


def append_rows(
    df: DataFrame,
    root: str,
    batch_id: int | None = None,
    max_per_file: int | None = None,
) -> dict:
    """Append NEW rows to an existing table as a new snapshot —
    the streaming-ingest write path (:mod:`..streaming.geo.ingest_to_table`
    calls this from ``foreachBatch``). ``write_partitioned`` is a *build*
    primitive: it skips already-committed cells entirely (resume), silently
    dropping late rows that land in them; appends instead ROUTE every row:

    - rows covered by an existing leaf cell append files to that cell
      (longest-prefix routing via the same broadcast hash equi-join as
      ``tag_cells`` — plan size O(1) in cell count);
    - rows outside every existing leaf (new geography) open their z12
      quadkey as a new leaf cell. z12 cells are never proper prefixes of
      leaves, so the routing plan stays prefix-disjoint and each row
      matches exactly one entry.

    Keyed (hive ``country_iso=XX``-style) tables route per key group: the
    batch must carry the partition key columns, and (key values, cell)
    addresses the directory ``data/<k>=<v>/cell=<c>/`` — the reference's
    primary archive layout (overture/partition.py:168-170). A key value
    never seen before simply opens its own z12 leaves.

    Every batch row MUST route: rows whose quadkey is NULL (or whose key
    columns are NULL) would silently vanish through the inner routing
    join, so the batch count is compared with the routed count and a
    mismatch raises (mirrors ``upsert_rows``'s guard).

    Snapshot immutability holds: files are only ever ADDED (job-unique part
    names, pre/post directory diff per touched cell), the manifest diff is
    per-cell ``files`` + ``n_rows``, and older snapshots keep reading
    exactly their own files. Fragmentation from many micro-batches is
    reclaimed by :func:`compact_cells`.

    ``batch_id`` makes replays idempotent (exactly-once for a single
    streaming writer): if ``batch_id <= metrics['last_append_batch_id']``
    the micro-batch already committed — a crashed run whose checkpoint
    lagged its table commit re-delivers the batch and this no-ops. A
    mid-append crash leaves only unreferenced files (expire_snapshots
    reclaims them) and the replay re-appends cleanly.
    """
    from ..operators.partition import tag_cells

    m = current_manifest(root)
    if m is None:
        raise FileNotFoundError(f"no committed snapshot at {root}")
    keys = _manifest_keys(m)
    last = m["metrics"].get("last_append_batch_id")
    if batch_id is not None and last is not None and batch_id <= last:
        return m  # replayed micro-batch: already committed
    if m.get("schema"):
        allowed = {f["name"] for f in m["schema"]} | set(keys)
        extra = set(df.columns) - allowed
        if extra:
            raise ValueError(
                f"append columns {sorted(extra)} not in table schema; "
                f"add_column first"
            )
    missing = set(keys) - set(df.columns)
    if missing:
        raise ValueError(
            f"append batch missing partition key columns {sorted(missing)}"
        )
    if keys:
        _check_key_types(df, keys)
    cap = (
        max_per_file
        if max_per_file is not None
        else m.get("metrics", {}).get("max_per_file")
    )
    spark = df.sparkSession
    data_dir = os.path.join(root, "data")

    _, plan = _routing_plan(spark, m, df, keys)
    tagged = tag_cells(df, plan, keys).persist()
    try:
        n_batch = df.count()
        counts = {
            tuple(r[k] for k in keys) + (r["cell"],): r["n"]
            for r in tagged.groupBy(*keys, "cell")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        if sum(counts.values()) != n_batch:
            raise ValueError(
                f"{n_batch - sum(counts.values())} append rows have a NULL "
                "or un-routable quadkey or partition key; refusing (the "
                "inner routing join would silently drop them)"
            )
        if not counts:
            if batch_id is None:
                return m
            m2 = {
                **m,
                "snapshot_id": m["snapshot_id"] + 1,
                "parent_id": m["snapshot_id"],
                "metrics": {**m["metrics"], "last_append_batch_id": batch_id},
            }
            _commit_manifest(root, m2)
            return m2
        pre_files = {
            ck: set(
                glob.glob(
                    os.path.join(
                        _part_dir(data_dir, keys, dict(zip(keys, ck)), ck[-1]),
                        "*.parquet",
                    )
                )
            )
            for ck in counts
        }
        _write_cells_salted(tagged, counts, cap, data_dir, keys)
    finally:
        tagged.unpersist()
    by_ck = {_part_key(p, keys): p for p in m["partitions"]}
    parts = [dict(p) for p in m["partitions"]]
    appended_files: list[str] = []
    # one BATCHED footer pass for the whole commit (fans out as a Spark
    # job past the threshold) — per-cell serial driver reads would stall
    # a wide append exactly the way _rows_per_file's docstring warns
    new_files: dict[tuple, list[str]] = {}
    backfill: dict[tuple, list[str]] = {}
    for ck in counts:
        pdir = _part_dir(data_dir, keys, dict(zip(keys, ck)), ck[-1])
        new_files[ck] = sorted(
            set(glob.glob(os.path.join(pdir, "*.parquet"))) - pre_files[ck]
        )
        if ck in by_ck and by_ck[ck].get("file_rows") is None:
            # opportunistic backfill for pre-r4 manifests, bounded by the
            # files of the cells this batch touches
            backfill[ck] = [os.path.join(root, f) for f in by_ck[ck]["files"]]
    flat = [p for ck in counts for p in new_files[ck]] + [
        p for fl in backfill.values() for p in fl
    ]
    it = iter(_rows_per_file(flat, spark))
    frows_by = {ck: [next(it) for _ in new_files[ck]] for ck in counts}
    bf_by = {ck: [next(it) for _ in fl] for ck, fl in backfill.items()}
    for ck, n in counts.items():
        files = new_files[ck]
        rel = [os.path.relpath(p, root) for p in files]
        frows = frows_by[ck]
        appended_files.extend(os.path.join(root, f) for f in rel)
        if ck in by_ck:
            tgt = next(p for p in parts if _part_key(p, keys) == ck)
            old_fr = tgt.get("file_rows")
            if old_fr is None:
                old_fr = bf_by[ck]
            tgt["files"] = tgt["files"] + rel
            tgt["file_rows"] = old_fr + frows
            tgt["n_rows"] = tgt["n_rows"] + n
        else:
            parts.append(
                {
                    "cell": ck[-1],
                    "values": dict(zip(keys, ck)),
                    "n_rows": n,
                    "files": rel,
                    "file_rows": frows,
                }
            )
    metrics2 = {
        **m["metrics"],
        "rows_written": m["metrics"]["rows_written"] + sum(counts.values()),
        # a manual append (batch_id=None) must NOT reset the streaming
        # replay watermark — clobbering it to null would let a crashed
        # stream re-deliver its last batch past the exactly-once guard
        "last_append_batch_id": batch_id if batch_id is not None else last,
        "appended_batches": m["metrics"].get("appended_batches", 0) + 1,
    }
    # keep the kNN exactness bound current: max with the appended files'
    # own offset (one column-pruned scan of JUST the new files)
    if "max_anchor_offset_m" in m["metrics"] and appended_files:
        from ..operators.knn import corpus_anchor_offset_m

        metrics2["max_anchor_offset_m"] = max(
            m["metrics"]["max_anchor_offset_m"],
            corpus_anchor_offset_m(spark.read.parquet(*appended_files)),
        )
    m2 = {
        **{k: v for k, v in m.items() if k in ("schema", "keys")},
        "snapshot_id": m["snapshot_id"] + 1,
        "parent_id": m["snapshot_id"],
        "partitions": parts,
        "metrics": metrics2,
    }
    _commit_manifest(root, m2)
    return m2


def _plan_schema(keys: list[str], extra: str = "") -> str:
    return (
        ", ".join(f"{k} string" for k in keys) + (", " if keys else "")
    ) + "cell string" + extra


def _write_cells_salted(
    df: DataFrame,
    counts: dict,
    cap: int | None,
    data_dir: str,
    keys: list[str] | None = None,
) -> None:
    """Append tagged rows into hive ``<k>=<v>/cell=<c>`` dirs honoring the
    per-file row cap via the same data-driven salting as
    ``write_partitioned``: partitions over the cap shard into ceil(n/cap)
    doc-hash buckets so no single writer task (and no expected output file)
    exceeds the cap — without it, repartition-by-cell funnels a dense
    cell's whole append into ONE task and one oversized file. Shared by
    :func:`append_rows`, :func:`upsert_rows` and :func:`delete_rows`
    (rows must carry ``doc_id`` for the salt). ``counts`` is keyed by
    (key values..., cell) tuples."""
    keys = keys or []
    spark = df.sparkSession
    on = [*keys, "cell"]
    if cap:
        over = [(*ck, -(-n // cap)) for ck, n in counts.items() if n > cap]
        if over:
            shards_df = F.broadcast(
                spark.createDataFrame(over, _plan_schema(keys, ", _shards int"))
            )
            df = (
                df.join(shards_df, on, "left")
                .withColumn(
                    "_salt",
                    F.when(
                        F.col("_shards").isNotNull(),
                        F.pmod(F.hash(F.col("doc_id")), F.col("_shards")),
                    ).otherwise(F.lit(0)),
                )
                .drop("_shards")
            )
        else:
            df = df.withColumn("_salt", F.lit(0))
        n_writers = max(1, -(-sum(counts.values()) // cap))
        df = df.repartition(
            n_writers, F.col("cell"), F.col("_salt"), *[F.col(k) for k in keys]
        ).drop("_salt")
    else:
        n_writers = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
        df = df.repartition(n_writers, F.col("cell"), *[F.col(k) for k in keys])
    (
        df.sortWithinPartitions(*keys, "cell", "quadkey")
        .write.mode("append")
        .partitionBy(*keys, "cell")
        .option("compression", "snappy")
        .parquet(data_dir)
    )


def _routing_plan(
    spark: SparkSession, m: dict, df: DataFrame, keys: list[str] | None = None
):
    """(existing-cells df, routing plan df) for a batch of rows: existing
    (key values, leaf) partitions plus a new z12 leaf for every batch
    (key values, quadkey) outside all of them (z12 cells are never proper
    prefixes of leaves, so the plan stays prefix-disjoint per key group and
    every row matches exactly one entry). A never-seen key value opens its
    own z12 leaves. Shared by :func:`append_rows` and :func:`upsert_rows`."""
    from ..operators.partition import tag_cells

    keys = keys or []
    cells_df = spark.createDataFrame(
        [_part_key(p, keys) for p in m["partitions"]], _plan_schema(keys)
    )
    batch12 = df.select(
        *keys, F.substring("quadkey", 1, 12).alias("quadkey")
    ).distinct()
    covered = tag_cells(batch12, cells_df, keys).select(*keys, "quadkey")
    new_cells = batch12.join(covered, [*keys, "quadkey"], "left_anti").select(
        *keys, F.col("quadkey").alias("cell")
    )
    return cells_df, cells_df.unionByName(new_cells)


def _read_partitions(
    spark: SparkSession, root: str, m: dict, parts: list[dict]
) -> DataFrame:
    """Scan of exactly the given manifest partitions' files (keyed tables
    recover their key columns from the directory names; ``cell`` is NOT
    exposed — re-derive with ``tag_cells`` where needed)."""
    files = [os.path.join(root, f) for p in parts for f in p["files"]]
    keys = _manifest_keys(m)
    if keys:
        return _keyed_reader(spark, m, keys, root).parquet(*files).drop("cell")
    reader = spark.read
    if m.get("schema"):
        reader = reader.schema(_schema_struct(m))
    return reader.parquet(*files)


def upsert_rows(
    df: DataFrame,
    root: str,
    key: str = "doc_id",
    max_per_file: int | None = None,
) -> dict:
    """MERGE by key: rows of ``df`` REPLACE existing rows with the same
    ``key`` and new keys insert — Iceberg-style copy-on-write at cell
    granularity, in one new snapshot; older snapshots keep reading their
    original files (reclaim superseded ones with :func:`expire_snapshots`).

    Cells split two ways: REWRITE cells hold an old version of an upserted
    key (their survivors are re-read via a manifest-pruned scan of just
    those cells, anti-joined on the key set, and rewritten together with
    the new rows as NEW files); APPEND-ONLY cells merely receive brand-new
    keys and keep their existing files, gaining the new ones — no
    copy-on-write amplification for pure inserts.

    Keyed (hive) tables merge the same way: (partition key values, cell)
    addresses the directory, and a row whose key value CHANGES (a doc
    moving country) is found in its old partition, deleted there, and
    written under its new one — the full scan that locates old versions is
    key-agnostic.

    Guards (a MERGE must never corrupt the key invariant silently): the
    batch may not contain duplicate keys, and every batch row must route to
    a cell (a NULL/empty quadkey would otherwise delete the old version
    while the replacement vanishes).

    Scale shape: the upsert batch is small relative to the table, so its
    key set broadcasts; finding old versions is one manifest-planned scan
    with a broadcast semi-join (at 10^12 rows the dominant cost, bounded by
    a quadkey-prefix prune when the caller knows the affected geography);
    the rewrite scan reads only the rewrite cells' files.
    """
    from ..operators.partition import tag_cells

    m = current_manifest(root)
    if m is None:
        raise FileNotFoundError(f"no committed snapshot at {root}")
    part_keys = _manifest_keys(m)
    if m.get("schema"):
        allowed = {f["name"] for f in m["schema"]} | set(part_keys)
        extra = set(df.columns) - allowed
        if extra:
            raise ValueError(
                f"upsert columns {sorted(extra)} not in table schema; "
                f"add_column first"
            )
    missing = set(part_keys) - set(df.columns)
    if missing:
        raise ValueError(
            f"upsert batch missing partition key columns {sorted(missing)}"
        )
    if part_keys:
        _check_key_types(df, part_keys)
    cap = (
        max_per_file
        if max_per_file is not None
        else m.get("metrics", {}).get("max_per_file")
    )
    spark = df.sparkSession
    data_dir = os.path.join(root, "data")

    cells_df, plan = _routing_plan(spark, m, df, part_keys)
    tagged = tag_cells(df, plan, part_keys).persist()
    try:
        n_batch = df.count()
        n_dup_keys = (
            df.groupBy(key).count().filter(F.col("count") > 1).limit(1).count()
        )
        if n_dup_keys:
            raise ValueError(
                f"upsert batch contains duplicate {key} values; a MERGE "
                "source must be key-unique"
            )
        new_counts = {
            tuple(r[k] for k in part_keys) + (r["cell"],): r["n"]
            for r in tagged.groupBy(*part_keys, "cell")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        if sum(new_counts.values()) != n_batch:
            raise ValueError(
                f"{n_batch - sum(new_counts.values())} upsert rows have a "
                "NULL or un-routable quadkey or partition key; refusing "
                "(the old versions would be deleted with no replacement "
                "written)"
            )
        keys_df = df.select(key).distinct()
        # old versions can live under ANY partition (a row may change its
        # partition key value — e.g. a doc moving country), so the rewrite
        # set comes from a full manifest-planned scan with a broadcast
        # semi-join on the merge key
        old_all = tag_cells(read_table(spark, root), cells_df, part_keys)
        rewrite = sorted(
            tuple(r[k] for k in part_keys) + (r["cell"],)
            for r in old_all.join(F.broadcast(keys_df), key, "left_semi")
            .select(*part_keys, "cell")
            .distinct()
            .collect()
        )
        append_cells = sorted(set(new_counts) - set(rewrite))
        affected = sorted(set(rewrite) | set(new_counts))
        if not affected:
            return m
        if rewrite:
            rw_set = set(rewrite)
            rw_parts = [
                p for p in m["partitions"] if _part_key(p, part_keys) in rw_set
            ]
            survivors = tag_cells(
                _read_partitions(spark, root, m, rw_parts), cells_df, part_keys
            ).join(F.broadcast(keys_df), key, "left_anti")
            merged = survivors.unionByName(tagged.select(*survivors.columns))
        else:
            merged = tagged
        merged = merged.persist()
        counts = {
            tuple(r[k] for k in part_keys) + (r["cell"],): r["n"]
            for r in merged.groupBy(*part_keys, "cell")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        pre_files = {
            ck: set(
                glob.glob(
                    os.path.join(
                        _part_dir(data_dir, part_keys, dict(zip(part_keys, ck)), ck[-1]),
                        "*.parquet",
                    )
                )
            )
            for ck in affected
        }
        _write_cells_salted(merged, counts, cap, data_dir, part_keys)
        merged.unpersist()
    finally:
        tagged.unpersist()
    by_ck = {_part_key(p, part_keys): p for p in m["partitions"]}
    aff_set = set(affected)
    parts = [
        dict(p) for p in m["partitions"] if _part_key(p, part_keys) not in aff_set
    ]
    new_file_paths: list[str] = []
    # batched footer pass (see append_rows): never per-cell serial reads
    post_by: dict[tuple, list[str]] = {}
    backfill = {}
    for ck in affected:
        pdir = _part_dir(data_dir, part_keys, dict(zip(part_keys, ck)), ck[-1])
        post_by[ck] = sorted(
            set(glob.glob(os.path.join(pdir, "*.parquet"))) - pre_files[ck]
        )
        if (
            ck in append_cells
            and ck in by_ck
            and by_ck[ck].get("file_rows") is None
        ):
            backfill[ck] = [os.path.join(root, f) for f in by_ck[ck]["files"]]
    flat = [p for ck in affected for p in post_by[ck]] + [
        p for fl in backfill.values() for p in fl
    ]
    it = iter(_rows_per_file(flat, spark))
    frows_by = {ck: [next(it) for _ in post_by[ck]] for ck in affected}
    bf_by = {ck: [next(it) for _ in fl] for ck, fl in backfill.items()}
    for ck in affected:
        vals = dict(zip(part_keys, ck))
        post = post_by[ck]
        rel = [os.path.relpath(f, root) for f in post]
        frows = frows_by[ck]
        new_file_paths.extend(post)
        if ck in append_cells and ck in by_ck:
            prior = by_ck[ck]
            old_fr = prior.get("file_rows")
            if old_fr is None:
                old_fr = bf_by[ck]
            parts.append(
                {
                    **dict(prior),
                    "files": prior["files"] + rel,
                    "file_rows": old_fr + frows,
                    "n_rows": prior["n_rows"] + counts.get(ck, 0),
                }
            )
        else:
            n = counts.get(ck, 0)
            if n == 0:
                continue  # every row of this cell moved or was replaced away
            parts.append(
                {
                    "cell": ck[-1],
                    "values": vals,
                    "n_rows": n,
                    "files": rel,
                    "file_rows": frows,
                }
            )
    parts.sort(key=lambda p: _part_key(p, part_keys))
    metrics2 = {
        **m["metrics"],
        "upserted_batches": m["metrics"].get("upserted_batches", 0) + 1,
        "rows_upserted": m["metrics"].get("rows_upserted", 0)
        + sum(new_counts.values()),
    }
    # keep the kNN exactness bound current, exactly as append_rows does:
    # replacement geometry can raise the corpus anchor offset
    if "max_anchor_offset_m" in m["metrics"] and new_file_paths:
        from ..operators.knn import corpus_anchor_offset_m

        metrics2["max_anchor_offset_m"] = max(
            m["metrics"]["max_anchor_offset_m"],
            corpus_anchor_offset_m(spark.read.parquet(*new_file_paths)),
        )
    m2 = {
        **{k: v for k, v in m.items() if k in ("schema", "keys")},
        "snapshot_id": m["snapshot_id"] + 1,
        "parent_id": m["snapshot_id"],
        "partitions": parts,
        "metrics": metrics2,
    }
    _commit_manifest(root, m2)
    return m2


def update_rows(
    spark: SparkSession,
    root: str,
    assignments: dict,
    predicate=None,
    key: str = "doc_id",
    max_per_file: int | None = None,
) -> dict:
    """``UPDATE table SET col = expr [WHERE pred]`` — the reference's
    in-place column compute (P9, overture/add_columns.py:40-47
    ``UPDATE buildings SET quadkey = …``) as a copy-on-write snapshot.

    Implemented as a MERGE of the updated rows (:func:`upsert_rows`):
    an assignment may change ``quadkey`` (the reference's own use case),
    which MOVES the row to a different leaf cell — the merge path already
    routes rows, rewrites the cells that lose them, and keeps older
    snapshots time-traveling. ``assignments`` maps column name -> SQL
    expression string (or Column); ``predicate`` (SQL string or Column,
    None = all rows) selects the rows to update. The table needs a unique
    ``key`` column. Returns the new manifest (or the current one when
    nothing matches)."""
    m = current_manifest(root)
    if m is None:
        raise FileNotFoundError(f"no committed snapshot at {root}")
    if key.lower() in {c.lower() for c in assignments}:
        # rewriting the merge key would make the MERGE see only the NEW
        # values: old rows never match, survive untouched, and the updated
        # rows insert as duplicates — refuse (case-insensitively: Spark's
        # default resolver would bind 'DOC_ID' to doc_id)
        raise ValueError(
            f"UPDATE may not assign the merge key column {key!r} "
            "(old rows could not be matched for replacement)"
        )
    cur = read_table(spark, root)
    if predicate is not None:
        pred = F.expr(predicate) if isinstance(predicate, str) else predicate
        cur = cur.filter(F.coalesce(pred, F.lit(False)))
    for cname, e in assignments.items():
        cur = cur.withColumn(cname, F.expr(e) if isinstance(e, str) else e)
    if not cur.limit(1).count():
        return m
    return upsert_rows(cur, root, key=key, max_per_file=max_per_file)


def delete_rows(
    spark: SparkSession,
    root: str,
    predicate,
    max_per_file: int | None = None,
) -> dict:
    """``DELETE FROM table WHERE predicate`` — the reference's in-place
    row delete (google/process.py:149 ``DELETE FROM buildings WHERE
    confidence < …``) as an Iceberg-style copy-on-write operation: cells
    holding matching rows are rewritten WITHOUT them as new files and a new
    snapshot swaps in; every older snapshot still time-travels to the
    pre-delete state (reclaim superseded files with
    :func:`expire_snapshots`). The takedown / contamination-purge
    primitive a 10^12-doc corpus needs.

    ``predicate``: SQL string or Column; rows where it is TRUE are removed
    (NULL keeps the row — SQL DELETE semantics). Works on keyed tables.

    Scale shape: finding affected partitions is one manifest-planned scan
    with the predicate pushed into it (at planet scale the dominant,
    bounded cost); the rewrite then re-reads ONLY the affected partitions'
    files. Partitions left empty drop out of the manifest.
    """
    from ..operators.partition import tag_cells

    m = current_manifest(root)
    if m is None:
        raise FileNotFoundError(f"no committed snapshot at {root}")
    keys = _manifest_keys(m)
    cap = (
        max_per_file
        if max_per_file is not None
        else m.get("metrics", {}).get("max_per_file")
    )
    data_dir = os.path.join(root, "data")
    pred = F.expr(predicate) if isinstance(predicate, str) else predicate
    hit = F.coalesce(pred, F.lit(False))

    cells_df = spark.createDataFrame(
        [_part_key(p, keys) for p in m["partitions"]], _plan_schema(keys)
    )
    full = tag_cells(read_table(spark, root), cells_df, keys)
    affected = sorted(
        tuple(r[k] for k in keys) + (r["cell"],)
        for r in full.filter(hit).select(*keys, "cell").distinct().collect()
    )
    if not affected:
        return m
    aff_set = set(affected)
    aff_parts = [p for p in m["partitions"] if _part_key(p, keys) in aff_set]
    survivors = tag_cells(
        _read_partitions(spark, root, m, aff_parts), cells_df, keys
    ).filter(~hit)
    survivors = survivors.persist()
    try:
        counts = {
            tuple(r[k] for k in keys) + (r["cell"],): r["n"]
            for r in survivors.groupBy(*keys, "cell")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        pre_files = {
            ck: set(
                glob.glob(
                    os.path.join(
                        _part_dir(data_dir, keys, dict(zip(keys, ck)), ck[-1]),
                        "*.parquet",
                    )
                )
            )
            for ck in affected
        }
        if counts:
            _write_cells_salted(survivors, counts, cap, data_dir, keys)
    finally:
        survivors.unpersist()
    parts = [
        dict(p) for p in m["partitions"] if _part_key(p, keys) not in aff_set
    ]
    # batched footer pass (see append_rows): never per-cell serial reads
    survivors_cks = [ck for ck in affected if counts.get(ck, 0) > 0]
    post_by = {
        ck: sorted(
            set(
                glob.glob(
                    os.path.join(
                        _part_dir(data_dir, keys, dict(zip(keys, ck)), ck[-1]),
                        "*.parquet",
                    )
                )
            )
            - pre_files[ck]
        )
        for ck in survivors_cks
    }
    it = iter(
        _rows_per_file([p for ck in survivors_cks for p in post_by[ck]], spark)
    )
    for ck in survivors_cks:
        post = post_by[ck]
        parts.append(
            {
                "cell": ck[-1],
                "values": dict(zip(keys, ck)),
                "n_rows": counts[ck],
                "files": [os.path.relpath(f, root) for f in post],
                "file_rows": [next(it) for _ in post],
            }
        )
    parts.sort(key=lambda p: _part_key(p, keys))
    n_deleted = sum(p["n_rows"] for p in aff_parts) - sum(counts.values())
    m2 = {
        **{k: v for k, v in m.items() if k in ("schema", "keys")},
        "snapshot_id": m["snapshot_id"] + 1,
        "parent_id": m["snapshot_id"],
        "partitions": parts,
        "metrics": {
            **m["metrics"],
            # the stored kNN bound (max_anchor_offset_m) stays: deletion
            # can only shrink the true offset, so it remains a valid upper
            # bound for exactness
            "rows_deleted": m["metrics"].get("rows_deleted", 0) + n_deleted,
            "deleted_batches": m["metrics"].get("deleted_batches", 0) + 1,
        },
    }
    _commit_manifest(root, m2)
    return m2


def manifest_at(root: str, snapshot_id: int) -> dict | None:
    """Load a specific snapshot's manifest (time travel)."""
    path = os.path.join(_meta_dir(root), f"v{snapshot_id}.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def read_table(
    spark: SparkSession,
    root: str,
    quadkey_prefix=None,
    snapshot_id: int | None = None,
    **key_filters: str,
) -> DataFrame:
    """Manifest-planned scan with partition pruning.

    ``quadkey_prefix``: keep partitions whose cell overlaps the prefix
    (cell startswith prefix OR prefix startswith cell); a LIST of
    prefixes keeps partitions overlapping ANY of them (a window's cell
    cover — e.g. table/s2table.py window_read — prunes in one plan pass
    instead of one read per cover cell). Key equality filters prune on
    manifest partition values. Returns an empty DataFrame with no files
    when everything prunes away.

    ``snapshot_id``: time travel — plan from that snapshot's manifest
    instead of the current one. Snapshots are fully immutable: every write
    path (commit-group appends, resumed recomputes, compactions, schema
    changes) only ADDS files and commits a new manifest, so any retained
    snapshot reads exactly the bytes it committed (reclaim superseded
    files with :func:`expire_snapshots`).

    Reads plan with the SNAPSHOT's schema (schema evolution): files
    written before a column was added are null-filled for it by the
    parquet reader, and columns added after the snapshot don't leak in.
    """
    m = manifest_at(root, snapshot_id) if snapshot_id is not None else current_manifest(root)
    if m is None:
        raise FileNotFoundError(
            f"no committed snapshot at {root}"
            + (f" (snapshot {snapshot_id})" if snapshot_id is not None else "")
        )
    prefixes = (
        [quadkey_prefix]
        if isinstance(quadkey_prefix, str)
        else list(quadkey_prefix or [])
    )
    files: list[str] = []
    for part in m["partitions"]:
        if prefixes:
            cell = part["cell"]
            if not any(
                cell.startswith(p) or p.startswith(cell) for p in prefixes
            ):
                continue
        if any(part["values"].get(k) != v for k, v in key_filters.items()):
            continue
        files.extend(os.path.join(root, f) for f in part["files"])
    keys = _manifest_keys(m)
    if keys:
        # keyed table: key values live in directory names, recovered via
        # basePath + explicit string schema (never inference)
        reader = _keyed_reader(spark, m, keys, root)
        if not files:
            allf = [
                os.path.join(root, f) for p in m["partitions"] for f in p["files"]
            ]
            return reader.parquet(*allf).limit(0).drop("cell")
        return reader.parquet(*files).drop("cell")
    reader = spark.read
    if m.get("schema"):
        reader = reader.schema(_schema_struct(m))
    if not files:
        # preserve schema by reading zero rows from the full table
        allf = [os.path.join(root, f) for p in m["partitions"] for f in p["files"]]
        return reader.parquet(*allf).limit(0)
    return reader.parquet(*files)


def _schema_struct(manifest: dict):
    from pyspark.sql.types import StructType

    return StructType.fromJson({"type": "struct", "fields": manifest["schema"]})


def add_column(root: str, name: str, dtype: str) -> dict:
    """Schema evolution: ADD COLUMN as a metadata-only snapshot (reference:
    ``ALTER TABLE ... ADD COLUMN``, overture/add_columns.py:37,55). No data
    file is touched — the new snapshot carries the widened schema and the
    same file list; readers null-fill the column for pre-existing files.
    Older snapshots keep their own schema (time travel shows the table as
    it was). Backfill happens naturally as cells are rewritten (compaction)
    or via a new table build; there is no in-place UPDATE by design."""
    m = current_manifest(root)
    if m is None:
        raise FileNotFoundError(f"no committed snapshot at {root}")
    if "schema" not in m:
        raise ValueError(
            f"table at {root} predates schema tracking; rewrite it first"
        )
    if any(f["name"] == name for f in m["schema"]):
        raise ValueError(f"column {name!r} already exists")
    from pyspark.sql.types import StructField, _parse_datatype_string

    field = StructField(name, _parse_datatype_string(dtype), True)
    m2 = {
        **m,
        "snapshot_id": m["snapshot_id"] + 1,
        "parent_id": m["snapshot_id"],
        "schema": m["schema"] + [field.jsonValue()],
    }
    _commit_manifest(root, m2)
    return m2


def read_table_cells(
    spark: SparkSession, root: str, cells: list[str]
) -> DataFrame:
    """Manifest-planned scan pruned to partitions overlapping ANY of the
    given z-cells (cell list from e.g. a kNN ring). A partition matches iff
    its leaf cell is a prefix of a requested cell or vice versa; matching is
    a set lookup over all prefixes of the requested cells, so planning is
    O(#cells x 12 + #partitions) — never a scan."""
    m = current_manifest(root)
    if m is None:
        raise FileNotFoundError(f"no committed snapshot at {root}")
    want = {c[:k] for c in cells for k in range(1, len(c) + 1)}
    want.add("")
    cellset = set(cells)
    files: list[str] = []
    for part in m["partitions"]:
        pc = part["cell"]
        # leaf above or at a requested cell, or leaf below one (deeper leaf
        # whose prefix is a requested cell)
        if pc in want or any(pc[:k] in cellset for k in range(1, len(pc) + 1)):
            files.extend(os.path.join(root, f) for f in part["files"])
    keys = _manifest_keys(m)
    if keys:
        reader = _keyed_reader(spark, m, keys, root)
        if not files:
            allf = [
                os.path.join(root, f) for p in m["partitions"] for f in p["files"]
            ]
            return reader.parquet(*allf).limit(0).drop("cell")
        return reader.parquet(*files).drop("cell")
    reader = spark.read
    if m.get("schema"):
        reader = reader.schema(_schema_struct(m))
    if not files:
        allf = [os.path.join(root, f) for p in m["partitions"] for f in p["files"]]
        return reader.parquet(*allf).limit(0)
    return reader.parquet(*files)


def metrics(root: str) -> dict:
    """Per-partition lineage + row-count metrics from the current snapshot."""
    m = current_manifest(root)
    if m is None:
        return {}
    keys = _manifest_keys(m)
    return {
        "snapshot_id": m["snapshot_id"],
        "n_partitions": len(m["partitions"]),
        "rows_written": m["metrics"]["rows_written"],
        "recomputed_cells": m["metrics"]["recomputed_cells"],
        "partitions": {
            # keyed partitions address by their hive path (the bare cell
            # string would collide across key values)
            (
                "/".join(
                    [f"{k}={p['values'][k]}" for k in keys]
                    + [f"cell={p['cell']}"]
                )
                if keys
                else p["cell"]
            ): p["n_rows"]
            for p in m["partitions"]
        },
    }


def compact_cells(
    spark: SparkSession,
    root: str,
    max_files: int = 1,
    max_rows_per_file: int | None = None,
) -> dict:
    """Small-file compaction: rewrite fragmented cells into quadkey-sorted
    files, committed as a NEW snapshot referencing NEW files (old files are
    untouched, so prior snapshots keep reading their own view — Iceberg
    rewrite semantics; reclaim space later with :func:`expire_snapshots`).

    Output files respect the table's north_rule row cap: by default the
    writer's ``max_per_file`` (stored in the manifest) re-shards compaction
    output at that many rows per file, so an over-dense salted cell is
    NEVER collapsed back into one oversized file/task — a cell whose file
    count already equals its required shard count is skipped entirely.
    ``max_rows_per_file`` overrides the cap (None + no stored cap = one
    file per cell).

    Scale shape: candidate cells compact in parallel (repartition on
    (keys, cell), one pyarrow writer per task walking its partitions in
    clustered order); the driver only swaps manifest entries. Streaming
    ingests that append many micro-batch files per cell are the intended
    caller. Keyed tables compact the same way — key columns are recovered
    from the hive directory names and written back as directories, never
    as data columns.

    Selection is per FILE where the manifest records ``file_rows``: a cell
    whose file count looks right but holds one skewed over-cap file (e.g.
    999+1 rows at cap 500) is still selected and re-sharded.
    """
    import pyarrow as pa
    from pyspark import TaskContext

    m = current_manifest(root)
    if m is None:
        raise FileNotFoundError(f"no committed snapshot at {root}")
    keys = _manifest_keys(m)
    cap = (
        max_rows_per_file
        if max_rows_per_file is not None
        else m.get("metrics", {}).get("max_per_file")
    )

    def needed(p) -> int:
        return 1 if not cap else -(-p["n_rows"] // cap)

    def overcap_file(p) -> bool:
        fr = p.get("file_rows")
        return bool(cap) and fr is not None and any(x > cap for x in fr)

    todo = [
        p
        for p in m["partitions"]
        if len(p["files"]) > max(max_files, needed(p))
        # under-sharded: fewer files than the cap requires means the cell's
        # average file exceeds the row cap — select it so the cap-rolling
        # writer below re-shards the oversized file(s)
        or (cap and len(p["files"]) < needed(p))
        # skewed: an individual file over the cap even though the per-cell
        # aggregate looks fine (known exactly from the stored file_rows)
        or overcap_file(p)
    ]
    if not todo:
        return m
    snap = m["snapshot_id"] + 1
    data_dir = os.path.join(root, "data")
    src = _read_partitions(spark, root, m, todo)

    from ..operators.partition import tag_cells

    plan_df = spark.createDataFrame(
        [_part_key(p, keys) for p in todo], _plan_schema(keys)
    )
    tagged = (
        tag_cells(src, plan_df, keys)
        .repartition(max(len(todo), 1), *keys, "cell")
        .sortWithinPartitions(*keys, "cell", "quadkey")
    )

    def write_part(batches):
        import pyarrow.parquet as pq

        tc = TaskContext.get()
        out_rows = []
        writer = None
        cur = None  # (key values..., cell) of the open group
        fname = None  # output path relative to data_dir
        n = 0
        seq = 0

        def close():
            nonlocal writer, n, fname
            if writer is not None:
                writer.close()
                final = os.path.join(data_dir, fname)
                os.replace(
                    os.path.join(
                        os.path.dirname(final),
                        "." + os.path.basename(final) + ".inprogress",
                    ),
                    final,
                )
                out_rows.append((cur, fname, n))
                writer, n, fname = None, 0, None

        def open_file(schema):
            nonlocal writer, fname, seq
            seq += 1
            pdir = _part_dir(data_dir, keys, dict(zip(keys, cur)), cur[-1])
            os.makedirs(pdir, exist_ok=True)
            base = (
                f"compact-{snap}-{cur[-1] or 'root'}-"
                f"{tc.partitionId()}-{tc.taskAttemptId()}-{seq}.parquet"
            )
            fname = os.path.relpath(os.path.join(pdir, base), data_dir)
            writer = pq.ParquetWriter(
                os.path.join(pdir, "." + base + ".inprogress"),
                schema,
                compression="snappy",
            )

        for rb in batches:
            if rb.num_rows == 0:
                continue
            names = rb.schema.names
            gidx = [names.index(k) for k in keys] + [names.index("cell")]
            gset = set(gidx)
            groups = list(zip(*[rb.column(j).to_pylist() for j in gidx]))
            start = 0
            for i in range(len(groups) + 1):
                if i < len(groups) and groups[i] == groups[start]:
                    continue
                piece = rb.slice(start, i - start)
                if cur != groups[start]:
                    close()
                    cur = groups[start]
                arrays = [
                    piece.column(j)
                    for j in range(piece.num_columns)
                    if j not in gset
                ]
                out = pa.record_batch(
                    arrays,
                    names=[nm for j, nm in enumerate(names) if j not in gset],
                )
                # roll files at the row cap (north_rule: no oversized
                # output file, even when one task compacts a dense cell)
                off = 0
                while off < out.num_rows:
                    if writer is None:
                        open_file(out.schema)
                    take = (
                        out.num_rows - off
                        if not cap
                        else min(cap - n, out.num_rows - off)
                    )
                    writer.write_batch(out.slice(off, take))
                    n += take
                    off += take
                    if cap and n >= cap:
                        close()
                start = i
        close()
        for grp, f, cnt in out_rows:
            yield pa.record_batch(
                [pa.array([v]) for v in grp]
                + [pa.array([f]), pa.array([cnt], type=pa.int64())],
                names=[*keys, "cell", "file", "n_rows"],
            )

    results = tagged.mapInArrow(
        write_part, _plan_schema(keys, ", file string, n_rows long")
    ).collect()
    new_files: dict[tuple, list] = {}
    for r in results:
        ck = tuple(r[k] for k in keys) + (r["cell"],)
        new_files.setdefault(ck, []).append(
            (os.path.join("data", r["file"]), r["n_rows"])
        )
    # sanity: compaction must preserve row counts per partition
    for p in todo:
        ck = _part_key(p, keys)
        got = sum(n for _, n in new_files.get(ck, []))
        assert got == p["n_rows"], (ck, got, p["n_rows"])
    parts = []
    for p in m["partitions"]:
        ck = _part_key(p, keys)
        if ck in new_files:
            pairs = sorted(new_files[ck])
            parts.append(
                {
                    **p,
                    "files": [f for f, _ in pairs],
                    "file_rows": [n for _, n in pairs],
                }
            )
        else:
            parts.append(p)
    m2 = {
        **{k: v for k, v in m.items() if k in ("schema", "keys")},
        "snapshot_id": snap,
        "parent_id": m["snapshot_id"],
        "partitions": parts,
        "metrics": {**m["metrics"], "compacted_cells": len(todo)},
    }
    _commit_manifest(root, m2)
    return m2


def expire_snapshots(root: str, keep_last: int = 1) -> int:
    """Delete manifests older than the newest ``keep_last`` snapshots and
    any data file no kept snapshot references. Returns files deleted."""
    m = current_manifest(root)
    if m is None:
        return 0
    keep_ids = [m["snapshot_id"] - i for i in range(keep_last)]
    kept = [manifest_at(root, i) for i in keep_ids]
    live = {
        os.path.normpath(os.path.join(root, f))
        for km in kept
        if km
        for p in km["partitions"]
        for f in p["files"]
    }
    deleted = 0
    for f in glob.glob(os.path.join(root, "data", "**", "*.parquet"), recursive=True):
        if os.path.normpath(f) not in live:
            os.remove(f)
            crc = os.path.join(os.path.dirname(f), "." + os.path.basename(f) + ".crc")
            if os.path.exists(crc):
                os.remove(crc)
            deleted += 1
    for mf in glob.glob(os.path.join(_meta_dir(root), "v*.json")):
        sid = int(os.path.basename(mf)[1:-5])
        if sid not in keep_ids:
            os.remove(mf)
    return deleted


def drop_table(root: str) -> None:
    if os.path.exists(root):
        shutil.rmtree(root)
