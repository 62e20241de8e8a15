"""Structured Streaming geo-ingest: tail a docs directory, run the SAME
single-pass enrichment plan as batch, and append quadkey-clustered parquet.

The reference is batch-only (its archive build re-runs from scratch,
overture/partition.py); a training pipeline at 100 TB tails an arriving
corpus instead. Batch/stream parity: the streaming plan IS the batch plan
(`enrich.add_geo_columns` over readStream), so the driver gate checks the
streaming result against the same DuckDB oracle as the batch enrichment
(`g_stream_enrich` = g_enrich_quadkey's SQL).

Scale shape: the file source scales by `maxFilesPerTrigger`; the sink
partitions by the level-4 quadkey prefix (256-way spatial fanout, stable
across micro-batches) so downstream prefix queries prune directories the
same way the batch table layer prunes manifest cells. Checkpointing gives
exactly-once file-sink semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import enrich

INGEST_CELL_LEVEL = 4


def enrich_stream(
    spark: SparkSession, docs_dir: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """readStream over a docs parquet directory -> enriched stream with the
    identical logical plan as the batch path (one ArrowEvalPython stage,
    wkt-only transfer)."""
    schema = spark.read.parquet(docs_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )
    return enrich.add_geo_columns(stream, drop_nongeo=True)


def ingest_to_parquet(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 4,
):
    """Start an availableNow ingest: docs_dir -> enriched parquet
    partitioned by cell4 = substring(quadkey, 1, 4). Returns the streaming
    query (caller awaits termination). Exactly-once via the checkpointed
    file sink; appends are idempotent per micro-batch.

    Readers: quadkey prefixes carry leading zeros, so read the output with
    ``spark.sql.sources.partitionColumnTypeInference.enabled=false`` (or an
    explicit schema) — default inference would coerce cell4='0300' to the
    integer 300."""
    out = enrich_stream(spark, docs_dir, max_files_per_trigger).withColumn(
        "cell4", F.substring("quadkey", 1, INGEST_CELL_LEVEL)
    )
    return (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("cell4")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def ingest_to_table(
    spark: SparkSession,
    docs_dir: str,
    table_root: str,
    checkpoint_dir: str,
    max_per_file: int = 200_000,
    max_files_per_trigger: int = 4,
    keys: list[str] | None = None,
    transform=None,
    write_opts: dict | None = None,
):
    """Stream docs straight into the MANIFEST table (not a plain file sink):
    each micro-batch appends through ``iceberg_lite.append_rows`` inside
    ``foreachBatch``, so the destination is the same snapshot-versioned,
    manifest-pruned table the batch builder writes — time travel, compaction
    and serving-path kNN/AOI all work on a live ingest.

    Exactly-once: the checkpoint replays unacknowledged micro-batches after
    a crash, and ``append_rows``' ``batch_id`` guard makes the replay a
    no-op when the table commit already landed (single-writer semantics).
    A first batch against an empty root bootstraps via ``write_partitioned``
    (which also plans the initial leaf cells). Returns the streaming query
    (caller awaits termination).

    ``keys`` builds/maintains a KEY-PARTITIONED (hive ``country_iso=XX``)
    table — pass ``transform`` to derive the key column(s) on the enriched
    stream; subsequent appends route through the keyed directories.
    ``write_opts`` forwards to the bootstrap ``write_partitioned`` (e.g.
    an S2 ingest passes ``store_anchor_offset=False`` + provider metrics —
    see table/s2table.py ingest_stream_to_s2_table).
    """
    from ..table import iceberg_lite as tbl

    out = enrich_stream(spark, docs_dir, max_files_per_trigger)
    if transform is not None:
        out = transform(out)

    def commit_batch(bdf, batch_id: int) -> None:
        if tbl.current_manifest(table_root) is None:
            # the batch id is stamped INSIDE write_partitioned's single
            # final commit (extra_metrics), so the bootstrap is atomic:
            # either no manifest exists (a replayed batch 0 bootstraps
            # cleanly; files from the crashed attempt sit unreferenced) or
            # the manifest already proves batch 0 done and append_rows'
            # guard no-ops the replay — no window where data committed but
            # the watermark didn't
            opts = dict(write_opts or {})
            extra = dict(opts.pop("extra_metrics", None) or {})
            extra["last_append_batch_id"] = batch_id
            tbl.write_partitioned(
                bdf,
                table_root,
                max_per_file=max_per_file,
                keys=keys,
                extra_metrics=extra,
                **opts,
            )
        else:
            # keyed tables: append_rows reads the key list from the
            # manifest the bootstrap committed
            tbl.append_rows(bdf, table_root, batch_id=batch_id,
                            max_per_file=max_per_file)

    return (
        out.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def enrich_stream_to_memory(
    spark: SparkSession, docs_dir: str, name: str, select_cols: list[str]
) -> DataFrame:
    """Run the enrichment stream to completion (availableNow) into a memory
    sink and return the result table — the driver-gate entry point, letting
    the streaming plan be value-checked against the batch oracle."""
    out = enrich_stream(spark, docs_dir).select(*select_cols)
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
