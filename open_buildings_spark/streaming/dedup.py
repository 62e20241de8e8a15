"""Streaming dedup-on-ingest: exact dedup as a stateful Structured
Streaming aggregation. A training-data ingest that tails a document feed
wants duplicates collapsed AS THEY ARRIVE, not in a nightly batch pass.

Semantics chosen for determinism: the state is (fingerprint -> min doc_id,
count), a pure commutative/associative aggregate — the final state after
an availableNow drain is identical to the batch groupBy regardless of file
arrival or task order, so the streaming result sits under the same
rows+schema+hash oracle gate as the batch operator (keep-FIRST-seen
semantics, by contrast, depend on arrival order and cannot be gated).

Scale shape: one hash-partitioned state store keyed by the 32-byte md5
fingerprint; updates are map-side-combinable within each micro-batch
before touching state. Raw text never enters state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def exact_dedup_stream(spark: SparkSession, docs_dir: str) -> DataFrame:
    """(fingerprint, canonical_id, group_size) as a streaming aggregation
    over a parquet file source of (doc_id, text) documents."""
    schema = spark.read.parquet(docs_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
    )
    return (
        stream.withColumn("fingerprint", F.md5("text"))
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count("*").alias("group_size"),
        )
    )


def exact_dedup_stream_to_memory(
    spark: SparkSession, docs_dir: str, name: str
) -> DataFrame:
    """Drain the dedup stream (availableNow) into a memory sink in complete
    mode and return the final state table — the driver-gate entry point."""
    from .drain import drain_to_memory

    return drain_to_memory(
        spark, exact_dedup_stream(spark, docs_dir), name, output_mode="complete"
    )
