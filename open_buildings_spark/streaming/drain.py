"""Shared memory-sink drain for the stateful streaming twins (sessionize,
as-of, funnel, dedup): one place owns the availableNow trigger, the
timeout contract and the truncated-drain guard, so a change to any of
them cannot silently apply to only one twin."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def drain_to_memory(
    spark: SparkSession,
    out: DataFrame,
    name: str,
    output_mode: str = "append",
    timeout_s: int = 600,
) -> DataFrame:
    """Run ``out`` (a streaming DataFrame) to completion (availableNow)
    into a memory sink and return the result table. Raises instead of
    returning a TRUNCATED table when the drain stalls — handing a partial
    sink to the correctness gate would silently pass wrong data."""
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"stream did not drain within {timeout_s}s (query {name})"
        )
    return spark.table(name)
