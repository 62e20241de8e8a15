"""Streaming twin of the batch as-of join (operators/asof.py).

Point-in-time enrichment of a live event stream: each LEFT event (e.g. a
purchase) is emitted immediately, carrying the latest RIGHT event's value
(e.g. the user's last product view) at or before it — the canonical
production use of as-of (feature lookups, price marks, sensor alignment).

State shape: ONE (ts, value) pair per key — the carry-forward register the
batch operator materializes as a running window. Nothing buffers: left
rows emit in the micro-batch they arrive in (append mode, no watermark
hold-back), right rows only overwrite the register. At 100 TB of events
the state store holds |keys| tiny fixed-width rows, hash-partitioned —
the same footprint as any keyed counter.

Ordering contract (same as the stateful sessionizer,
streaming/events.py:216-230): per-key event-time-ordered arrival across
micro-batches — a production log's per-key ordering; the gate provides it
by replaying time-range-ordered files. Within a micro-batch, rows sort by
(ts, side, value), reproducing the batch tie rules exactly: a right row
tied with a left row's timestamp IS visible to it, and right rows tied
with each other resolve to MAX(value). The result is gated bit-equal to
the batch `asof_join` (the e_asof driver query) on the drained sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def asof_stream_stateful(
    spark: SparkSession,
    sf_dir: str,
    src_dir: str | None = None,
    on: str = "user_id",
    ts_col: str = "ts",
    left_type: str = "purchase",
    right_type: str = "view",
    value_col: str = "value",
) -> DataFrame:
    """Stateful streaming as-of enrich over the events file stream:
    (event_id, user_id, asof_value, lag_us) per left event — the exact
    output of the batch e_asof query. ``src_dir`` streams a different
    parquet directory than the schema source (the time-ordered copy)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ev_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(ev_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir or sf_dir)
    )
    tagged = stream.where(
        F.col("event_type").isin(left_type, right_type)
    ).select(
        "event_id",
        F.col(on).alias("_key"),
        F.col(ts_col).alias("_ts"),
        (F.col("event_type") == left_type).cast("int").alias("_is_left"),
        F.col(value_col).alias("_value"),
    )

    out_schema = "event_id long, user_id long, asof_value double, lag_us long"
    state_schema = "rts long, value double"

    def fn(key, pdfs, state: GroupState):
        (key_val,) = key
        rts, val = state.get if state.exists else (None, None)
        rows = pd.concat(list(pdfs)).sort_values(["_ts", "_is_left", "_value"])
        out = []
        for eid, ts, is_left, v in zip(
            rows["event_id"], rows["_ts"], rows["_is_left"], rows["_value"]
        ):
            t = int(ts.value // 1000)  # exact microseconds
            if is_left:
                out.append(
                    (eid, key_val, val, t - rts if rts is not None else None)
                )
            else:
                rts, val = t, float(v)
        if rts is not None:
            state.update((rts, val))
        if out:
            # exact null semantics (pdexact rules): ints as Int64 (a plain
            # int column with None upcasts to float64), asof_value as an
            # OBJECT series so None stays NULL. KNOWN LIMIT: a NaN right
            # VALUE also becomes NULL here — pandas/Arrow interop defines
            # float NaN AS the missing marker, so no pandas-mediated
            # stateful operator can round-trip NaN-vs-NULL (the JVM-side
            # batch twin preserves NaN); the twin equality contract
            # therefore assumes NaN-free value columns (pinned by
            # test_asof_stream_nan_becomes_null)
            yield pd.DataFrame(
                {
                    "event_id": pd.array(
                        [r[0] for r in out], dtype="Int64"
                    ),
                    "user_id": pd.array(
                        [r[1] for r in out], dtype="Int64"
                    ),
                    "asof_value": pd.Series(
                        [r[2] for r in out], dtype=object
                    ),
                    "lag_us": pd.array([r[3] for r in out], dtype="Int64"),
                }
            )

    return tagged.groupBy("_key").applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def asof_stream_to_memory(
    spark: SparkSession, src_dir: str, sf_dir: str, name: str
) -> DataFrame:
    """Drain the streaming as-of enrich (availableNow) into a memory sink
    and return the result table — the driver-gate entry point."""
    from .drain import drain_to_memory

    out = asof_stream_stateful(spark, sf_dir, src_dir=src_dir)
    return drain_to_memory(spark, out, name)
