"""Structured Streaming over the events table: watermarked windowed
aggregation and a custom stateful sessionization operator.

The reference is batch-only; the engine adds streams as first-class
(north-star training pipelines tail event logs). Batch/stream parity: the
batch variants below define the semantics and back the DuckDB oracle; the
streaming variants run the same logical plan via readStream and are
asserted equal to the batch result in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_counts_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window per event_type: (window_start, event_type,
    n_events, sum_value_r4). Batch semantics = oracle semantics."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value_r4"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value_r4",
        )
    )


def hopping_counts_batch(
    spark: SparkSession,
    sf_dir: str,
    length: str = "1 hour",
    slide: str = "15 minutes",
) -> DataFrame:
    """Hopping (sliding) windows: every event lands in length/slide
    overlapping windows — the third of the three windowing shapes next to
    tumbling (:func:`windowed_counts_batch`) and session
    (:func:`sessionize_batch`). Spark's ``F.window(ts, length, slide)``
    assigns epoch-aligned window starts; the oracle re-derives the same
    assignment arithmetically (floor(epoch/slide)*slide - k*slide), so the
    gate pins the alignment rule itself. Returns
    (window_start, event_type, n_events, sum_value_r4)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy(F.window("ts", length, slide).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value_r4"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value_r4",
        )
    )


def windowed_counts_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same aggregation as a watermarked streaming query (file source).
    Caller starts it with .writeStream (tests use format('memory') +
    outputMode('complete'))."""
    ev_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(ev_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(sf_dir)
    )
    # late data policy: 2-hour watermark; with the static fixture all rows
    # are within bounds, so stream result == batch result.
    # watermarks require TIMESTAMP (not NTZ): cast in, cast back out —
    # lossless under the pinned UTC session timezone.
    return (
        stream.where(F.col("event_id").isNotNull())
        .withColumn("ts_ltz", F.col("ts").cast("timestamp"))
        .withWatermark("ts_ltz", "2 hours")
        .groupBy(F.window("ts_ltz", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value_r4"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value_r4",
        )
    )


def sessionize_batch(spark: SparkSession, sf_dir: str, gap_minutes: int = 30) -> DataFrame:
    """Per-user sessions: a session breaks after a >gap inactivity.

    Batch formulation with window functions (the oracle-checkable
    semantics); the streaming twin is :func:`sessionize_stream_stateful`.
    Returns (user_id, session_id, n_events, t_start, t_end).
    """
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.lag("ts").over(w)
    # microsecond-exact gap (events carry sub-second timestamps; second
    # truncation would disagree with the oracle's epoch_us)
    # ts is TIMESTAMP_NTZ; the NTZ-cast subtlety lives in tsutil
    from ..tsutil import unix_micros_ntz as us
    new_session = (
        F.when(gap.isNull(), 1)
        .when(us(F.col("ts")) - us(gap) > gap_minutes * 60 * 1_000_000, 1)
        .otherwise(0)
    )
    sess = ev.withColumn(
        "session_id", F.sum(new_session).over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("t_start"),
        F.max("ts").alias("t_end"),
    )


def hopping_counts_stream(
    spark: SparkSession,
    sf_dir: str,
    length: str = "1 hour",
    slide: str = "15 minutes",
) -> DataFrame:
    """Streaming twin of :func:`hopping_counts_batch` (watermarked file
    source; tests drain it to a memory sink and compare bit-for-bit with
    the batch result — valid because count/sum are commutative)."""
    ev_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(ev_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(sf_dir)
    )
    return (
        stream.where(F.col("event_id").isNotNull())
        .withColumn("ts_ltz", F.col("ts").cast("timestamp"))
        .withWatermark("ts_ltz", "2 hours")
        .groupBy(F.window("ts_ltz", length, slide).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value_r4"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value_r4",
        )
    )


def funnel_batch(
    spark: SparkSession,
    sf_dir: str,
    stages: tuple[str, ...] = ("view", "click", "purchase"),
) -> DataFrame:
    """Ordered-funnel analysis: per stage k, how many users emitted a
    stage-1 event, then a stage-2 event at-or-after it, then ... up to
    stage k (first-occurrence chaining — the standard product-analytics
    funnel). Returns (stage, stage_name, n_users), one row per stage.

    Scale shape: ONE shuffle (groupBy user), then a native fold: each
    user's (ts, stage) pairs sort in-memory and an `aggregate` lambda
    advances a stage pointer — per-user state is a single int, the
    per-user array is bounded by that user's activity (the same bound
    sessionize already carries), and nothing crosses the Python boundary.
    The oracle reimplements the semantics independently as chained
    min-timestamp CTE joins."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    stage_idx = F.create_map(
        *[x for i, s in enumerate(stages) for x in (F.lit(s), F.lit(i + 1))]
    )
    tagged = ev.where(F.col("event_type").isin(*stages)).select(
        "user_id",
        F.struct(
            F.col("ts"), stage_idx[F.col("event_type")].alias("stage")
        ).alias("e"),
    )
    # ties at equal ts: the struct sorts by (ts, stage), so an earlier
    # stage at the same timestamp is seen first — "at-or-after" semantics
    reached = tagged.groupBy("user_id").agg(
        F.aggregate(
            F.array_sort(F.collect_list("e")),
            F.lit(0),
            lambda acc, e: F.when(e["stage"] == acc + 1, acc + 1).otherwise(acc),
        ).alias("max_stage")
    )
    return _stage_counts(spark, reached, stages)


def _stage_counts(
    spark: SparkSession, reached: DataFrame, stages: tuple[str, ...]
) -> DataFrame:
    """(stage, stage_name, n_users) from per-user (user_id, max_stage) —
    shared tail of the batch funnel and its streaming twin. Collapses
    users to (max_stage, n) FIRST (<= len(stages)+1 rows), so the theta
    join touches a handful of rows, not one per user."""
    by_max = reached.groupBy("max_stage").agg(F.count(F.lit(1)).alias("n"))
    stage_rows = spark.createDataFrame(
        [(i + 1, s) for i, s in enumerate(stages)], "stage int, stage_name string"
    )
    return (
        stage_rows.join(by_max, F.col("max_stage") >= F.col("stage"), "left")
        .groupBy("stage", "stage_name")
        .agg(F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n_users"))
    )


def sessionize_stream_stateful(
    spark: SparkSession, sf_dir: str, gap_minutes: int = 30, src_dir: str | None = None
) -> DataFrame:
    """Custom stateful streaming sessionization via applyInPandasWithState:
    open sessions ride in per-user state; a session is emitted when the
    inactivity gap passes (append mode emits CLOSED sessions; each user's
    final session stays in state). Demonstrates the engine's custom
    stateful-operator surface; correctness vs the batch twin in tests and
    the e_sessionize_stream driver oracle.

    ``src_dir``: stream from a different parquet directory than the schema
    source — e.g. a time-ordered multi-file copy, so micro-batches arrive
    in event-time order per user across batches (the stateful operator,
    like any per-key sessionizer, assumes per-key in-order arrival; a
    production stream gets this from the log's per-key ordering)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ev_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(ev_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir or sf_dir)
    )
    gap_us = gap_minutes * 60 * 1_000_000

    out_schema = (
        "user_id long, session_id long, n_events long, t_start timestamp, t_end timestamp"
    )
    state_schema = "session_id long, n long, t_start long, t_end long"

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.exists:
            session_id, n, t0, t1 = state.get
        else:
            session_id, n, t0, t1 = 0, 0, None, None
        out = []
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        for ts in rows["ts"]:
            t = int(ts.value // 1000)  # exact microseconds
            if t0 is None:
                session_id, n, t0, t1 = 1, 1, t, t
            elif t - t1 > gap_us:
                out.append((user_id, session_id, n, t0, t1))
                session_id, n, t0, t1 = session_id + 1, 1, t, t
            else:
                n += 1
                t1 = t
        state.update((session_id, n, t0, t1))
        if out:
            yield pd.DataFrame(
                out, columns=["user_id", "session_id", "n_events", "t_start", "t_end"]
            ).assign(
                t_start=lambda d: pd.to_datetime(d.t_start, unit="us"),
                t_end=lambda d: pd.to_datetime(d.t_end, unit="us"),
            )

    return stream.groupBy("user_id").applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def sessionize_stream_to_memory(
    spark: SparkSession, src_dir: str, sf_dir: str, name: str
) -> DataFrame:
    """Run the stateful sessionizer to completion (availableNow) into a
    memory sink and return the result table — the driver-gate entry point.
    Emits the CLOSED sessions (batch result minus each user's final open
    session); timestamps cast back to NTZ for parity with the batch twin."""
    from .drain import drain_to_memory

    out = sessionize_stream_stateful(spark, sf_dir, src_dir=src_dir)
    return drain_to_memory(spark, out, name).select(
        "user_id",
        "session_id",
        "n_events",
        F.col("t_start").cast("timestamp_ntz").alias("t_start"),
        F.col("t_end").cast("timestamp_ntz").alias("t_end"),
    )


def funnel_stream_stateful(
    spark: SparkSession,
    sf_dir: str,
    stages: tuple[str, ...] = ("view", "click", "purchase"),
    src_dir: str | None = None,
) -> DataFrame:
    """Streaming twin of :func:`funnel_batch`'s per-user fold: state is
    ONE int per user (the stage pointer — the same bounded register shape
    as the as-of twin), advanced in event-time order; a row (user_id,
    max_stage) is emitted whenever the pointer ADVANCES, so the drained
    sink's per-user MAX equals the batch fold exactly (the pointer is
    monotone). Ordering contract as every stateful twin here: per-key
    event-time-ordered arrival across micro-batches; within a batch rows
    sort by (ts, stage) — the batch tie rule (an earlier stage at the
    same timestamp is seen first)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ev_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(ev_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir or sf_dir)
    )
    stage_idx = F.create_map(
        *[x for i, s in enumerate(stages) for x in (F.lit(s), F.lit(i + 1))]
    )
    tagged = stream.where(F.col("event_type").isin(*stages)).select(
        "user_id",
        F.col("ts").alias("_ts"),
        stage_idx[F.col("event_type")].alias("_stage"),
    )

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        (ptr,) = state.get if state.exists else (0,)
        rows = pd.concat(list(pdfs)).sort_values(["_ts", "_stage"])
        start = ptr
        n_stages = len(stages)
        for st in rows["_stage"]:
            if ptr < n_stages and int(st) == ptr + 1:
                ptr += 1
        state.update((ptr,))
        if ptr > start:
            yield pd.DataFrame(
                {
                    "user_id": pd.array([user_id], dtype="Int64"),
                    "max_stage": pd.array([ptr], dtype="Int64"),
                }
            )

    return tagged.groupBy("user_id").applyInPandasWithState(
        fn,
        "user_id long, max_stage int",
        "ptr int",
        "append",
        GroupStateTimeout.NoTimeout,
    )


def funnel_stream_to_memory(
    spark: SparkSession,
    src_dir: str,
    sf_dir: str,
    name: str,
    stages: tuple[str, ...] = ("view", "click", "purchase"),
) -> DataFrame:
    """Drain the streaming funnel (availableNow) and aggregate the final
    per-user stages to (stage, stage_name, n_users) — the drained MAX per
    user equals the batch fold because the pointer is monotone, so this
    shares :func:`_stage_counts` with funnel_batch and sits under the
    SAME oracle."""
    from .drain import drain_to_memory

    out = funnel_stream_stateful(spark, sf_dir, stages=stages, src_dir=src_dir)
    reached = (
        drain_to_memory(spark, out, name)
        .groupBy("user_id")
        .agg(F.max("max_stage").alias("max_stage"))
    )
    return _stage_counts(spark, reached, stages)
