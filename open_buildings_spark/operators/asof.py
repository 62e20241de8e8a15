"""Distributed as-of join (point-in-time / "latest value at or before").

The classic time-series join Spark lacks natively (the brief's canonical
custom-operator example): for each left row, attach the most recent right
row with ``ts_right <= ts_left`` on the same key.

Scale shape — union + carry-forward window, NOT a range join:

- both sides union into one tagged stream and shuffle ONCE on the key;
- within each key, rows sort by (ts, side) — right rows first at equal
  timestamps so ties ``ts_r == ts_l`` are visible to the left row — and a
  running ``last(..., ignorenulls=True)`` window carries the latest right
  payload forward;
- left rows filter back out with the carried columns attached.

The plan contains NO join node at all and exactly ONE hash exchange on
the key (pinned by test) — the same cost as a groupBy, immune to the
row-explosion a ``l.ts >= r.ts`` theta-join suffers (Spark would
otherwise nested-loop-join every left row against every right row per
key). Skewed keys behave exactly like a skewed groupBy (AQE handles
them).

Right rows sharing (key, ts) need no pre-aggregation (which would cost a
second, differently-keyed shuffle): the window sort order ends with the
right payload columns, so the running ``last`` deterministically keeps
the lexicographically-greatest right row of each tie group — for a
single value column that is exactly MAX(value), the rule the DuckDB
oracle applies, so the gate pins it. Right payload columns must be of
orderable types.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts",
    right_cols: Sequence[str] = ("value",),
    suffix: str = "_asof",
    tolerance_us: int | None = None,
) -> DataFrame:
    """All of ``left``'s columns plus, per ``right_cols`` entry ``c``, a
    ``c{suffix}`` column with the latest right value at or before the left
    row's timestamp (NULL when none exists), and ``{ts_col}{suffix}`` with
    the matched right timestamp. ``tolerance_us`` (microseconds) nulls
    matches staler than the bound — the pandas ``merge_asof`` contract."""
    rts = f"{ts_col}{suffix}"
    tagged = [f"{c}{suffix}" for c in right_cols]

    clash = ({rts, *tagged, "_is_left", "_carry"}) & set(left.columns)
    if clash:
        raise ValueError(
            f"left columns {sorted(clash)} collide with asof_join's output/"
            "internal names; rename them or pass a different suffix"
        )

    # one select per side (not a withColumn chain — O(width) projections)
    lt = left.select(
        "*",
        F.lit(1).alias("_is_left"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(t)
            for c, t in zip(right_cols, tagged)
        ],
        F.lit(None).cast(left.schema[ts_col].dataType).alias(rts),
    )
    rt = right.select(
        *[
            F.lit(None).cast(f.dataType).alias(f.name)
            for f in left.schema.fields
            if f.name not in {on, ts_col}
        ],
        on,
        ts_col,
        F.lit(0).alias("_is_left"),
        *[F.col(c).alias(t) for c, t in zip(right_cols, tagged)],
        F.col(ts_col).alias(rts),
    )

    u = lt.unionByName(rt.select(*lt.columns))
    # sort tail (*tagged): right rows tied on (key, ts) resolve to the
    # lexicographically-greatest payload (nulls first, so == MAX for one
    # column); left rows (_is_left = 1) still sort after every tied right
    # row regardless of their all-null payload slots
    w = (
        Window.partitionBy(on)
        .orderBy(ts_col, "_is_left", *tagged)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # carry ONE struct, not per-column lasts: a right row whose value is
    # NULL must not let the carried value and carried timestamp come from
    # DIFFERENT right rows (struct literals are non-null even when every
    # field is null, so ignorenulls treats each right row atomically)
    carry = F.when(
        F.col("_is_left") == 0,
        F.struct(F.col(rts).alias("ts"), *[F.col(t).alias(t) for t in tagged]),
    )
    u = u.withColumn("_carry", F.last(carry, ignorenulls=True).over(w))
    u = u.withColumn(rts, F.col("_carry.ts"))
    for t in tagged:
        u = u.withColumn(t, F.col(f"_carry.{t}"))

    out = u.where(F.col("_is_left") == 1).drop("_is_left", "_carry")
    if tolerance_us is not None:
        from ..tsutil import unix_micros_ntz as us

        fresh = us(ts_col) - us(rts) <= F.lit(int(tolerance_us))
        for c in (*tagged, rts):
            out = out.withColumn(c, F.when(fresh, F.col(c)))
    return out
