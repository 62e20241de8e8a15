"""Distributed as-of join (operators/asof.py)."""

from __future__ import annotations

import contextlib
import datetime as dt
import io
import re

from pyspark.sql import functions as F

from open_buildings_spark.operators import asof


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts(5), "l5"),
            (2, 10, _ts(10), "l10"),
            (3, 10, _ts(2), "l2-before-any-right"),
            (4, 20, _ts(7), "other-key"),
            (5, 30, _ts(9), "key-with-no-right"),
        ],
        "event_id long, user_id long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (10, _ts(3), 3.0),
            (10, _ts(5), 5.0),  # tie with left l5: ts_r == ts_l matches
            (10, _ts(8), 8.0),
            (20, _ts(1), 1.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    return left, right


def test_asof_basic_semantics(spark):
    left, right = _frames(spark)
    out = {
        r["event_id"]: (r["value_asof"], r["ts_asof"])
        for r in asof.asof_join(left, right).collect()
    }
    assert out[1] == (5.0, _ts(5))  # tie: ts_r == ts_l wins
    assert out[2] == (8.0, _ts(8))  # latest <= 10 min
    assert out[3] == (None, None)  # left precedes all right rows
    assert out[4] == (1.0, _ts(1))  # keys independent
    assert out[5] == (None, None)  # no right rows for key
    # all left columns survive
    cols = asof.asof_join(left, right).columns
    assert {"event_id", "user_id", "ts", "tag", "value_asof", "ts_asof"} <= set(cols)


def test_asof_tolerance(spark):
    left, right = _frames(spark)
    out = {
        r["event_id"]: r["value_asof"]
        for r in asof.asof_join(left, right, tolerance_us=2 * 60 * 1_000_000).collect()
    }
    assert out[1] == 5.0  # lag 0 <= 2 min
    assert out[2] == 8.0  # lag 2 min, inclusive bound
    assert out[4] is None  # lag 6 min > 2 min -> nulled


def test_asof_duplicate_right_ts_deterministic(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(5))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(10, _ts(3), 2.0), (10, _ts(3), 7.0)],
        "user_id long, ts timestamp, value double",
    )
    got = asof.asof_join(left, right).collect()[0]
    assert got["value_asof"] == 7.0  # per-(key, ts) MAX reduction


def test_asof_null_right_value_keeps_row_atomicity(spark):
    """A right row with NULL value must null the match, not resurrect an
    older value next to the newer timestamp."""
    left = spark.createDataFrame(
        [(1, 10, _ts(9))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(10, _ts(3), 3.0), (10, _ts(8), None)],
        "user_id long, ts timestamp, value double",
    )
    got = asof.asof_join(left, right).collect()[0]
    assert got["ts_asof"] == _ts(8) and got["value_asof"] is None


def test_asof_plan_single_exchange_no_join(spark):
    """The whole operator is one hash exchange + window — no join node,
    no range-join explosion."""
    left, right = _frames(spark)
    df = asof.asof_join(left, right)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    nodes = re.findall(r"^\(\d+\) (\w+)", buf.getvalue(), re.M)
    assert not any("Join" in n for n in nodes)
    assert sum(1 for n in nodes if n == "Window") == 1
    # the headline property: exactly ONE shuffle for the whole operator
    assert sum(1 for n in nodes if n == "Exchange") == 1
    assert not any("Broadcast" in n for n in nodes)


def test_asof_matches_pandas_merge_asof(spark):
    """Randomized cross-check against pandas' reference merge_asof."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    n_l, n_r = 400, 300
    lpdf = pd.DataFrame(
        {
            "event_id": np.arange(n_l),
            "user_id": rng.integers(0, 12, n_l),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10_000, n_l), unit="s"),
        }
    )
    rpdf = pd.DataFrame(
        {
            "user_id": rng.integers(0, 12, n_r),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10_000, n_r), unit="s"),
            "value": rng.uniform(0, 100, n_r).round(2),
        }
    )
    # mirror the operator's per-(key, ts) MAX reduction before merge_asof
    rdedup = rpdf.groupby(["user_id", "ts"], as_index=False)["value"].max()
    want = pd.merge_asof(
        lpdf.sort_values("ts", kind="stable"),
        rdedup.sort_values("ts", kind="stable"),
        on="ts",
        by="user_id",
        direction="backward",
    ).sort_values("event_id")
    got = (
        asof.asof_join(
            spark.createDataFrame(lpdf), spark.createDataFrame(rpdf)
        )
        .select("event_id", "value_asof")
        .toPandas()
        .sort_values("event_id")
    )
    lw = want["value"].to_numpy()
    lg = got["value_asof"].to_numpy()
    assert ((lw == lg) | (pd.isna(lw) & pd.isna(lg))).all()


def test_funnel_batch_matches_brute_force(spark):
    """funnel_batch's stage-pointer fold vs a per-user python replay of
    the first-occurrence chaining rule over the real events table."""
    from open_buildings_spark.streaming import events as events_ops

    sf_dir = "/root/testdata/sf0.001"
    got = {
        r["stage"]: (r["stage_name"], r["n_users"])
        for r in events_ops.funnel_batch(spark, sf_dir).collect()
    }
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "ts", "event_type")
        .collect()
    )
    stages = {"view": 1, "click": 2, "purchase": 3}
    per_user = {}
    for r in ev:
        if r["event_type"] in stages:
            per_user.setdefault(r["user_id"], []).append(
                (r["ts"], stages[r["event_type"]])
            )
    counts = [0, 0, 0, 0]
    for evs in per_user.values():
        s = 0
        for _, k in sorted(evs):
            if k == s + 1:
                s += 1
        for i in range(1, s + 1):
            counts[i] += 1
    assert got[1] == ("view", counts[1])
    assert got[2] == ("click", counts[2])
    assert got[3] == ("purchase", counts[3])
    assert counts[1] >= counts[2] >= counts[3] > 0
