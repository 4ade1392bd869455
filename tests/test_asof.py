"""As-of join semantics (backward inclusive, tolerance, no-match) and
interval join (keyed vs bucketized paths agree)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from rse_spark.functions.asof import asof_join, interval_join


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


def test_asof_backward_inclusive(spark):
    left = spark.createDataFrame(pd.DataFrame({
        "k": ["a", "a", "a", "b"],
        "ts": [_ts(10), _ts(20), _ts(5), _ts(10)],
        "lid": [1, 2, 3, 4],
    }))
    right = spark.createDataFrame(pd.DataFrame({
        "k": ["a", "a", "b"],
        "ts": [_ts(10), _ts(15), _ts(30)],
        "rid": [100, 200, 300],
    }))
    got = {
        r["lid"]: r["r_rid"]
        for r in asof_join(left, right, by="k", ts="ts",
                           right_cols=["rid"]).collect()
    }
    # lid=1 at :10 matches rid=100 (equal ts inclusive); lid=2 at :20
    # matches rid=200; lid=3 at :05 has no earlier right row; lid=4's
    # only right row is later
    assert got == {1: 100, 2: 200, 3: None, 4: None}


def test_asof_tolerance(spark):
    left = spark.createDataFrame(pd.DataFrame({
        "k": ["a", "a"], "ts": [_ts(10), _ts(40)], "lid": [1, 2],
    }))
    right = spark.createDataFrame(pd.DataFrame({
        "k": ["a"], "ts": [_ts(9)], "rid": [100],
    }))
    got = {
        r["lid"]: r["r_rid"]
        for r in asof_join(
            left, right, by="k", ts="ts", right_cols=["rid"],
            tolerance_ms=10 * 60 * 1000,
        ).collect()
    }
    assert got == {1: 100, 2: None}  # :40 is 31 min past :09 — too old


def test_asof_tie_deterministic(spark):
    # two right rows at the identical (k, ts): highest tiebreak wins
    left = spark.createDataFrame(pd.DataFrame({
        "k": ["a"], "ts": [_ts(10)], "lid": [1],
    }))
    right = spark.createDataFrame(pd.DataFrame({
        "k": ["a", "a"], "ts": [_ts(10), _ts(10)], "rid": [7, 9],
    }))
    rows = asof_join(left, right, by="k", ts="ts",
                     right_cols=["rid"]).collect()
    assert [r["r_rid"] for r in rows] == [9]


def test_interval_join_bucketized_matches_keyed(spark):
    ev = spark.read.parquet(
        "/root/testdata/sf0.001/events.parquet"
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        "user_id",
        F.col("ts").alias("start"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("end"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value",
        F.col("event_id").alias("pid"),
    )
    keyed = interval_join(purchases, signups, ts="ts", by="user_id")
    keyed_pairs = {
        (r["signup_id"], r["pid"]) for r in keyed.collect()
    }
    # bucketized path has no equi key: same-user constraint applied
    # after the range match to compare apples to apples
    bucketized = interval_join(
        purchases.withColumnRenamed("user_id", "p_user"),
        signups, ts="ts", by=None, bucket_ms=30 * 60 * 1000,
    ).filter(F.col("p_user") == F.col("user_id"))
    buck_pairs = {
        (r["signup_id"], r["pid"]) for r in bucketized.collect()
    }
    assert keyed_pairs == buck_pairs
    assert keyed_pairs, "expected at least one purchase in a window"


def test_asof_empty_right_cols(spark):
    """Right side with only (by, ts): asof_join must not build a
    zero-column window orderBy (round-2 ADVICE)."""
    import pandas as pd

    left = spark.createDataFrame(pd.DataFrame({
        "k": ["a", "a"], "ts": [_ts(10), _ts(20)], "lid": [1, 2],
    }))
    right = spark.createDataFrame(pd.DataFrame({
        "k": ["a"], "ts": [_ts(15)],
    }))
    rows = asof_join(left, right, by="k", ts="ts").collect()
    assert sorted(r["lid"] for r in rows) == [1, 2]


def test_interval_join_shared_names_unambiguous(spark):
    """Bucketized interval_join with colliding column names on both
    sides: interval-side collisions are renamed i_<name> so downstream
    references never hit an ambiguous-column error (round-2 ADVICE)."""
    import pandas as pd

    points = spark.createDataFrame(pd.DataFrame({
        "user_id": [1, 2], "ts": [_ts(10), _ts(59)], "v": [5, 6],
    }))
    intervals = spark.createDataFrame(pd.DataFrame({
        "user_id": [7], "start": [_ts(0)], "end": [_ts(20)],
        "iv": ["w"],
    }))
    out = interval_join(points, intervals, ts="ts", by=None,
                        bucket_ms=60_000)
    # both user_id columns survive, disambiguated
    assert "user_id" in out.columns and "i_user_id" in out.columns
    rows = out.select("user_id", "i_user_id", "iv", "v").collect()
    assert [(r["user_id"], r["i_user_id"], r["iv"], r["v"])
            for r in rows] == [(1, 7, "w", 5)]
