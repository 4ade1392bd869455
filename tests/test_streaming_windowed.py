"""Watermarked windowed aggregation (late rows dropped, on-time rows
finalized) and the applyInPandasWithState running-totals operator
(state survives across micro-batches)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from rse_spark.streaming.windowed import (
    running_user_totals,
    windowed_event_counts,
)

EVENTS = "/root/testdata/sf0.001/events.parquet"


def _write_batches(spark, src):
    """Five single-file writes -> five micro-batches (maxFilesPerTrigger
    = 1; coalesce(1) so one write = one file; spaced mtimes so the file
    source sees them in order).

    Spark drops a late row only once its WINDOW's state has been
    evicted, and eviction happens at the END of the batch in which the
    watermark passes the window end — so the late row must arrive one
    batch AFTER the flush (verified: that batch reports
    numRowsDroppedByWatermark=1)."""
    base = dt.datetime(2024, 1, 1)
    batches = [
        pd.DataFrame({
            "ts": [base + dt.timedelta(minutes=m) for m in (5, 20, 70)],
            "user_id": [1, 1, 2],
            "value": [10.0, 20.0, 30.0],
        }),
        pd.DataFrame({              # advances wm to 01:30 for batch 2
            "ts": [base + dt.timedelta(hours=2, minutes=30)],
            "user_id": [2], "value": [40.0],
        }),
        pd.DataFrame({              # batch 2 runs at wm 01:30: flushes
            "ts": [base + dt.timedelta(hours=3)],   # the 00:00 window
            "user_id": [2], "value": [5.0],
        }),
        pd.DataFrame({              # LATE: window [00:00,01:00) already
            "ts": [base + dt.timedelta(minutes=1)],  # evicted -> DROPPED
            "user_id": [1], "value": [99.0],
        }),
        pd.DataFrame({
            "ts": [base + dt.timedelta(hours=6)],
            "user_id": [3], "value": [1.0],
        }),
    ]
    import time

    for i, pdf in enumerate(batches):
        spark.createDataFrame(pdf).coalesce(1).write.parquet(
            f"{src}/b{i}"
        )
        time.sleep(1.1)
    return spark.createDataFrame(batches[0]).schema


def test_watermark_drops_late_rows(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("win_src"))
    sink = str(tmp_path_factory.mktemp("win_sink"))
    ckpt = str(tmp_path_factory.mktemp("win_ckpt"))
    schema = _write_batches(spark, src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")  # b1/b2/b3 are subdirectories
    )
    q = (
        windowed_event_counts(stream, window="1 hour", watermark="1 hour")
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = {
        r["window_start"]: (r["n_events"], r["sum_value"])
        for r in spark.read.parquet(sink).collect()
    }
    base = dt.datetime(2024, 1, 1)
    # the 00:00 window finalized with exactly the 2 ON-TIME events — the
    # 00:01 row from batch 2 arrived behind the 00:10 watermark and was
    # DROPPED (n would be 3 otherwise). Later windows are still open at
    # the final watermark (05:00), except 01:00/02:00 which may finalize
    # depending on the closing flush — assert the invariants, not the
    # flush timing.
    assert out[base] == (2, 30.0)
    assert all(
        ws >= base + dt.timedelta(hours=1) for ws in out if ws != base
    )


def test_running_totals_state_across_batches(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("state_src"))
    sink = str(tmp_path_factory.mktemp("state_sink"))
    ckpt = str(tmp_path_factory.mktemp("state_ckpt"))
    schema = _write_batches(spark, src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")  # b1/b2/b3 are subdirectories
    )
    q = (
        running_user_totals(stream)
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.read.parquet(sink).collect()
    finals = {}
    for r in rows:
        key = (r["user_id"], r["total_events"])
        finals[r["user_id"]] = max(
            finals.get(r["user_id"], 0), r["total_events"]
        )
    # the stateful op sees ALL rows (no watermark): user 1 = 2 + the
    # "late" one = 3; user 2 = 3 across three batches; user 3 = 1 —
    # cumulative counts prove state persisted across micro-batches
    assert finals == {1: 3, 2: 3, 3: 1}
    totals = {
        (r["user_id"], r["total_events"]): r["total_value"] for r in rows
    }
    assert totals[(1, 3)] == pytest.approx(129.0)
    assert totals[(2, 3)] == pytest.approx(75.0)
