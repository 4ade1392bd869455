"""Event-time streaming aggregation: watermarked tumbling windows and a
custom stateful operator (applyInPandasWithState).

The reference has no event-time processing (its loop is a poll queue);
these are the streaming operators the task directive adds: windowed
aggregates that tolerate late data up to a watermark, and arbitrary
per-key state for what windows can't express. Both run identically on
a cluster — state lives in the checkpointed state store, keyed by the
grouping columns, so parallelism follows the key hash like any shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_event_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    by: list[str] | None = None,
) -> DataFrame:
    """Tumbling event-time window counts with late-data tolerance.

    Events later than ``watermark`` behind the max seen event time are
    dropped; windows finalize (append-mode emit) once the watermark
    passes their end — the standard unbounded-stream aggregation that a
    100 TB/day event feed needs (state is bounded by watermark horizon,
    not stream length)."""
    by = by or []
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), *by)
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *by,
            "n_events",
            "sum_value",
        )
    )


_RUNNING_OUT = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("batch_events", T.LongType()),
    T.StructField("total_events", T.LongType()),
    T.StructField("total_value", T.DoubleType()),
])
_RUNNING_STATE = T.StructType([
    T.StructField("n", T.LongType()),
    T.StructField("v", T.DoubleType()),
])


def _running_totals(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user cumulative counters across micro-batches."""
    n, v = state.get if state.exists else (0, 0.0)
    batch_n = 0
    for pdf in pdfs:
        batch_n += len(pdf)
        v += float(pdf["value"].sum())
    n += batch_n
    state.update((n, v))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "batch_events": [batch_n],
            "total_events": [n],
            "total_value": [round(v, 2)],
        }
    )


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Custom stateful operator: cumulative per-user event count/value
    maintained in the state store across micro-batches — the
    applyInPandasWithState escape hatch for semantics windows can't
    express (lifetime counters, custom sessionization, CDC merge)."""
    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _running_totals,
            outputStructType=_RUNNING_OUT,
            stateStructType=_RUNNING_STATE,
            outputMode="append",  # final-per-batch emissions; file sinks are append-only
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
