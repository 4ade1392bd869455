"""As-of (point-in-time) join and interval/range join — the two
time-series operators the task directive calls out that Spark lacks as
built-ins. Both are compositions of existing DataFrame ops (no UDFs,
no cartesian products).

as-of join (backward, inclusive): for every left row, the single right
row with the greatest ts <= left.ts within the same key — attribution
("last click before this purchase"), sensor alignment, PIT features.

    Spark-first plan: UNION the two sides with a side tag, one window
    partitioned by key ordered by (ts, side, tiebreak), and
    last(right_value, ignorenulls) over rowsBetween(unboundedPreceding,
    0). ONE shuffle on the key, no join explosion, no per-key python —
    the standard large-scale point-in-time-join shape. Right rows sort
    before left rows at equal ts, making the match inclusive exactly
    like DuckDB's ASOF JOIN (the correctness oracle).

interval join: points matched to [start, end] intervals. With a shared
equi key the range predicate rides on a hash join (never cartesian).
Without one, intervals and points are EXPLODED onto coarse time
buckets (one row per bucket an interval overlaps) and joined on the
bucket — the classic bucketized range join; bucket width trades
duplication against candidate-filter selectivity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts: str = "ts",
    right_cols: list[str] | None = None,
    tolerance_ms: int | None = None,
) -> DataFrame:
    """Backward inclusive as-of join. Returns every left row plus, for
    each of ``right_cols``, the value from the latest right row with
    right.ts <= left.ts in the same ``by`` group (NULL when none).

    ``tolerance_ms``: matches older than this are nulled out (pandas
    merge_asof semantics).

    The right side is deduplicated to one row per (by, ts) — latest
    tiebreak column order — so the match is deterministic even with
    timestamp collisions."""
    right_cols = right_cols or [
        c for c in right.columns if c not in (by, ts)
    ]
    # one row per (by, ts) on the right: deterministic under ties.
    # With no value columns (right is just by+ts) any one row per
    # (by, ts) is equivalent — order by ts to keep the window valid.
    w_dedup = Window.partitionBy(by, ts).orderBy(
        *([F.desc(c) for c in right_cols] or [F.col(ts)])
    )
    r = (
        right.select(by, ts, *right_cols)
        .withColumn("_rn", F.row_number().over(w_dedup))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

    l_tag = left.select(
        by, ts,
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        *[F.lit(None).cast(r.schema[c].dataType).alias(f"_r_{c}")
          for c in right_cols],
    )
    r_tag = r.select(
        by, ts,
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            l_tag.schema["_l"].dataType
        ).alias("_l"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    # right rows (side 0) sort before left rows (side 1) at equal ts ->
    # inclusive backward match
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = l_tag.unionByName(r_tag)
    picked = [
        F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_m_{c}")
        for c in right_cols
    ]
    match_ts = F.last(
        F.when(F.col("_side") == 0, F.col(ts)), ignorenulls=True
    ).over(w).alias("_m_ts")
    out = (
        merged.select("*", *picked, match_ts)
        .filter(F.col("_side") == 1)
    )
    if tolerance_ms is not None:
        too_old = (
            F.unix_millis(F.col(ts).cast("timestamp"))
            - F.unix_millis(F.col("_m_ts").cast("timestamp"))
        ) > tolerance_ms
        out = out.select(
            "*",
            *[
                F.when(too_old, F.lit(None)).otherwise(
                    F.col(f"_m_{c}")
                ).alias(f"_t_{c}")
                for c in right_cols
            ],
        )
        matched = {c: f"_t_{c}" for c in right_cols}
    else:
        matched = {c: f"_m_{c}" for c in right_cols}
    return out.select(
        F.col("_l.*"),
        *[F.col(src).alias(f"r_{c}") for c, src in matched.items()],
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts: str = "ts",
    start: str = "start",
    end: str = "end",
    by: str | None = None,
    bucket_ms: int = 3_600_000,
) -> DataFrame:
    """Rows of ``points`` joined to every interval containing them
    (inclusive bounds).

    With ``by``: hash join on the key + range predicate (never a
    cartesian). Without: both sides are exploded onto ``bucket_ms``-wide
    time buckets and joined on the bucket before the exact range filter
    — candidate pairs are bounded by bucket co-residency instead of
    |points| x |intervals|.

    Interval-side columns whose names collide with point-side columns
    (other than the ``by`` key) are renamed to ``i_<name>`` in the
    output, so the joined frame is never ambiguous downstream."""
    keep = {by} if by is not None else set()
    point_names = set(points.columns)
    renames = {}
    for c in intervals.columns:
        if c in point_names and c not in keep:
            alias = f"i_{c}"
            while alias in point_names or alias in intervals.columns:
                alias = "_" + alias
            intervals = intervals.withColumnRenamed(c, alias)
            renames[c] = alias
    start = renames.get(start, start)
    end = renames.get(end, end)
    cond = (F.col(ts) >= F.col(start)) & (F.col(ts) <= F.col(end))
    if by is not None:
        return points.join(intervals, on=by).filter(cond)
    p_ms = F.unix_millis(F.col(ts).cast("timestamp"))
    s_ms = F.unix_millis(F.col(start).cast("timestamp"))
    e_ms = F.unix_millis(F.col(end).cast("timestamp"))
    p = points.withColumn("_bkt", (p_ms / bucket_ms).cast("long"))
    i = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                (s_ms / bucket_ms).cast("long"),
                (e_ms / bucket_ms).cast("long"),
            )
        ),
    )
    return p.join(i, "_bkt").filter(cond).drop("_bkt")
