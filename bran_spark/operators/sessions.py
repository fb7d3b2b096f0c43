"""Gap-based sessionization over the events stream (SURVEY.md §2.9: the
reference has no temporal operators; this demonstrates the session-window
class the driver's ``events`` table exists for).

Uses Spark's native ``session_window`` (the same operator Structured
Streaming uses for stateful session aggregation, so the batch query here is
literally the streaming query under ``readStream``): one shuffle on the
user key, sessions merged JVM-side. Session semantics (verified against
Spark 4.1's session_window): successive gaps ≤ ``gap`` merge — an event
exactly ``gap`` after its predecessor is still the SAME session; only a
strictly larger gap starts a new one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _gap_seconds(gap: str) -> int:
    """'<n> seconds|minutes|hours' -> seconds (the subset session_window
    accepts here); keeping end_ts's correction derived from the SAME string
    avoids the desync footgun of a second independent parameter."""
    qty, unit = gap.strip().split()
    mult = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
            "hour": 3600, "hours": 3600}
    return int(qty) * mult[unit.lower()]


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
) -> DataFrame:
    """Per-user sessions: (user_id, start_ts, end_ts, n_events, total_value).

    ``end_ts`` is the last event's timestamp (session_window.end minus the
    gap, since Spark extends every window ``gap`` past its last event) —
    the subtracted interval is DERIVED from ``gap``, never a second
    parameter that could silently disagree with it.
    """
    gap_seconds = _gap_seconds(gap)
    return (
        events.groupBy(
            F.col(user_col), F.session_window(F.col(ts_col), gap).alias("w")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            user_col,
            F.col("w.start").alias("start_ts"),
            (F.col("w.end") - F.expr(f"INTERVAL {gap_seconds} SECONDS")).alias(
                "end_ts"
            ),
            "n_events",
            F.round(F.col("total_value"), 6).alias("total_value"),
        )
    )


def bucketed_interval_join(
    intervals: DataFrame,
    hour_windows: DataFrame,
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    window_col: str = "window_start",
) -> DataFrame:
    """Interval-overlap join between arbitrary [start, end] intervals and
    HOUR-ALIGNED [w, w+1h) windows — as an EQUI-join.

    The naive formulation (`a.start < w + 1h AND a.end >= w`) is a range
    join: Spark plans it as a broadcast nested-loop / cartesian — O(|A|·|B|)
    and a guaranteed non-starter at scale. Instead each interval explodes
    into the hour buckets it covers (sequence of date_trunc'd hours —
    bounded fan-out: one row per covered hour) and equi-joins on the
    bucket. For hour-aligned windows the bucket match IS the overlap
    predicate (proof in q80's docstring), so no residual verify filter is
    needed; for non-aligned windows add the overlap predicate post-join —
    same plan shape, tiny residual filter.

    Preconditions (enforced by the pre-filter below): rows with a NULL
    start/end or an inverted interval (end < start) are DROPPED before the
    explode — `sequence` would yield NULL (row silently vanishes) for the
    former and throw mid-job for the latter. Callers needing those rows
    must handle them upstream.
    """
    intervals = intervals.where(
        F.col(start_col).isNotNull()
        & F.col(end_col).isNotNull()
        & (F.col(start_col) <= F.col(end_col))
    )
    hours = intervals.withColumn(
        "_h",
        F.explode(
            F.sequence(
                F.date_trunc("hour", F.col(start_col)),
                F.date_trunc("hour", F.col(end_col)),
                F.expr("INTERVAL 1 HOUR"),
            )
        ),
    )
    return hours.join(
        hour_windows, hours["_h"] == hour_windows[window_col]
    ).drop("_h")


def burst_scores(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    z_threshold: float = 2.0,
) -> DataFrame:
    """Per-stream burst detection over hourly buckets — the temporal
    anomaly alarm a feed-ingest pipeline runs per source/event type
    (a crawler gone hot, a spam flood, a replayed backfill):

      z(type, hour) = (count − mean_type) / stddev_type,
      burst ⇔ z ≥ z_threshold

    Mean/variance come from exact integer bucket counts via the
    two-moment identity (var = Σc²/n − (Σc/n)²) — the SAME fixed
    expression tree in every engine, instead of a library stddev whose
    accumulation order could differ. Two aggregates: (type, hour)
    counts, then per-type moments joined back (types are
    dimension-scale). Zero-variance streams yield NULL z (no burst by
    definition). Output: (event_type, bucket_start, n, z, burst)."""
    buckets = (
        events.groupBy(
            F.col(type_col).alias("event_type"),
            F.window(ts_col, "1 hour").alias("w"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            "event_type",
            F.unix_timestamp("w.start").alias("bucket_start"),
            "n",
        )
    )
    moments = buckets.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("nh"),
        F.sum("n").cast("double").alias("s1"),
        F.sum(F.col("n") * F.col("n")).cast("double").alias("s2"),
    )
    mean = F.col("s1") / F.col("nh")
    var = F.col("s2") / F.col("nh") - mean * mean
    z = (F.col("n") - mean) / F.sqrt(var)
    return (
        buckets.join(F.broadcast(moments), "event_type")
        .select(
            "event_type",
            "bucket_start",
            "n",
            F.when(var > 0, F.round(z, 6)).alias("z"),
            F.coalesce(
                F.when(var > 0, F.round(z, 6) >= z_threshold), F.lit(False)
            ).alias("burst"),
        )
    )
