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


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-user sessions: (user_id, start_ts, end_ts, n_events, total_value).

    ``end_ts`` is the last event's timestamp (session_window.end minus the
    gap, since Spark extends every window ``gap`` past its last event).
    """
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
