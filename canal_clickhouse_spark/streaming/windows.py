"""Event-time windows: tumbling, sliding, session (batch-mode oracle-checked).

ClickHouse expresses these as toStartOfInterval/time-bucket GROUP BYs and
(for sessions) neighbor/gaps analyses; Spark's ``window()`` /
``session_window()`` are the idiomatic equivalents and behave identically on
bounded input, which is what makes these keys hash-checkable against DuckDB.

Scale: a tumbling/sliding window agg is one hash aggregation — the window
struct is just a derived grouping key, so partial aggregation applies and the
shuffle carries only per-(window, key) partials. Session windows need a
per-user sort+merge; Spark plans that as a single shuffle on user_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


@query(
    "stream_tumbling",
    oracle="""
    SELECT time_bucket(INTERVAL 1 HOUR, ts) AS win_start,
           event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS total
    FROM events
    GROUP BY win_start, event_type
    """,
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n", "total")
    )


@query(
    "stream_sliding",
    oracle="""
    WITH assigned AS (
        SELECT time_bucket(INTERVAL 1 HOUR, ts) AS win_start, value FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL 1 HOUR, ts, INTERVAL 30 MINUTE) AS win_start,
               value
        FROM events
    )
    SELECT win_start, COUNT(*) AS n, ROUND(SUM(value), 2) AS total
    FROM assigned
    GROUP BY win_start
    """,
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1h windows sliding every 30min: each event lands in two windows.

    The oracle derives the same assignment as two offset hourly bucketings —
    the :00-anchored and :30-anchored window families.
    """
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(F.col("w.start").alias("win_start"), "n", "total")
    )


@query(
    "stream_session",
    oracle="""
    WITH seq AS (
        SELECT user_id, ts, value,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, value)
    ),
    sess AS (
        SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, value
                                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM seq
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total
    FROM sess
    GROUP BY user_id, sid
    """,
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 30-minute inactivity gap.

    Session end = last event + gap (Spark's definition); an event exactly
    ``gap`` after the previous one starts a NEW session (window end is
    exclusive), hence ``>=`` in the oracle's gaps-and-islands flag — verified
    empirically, SURVEY.md §7.4.
    """
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total",
        )
    )
