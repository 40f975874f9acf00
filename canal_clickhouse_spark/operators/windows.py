"""§2 E — Window functions (ClickHouse window surface → Spark Window specs).

Every spec orders by a unique tie-break key (§7.5.3) so rank/offset functions
are deterministic. Running/moving float sums go through per-row decimal casts
(exact, order-free) with the double cast at the end — the frame-slide
accumulate/retract path otherwise drifts between engines.

Scale note: window partitions here are user_id / custkey / returnflag — high
cardinality or low skew; at 100 TB a single shuffle on the partition key is
the cost, identical to the reference's sort-by-key requirement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


@query(
    "win_row_number",
    oracle="""
    SELECT o_custkey, o_orderkey,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate DESC, o_orderkey) AS rn
    FROM orders
    """,
)
def win_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey")
    )
    return o.select("o_custkey", "o_orderkey", F.row_number().over(w).alias("rn"))


@query(
    "win_rank",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           rank() OVER w AS rnk, dense_rank() OVER w AS drnk
    FROM lineitem
    WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity DESC)
    """,
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(F.col("l_quantity").desc())
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@query(
    "win_ntile",
    oracle="""
    SELECT c_custkey,
           ntile(4) OVER (PARTITION BY c_mktsegment
                          ORDER BY c_acctbal, c_custkey) AS quartile
    FROM customer
    """,
)
def win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select("c_custkey", F.ntile(4).over(w).alias("quartile"))


@query(
    "win_percent",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume
    FROM lineitem
    WINDOW w AS (PARTITION BY l_linestatus ORDER BY l_quantity)
    """,
)
def win_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    # (rank-1)/(n-1) and cume/n are single exact-int divisions — identical
    # doubles in both engines, no rounding needed.
    li = table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_linestatus").orderBy("l_quantity")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@query(
    "win_lag_lead",
    oracle="""
    SELECT event_id, user_id, value,
           lag(value, 1) OVER w AS prev_value,
           lead(value, 1) OVER w AS next_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ClickHouse neighbor(): prev/next row within user timeline.
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value", 1).over(w).alias("prev_value"),
        F.lead("value", 1).over(w).alias("next_value"),
    )


@query(
    "win_first_last",
    oracle="""
    SELECT event_id, user_id,
           first_value(event_type) OVER
             (PARTITION BY user_id ORDER BY event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_type,
           last_value(event_type) OVER
             (PARTITION BY user_id ORDER BY event_id
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS last_type
    FROM events
    """,
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    w_head = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_tail = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    return ev.select(
        "event_id",
        "user_id",
        F.first("event_type").over(w_head).alias("first_type"),
        F.last("event_type").over(w_tail).alias("last_type"),
    )


@query(
    "win_running_sum",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER
             (PARTITION BY user_id ORDER BY event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_total
    FROM events
    """,
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.sum(F.col("value").cast("decimal(18,2)")).over(w)
    return ev.select(
        "event_id", "user_id", running.cast("double").alias("running_total")
    )


@query(
    "win_moving_avg",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
             / COUNT(*) OVER w AS moving_avg
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # avg() over a sliding frame accumulates/retracts floats — engine-specific
    # drift. Exact decimal SUM / COUNT is one deterministic double division.
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(-2, 0)
    msum = F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double")
    return ev.select(
        "event_id", "user_id", (msum / F.count(F.lit(1)).over(w)).alias("moving_avg")
    )


@query(
    "win_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) OVER
             (PARTITION BY o_custkey ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
              RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS spend_30d
    FROM orders
    """,
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 30-day trailing spend per customer: RANGE frame over epoch seconds.
    # o_orderdate is TIMESTAMP_NTZ (parquet, not UTC-adjusted): no direct
    # long cast — hop through LTZ, exact under the pinned-UTC session.
    o = table(spark, sf_dir, "orders").withColumn(
        "odate_s", F.col("o_orderdate").cast("timestamp").cast("long")
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("odate_s")
        .rangeBetween(-30 * 86400, 0)
    )
    spend = F.sum(F.col("o_totalprice").cast("decimal(28,2)")).over(w)
    return o.select(
        "o_orderkey", "o_custkey", spend.cast("double").alias("spend_30d")
    )


@query(
    "topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ClickHouse LIMIT BY: top-3 orders per customer by price.
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@query(
    "win_nth_value",
    oracle="""
    SELECT event_id, user_id, value,
           nth_value(value, 3) OVER (
               PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS third_val,
           LEAD(value, 2, -1.0) OVER (
               PARTITION BY user_id ORDER BY event_id) AS lead2,
           LAG(value, 3) OVER (
               PARTITION BY user_id ORDER BY event_id) AS lag3
    FROM events ORDER BY event_id
    """,
)
def win_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``nth_value`` + offset lead/lag with defaults: the 3rd value seen
    so far per user (running frame), the value 2 ahead with a −1 default,
    and the value 3 back (NULL default). event_id is unique per user, so
    the frame order is total.
    """
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return e.select(
        "event_id",
        "user_id",
        "value",
        F.nth_value("value", 3).over(running).alias("third_val"),
        F.lead("value", 2, -1.0).over(w).alias("lead2"),
        F.lag("value", 3).over(w).alias("lag3"),
    ).orderBy("event_id")


@query(
    "win_running_distinct",
    oracle="""
    WITH marked AS (
        SELECT user_id, event_id, ts, event_type,
               CASE WHEN ROW_NUMBER() OVER (
                        PARTITION BY user_id, event_type
                        ORDER BY ts, event_id) = 1
                    THEN 1 ELSE 0 END AS first_seen
        FROM events
    )
    SELECT user_id, event_id,
           CAST(SUM(first_seen) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS BIGINT)
               AS distinct_types_so_far
    FROM marked ORDER BY user_id, event_id
    """,
)
def win_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) over a window — which no SQL engine supports
    directly — via the first-occurrence decomposition: mark each (user,
    event_type)'s first event with one ROW_NUMBER window, then a running
    SUM of the marks gives the cumulative distinct-type count at every
    event (CH would reach for uniqState rollups here).

    Two windows, but BOTH partition on user_id — Spark plans a single
    user_id exchange and two in-partition sorts ((user,type,ts) then
    (user,ts)). Exact at unbounded distinct cardinality, unlike sketch
    alternatives, and every step is integer.
    """
    ev = table(spark, sf_dir, "events")
    first_w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    run_w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.row_number().over(first_w) == 1, 1).otherwise(0).alias(
            "first_seen"
        ),
    )
    return marked.select(
        "user_id",
        "event_id",
        F.sum("first_seen").over(run_w).cast("bigint").alias(
            "distinct_types_so_far"
        ),
    ).orderBy("user_id", "event_id")
