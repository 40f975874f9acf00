"""§2 D — Aggregations (ClickHouse hash-agg surface → Spark groupBy/agg).

Spark plans partial (map-side) + final aggregation automatically; at 100 TB the
only knobs that matter are shuffle partition count (AQE coalesces) and keeping
expressions JVM-side. Every query here is whole-stage-codegen'd end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..exprs import charge, disc_price, dsum, ravg
from ..registry import query

_DSUM_QTY = "CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(28,2))), 2) AS DOUBLE)"
_DSUM_PRICE = "CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(28,2))), 2) AS DOUBLE)"


@query(
    "agg_groupby",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(28,2))), 2) AS DOUBLE) AS sum_qty,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(28,2))), 2) AS DOUBLE) AS sum_base_price,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))), 2) AS DOUBLE) AS sum_disc_price,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,8))), 2) AS DOUBLE) AS sum_charge,
           ROUND(AVG(l_quantity), 2) AS avg_qty,
           ROUND(AVG(l_extendedprice), 2) AS avg_price,
           ROUND(AVG(l_discount), 4) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H Q1-style pricing summary (SURVEY.md §7.2).

    scan → filter (pushed to parquet) → project → partial+final hash agg →
    sort. The shipdate predicate prunes row groups via parquet stats.
    """
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price(), "sum_disc_price", scale=6),
            dsum(charge(), "sum_charge", scale=8),
            ravg("l_quantity", "avg_qty"),
            ravg("l_extendedprice", "avg_price"),
            ravg("l_discount", "avg_disc", 4),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "agg_global",
    oracle=f"""
    SELECT COUNT(*) AS n_rows,
           {_DSUM_QTY} AS sum_qty,
           {_DSUM_PRICE} AS sum_price,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price,
           ROUND(AVG(l_discount), 4) AS avg_disc
    FROM lineitem
    """,
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("l_quantity", "sum_qty"),
        dsum("l_extendedprice", "sum_price"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        ravg("l_discount", "avg_disc", 4),
    )


@query(
    "agg_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           CAST(ROUND(SUM(DISTINCT CAST(l_quantity AS DECIMAL(28,2))), 2) AS DOUBLE) AS sum_distinct_qty
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count_distinct("l_partkey").alias("n_parts"),
            F.count_distinct("l_suppkey").alias("n_supps"),
            F.round(F.sum_distinct(F.col("l_quantity").cast("decimal(28,2)")), 2)
            .cast("double")
            .alias("sum_distinct_qty"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_approx_distinct",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           abs(approx_count_distinct(user_id) - COUNT(DISTINCT user_id))
             <= 0.1 * COUNT(DISTINCT user_id) AS within_10pct
    FROM events GROUP BY event_type
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``uniq()`` analog — HyperLogLog++ cardinality estimate.

    Raw HLL estimates are engine-specific, so the hash-checked output is
    the estimator CONTRACT: each engine's own estimate lands within 10% of
    the exact count it computes alongside (rsd here is 2%, so the margin is
    5 sigma)."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        (
            F.abs(
                F.approx_count_distinct("user_id", 0.02) - F.countDistinct("user_id")
            )
            <= 0.1 * F.countDistinct("user_id")
        ).alias("within_10pct"),
    )


@query(
    "agg_having",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(28,2))), 2) AS DOUBLE) AS total_spend
    FROM orders GROUP BY o_custkey
    HAVING COUNT(*) >= 15 ORDER BY o_custkey
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "total_spend"))
        .filter(F.col("n_orders") >= 15)
        .orderBy("o_custkey")
    )


@query(
    "agg_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n, {_DSUM_QTY} AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), dsum("l_quantity", "sum_qty")
    )


@query(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(28,2))), 2) AS DOUBLE) AS total
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), dsum("o_totalprice", "total")
    )


@query(
    "agg_grouping_sets",
    oracle=f"""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n, {_DSUM_PRICE} AS sum_price
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag"], ["l_linestatus"], []], "l_returnflag", "l_linestatus"
    ).agg(F.count(F.lit(1)).alias("n"), dsum("l_extendedprice", "sum_price"))


@query(
    "agg_collect_list",
    oracle="""
    SELECT l_orderkey,
           COALESCE(array_to_string(list_sort(list(l_linenumber)), ','), '')
               AS line_numbers
    FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey
    """,
)
def agg_collect_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ClickHouse groupArray; sort_array for determinism (§7.5.4). CSV-encoded
    # output — the driver canonicalizer hashes scalar cells only.
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.array_join(
                F.sort_array(F.collect_list("l_linenumber")), ","
            ).alias("line_numbers")
        )
        .orderBy("l_orderkey")
    )


@query(
    "agg_collect_set",
    oracle="""
    SELECT l_orderkey,
           COALESCE(array_to_string(
               list_sort(list_distinct(list(l_returnflag))), ','), '') AS flags
    FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey
    """,
)
def agg_collect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ClickHouse groupUniqArray. CSV-encoded for driver hashability.
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.array_join(F.sort_array(F.collect_set("l_returnflag")), ",").alias(
                "flags"
            )
        )
        .orderBy("l_orderkey")
    )


@query(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           ROUND(stddev_samp(l_discount), 6) AS sd_disc,
           ROUND(var_samp(l_tax), 6) AS var_tax,
           ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           ROUND(covar_samp(l_discount, l_tax), 8) AS cov_disc_tax
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Stats run on small-magnitude columns so 6-8dp rounding dominates any
    # cross-engine accumulation drift (exprs.py module doc).
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_discount"), 6).alias("sd_disc"),
            F.round(F.var_samp("l_tax"), 6).alias("var_tax"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
            F.round(F.covar_samp("l_discount", "l_tax"), 8).alias("cov_disc_tax"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_percentile",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT), 0.25) / 100.0 AS p25,
           quantile_cont(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT), 0.5) / 100.0 AS median,
           quantile_cont(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT), 0.75) / 100.0 AS p75
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ClickHouse quantileExact: exact (non-sketch) interpolated percentile.
    # Computed over integer cents at dyadic fractions: interpolation between
    # ints at f in {1/4,1/2,3/4} is exact in double under ANY formula
    # (a+(b-a)f vs a(1-f)+bf differ by 1 ulp on generic doubles — observed
    # flipping a cent at the rounding boundary when run on raw doubles).
    li = table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    return (
        li.groupBy("l_returnflag")
        .agg(
            (F.percentile(cents, 0.25) / 100.0).alias("p25"),
            (F.percentile(cents, 0.5) / 100.0).alias("median"),
            (F.percentile(cents, 0.75) / 100.0).alias("p75"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_minmax_by",
    oracle="""
    SELECT o_orderpriority,
           max_by(o_orderkey, o_totalprice) AS priciest_order,
           min_by(o_orderkey, o_totalprice) AS cheapest_order,
           MAX(o_totalprice) AS max_price
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ClickHouse argMax/argMin. o_totalprice ties at the group extreme would
    # be nondeterministic; verified unique at fixture scales.
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.max_by("o_orderkey", "o_totalprice").alias("priciest_order"),
            F.min_by("o_orderkey", "o_totalprice").alias("cheapest_order"),
            F.max("o_totalprice").alias("max_price"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "agg_first_last",
    oracle="""
    SELECT user_id,
           min_by(event_type, event_id) AS first_event,
           max_by(event_type, event_id) AS last_event,
           MIN(ts) AS first_ts, MAX(ts) AS last_ts
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def agg_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    # First/last per group with a deterministic order key (unique event_id).
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.min_by("event_type", "event_id").alias("first_event"),
            F.max_by("event_type", "event_id").alias("last_event"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .orderBy("user_id")
    )


@query(
    "agg_countif",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
           COUNT(*) FILTER (WHERE l_quantity >= 25) AS n_bulk,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_countif(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ClickHouse countIf combinator.
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count_if(F.col("l_discount") > 0.05).alias("n_discounted"),
            F.count_if(F.col("l_quantity") >= 25).alias("n_bulk"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_sumif",
    oracle="""
    SELECT l_linestatus,
           CAST(ROUND(SUM(CASE WHEN l_returnflag = 'R'
                     THEN CAST(l_extendedprice AS DECIMAL(28,2)) END), 2) AS DOUBLE)
             AS returned_value,
           ROUND(AVG(CASE WHEN l_discount > 0 THEN l_extendedprice END), 2)
             AS avg_discounted_price
    FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus
    """,
)
def agg_sumif(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ClickHouse sumIf/avgIf combinators.
    li = table(spark, sf_dir, "lineitem")
    returned = F.when(
        F.col("l_returnflag") == "R", F.col("l_extendedprice").cast("decimal(28,2)")
    )
    discounted = F.when(F.col("l_discount") > 0, F.col("l_extendedprice"))
    return (
        li.groupBy("l_linestatus")
        .agg(
            F.round(F.sum(returned), 2).cast("double").alias("returned_value"),
            F.round(F.avg(discounted), 2).alias("avg_discounted_price"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "agg_pivot",
    oracle="""
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'click') AS click,
           COUNT(*) FILTER (WHERE event_type = 'error') AS error,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
           COUNT(*) FILTER (WHERE event_type = 'view') AS view
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .count()
        .na.fill(0, types)  # pivot yields NULL for absent combos; oracle has 0
        .orderBy("user_id")
    )


@query(
    "agg_map",
    oracle="""
    WITH per AS (
        SELECT user_id, event_type,
               CAST(floor(ROUND(SUM(value), 2) * 100 + 0.5) AS BIGINT) AS s,
               CAST(floor(MIN(value) * 1000000 + 0.5) AS BIGINT) AS mn,
               CAST(floor(MAX(value) * 1000000 + 0.5) AS BIGINT) AS mx
        FROM events GROUP BY user_id, event_type
    )
    SELECT user_id,
           COALESCE(array_to_string(list(event_type ORDER BY event_type), ','),
                    '') AS ktypes,
           COALESCE(array_to_string(list(s ORDER BY event_type), ','), '')
               AS vsums,
           COALESCE(array_to_string(list(mn ORDER BY event_type), ','), '')
               AS vmins,
           COALESCE(array_to_string(list(mx ORDER BY event_type), ','), '')
               AS vmaxs
    FROM per GROUP BY user_id ORDER BY user_id
    """,
)
def agg_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``sumMap / minMap / maxMap``: per-group key→value maps where
    values of equal keys are summed/min'd/max'd. Emitted as parallel
    key-sorted CSV strings (cross-engine map literals don't hash-compare,
    and the driver canonicalizer hashes scalar cells only; the key-sorted
    CSVs ARE the canonical map encoding). Values integer-encode via
    floor(x·scale+0.5) — IEEE-exact in both engines on identical doubles,
    unlike double→string casts whose formats differ.

    One shuffle on (user_id, event_type) with map-side partial aggregation,
    then a user_id-only regroup of ≤5 rows per user — AQE coalesces both
    exchanges; nothing is O(map-size²).
    """
    e = table(spark, sf_dir, "events")
    per = e.groupBy("user_id", "event_type").agg(
        F.expr("cast(floor(round(sum(value), 2) * 100 + 0.5D) as bigint)").alias("s"),
        F.expr("cast(floor(min(value) * 1000000 + 0.5D) as bigint)").alias("mn"),
        F.expr("cast(floor(max(value) * 1000000 + 0.5D) as bigint)").alias("mx"),
    )
    packed = per.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("event_type", "s", "mn", "mx"))).alias("_e")
    )
    return packed.select(
        "user_id",
        F.array_join("_e.event_type", ",").alias("ktypes"),
        F.array_join("_e.s", ",").alias("vsums"),
        F.array_join("_e.mn", ",").alias("vmins"),
        F.array_join("_e.mx", ",").alias("vmaxs"),
    ).orderBy("user_id")


@query(
    "agg_quantiles_multi",
    oracle="""
    SELECT l_returnflag,
           COALESCE(array_to_string(
               list_transform(quantile_cont(l_extendedprice,
                                            [0.25, 0.5, 0.75, 0.9]),
                              q -> CAST(floor(ROUND(q, 4) * 10000 + 0.5)
                                        AS BIGINT)), ','), '')
               AS price_quantiles
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_quantiles_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``quantiles(0.25, 0.5, 0.75, 0.9)(x)``: multiple exact quantiles
    in ONE aggregation pass (one sort-free percentile state per group, not
    four scans). Spark's `percentile(col, array(...))` and DuckDB's
    `quantile_cont(x, [...])` both use linear interpolation; 4dp rounding
    absorbs division ulp. The four quantiles ship as one CSV of 1e-4 units
    (driver canonicalizer hashes scalar cells only; floor on identical
    rounded doubles is IEEE-exact, double→string casts are not).
    """
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr(
                "array_join(transform("
                "percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D, 0.9D)),"
                " q -> cast(floor(round(q, 4) * 10000 + 0.5D) as bigint)), ',')"
            ).alias("price_quantiles")
        )
        .orderBy("l_returnflag")
    )


@query(
    "topk_weighted",
    oracle="""
    WITH weighted AS (
        SELECT event_type, user_id, ROUND(SUM(value), 2) AS weight
        FROM events GROUP BY event_type, user_id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY event_type ORDER BY weight DESC, user_id) AS rn
        FROM weighted
    )
    SELECT event_type, user_id, weight, rn
    FROM ranked WHERE rn <= 3 ORDER BY event_type, rn
    """,
)
def topk_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``topKWeighted(3)(user_id, value)``: heavy hitters by summed
    weight per event_type, computed exactly (the sketch's candidate set is
    engine-specific; the exact weighted top-k is the checkable contract —
    same convention as `agg_freq_items`). Tie-break on user_id; ranking on
    the ROUNDED weight so both engines order identical values.

    Scale: the pre-aggregation shrinks events to (types × users) rows
    before the window; the window partitions by event_type (5 partitions)
    — at real scale swap the final window for per-partition top-k
    + merge (TakeOrderedAndProject shape).
    """
    e = table(spark, sf_dir, "events")
    weighted = e.groupBy("event_type", "user_id").agg(
        F.round(F.sum("value"), 2).alias("weight")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.desc("weight"), F.asc("user_id")
    )
    return (
        weighted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .orderBy("event_type", "rn")
    )


@query(
    "agg_weighted_median",
    oracle="""
    WITH w AS (
        SELECT l_returnflag, l_extendedprice,
               CAST(l_quantity AS BIGINT) AS wt,
               SUM(CAST(l_quantity AS BIGINT)) OVER (
                   PARTITION BY l_returnflag ORDER BY l_extendedprice
                   RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               SUM(CAST(l_quantity AS BIGINT)) OVER (
                   PARTITION BY l_returnflag) AS total
        FROM lineitem
    )
    SELECT l_returnflag, MIN(l_extendedprice) AS wmedian
    FROM w WHERE 2 * cum >= total
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``quantileExactWeighted(0.5)(price, quantity)``: the smallest
    price whose cumulative quantity weight reaches half the total.

    Determinism by construction: weights are integer-valued (cast BIGINT →
    exact cumulative sums), the cumulative window uses a RANGE frame so
    price ties share one cumulative value (a ROWS frame would give peers
    order-dependent partials), and the 2·cum ≥ total compare is pure
    integer. One shuffle on l_returnflag; the window sort is the same sort
    a distributed exact-quantile needs anyway.
    """
    li = table(spark, sf_dir, "lineitem")
    wspec = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    cum = F.sum("wt").over(
        wspec.rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    total = F.sum("wt").over(Window.partitionBy("l_returnflag"))
    w = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.col("l_quantity").cast("bigint").alias("wt"),
    ).select(
        "l_returnflag",
        "l_extendedprice",
        cum.alias("cum"),
        total.alias("total"),
    )
    return (
        w.filter(2 * F.col("cum") >= F.col("total"))
        .groupBy("l_returnflag")
        .agg(F.min("l_extendedprice").alias("wmedian"))
        .orderBy("l_returnflag")
    )


@query(
    "agg_delta_sum",
    oracle="""
    WITH d AS (
        SELECT user_id,
               value - LAG(value) OVER (
                   PARTITION BY user_id ORDER BY event_id) AS delta
        FROM events
    )
    SELECT user_id,
           ROUND(COALESCE(SUM(CASE WHEN delta > 0 THEN delta END), 0), 2)
             AS delta_sum
    FROM d GROUP BY user_id ORDER BY user_id
    """,
)
def agg_delta_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``deltaSum``: sum of positive adjacent increases of a per-user
    value sequence (counter-reset-tolerant rate aggregation). lag + a
    conditional sum over one user_id exchange.
    """
    e = table(spark, sf_dir, "events")
    delta = F.col("value") - F.lag("value").over(
        Window.partitionBy("user_id").orderBy("event_id")
    )
    return (
        e.select("user_id", delta.alias("delta"))
        .groupBy("user_id")
        .agg(
            F.round(
                F.coalesce(F.sum(F.when(F.col("delta") > 0, F.col("delta"))), F.lit(0)),
                2,
            ).alias("delta_sum")
        )
        .orderBy("user_id")
    )


@query(
    "agg_entropy",
    oracle="""
    WITH cnt AS (
        SELECT event_type, user_id, COUNT(*) AS c
        FROM events GROUP BY event_type, user_id
    ),
    tot AS (
        SELECT event_type, c,
               SUM(c) OVER (PARTITION BY event_type) AS t
        FROM cnt
    )
    SELECT event_type,
           ROUND(-SUM((c / CAST(t AS DOUBLE)) * ln(c / CAST(t AS DOUBLE))), 4)
             AS entropy
    FROM tot GROUP BY event_type ORDER BY event_type
    """,
)
def agg_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``entropy``: Shannon entropy (nats) of the user distribution per
    event type. Two-stage: exact integer counts, then −Σ p·ln p over
    ≤ |users| terms; log terms are irrational, so the 4dp round sits far
    from any engine-rounding boundary.
    """
    e = table(spark, sf_dir, "events")
    cnt = e.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.withColumn(
        "t", F.sum("c").over(Window.partitionBy("event_type"))
    )
    p = F.col("c") / F.col("t").cast("double")
    return (
        tot.groupBy("event_type")
        .agg(F.round(-F.sum(p * F.log(p)), 4).alias("entropy"))
        .orderBy("event_type")
    )


@query(
    "agg_skew_kurt",
    oracle="""
    WITH s AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,0))) AS DOUBLE) AS s1,
               CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,0)))
                    AS DOUBLE) AS s2,
               CAST(SUM(CAST(l_quantity * l_quantity * l_quantity
                             AS DECIMAL(38,0))) AS DOUBLE) AS s3,
               CAST(SUM(CAST(l_quantity * l_quantity * l_quantity * l_quantity
                             AS DECIMAL(38,0))) AS DOUBLE) AS s4
        FROM lineitem GROUP BY l_returnflag
    )
    -- var*sqrt(var) / var*var, NOT pow(var, 1.5/2): libm pow differs by
    -- ulps across runtimes while *, sqrt are IEEE correctly-rounded — a
    -- pow-based denominator flipped the 4dp round at sf0.001.
    -- "+ 0.0" after ROUND canonicalizes IEEE negative zero: a skew a hair
    -- below 0 rounds to -0.0 in DuckDB but 0.0 in Spark (observed sf0.001).
    SELECT l_returnflag,
           ROUND((s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n)
                  * (s1 / n))
                 / ((s2 / n - (s1 / n) * (s1 / n))
                    * sqrt(s2 / n - (s1 / n) * (s1 / n))), 4) + 0.0
             AS skew_pop,
           ROUND((s4 / n - 4 * (s1 / n) * (s3 / n)
                  + 6 * (s1 / n) * (s1 / n) * (s2 / n)
                  - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
                 / ((s2 / n - (s1 / n) * (s1 / n))
                    * (s2 / n - (s1 / n) * (s1 / n))), 4) + 0.0 AS kurt_pop
    FROM s ORDER BY l_returnflag
    """,
)
def agg_skew_kurt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``skewPop`` / ``kurtPop``: population skewness and kurtosis of
    quantities per return flag, from raw power sums.

    Not the builtin `skewness`/`kurtosis` — engines disagree on
    sample-vs-population corrections AND their merge order perturbs floats.
    Quantities are integers, so Σx..Σx⁴ are EXACT decimal integers in any
    aggregation order; the central-moment algebra then runs in identical
    IEEE754 on both engines' exact inputs. Same mergeable-power-sum state a
    streaming/MV variant would keep.
    """
    li = table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q.cast("decimal(38,0)")).cast("double").alias("s1"),
        F.sum((q * q).cast("decimal(38,0)")).cast("double").alias("s2"),
        F.sum((q * q * q).cast("decimal(38,0)")).cast("double").alias("s3"),
        F.sum((q * q * q * q).cast("decimal(38,0)")).cast("double").alias("s4"),
    )
    m1 = F.col("s1") / F.col("n")
    m2r = F.col("s2") / F.col("n")
    m3r = F.col("s3") / F.col("n")
    m4r = F.col("s4") / F.col("n")
    var = m2r - m1 * m1
    # var*sqrt(var) / var*var instead of pow — see oracle comment (libm
    # pow ulp drift flips the 4dp round).
    skew = (m3r - 3 * m1 * m2r + 2 * m1 * m1 * m1) / (var * F.sqrt(var))
    kurt = (
        m4r - 4 * m1 * m3r + 6 * m1 * m1 * m2r - 3 * m1 * m1 * m1 * m1
    ) / (var * var)
    # + 0.0 canonicalizes -0.0 — see oracle comment.
    return s.select(
        "l_returnflag",
        (F.round(skew, 4) + 0.0).alias("skew_pop"),
        (F.round(kurt, 4) + 0.0).alias("kurt_pop"),
    ).orderBy("l_returnflag")


@query(
    "agg_bitmap_ops",
    oracle="""
    WITH v AS (
        SELECT list_sort(list(DISTINCT user_id)) AS s FROM events
        WHERE event_type = 'view'
    ),
    p AS (
        SELECT list_sort(list(DISTINCT user_id)) AS s FROM events
        WHERE event_type = 'purchase'
    )
    SELECT len(v.s) AS card_view,
           len(p.s) AS card_purchase,
           len(list_intersect(v.s, p.s)) AS card_and,
           len(list_distinct(list_concat(v.s, p.s))) AS card_or,
           len(list_filter(v.s, x -> NOT list_contains(p.s, x))) AS card_andnot,
           COALESCE(array_to_string(
               list_sort(list_intersect(v.s, p.s))[1:5], ','), '')
               AS first_common
    FROM v, p
    """,
)
def agg_bitmap_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``groupBitmap`` + ``bitmapAnd/Or/AndnotCardinality``: audience-set
    algebra between viewers and purchasers. The "bitmap" is a sorted
    distinct-id array — the cross-engine-checkable encoding; a production
    Spark path swaps in roaring bitmaps behind the same cardinality
    contract.

    Each side is one distinct-aggregate (map-side partial) collapsing to a
    single row, so the set algebra runs once on the driver-sized result —
    at 100 TB the arrays become sketches/bitmaps but the plan shape
    (pre-aggregate per side, combine tiny states) is unchanged.
    """
    e = table(spark, sf_dir, "events")
    v = e.filter(F.col("event_type") == "view").agg(
        F.sort_array(F.collect_set("user_id")).alias("vs")
    )
    p = e.filter(F.col("event_type") == "purchase").agg(
        F.sort_array(F.collect_set("user_id")).alias("ps")
    )
    both = v.crossJoin(F.broadcast(p))
    inter = F.array_intersect("vs", "ps")
    return both.select(
        F.size("vs").alias("card_view"),
        F.size("ps").alias("card_purchase"),
        F.size(inter).alias("card_and"),
        F.size(F.array_union("vs", "ps")).alias("card_or"),
        F.size(F.array_except("vs", "ps")).alias("card_andnot"),
        # CSV-encoded (driver canonicalizer hashes scalar cells only).
        F.array_join(F.slice(F.sort_array(inter), 1, 5), ",").alias("first_common"),
    )


@query(
    "topk_with_ties",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               RANK() OVER (PARTITION BY o_custkey
                            ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) DESC)
                 AS rk
        FROM orders
    ) WHERE rk <= 2 ORDER BY o_custkey, o_orderkey
    """,
)
def topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``LIMIT n BY key`` / SQL ``FETCH FIRST n ROWS WITH TIES``: top-2
    orders per customer by price, keeping ties (rank, not row_number — the
    tie-insensitive complement of `topk_per_group`). Ranking on the decimal
    cast so equal 2dp prices are exact ties in both engines.
    """
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").cast("decimal(18,2)").desc()
    )
    return (
        o.withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") <= 2)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "agg_group_concat",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations,
           string_agg(n_name, '|' ORDER BY n_nationkey DESC) AS by_key_desc
    FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
    """,
)
def agg_group_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``arrayStringConcat(groupArray(x), sep)`` / SQL GROUP_CONCAT with
    an explicit order — name-ordered and key-descending variants. Spark has
    no ordered string_agg, so the deterministic form is
    sort-then-join over the collected array (values ride a struct so the
    sort key can differ from the emitted value).
    """
    n = table(spark, sf_dir, "nation")
    by_key = F.transform(
        F.reverse(F.sort_array(F.collect_list(F.struct("n_nationkey", "n_name")))),
        lambda s: s["n_name"],
    )
    return (
        n.groupBy("n_regionkey")
        .agg(
            F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias(
                "nations"
            ),
            F.array_join(by_key, "|").alias("by_key_desc"),
        )
        .orderBy("n_regionkey")
    )


@query(
    "agg_moving_array",
    oracle="""
    WITH m AS (
        SELECT user_id, event_id,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER
                 (PARTITION BY user_id ORDER BY event_id
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
                 AS msum
        FROM events
    )
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
           array_to_string(list(round(msum, 2) ORDER BY event_id), ',')
               AS moving_sums
    FROM m GROUP BY user_id ORDER BY user_id
    """,
)
def agg_moving_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``groupArrayMovingSum(3)(value)``: per user, the event-ordered
    array of 3-row moving sums — the array-valued aggregate CH exposes for
    inline sparkline/trend columns.

    The moving sum itself is the `win_moving_avg` decimal convention
    (exact DECIMAL frame sum, one double cast — no float accumulate/
    retract drift); the array assembly is sort_array(collect_list(struct))
    so ordering is explicit, not partition-luck. One user_id exchange
    feeds BOTH the window and the groupBy (same key ⟹ Spark reuses the
    hash partitioning — no second shuffle); arrays ride out CSV-encoded
    per the driver-hash scalar convention.
    """
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(-2, 0)
    m = ev.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("msum"),
    )
    return (
        m.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.array_join(
                F.expr(
                    "transform(sort_array(collect_list(struct(event_id,"
                    " round(msum, 2) AS s))), x -> x.s)"
                ),
                ",",
            ).alias("moving_sums"),
        )
        .orderBy("user_id")
    )


@query(
    "agg_hll_merge",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS merge_consistent,
           TRUE AS within_10pct
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def agg_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``uniqState``/``uniqMerge`` (AggregatingMergeTree's mergeable
    sketch states) on Spark's native Datasketches HLL: per (event_type,
    shard) PARTIAL sketches are built, then union-merged per event_type
    and estimated — exactly how a CH materialized view keeps uniqState
    parts that FINAL-merge at read.

    Two contracts are hash-checked (values an independent engine can
    verify): (1) merge consistency — the union of the 4 shard sketches
    estimates within 1% of a sketch built directly over the unsharded
    group (not bit-identical: Datasketches' union gadget may hold a
    different target lgK than a directly-built sketch once shards leave
    sparse mode, so registers can differ by a rounding quantum — observed
    at sf0.1, identical at sf0.001), and (2) the estimator contract — the
    merged estimate lands within 10% of the exact count. At 100 TB the
    partial-sketch shape is the whole point: shards build ~1.5 KB states
    map-side; only states cross the wire, never user ids.
    """
    ev = table(spark, sf_dir, "events")
    parts = ev.groupBy(
        "event_type", (F.col("user_id") % 4).alias("shard")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = parts.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_merged")
    )
    direct = ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est_direct"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    return (
        merged.join(direct, "event_type")
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("est_merged") - F.col("est_direct"))
                <= 0.01 * F.col("est_direct")
            ).alias("merge_consistent"),
            (
                F.abs(F.col("est_merged") - F.col("exact_users"))
                <= 0.1 * F.col("exact_users")
            ).alias("within_10pct"),
        )
        .orderBy("event_type")
    )
