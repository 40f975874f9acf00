"""Composite analytic queries — multi-join TPC-H-shaped workloads.

The reference's sink side is queried with exactly this class of star-schema
SQL (reference identity /root/reference/README.md:1; ClickHouse's public
benchmark surface is TPC-H/SSB-style [P-ch]). Each key here is a full
pipeline — scan → selective filters → 2-5 joins → decimal aggregate →
deterministic top-k — adapted to the fixture schema (no o_shippriority /
c_address columns; o_orderpriority stands in).

Scale posture (100 TB): the fact-side joins (orders⋈lineitem) shuffle on the
orderkey; every dimension (customer, supplier, nation, region) is broadcast —
written with explicit `F.broadcast` so the plan holds even when stale stats
would talk AQE out of it. Selective dimension filters (segment, region, date
window) run BEFORE the join, so the shuffle carries only qualifying fact
rows. Money aggregates use the exprs.dsum decimal convention — order-free
sums, immune to AQE re-partitioning (SURVEY.md §7.5).

Determinism: every top-k orders by (exact decimal-summed revenue DESC, unique
key) — both engines produce bit-identical revenue, so the LIMIT frontier is
the same set on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..exprs import disc_price, dsum, dsum_sql
from ..registry import query

_REV = dsum_sql("l_extendedprice * (1 - l_discount)", "revenue", scale=6)


@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey, {_REV}, o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top unshipped-revenue orders for one market segment.

    Plan: segment-filtered customer (1/5 of a small dim) broadcasts into
    orders; the surviving orders join lineitem on the orderkey shuffle; one
    hash aggregate; `TakeOrderedAndProject` for the top-10 (no global sort).
    """
    c = table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp")
    )
    return (
        o.join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(disc_price(), "revenue", scale=6))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name, {_REV}
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name ORDER BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue through local suppliers (customer and
    supplier in the same nation), one region, one year.

    Plan: one orderkey shuffle joins the two fact tables; customer,
    supplier, nation, region all broadcast (region filter prunes nations
    before the fact join touches them). The c_nationkey = s_nationkey
    equality rides the supplier broadcast join as a second condition — no
    extra exchange.
    """
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum(disc_price(), "revenue", scale=6))
        .orderBy("n_name")
    )


@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, {_REV}, ROUND(c_acctbal, 2) AS acctbal, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-10-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by lost revenue from returned
    items in one quarter.

    Plan: date-filtered orders ⋈ return-filtered lineitem on the orderkey
    shuffle; customer and nation broadcast; top-20 via
    `TakeOrderedAndProject` with the unique-custkey tie-break.
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    return (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(disc_price(), "revenue", scale=6))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "q14_promo_revenue",
    oracle="""
    SELECT ROUND(100.0
        * CAST(SUM(CAST(CASE WHEN p_type LIKE 'PROMO%'
                   THEN l_extendedprice * (1 - l_discount) ELSE 0
              END AS DECIMAL(28,6))) AS DOUBLE)
        / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                   AS DECIMAL(28,6))) AS DOUBLE), 4) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo-part revenue share for one month.

    Plan: one month of lineitem (shipdate pushed to parquet stats) with
    part broadcast; both sums accumulate in exact decimal so the ratio
    divides two bit-identical doubles — 4dp rounding is then flip-proof.
    """
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part")
    promo = F.when(F.col("p_type").like("PROMO%"), disc_price()).otherwise(0.0)
    joined = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    num = F.sum(promo.cast("decimal(28,6)")).cast("double")
    den = F.sum(disc_price().cast("decimal(28,6)")).cast("double")
    return joined.agg(F.round(100.0 * num / den, 4).alias("promo_pct"))


@query(
    "q18_large_orders",
    oracle="""
    WITH big AS (
        SELECT l_orderkey,
               CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(28,2))), 2)
                    AS DOUBLE) AS sum_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(28,2))) > 250)
    SELECT c_custkey, c_name, o_orderkey, o_orderdate,
           ROUND(o_totalprice, 2) AS totalprice, sum_qty
    FROM big
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY totalprice DESC, o_orderkey
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers with large-volume orders (sum qty > 250).

    Plan: the HAVING pre-aggregate runs on lineitem alone (partial map-side
    combine on the orderkey), and only the tiny surviving set joins orders —
    a semi-join-like reduction BEFORE the wide join, the pattern that makes
    this query feasible at 100 TB. Survivors broadcast into orders/customer.
    """
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(28,2)")).alias("q"))
        .filter(F.col("q") > 250)
        .select(
            "l_orderkey", F.round("q", 2).cast("double").alias("sum_qty")
        )
    )
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("totalprice"),
            "sum_qty",
        )
        .orderBy(F.col("totalprice").desc(), "o_orderkey")
    )
