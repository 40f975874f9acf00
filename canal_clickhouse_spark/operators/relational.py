"""§2 B/F/G — Projections, filters, sorts/limits, set operations.

ClickHouse's scalar SQL surface re-expressed as declarative DataFrame ops so
Catalyst pushes predicates/projections into the parquet scan (verified via
.explain: PushedFilters / ReadSchema). Per-row double arithmetic is left
unrounded — IEEE ops on identical inputs are bit-identical across engines
(exprs.py module doc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query

# --- B. Projections / filters -------------------------------------------------


@query(
    "project_select",
    oracle="""
    SELECT c_custkey, c_name AS cust_name, c_mktsegment AS segment
    FROM customer
    """,
)
def project_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_name").alias("cust_name"),
        F.col("c_mktsegment").alias("segment"),
    )


@query(
    "project_compute",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS disc_price,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
           l_quantity * 2 + 1 AS qty_adj
    FROM lineitem
    """,
)
def project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    dp = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        dp.alias("disc_price"),
        (dp * (1 + F.col("l_tax"))).alias("charge"),
        (F.col("l_quantity") * 2 + 1).alias("qty_adj"),
    )


@query(
    "project_cast",
    oracle="""
    SELECT CAST(o_orderkey AS VARCHAR) AS key_str,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS odate,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price_exact,
           CAST(substr(o_orderpriority, 1, 1) AS INT) AS prio_num
    FROM orders
    """,
)
def project_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderkey").cast("string").alias("key_str"),
        # DATE stays internal only: pandas dtypes for DATE differ between
        # Spark (object date) and DuckDB (datetime64), so surface as string.
        F.col("o_orderdate").cast("date").cast("string").alias("odate"),
        F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias("price_exact"),
        F.substring("o_orderpriority", 1, 1).cast("int").alias("prio_num"),
    )


@query(
    "filter_simple",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem WHERE l_quantity > 45
    """,
)
def filter_simple(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


@query(
    "filter_compound",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag, l_discount, l_quantity
    FROM lineitem
    WHERE (l_returnflag = 'R' AND l_discount >= 0.05) OR NOT (l_quantity < 10)
    """,
)
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    p = ((F.col("l_returnflag") == "R") & (F.col("l_discount") >= 0.05)) | ~(
        F.col("l_quantity") < 10
    )
    return li.filter(p).select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_discount", "l_quantity"
    )


@query(
    "filter_in",
    oracle="""
    SELECT o_orderkey, o_orderpriority
    FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
)
def filter_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select("o_orderkey", "o_orderpriority")
    )


@query(
    "filter_between",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_shipdate
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1997-01-01 00:00:00'
                         AND TIMESTAMP '1997-12-31 00:00:00'
    """,
)
def filter_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_shipdate").between(
            F.lit("1997-01-01").cast("timestamp"),
            F.lit("1997-12-31").cast("timestamp"),
        )
    ).select("l_orderkey", "l_linenumber", "l_shipdate")


@query(
    "filter_like",
    oracle="""
    SELECT p_partkey, p_type FROM part WHERE p_type LIKE 'PROMO%'
    """,
)
def filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "part")
        .filter(F.col("p_type").like("PROMO%"))
        .select("p_partkey", "p_type")
    )


@query(
    "filter_regex",
    oracle=r"""
    SELECT p_partkey, p_name FROM part
    WHERE regexp_matches(p_name, '^[bg].*[ed]$')
    """,
)
def filter_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").rlike(r"^[bg].*[ed]$"))
        .select("p_partkey", "p_name")
    )


@query(
    "filter_null",
    oracle="""
    SELECT o_orderkey, NULLIF(o_orderstatus, 'O') AS status_or_null
    FROM orders WHERE NULLIF(o_orderstatus, 'O') IS NULL
    """,
)
def filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    son = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return o.select("o_orderkey", son.alias("status_or_null")).filter(
        F.col("status_or_null").isNull()
    )


@query(
    "case_when",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 300000 THEN 'high'
                WHEN o_totalprice >= 100000 THEN 'mid'
                ELSE 'low' END AS price_band,
           CASE o_orderstatus WHEN 'O' THEN 'open' WHEN 'F' THEN 'final'
                ELSE 'other' END AS status_name
    FROM orders
    """,
)
def case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000, "high")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.when(F.col("o_orderstatus") == "O", "open")
        .when(F.col("o_orderstatus") == "F", "final")
        .otherwise("other")
        .alias("status_name"),
    )


@query(
    "distinct_rows",
    oracle="""
    SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
    """,
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


# --- F. Sorts / limits / top-k -------------------------------------------------
# The driver's value-hash is order-insensitive, so sorts are made observable
# through LIMIT with a unique-key tie-break (SURVEY.md §7.5.3).


@query(
    "sort_multi",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100
    """,
)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


@query(
    "sort_nulls",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal_or_null
    FROM customer
    ORDER BY bal_or_null ASC NULLS FIRST, c_custkey LIMIT 50
    """,
)
def sort_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    bal = F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(F.col("c_acctbal"))
    return (
        c.select("c_custkey", bal.alias("bal_or_null"))
        .orderBy(F.col("bal_or_null").asc_nulls_first(), F.col("c_custkey"))
        .limit(50)
    )


@query(
    "limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_orderkey LIMIT 20 OFFSET 100
    """,
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
        .offset(100)
        .limit(20)
    )


@query(
    "topk_global",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10
    """,
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    # orderBy+limit compiles to TakeOrderedAndProject: per-partition heap +
    # single driver merge — no global sort shuffle even at 100 TB.
    return (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(
            F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")
        )
        .limit(10)
    )


# --- G. Set operations ----------------------------------------------------------

_LEFT_SQL = "SELECT c_custkey, c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'"
_RIGHT_SQL = "SELECT c_custkey, c_nationkey FROM customer WHERE c_acctbal > 5000"


def _setop_sides(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    c = table(spark, sf_dir, "customer")
    left = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey", "c_nationkey")
    right = c.filter(F.col("c_acctbal") > 5000).select("c_custkey", "c_nationkey")
    return left, right


@query("union_all", oracle=f"{_LEFT_SQL} UNION ALL {_RIGHT_SQL}")
def union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    left, right = _setop_sides(spark, sf_dir)
    return left.unionByName(right)


@query("union_distinct", oracle=f"{_LEFT_SQL} UNION {_RIGHT_SQL}")
def union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    left, right = _setop_sides(spark, sf_dir)
    return left.unionByName(right).distinct()


@query("intersect", oracle=f"{_LEFT_SQL} INTERSECT {_RIGHT_SQL}")
def intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    left, right = _setop_sides(spark, sf_dir)
    return left.intersect(right)


@query("except", oracle=f"{_LEFT_SQL} EXCEPT {_RIGHT_SQL}")
def except_(spark: SparkSession, sf_dir: str) -> DataFrame:
    left, right = _setop_sides(spark, sf_dir)
    return left.exceptAll(right).distinct()


@query("intersect_all", oracle=f"{_LEFT_SQL} INTERSECT ALL {_RIGHT_SQL}")
def intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    left, right = _setop_sides(spark, sf_dir)
    return left.intersectAll(right)


@query("except_all", oracle=f"{_LEFT_SQL} EXCEPT ALL {_RIGHT_SQL}")
def except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    left, right = _setop_sides(spark, sf_dir)
    return left.exceptAll(right)
