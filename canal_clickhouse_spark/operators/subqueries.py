"""Correlated-subquery workloads — Catalyst decorrelation through the SQL entry.

ClickHouse's analytic surface (reference identity /root/reference/README.md:1;
public SQL surface [P-ch]) includes EXISTS / NOT EXISTS / correlated scalar
subqueries. These keys run VERBATIM SQL through the EP-3 entry
(`catalog.sql`) so Catalyst's rewrite rules do the decorrelation —
`RewritePredicateSubquery` turns EXISTS/NOT EXISTS into semi/anti joins,
`RewriteCorrelatedScalarSubquery` turns the per-part average into an
aggregate-then-join — rather than us hand-writing the joins (the hand-written
equivalents are covered by `join_semi` / `join_anti`). The DuckDB oracle runs
the IDENTICAL query text modulo the decimal-rounding wrappers, so this also
pins that both engines' decorrelation agrees.

Scale posture (100 TB): a decorrelated scalar subquery is one extra
pre-aggregate on the correlation key (map-side combined, same shuffle key as
the main join — AQE fuses the exchanges); EXISTS becomes a semi join that
short-circuits per probe row and never replicates matches. Nothing here
executes per-row subqueries — that is the whole point of decorrelation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import sql as run_sql
from ..registry import query

_Q4 = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
  AND EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey
        AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("q4_order_priority", oracle=_Q4.replace("90 DAY", "90 DAYS"))
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders in one quarter having at least one late line
    item (shipped >90 days after the order date; the fixture has no
    commit/receipt dates, so lateness is relative to the order date).

    EXISTS → left-semi join on the orderkey; the correlated date condition
    rides the join as a secondary predicate.
    """
    return run_sql(spark, sf_dir, _Q4)


_Q17_SPARK = """
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) / 7.0, 2)
            AS DOUBLE) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#23'
  AND l_quantity < (
      SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
      WHERE l2.l_partkey = p_partkey)
"""


@query("q17_small_quantity", oracle=_Q17_SPARK)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue impact of small-quantity orders for one
    brand, with the per-part average quantity as a correlated scalar
    subquery.

    Catalyst decorrelates into: lineitem groupBy(l_partkey).avg → join back
    on partkey → filter — the per-part aggregate is computed ONCE, not per
    probe row. The sum accumulates in decimal; /7.0 and the 2dp round
    happen after the exact sum, so the single output row is bit-stable.
    """
    return run_sql(spark, sf_dir, _Q17_SPARK)


_Q22 = """
SELECT c_nationkey,
       COUNT(*) AS numcust,
       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(28,2))), 2) AS DOUBLE)
         AS totacctbal
FROM customer
WHERE c_acctbal > (
        SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2000-06-01 00:00:00')
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


@query("q22_sales_opportunity", oracle=_Q22)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no recent
    orders (the fixture has no phone country codes, so cohorts group by
    nation key).

    Two rewrites in one query: the uncorrelated scalar average becomes a
    1-row broadcast; NOT EXISTS becomes a left-anti join against the
    date-filtered orders — the filter lands on the orders scan BEFORE the
    anti join, so the join probes a fraction of the table.
    """
    return run_sql(spark, sf_dir, _Q22)
