"""Remaining TPC-H-shaped workloads — the full 22-query pattern inventory.

The reference's sink side is a ClickHouse warehouse queried with star-schema
analytics (reference identity /root/reference/README.md:1; ClickHouse's
public benchmark surface is TPC-H/SSB-style [P-ch]). `composite.py` and
`subqueries.py` cover Q1/Q3/Q4/Q5/Q10/Q14/Q17/Q18/Q22; this module closes
the rest of the pattern space — each key is one optimizer behavior the
others don't exercise:

- Q2  correlated-MIN scalar subquery against a reused CTE
- Q6  pure scan: every predicate pushes to the parquet reader, no join
- Q7  symmetric nation-pair disjunction over a 6-table star
- Q8  CASE-conditional market-share ratio of two decimal sums
- Q9  profit expression spanning three tables' columns
- Q11 HAVING against an uncorrelated scalar aggregate (global threshold)
- Q12 CASE-bucketed counts with a join-riding date inequality
- Q13 LEFT OUTER join with join-condition filter -> double aggregation
- Q15 CTE referenced twice (revenue view + its MAX) with exact-equality join
- Q16 NOT IN anti-join under a COUNT(DISTINCT) aggregate
- Q19 disjunction of conjunction groups (common key extracted by Catalyst)
- Q20 IN-subquery over a HAVING-filtered grouped fact scan
- Q21 EXISTS + NOT EXISTS self-joins on the fact table

Everything runs VERBATIM SQL through the EP-3 entry (`catalog.sql`) so
Catalyst's subquery rewrite rules (RewritePredicateSubquery,
RewriteCorrelatedScalarSubquery) do the decorrelation; the DuckDB oracle
runs the identical text (modulo DAY/DAYS spelling), pinning that both
engines' rewrites agree.

Fixture adaptations (TESTDATA.md schema has no partsupp / l_shipmode /
l_commitdate / l_receiptdate): supply cost derives from lineitem unit price
(Q2) or a retail-price fraction (Q9); "late" means shipped >60 days after
the order date (Q12/Q21); l_linestatus stands in for l_shipmode (Q12);
negative account balance stands in for customer complaints (Q16).

Scale posture (100 TB): fact-fact joins (orders⋈lineitem, lineitem self
joins in Q21) hash-shuffle on the orderkey — one exchange reused across the
EXISTS/NOT EXISTS branches after decorrelation since all three legs share
the key. Dimensions (part 1/5 filtered, supplier, nation, region) sit under
the broadcast threshold at any realistic dimension:fact ratio, so no
dimension ever shuffles the fact side. Scalar subqueries (Q11/Q15/Q19's
bounds, Q8's denominator) collapse to one-row broadcasts. Decimal money
sums follow exprs.dsum: exact, order-free, immune to AQE re-partitioning.

Determinism: every ORDER BY ends in a unique column chain; ratio outputs
round AFTER an exact decimal rescale (see exprs module doc for why scale<=4
before the double cast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import sql as run_sql
from ..registry import query

# --------------------------------------------------------------------------
# Q2 — minimum-cost supplier: correlated MIN over a reused CTE
# --------------------------------------------------------------------------

_Q2 = """
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         MIN(l_extendedprice / l_quantity) AS supplycost
  FROM lineitem GROUP BY l_partkey, l_suppkey)
SELECT s_acctbal, s_name, n_name, p_partkey
FROM part
JOIN ps ON p_partkey = ps.l_partkey
JOIN supplier ON s_suppkey = ps.l_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE p_size = 15 AND p_type = 'LARGE' AND r_name = 'EUROPE'
  AND ps.supplycost = (
      SELECT MIN(ps2.supplycost)
      FROM ps ps2
      JOIN supplier s2 ON s2.s_suppkey = ps2.l_suppkey
      JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
      JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
      WHERE ps2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 20
"""


@query("q2_min_cost_supplier", oracle=_Q2)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the European supplier
    offering it at minimum unit cost (unit cost = lineitem extended price /
    quantity, the fixture's partsupp stand-in).

    The correlated MIN decorrelates into: ps → region-filtered re-aggregate
    by partkey → join back on the partkey — computed once, not per probe
    row. The unit-cost division is the same IEEE754 op on both engines, so
    MIN and the equality filter agree bit-for-bit.
    """
    return run_sql(spark, sf_dir, _Q2)


# --------------------------------------------------------------------------
# Q6 — forecast revenue change: pure pushdown scan, zero joins
# --------------------------------------------------------------------------

_Q6 = """
SELECT CAST(ROUND(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,6))),
                  2) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24.0
"""


@query("q6_forecast_revenue", oracle=_Q6)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: revenue from would-be-discount-eliminated line items.

    The whole WHERE clause is scan-pushable: `.explain` shows all three
    range predicates in PushedFilters and a 4-column ReadSchema — at 100 TB
    this query reads row-group stats for most of the table and decodes only
    qualifying pages. The discount bounds compare against the same binary
    doubles on both engines (fixture values are 2dp literals).
    """
    return run_sql(spark, sf_dir, _Q6)


# --------------------------------------------------------------------------
# Q7 — volume shipping between two nations (symmetric pair disjunction)
# --------------------------------------------------------------------------

_Q7 = """
SELECT supp_nation, cust_nation, l_year,
       CAST(ROUND(SUM(CAST(volume AS DECIMAL(28,6))), 2) AS DOUBLE)
         AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         YEAR(l_shipdate) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@query("q7_volume_shipping", oracle=_Q7)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between a nation pair, by direction
    and year. The same nation table joins twice (supplier side and
    customer side) — two independent broadcasts, and the pair disjunction
    cannot be split into either join alone, so it evaluates post-join as a
    residual filter over two tiny (25-row) broadcast sides.
    """
    return run_sql(spark, sf_dir, _Q7)


# --------------------------------------------------------------------------
# Q8 — national market share: conditional ratio of two decimal sums
# --------------------------------------------------------------------------

_Q8 = """
SELECT o_year,
       ROUND(
         CAST(ROUND(SUM(CAST(CASE WHEN nation = 'NATION_5' THEN volume
                                  ELSE 0.0 END AS DECIMAL(28,6))), 2)
              AS DOUBLE)
         / CAST(ROUND(SUM(CAST(volume AS DECIMAL(28,6))), 2) AS DOUBLE),
         6) AS mkt_share
FROM (
  SELECT YEAR(o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n1.n_name AS nation
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  JOIN region ON n2.n_regionkey = r_regionkey
  WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
) all_nations
GROUP BY o_year
ORDER BY o_year
"""


@query("q8_market_share", oracle=_Q8)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's market for one part
    type, per year. Numerator and denominator each follow the dsum
    convention (exact decimal sum → 2dp rescale → double), so the division
    operates on bit-identical doubles on both engines; only then does the
    6dp display round apply.
    """
    return run_sql(spark, sf_dir, _Q8)


# --------------------------------------------------------------------------
# Q9 — product-type profit: expression spanning three tables
# --------------------------------------------------------------------------

_Q9 = """
SELECT nation, o_year,
       CAST(ROUND(SUM(CAST(amount AS DECIMAL(28,6))), 2) AS DOUBLE)
         AS sum_profit
FROM (
  SELECT n_name AS nation, YEAR(o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount)
           - 0.1 * p_retailprice * l_quantity AS amount
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%gear%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


@query("q9_product_profit", oracle=_Q9)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on 'gear' parts by supplier nation and order
    year (supply cost = 10% of retail price × quantity — the fixture's
    partsupp.ps_supplycost stand-in).

    The LIKE filter prunes part (1/8 of the dim) BEFORE its broadcast, so
    the fact scan's join discards non-gear lines at probe time; orders
    joins on the orderkey shuffle that lineitem already produces. The
    per-row amount is pure double arithmetic (bit-identical cross-engine);
    exactness enters at the decimal cast, per the exprs convention.
    """
    return run_sql(spark, sf_dir, _Q9)


# --------------------------------------------------------------------------
# Q11 — important stock: HAVING vs a global scalar threshold
# --------------------------------------------------------------------------

_Q11 = """
SELECT l_partkey AS ps_partkey,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(28,2))), 2) AS DOUBLE)
         AS value
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_9'
GROUP BY l_partkey
HAVING CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(28,2))), 2) AS DOUBLE)
     > (SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(28,2))), 2)
                    AS DOUBLE) * 0.001
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_9')
ORDER BY value DESC, ps_partkey
"""


@query("q11_important_stock", oracle=_Q11)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose one-nation inventory value exceeds a
    fraction of that nation's total value.

    The uncorrelated scalar subquery becomes a one-row broadcast feeding
    the HAVING filter. The threshold is (exact 2dp decimal sum → double)
    × 0.001 as a *double* multiply — rounding happens before the multiply,
    never after, so the boundary comparison is the same pair of doubles on
    both engines and membership can't flip.
    """
    return run_sql(spark, sf_dir, _Q11)


# --------------------------------------------------------------------------
# Q12 — shipping buckets: CASE counts with a join-riding date inequality
# --------------------------------------------------------------------------

_Q12 = """
SELECT l_linestatus AS shipmode,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


@query("q12_shipping_buckets", oracle=_Q12.replace("30 DAY", "30 DAYS"))
def q12_shipping_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: priority mix of slow shipments (>30 days after the
    order date) per line status (the fixture's shipmode stand-in).

    The year window pushes to the lineitem scan; the cross-table
    l_shipdate > o_orderdate inequality can't push anywhere, so it rides
    the orderkey join as a residual. Counts cast to BIGINT explicitly
    because DuckDB's SUM(int) widens to HUGEINT while Spark's stays long.
    """
    return run_sql(spark, sf_dir, _Q12)


# --------------------------------------------------------------------------
# Q13 — customer order-count distribution: outer join + double aggregation
# --------------------------------------------------------------------------

_Q13 = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders
    ON c_custkey = o_custkey
   AND o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@query("q13_customer_distribution", oracle=_Q13)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: the distribution of per-customer order counts, including
    zero-order customers (hence the outer join; the priority exclusion
    stands in for the comment NOT LIKE filter).

    The filter lives in the JOIN CONDITION, not WHERE — on an outer join
    those differ (WHERE would delete the NULL-extended rows and lose the
    c_count=0 bucket). COUNT(o_orderkey) counts non-NULL only, so
    unmatched customers land in bucket 0. The second aggregation is tiny
    (one row per distinct count) — a near-free shuffle.
    """
    return run_sql(spark, sf_dir, _Q13)


# --------------------------------------------------------------------------
# Q15 — top supplier: CTE used twice, joined on exact-equal revenue
# --------------------------------------------------------------------------

_Q15 = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(28,6))), 2) AS DOUBLE)
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


@query("q15_top_supplier", oracle=_Q15)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the supplier(s) with maximum quarterly revenue — the
    revenue CTE is referenced twice (as the join side and inside the MAX
    scalar subquery).

    Revenue follows the dsum convention, so `total_revenue = MAX(...)`
    compares bit-identical doubles on both engines — the classic Q15
    float-equality trap is defused by making the floats exact. The MAX
    side collapses to a one-row broadcast.
    """
    return run_sql(spark, sf_dir, _Q15)


# --------------------------------------------------------------------------
# Q16 — supplier count: NOT IN anti-join under COUNT(DISTINCT)
# --------------------------------------------------------------------------

_Q16 = """
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#23'
  AND p_type <> 'MEDIUM'
  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


@query("q16_supplier_cnt", oracle=_Q16)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers serve each surviving
    (brand, type, size) bucket, excluding suppliers in bad standing
    (negative balance — the complaint-comment stand-in).

    NOT IN over a non-nullable key column rewrites to a left-anti join
    (the null-aware special case never triggers: s_suppkey has no NULLs).
    The size IN-list and brand/type filters prune part before its
    broadcast; COUNT(DISTINCT) expands to the usual two-phase distinct
    aggregate on (group keys, suppkey).
    """
    return run_sql(spark, sf_dir, _Q16)


# --------------------------------------------------------------------------
# Q19 — discounted revenue: disjunction of conjunction groups
# --------------------------------------------------------------------------

_Q19 = """
SELECT CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(28,6))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 1.0 AND l_quantity <= 11.0)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       AND l_quantity >= 10.0 AND l_quantity <= 20.0)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
       AND l_quantity >= 20.0 AND l_quantity <= 30.0)
"""


@query("q19_disjunctive_revenue", oracle=_Q19)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue from three OR'd (brand, size-range,
    quantity-range) conjunction groups.

    The optimizer work is CNF extraction: the union of the three brand
    predicates and of the three quantity ranges are each derivable as
    table-local filters (`p_brand IN (...)`, `l_quantity BETWEEN 1 AND
    30`), so both scans prune BEFORE the join even though the full
    disjunction spans both tables and must re-check post-join. The global
    aggregate emits exactly one row even when zero lines qualify (NULL
    revenue) on both engines.
    """
    return run_sql(spark, sf_dir, _Q19)


# --------------------------------------------------------------------------
# Q20 — part promotion: IN-subquery over a HAVING-filtered grouped scan
# --------------------------------------------------------------------------

_Q20 = """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_name LIKE '%gear%'
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_suppkey, l_partkey
    HAVING SUM(l_quantity) > 100.0)
  AND s_nationkey < 5
ORDER BY s_suppkey
"""


@query("q20_part_promotion", oracle=_Q20)
def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers in a nation group who moved serious
    volume (>100 units of one gear part in a year) — candidates for a
    promotion. The availqty comparison from the original maps to the
    HAVING threshold since the fixture has no partsupp.

    IN → left-semi join; the inner side aggregates (suppkey, partkey)
    AFTER the year+LIKE filters prune the fact scan. SUM(l_quantity) is a
    double sum of integer-valued doubles — exact at any ordering, so the
    HAVING frontier is engine-stable without a decimal cast.
    """
    return run_sql(spark, sf_dir, _Q20)


# --------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting: EXISTS + NOT EXISTS self-joins
# --------------------------------------------------------------------------

_Q21 = """
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
      SELECT 1 FROM lineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey
        AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
      SELECT 1 FROM lineitem l3
      WHERE l3.l_orderkey = l1.l_orderkey
        AND l3.l_suppkey <> l1.l_suppkey
        AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 25
"""


@query("q21_waiting_suppliers", oracle=_Q21.replace("60 DAY", "60 DAYS"))
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late supplier (shipped
    >60 days after the order date — the receipt/commit-date stand-in) on a
    finalized multi-supplier order.

    The fact table appears three times: the probe (l1), the EXISTS leg
    (another supplier participated), the NOT EXISTS leg (no OTHER supplier
    was late). Both legs decorrelate to semi/anti joins on l_orderkey —
    the same key the orders join already shuffles on, so all three legs
    share one exchange layout. The NOT EXISTS leg's lateness predicate
    correlates to the outer o_orderdate (same order ⇒ same date), which
    keeps the inner leg a pure lineitem scan.
    """
    return run_sql(spark, sf_dir, _Q21)
