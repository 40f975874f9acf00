"""§2 C — Joins (ClickHouse hash/GLOBAL join surface → Spark join strategies).

Strategy notes for 100 TB:
- Dimension joins carry an explicit ``broadcast()`` hint — at scale the dims
  (part/customer/nation) stay far below executor memory while the fact side
  streams through, so no shuffle of the big side.
- Fact-fact joins (orders ⋈ lineitem) rely on sort-merge with AQE; both sides
  shuffle on the join key once, and skew is handled by AQE skew-join.
- The as-of join is emulated with a range condition + row_number window —
  the candidate explosion is bounded by range-bucketing at scale (§7.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..exprs import dsum
from ..registry import query


@query(
    "join_inner_broadcast",
    oracle="""
    SELECT p_brand,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))), 2) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_type LIKE 'PROMO%'
    GROUP BY p_brand ORDER BY p_brand
    """,
)
def join_inner_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_type").like("PROMO%"))
    dp = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "inner")
        .groupBy("p_brand")
        .agg(dsum(dp, "revenue", scale=6), F.count(F.lit(1)).alias("n_items"))
        .orderBy("p_brand")
    )


@query(
    "join_inner_shuffle",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_lines,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(28,2))), 2) AS DOUBLE) AS total_price
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def join_inner_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "inner")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum("l_extendedprice", "total_price"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "join_left",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_totalprice
    FROM customer c LEFT JOIN (
        SELECT * FROM orders WHERE o_totalprice > 400000
    ) o ON c.c_custkey = o.o_custkey
    """,
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "c_mktsegment", "o_orderkey", "o_totalprice"
    )


@query(
    "join_right",
    oracle="""
    SELECT p.p_partkey, p.p_brand, l.l_orderkey, l.l_linenumber
    FROM (SELECT * FROM lineitem WHERE l_quantity >= 49) l
    RIGHT JOIN part p ON l.l_partkey = p.p_partkey
    """,
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)
    p = table(spark, sf_dir, "part")
    return li.join(p, li.l_partkey == p.p_partkey, "right").select(
        "p_partkey", "p_brand", "l_orderkey", "l_linenumber"
    )


@query(
    "join_full",
    oracle="""
    SELECT c.c_custkey, c.c_acctbal, o.o_orderkey, o.o_totalprice
    FROM (SELECT * FROM customer WHERE c_acctbal < 0) c
    FULL JOIN (SELECT * FROM orders WHERE o_totalprice > 450000) o
      ON c.c_custkey = o.o_custkey
    """,
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").filter(F.col("c_acctbal") < 0)
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return c.join(o, c.c_custkey == o.o_custkey, "full").select(
        "c_custkey", "c_acctbal", "o_orderkey", "o_totalprice"
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_cross",
    oracle="""
    SELECT r_name, seg FROM region
    CROSS JOIN (SELECT DISTINCT c_mktsegment AS seg FROM customer)
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = table(spark, sf_dir, "region").select("r_name")
    segs = (
        table(spark, sf_dir, "customer")
        .select(F.col("c_mktsegment").alias("seg"))
        .distinct()
    )
    return r.crossJoin(segs)


@query(
    "join_multikey",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, l.l_extendedprice
    FROM lineitem l
    JOIN (SELECT l_orderkey AS k1, MAX(l_linenumber) AS k2
          FROM lineitem GROUP BY l_orderkey) last
      ON l.l_orderkey = last.k1 AND l.l_linenumber = last.k2
    """,
)
def join_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    last = li.groupBy(F.col("l_orderkey").alias("k1")).agg(
        F.max("l_linenumber").alias("k2")
    )
    return li.join(
        last, (li.l_orderkey == last.k1) & (li.l_linenumber == last.k2), "inner"
    ).select("l_orderkey", "l_linenumber", "l_extendedprice")


@query(
    "join_theta_range",
    oracle="""
    SELECT s_suppkey, c_custkey, s_acctbal, c_acctbal
    FROM supplier JOIN customer
      ON s_acctbal >= c_acctbal - 10 AND s_acctbal < c_acctbal + 10
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Non-equi band join: broadcast nested loop with the small side hinted.
    # At 100 TB this becomes a range-bucketed join (bucket both sides by
    # floor(acctbal/width), equi-join on bucket ± 1, re-filter the band).
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    cond = (s.s_acctbal >= c.c_acctbal - 10) & (s.s_acctbal < c.c_acctbal + 10)
    return F.broadcast(s).join(c, cond, "inner").select(
        "s_suppkey", "c_custkey", "s_acctbal", "c_acctbal"
    )


@query(
    "join_asof",
    oracle="""
    SELECT a.event_id, a.user_id, a.ts, b.event_id AS prior_even_event, b.ts AS prior_ts
    FROM (SELECT * FROM events WHERE event_id % 2 = 1) a
    ASOF JOIN (SELECT * FROM events WHERE event_id % 2 = 0) b
      ON a.user_id = b.user_id AND b.ts <= a.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASOF JOIN emulation (ClickHouse ASOF JOIN; no native Spark op, §7.4).

    Odd events match the latest even event of the same user at-or-before ts.
    Single-pass shape: tag both sides in ONE relation, sort within user by
    (ts, parity, id) — evens sort before the odd row they may match at equal
    ts — and carry the last non-null even (id, ts) forward with
    `last(..., ignorenulls)` over an unbounded-preceding row frame. One
    shuffle on user_id, O(n log n) in the partition, no candidate fan-out;
    the range-join-then-rank alternative materializes every (odd, earlier
    even) pair per user — quadratic in per-user event count, the thing that
    dies first at 100 TB (measured 1.5× slower even at sf0.1).
    DuckDB's native ASOF is the oracle.
    """
    ev = table(spark, sf_dir, "events")
    tagged = ev.select(
        "event_id", "user_id", "ts", (F.col("event_id") % 2).alias("par")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "par", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    even_id = F.when(F.col("par") == 0, F.col("event_id"))
    even_ts = F.when(F.col("par") == 0, F.col("ts"))
    enriched = tagged.select(
        "event_id",
        "user_id",
        "ts",
        "par",
        F.last(even_id, ignorenulls=True).over(w).alias("prior_even_event"),
        F.last(even_ts, ignorenulls=True).over(w).alias("prior_ts"),
    )
    return enriched.filter(
        (F.col("par") == 1) & F.col("prior_even_event").isNotNull()
    ).select("event_id", "user_id", "ts", "prior_even_event", "prior_ts")


@query(
    "join_asof_forward",
    oracle="""
    SELECT a.event_id, a.user_id, a.ts,
           b.event_id AS next_even_event, b.ts AS next_ts
    FROM (SELECT * FROM events WHERE event_id % 2 = 1) a
    ASOF JOIN (SELECT * FROM events WHERE event_id % 2 = 0) b
      ON a.user_id = b.user_id AND b.ts >= a.ts
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward ASOF (ClickHouse ASOF JOIN with >= direction): odd events
    match the EARLIEST even event of the same user at-or-after ts.

    Mirror of `join_asof`: same single-relation tag-and-scan, reversed
    frame — sort within user by (ts, par DESC, event_id) so at equal ts the
    candidate even sorts AFTER the odd row that may claim it, then take
    `first(..., ignorenulls)` over the current-row→unbounded-following
    frame. Still one shuffle, no pair fan-out.
    """
    ev = table(spark, sf_dir, "events")
    tagged = ev.select(
        "event_id", "user_id", "ts", (F.col("event_id") % 2).alias("par")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("par").desc(), F.col("event_id"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    even_id = F.when(F.col("par") == 0, F.col("event_id"))
    even_ts = F.when(F.col("par") == 0, F.col("ts"))
    enriched = tagged.select(
        "event_id",
        "user_id",
        "ts",
        "par",
        F.first(even_id, ignorenulls=True).over(w).alias("next_even_event"),
        F.first(even_ts, ignorenulls=True).over(w).alias("next_ts"),
    )
    return enriched.filter(
        (F.col("par") == 1) & F.col("next_even_event").isNotNull()
    ).select("event_id", "user_id", "ts", "next_even_event", "next_ts")


_SALT_WAYS = 8


@query(
    "join_skew_salted",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n,
           ROUND(SUM(l.l_extendedprice), 2) AS total
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join — the manual skew lever for keys AQE can't split (e.g.
    one tenant owning half the fact table): the fact side appends a
    deterministic salt (hash of a per-row column, mod R), the dim side
    replicates R ways, and the join keys on (key, salt) so a single hot key
    spreads over R reducers. Semantically identical to the plain join (the
    oracle IS the plain join); only the shuffle distribution changes.

    At 100 TB: R tracks the hot key's share of rows ÷ target partition
    size; the dim replication costs R× a (small) build side, which is why
    salting composes with — not replaces — broadcasting. AQE's skew-join
    splitting handles the common case at runtime; the explicit salt is for
    sort-merge paths and pre-Spark-3 engines where it cannot.
    """
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    salted_fact = li.withColumn(
        "salt", F.pmod(F.hash("l_linenumber"), F.lit(_SALT_WAYS))
    )
    salted_dim = o.withColumn(
        "salt", F.explode(F.expr(f"sequence(0, {_SALT_WAYS - 1})"))
    )
    return (
        salted_fact.hint("shuffle_merge")
        .join(
            salted_dim,
            (salted_fact["l_orderkey"] == salted_dim["o_orderkey"])
            & (salted_fact["salt"] == salted_dim["salt"]),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("total"),
        )
        .orderBy("o_orderpriority")
    )


_N_BUCKETS = 8


@query(
    "join_bucketed_colocated",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n,
           ROUND(SUM(l.l_quantity), 2) AS qty
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
    """,
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join: both sides written `bucketBy(8, orderkey)`
    + `sortBy` (Hive-style bucketed tables — Spark's analog of MergeTree's
    pre-sharded parts), then joined WITHOUT a shuffle on either input — the
    bucketed scans already present the join distribution, so the exchange
    that dominates a large-large join at 100 TB simply does not exist
    (plan-asserted in tests/test_plans.py). This is the layout play the
    big-fact-to-big-fact joins need when broadcast is impossible: pay the
    shuffle ONCE at write time, amortize it over every subsequent join.
    """
    import os as _os

    import shutil as _shutil

    tag = _os.path.basename(_os.path.normpath(sf_dir)).replace(".", "_")
    t_orders, t_li = f"ccs_bkt_orders_{tag}", f"ccs_bkt_lineitem_{tag}"
    for t in (t_orders, t_li):
        # The in-memory catalog is per-session but table locations are not:
        # drop BOTH, else a fresh session trips LOCATION_ALREADY_EXISTS on
        # the previous session's files. Locations are pinned under /tmp
        # (external tables) so no cwd-relative warehouse dir is created.
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        _shutil.rmtree(f"/tmp/ccs_bkt/{t}", ignore_errors=True)
    table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    ).write.mode("overwrite").option(
        "path", f"/tmp/ccs_bkt/{t_orders}"
    ).bucketBy(_N_BUCKETS, "o_orderkey").sortBy("o_orderkey").saveAsTable(
        t_orders
    )
    table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    ).write.mode("overwrite").option(
        "path", f"/tmp/ccs_bkt/{t_li}"
    ).bucketBy(_N_BUCKETS, "l_orderkey").sortBy("l_orderkey").saveAsTable(
        t_li
    )
    o = spark.table(t_orders)
    li = spark.table(t_li)
    # merge hint: at fixture scale the dim side fits the broadcast
    # threshold and Catalyst would BHJ, hiding what this key demonstrates —
    # at 100 TB both sides are fact-sized and SMJ is the only option; the
    # hint pins that plan so the zero-input-exchange property is assertable.
    return (
        li.hint("merge")
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("qty"),
        )
        .orderBy("o_orderpriority")
    )
