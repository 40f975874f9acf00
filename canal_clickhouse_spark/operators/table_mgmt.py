"""Table-management surface: external dictionaries, TTL, mutations.

ClickHouse (reference sink identity, /root/reference/README.md:1; public SQL
surface [P-ch]) manages tables with features beyond plain SELECT:

- **External dictionaries** — ``dictGet('dict', 'attr', key)`` /
  ``dictGetOrDefault``: an in-memory key→attribute lookup table, consulted
  per row without a SQL join.
- **TTL** — ``TTL ts + INTERVAL n DAY``: rows expire relative to a time
  column; background merges drop them.
- **Mutations** — ``ALTER TABLE ... UPDATE / DELETE``: rewrite matching rows
  asynchronously (the only in-place updates ClickHouse offers outside the
  MergeTree merge semantics covered in ``cdc/apply.py``).

Spark-first equivalents: a dictionary IS a broadcast hash join (the lookup
table ships once per executor and probes stay in whole-stage codegen — same
cost model as CH's in-RAM dictionary); TTL is a partition-pruned filter
against a computed horizon; a mutation is a projection/filter producing the
post-mutation state (append-only storage, same as CH's rewrite-parts
approach).

Scale posture (100 TB): `dict_get` must broadcast (dimension ~KBs); the TTL
horizon is a 1-row broadcast scalar, and with date-partitioned layout the
filter prunes whole partitions before any scan; mutations rewrite only
matching partitions when the predicate aligns with the partition key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


@query(
    "dict_get",
    oracle="""
    WITH dict AS (SELECT n_nationkey, n_name FROM nation)
    SELECT c.c_custkey,
           COALESCE(d1.n_name, 'UNKNOWN') AS nation_name,
           COALESCE(d2.n_name, 'UNKNOWN') AS shifted_name,
           d1.n_name IS NOT NULL AS has_key
    FROM customer c
    LEFT JOIN dict d1 ON d1.n_nationkey = c.c_nationkey
    LEFT JOIN dict d2 ON d2.n_nationkey = c.c_nationkey + 10
    ORDER BY c_custkey
    """,
)
def dict_get(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``dictGetOrDefault('nations', 'n_name', key, 'UNKNOWN')`` +
    ``dictHas``: per-row attribute lookup with a miss default.

    The dictionary is the nation table broadcast-joined; the shifted probe
    (``c_nationkey + 10``) exercises the miss path (keys 25..34 don't
    exist). Two lookups = two broadcast joins against the SAME broadcast
    relation — Spark ships it once.
    """
    c = table(spark, sf_dir, "customer")
    d = F.broadcast(table(spark, sf_dir, "nation").select("n_nationkey", "n_name"))
    d1 = d.withColumnRenamed("n_name", "_name1")
    d2 = d.withColumnRenamed("n_name", "_name2").withColumnRenamed(
        "n_nationkey", "_key2"
    )
    return (
        c.join(d1, d1["n_nationkey"] == c["c_nationkey"], "left")
        .join(d2, d2["_key2"] == c["c_nationkey"] + 10, "left")
        .select(
            "c_custkey",
            F.coalesce("_name1", F.lit("UNKNOWN")).alias("nation_name"),
            F.coalesce("_name2", F.lit("UNKNOWN")).alias("shifted_name"),
            F.col("_name1").isNotNull().alias("has_key"),
        )
        .orderBy("c_custkey")
    )


@query(
    "ttl_expire",
    oracle="""
    WITH horizon AS (
        SELECT MAX(ts) - INTERVAL 10 DAY AS cutoff FROM events
    )
    SELECT event_id, ts, user_id, event_type
    FROM events, horizon
    WHERE ts >= cutoff
    ORDER BY event_id
    """,
)
def ttl_expire(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``TTL ts + INTERVAL 10 DAY``: surviving rows after expiry,
    with "now" anchored to the table's max timestamp so the result is
    deterministic (wall-clock-free).

    The horizon is a 1-row aggregate cross-joined in — Catalyst broadcasts
    it, so the plan is scan → broadcast-nested-loop (1 row) → filter; with
    date-partitioned layout at scale the same predicate prunes partitions.
    """
    e = table(spark, sf_dir, "events")
    horizon = e.agg(
        (F.max("ts") - F.expr("INTERVAL 10 DAYS")).alias("cutoff")
    )
    return (
        e.join(F.broadcast(horizon))
        .filter(F.col("ts") >= F.col("cutoff"))
        .select("event_id", "ts", "user_id", "event_type")
        .orderBy("event_id")
    )


@query(
    "mutation_apply",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 400000.0 THEN '1-URGENT'
                ELSE o_orderpriority END AS o_orderpriority,
           o_orderstatus, o_totalprice
    FROM orders
    WHERE NOT (o_orderstatus = 'F' AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00')
    ORDER BY o_orderkey
    """,
)
def mutation_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH mutations: ``ALTER TABLE orders UPDATE o_orderpriority='1-URGENT'
    WHERE o_totalprice > 400000`` then ``ALTER TABLE orders DELETE WHERE
    o_orderstatus='F' AND o_orderdate < '1996-01-01'`` — the post-mutation
    table state.

    Expressed as one projection (UPDATE = CASE WHEN) over one filter
    (DELETE = anti-predicate): a single scan, no shuffle. At scale this is
    the rewrite-matching-parts model — predicates on the partition key
    rewrite only those partitions.
    """
    o = table(spark, sf_dir, "orders")
    return (
        o.filter(
            ~(
                (F.col("o_orderstatus") == "F")
                & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
            )
        )
        .select(
            "o_orderkey",
            F.when(F.col("o_totalprice") > 400000.0, "1-URGENT")
            .otherwise(F.col("o_orderpriority"))
            .alias("o_orderpriority"),
            "o_orderstatus",
            "o_totalprice",
        )
        .orderBy("o_orderkey")
    )


@query(
    "ttl_rollup",
    oracle="""
    WITH horizon AS (
        SELECT MAX(ts) - INTERVAL 10 DAY AS cutoff FROM events
    ),
    recent AS (
        SELECT event_id, ts, event_type,
               ROUND(value, 2) AS value, FALSE AS rolled
        FROM events, horizon WHERE ts >= cutoff
    ),
    rolled AS (
        SELECT CAST(NULL AS BIGINT) AS event_id,
               date_trunc('day', ts) AS ts, event_type,
               ROUND(SUM(value), 2) AS value, TRUE AS rolled
        FROM events, horizon WHERE ts < cutoff
        GROUP BY date_trunc('day', ts), event_type
    )
    SELECT * FROM recent UNION ALL SELECT * FROM rolled
    ORDER BY rolled, event_id, ts, event_type
    """,
)
def ttl_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``TTL ts + INTERVAL 10 DAY GROUP BY toDate(ts), event_type SET
    value = sum(value)``: age-based rollup compaction — rows past the TTL
    horizon collapse to one per (day, event_type) carrying the value sum,
    recent rows pass through raw. The post-TTL table state, deterministic
    because "now" anchors to max(ts) (same contract as `ttl_expire`).

    Plan: one 1-row horizon aggregate broadcast over the scan, then the
    cold branch partial-aggregates on (day, type) while the hot branch is
    a pure filter — at scale with date-partitioned layout both branches
    prune to disjoint partition sets and the rollup shuffle carries only
    per-partition partials (this is exactly how MergeTree executes
    TTL GROUP BY at merge time, amortized instead of per-query).
    """
    e = table(spark, sf_dir, "events")
    horizon = e.agg(
        (F.max("ts") - F.expr("INTERVAL 10 DAYS")).alias("cutoff")
    )
    base = e.join(F.broadcast(horizon))
    recent = base.filter(F.col("ts") >= F.col("cutoff")).select(
        "event_id",
        "ts",
        "event_type",
        F.round("value", 2).alias("value"),
        F.lit(False).alias("rolled"),
    )
    rolled = (
        base.filter(F.col("ts") < F.col("cutoff"))
        .groupBy(
            F.date_trunc("day", "ts").alias("ts"), F.col("event_type")
        )
        .agg(F.round(F.sum("value"), 2).alias("value"))
        .select(
            F.lit(None).cast("bigint").alias("event_id"),
            "ts",
            "event_type",
            "value",
            F.lit(True).alias("rolled"),
        )
    )
    return recent.unionByName(rolled).orderBy(
        "rolled", "event_id", "ts", "event_type"
    )
