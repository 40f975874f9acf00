"""Batch CDC apply semantics — MergeTree merge behavior as explicit operators.

ClickHouse encodes mutability on append-only storage via merge-time collapse
(ReplacingMergeTree: latest version per key; CollapsingMergeTree: +1/−1 sign
cancellation); reads needing exactness use FINAL / argMax. Spark has no
background-merge concept, so these are explicit DataFrame operators — the
idiomatic equivalent and the reference's core query-side semantics
(/root/reference/README.md:1).

Scale notes (100 TB): latest-per-key uses ``max_by`` aggregation, not a
row_number window — hash aggregation does map-side partial aggregation and
avoids the per-partition sort a window needs; one shuffle on the PK either
way, but far less data crosses it when keys repeat (exactly the CDC case:
many versions per key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query
from .changes import (
    CDC_CHANGES_CTE,
    FINAL_STATE_SQL,
    ORDER_COLS,
    PAYLOAD_COLS,
    PK,
    SIGN_STREAM_CTE,
    _COLS,
    change_log,
    sign_log,
)


def latest_per_key(
    changes: DataFrame, pk: str = PK, version: str = "version"
) -> DataFrame:
    """Latest row per key by version, all non-key columns carried along.

    ClickHouse ``FINAL`` / ``argMax`` read over a ReplacingMergeTree table.
    Keeps ``op`` and ``version`` so callers can see tombstones.
    """
    payload = [c for c in changes.columns if c not in (pk, version)]
    return (
        changes.groupBy(pk)
        .agg(F.max_by(F.struct(*payload), version).alias("_s"), F.max(version).alias(version))
        .select(pk, "_s.*", version)
    )


def apply_replacing(
    changes: DataFrame, pk: str = PK, version: str = "version", op: str = "op"
) -> DataFrame:
    """ReplacingMergeTree: latest version per PK wins; tombstones drop."""
    latest = latest_per_key(changes, pk, version)
    return latest.filter(F.col(op) != "DELETE").drop(op, version)


@query("cdc_apply_replacing", oracle=FINAL_STATE_SQL)
def cdc_apply_replacing(spark: SparkSession, sf_dir: str) -> DataFrame:
    return apply_replacing(change_log(spark, sf_dir)).select(*ORDER_COLS)


@query(
    "cdc_apply_collapsing",
    oracle=f"""
    WITH {SIGN_STREAM_CTE},
    net AS (
        SELECT o_orderkey, SUM(sign) AS net FROM sign_stream GROUP BY o_orderkey
    ),
    latest AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY version DESC) AS rn
        FROM sign_stream WHERE sign = 1
    )
    SELECT l.o_orderkey, l.o_custkey, l.o_orderstatus, l.o_totalprice,
           l.o_orderdate, l.o_orderpriority
    FROM latest l JOIN net n USING (o_orderkey)
    WHERE n.net > 0 AND l.rn = 1
    """,
)
def cdc_apply_collapsing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CollapsingMergeTree: net sign > 0 survives with the latest +1 payload.

    Version-ordered (not arrival-ordered) collapse: deterministic under
    shuffle, unlike ClickHouse's part-order-dependent collapse — documented
    divergence (SURVEY.md §7.4). Single hash aggregation: net sign and latest
    payload computed in one pass; −1 rows are excluded from the payload vote
    by mapping their version to −1 (every key has a +1 insert at version 0,
    so a −1 payload can never win).
    """
    s = sign_log(spark, sf_dir)
    plus_version = F.when(F.col("sign") == 1, F.col("version")).otherwise(F.lit(-1))
    return (
        s.groupBy(PK)
        .agg(
            F.sum("sign").alias("_net"),
            F.max_by(F.struct(*PAYLOAD_COLS), plus_version).alias("_s"),
        )
        .filter(F.col("_net") > 0)
        .select(PK, "_s.*")
    )


@query("cdc_snapshot_merge", oracle=FINAL_STATE_SQL)
def cdc_snapshot_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Initial full snapshot ∪ incremental deltas → consistent state.

    The snapshot-then-tail handoff: a bulk load (orders as-is, version 0)
    unioned with the binlog tail (versions ≥ 1), resolved by the same
    replacing semantics. Equivalent to replaying the full log — that identity
    is the correctness property.
    """
    snapshot = (
        table(spark, sf_dir, "orders")
        .select(*ORDER_COLS)
        .withColumn("op", F.lit("INSERT"))
        .withColumn("version", F.lit(0))
    )
    deltas = change_log(spark, sf_dir).filter(F.col("version") > 0)
    return apply_replacing(snapshot.unionByName(deltas)).select(*ORDER_COLS)


@query(
    "cdc_dedup_batch",
    oracle=f"""
    WITH {CDC_CHANGES_CTE},
    replayed AS (
        SELECT * FROM cdc_changes UNION ALL SELECT * FROM cdc_changes
    )
    SELECT DISTINCT * FROM replayed
    """,
)
def cdc_dedup_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At-least-once guard: drop replayed (pk, version) duplicates.

    Canal's MQ transport is at-least-once; the sink must be idempotent.
    ``dropDuplicates`` on the (pk, version) identity is safe because a
    redelivered change carries identical content.
    """
    c = change_log(spark, sf_dir)
    return c.unionByName(c).dropDuplicates([PK, "version"])


@query(
    "cdc_read_final",
    oracle=f"""
    WITH {CDC_CHANGES_CTE}
    SELECT o_orderkey,
           arg_max(o_orderstatus, version) AS last_status,
           arg_max(op, version) AS last_op,
           MAX(version) AS last_version,
           COUNT(*) AS n_changes
    FROM cdc_changes GROUP BY o_orderkey
    """,
)
def cdc_read_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH FINAL/argMax read: current value per key straight off the raw log."""
    return (
        change_log(spark, sf_dir)
        .groupBy(PK)
        .agg(
            F.max_by("o_orderstatus", "version").alias("last_status"),
            F.max_by("op", "version").alias("last_op"),
            F.max("version").alias("last_version"),
            F.count(F.lit(1)).alias("n_changes"),
        )
    )


@query(
    "cdc_route",
    oracle=f"""
    WITH {CDC_CHANGES_CTE},
    routed AS (
        SELECT 'shop' AS database, 'orders' AS "table", op,
               o_orderkey AS pk FROM cdc_changes
        UNION ALL
        SELECT 'shop', 'customer', 'INSERT', c_custkey FROM customer
    )
    SELECT database, "table", op,
           COUNT(*) AS n, MIN(pk) AS min_pk, MAX(pk) AS max_pk
    FROM routed GROUP BY database, "table", op
    """,
)
def cdc_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fan one multi-table change stream out by (database, table).

    Canal publishes every table's changes on one topic; the sink routes by
    envelope (database, table). In Spark routing is a filter per route — at
    scale, a ``partitionBy("table")`` write so each table's consumer prunes
    to its own partition without scanning the rest.
    """
    orders_part = change_log(spark, sf_dir).select(
        F.lit("shop").alias("database"),
        F.lit("orders").alias("table"),
        "op",
        F.col(PK).alias("pk"),
    )
    cust_part = table(spark, sf_dir, "customer").select(
        F.lit("shop").alias("database"),
        F.lit("customer").alias("table"),
        F.lit("INSERT").alias("op"),
        F.col("c_custkey").alias("pk"),
    )
    return (
        orders_part.unionByName(cust_part)
        .groupBy("database", "table", "op")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("pk").alias("min_pk"),
            F.max("pk").alias("max_pk"),
        )
    )


__all__ = [
    "latest_per_key",
    "apply_replacing",
    "cdc_apply_replacing",
    "cdc_apply_collapsing",
    "cdc_snapshot_merge",
    "cdc_dedup_batch",
    "cdc_read_final",
    "cdc_route",
    "_COLS",
]
