"""Registered sink keys: partitioned parquet, ClickHouse contract, memory.

Each key writes through the real sink and reads its own output back, so the
oracle hash-checks durability + round-trip fidelity, not just the write call
returning.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query
from .clickhouse import ClickHouseSink


def _stage_dir(sf_dir: str, tag: str) -> str:
    base = f"/tmp/ccs_sink_{tag}_{os.path.basename(os.path.normpath(sf_dir))}"
    shutil.rmtree(base, ignore_errors=True)
    return base


@query(
    "sink_parquet",
    oracle="""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
)
def sink_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned, sorted columnar write — the MergeTree layout analog.

    `partitionBy(event_type)` = CH PARTITION BY; `sortWithinPartitions(ts)`
    = CH ORDER BY, making parquet row-group min/max stats selective for
    time-range scans (the §4 min/max-skipping convention). Reading back a
    single partition directory proves partition pruning works on layout.
    """
    path = _stage_dir(sf_dir, "parquet")
    ev = table(spark, sf_dir, "events")
    (
        ev.repartition("event_type")
        .sortWithinPartitions("ts")
        .write.partitionBy("event_type")
        .mode("overwrite")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    return back.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))


@query(
    "sink_clickhouse",
    oracle="""
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(28,2))), 2) AS DOUBLE)
               AS total
    FROM orders GROUP BY o_orderstatus
    """,
)
def sink_clickhouse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ClickHouse sink contract under replay: batches written twice
    dedupe to exactly-once.

    Orders are split into 3 batches; batch 1 is deliberately written twice
    (at-least-once redelivery). The read-back aggregate hash-matching the
    source proves the idempotency contract — the exact property a Canal→CH
    consumer relies on [P-canal].
    """
    root = _stage_dir(sf_dir, "ch")
    sink = ClickHouseSink(root, "orders")
    orders = table(spark, sf_dir, "orders")
    for b in range(3):
        batch = orders.filter(F.col("o_orderkey") % 3 == b)
        sink.write_batch(batch, b)
        if b == 1:  # replay
            sink.write_batch(batch, b)
    back = sink.read_back(spark)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(28,2)")), 2)
        .cast("double")
        .alias("total"),
    )


@query(
    "sink_memory",
    oracle="""
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY user_id
    """,
)
def sink_memory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debug/test sink: streaming aggregate materialized to an in-memory
    table (the rig every streaming unit test here stands on)."""
    from ..streaming.infra import events_stream, run_to_memory

    ev = events_stream(spark, sf_dir)
    agg = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    return run_to_memory(agg, "complete")
