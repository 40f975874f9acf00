"""Fixture catalog: typed parquet tables + SQL view registration.

Tables are the driver-provided TPC-H-ish star schema plus events / documents /
embeddings (FIXTURES.md §2). At 100 TB these reads are partitioned columnar
scans; Catalyst pushes filters/projections into the parquet reader, so every
operator should express predicates declaratively rather than materialize.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .session import tune

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def fix_events_ts(df: DataFrame) -> DataFrame:
    """Normalize events.ts to session-tz TIMESTAMP whatever the fixture wrote.

    Shapes seen across driver-regenerated fixtures:
    - parquet TIMESTAMP(NANOS): read as long (nanosAsLong conf); floor-divide
      to microseconds exactly like DuckDB truncates ns.
    - tz-naive timestamp[us]: Spark 4 infers TIMESTAMP_NTZ, which
      withWatermark rejects; cast to TIMESTAMP (session tz is UTC, so values
      are identical). The inferTimestampNTZ=false conf normally prevents this
      branch from being needed, but an externally-built session may not carry
      that conf.
    Applies to batch and streaming reads alike."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    if isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(df.schema["ts"].dataType, TimestampNTZType):
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


# Per-path SCHEMA memo (r9, reworked r10): `spark.read.parquet` re-reads
# the file footer for schema inference on EVERY call, and the registry's
# ch_sql path re-registers all 10 fixtures per query — ~1 s of pure
# footer/schema I/O per bench key before any query work. r9 memoized the
# DataFrames per session, but a DataFrame strongly references its
# SparkSession, so the WeakKeyDictionary never evicted (the value kept
# the key alive) and stopped sessions leaked for process lifetime (r10
# advice). Caching only the SCHEMA fixes both: `spark.read.schema(...)`
# skips inference (the entire footer-I/O cost), the schema object holds
# no session reference, and plan construction per call is microseconds of
# py4j. ASSUMPTION (documented, r9 verdict hygiene note): a parquet file
# at a given absolute path is immutable for process lifetime — true for
# the driver's read-only fixtures this catalog serves; replacing a
# fixture file in place with a different schema would serve the stale
# schema.
_SCHEMA_MEMO: dict[str, "object"] = {}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Keeps the scan lazy so pushdown applies."""
    if name not in TABLES:
        raise KeyError(f"unknown fixture table: {name}")
    tune(spark)
    path = os.path.join(os.path.abspath(sf_dir), f"{name}.parquet")
    schema = _SCHEMA_MEMO.get(path)
    if schema is None:
        df = spark.read.parquet(path)
        _SCHEMA_MEMO[path] = df.schema
    else:
        df = spark.read.schema(schema).parquet(path)
    if name == "events":
        df = fix_events_ts(df)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all fixture tables as temp views for the spark.sql entry path."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """EP-3 SQL entry: run a query over the registered fixture views.

    Same Catalyst path as the DataFrame API with one extra parser stage —
    exposed so reference users can keep their SQL verbatim.
    """
    register_views(spark, sf_dir)
    return spark.sql(query)
