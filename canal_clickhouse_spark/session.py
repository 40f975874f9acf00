"""SparkSession factory + defensive per-session tuning (SURVEY.md §4).

Two paths:
- ``get_spark()`` builds our own session (tests, bench): local[N], AQE, UTC.
- ``tune(spark)`` applies the runtime-settable subset to a session we did NOT
  build (the driver hands us one) — timezone and AQE are runtime-settable
  SQLConf entries, so correctness-critical settings hold either way.

100 TB posture: everything here is configuration Catalyst honors on a real
cluster — AQE coalesce/skew-join, CBO, broadcast threshold. Nothing is
local-mode-specific except the master URL.
"""

from __future__ import annotations

import os
import tempfile
import zipfile
from pathlib import Path

from pyspark.sql import SparkSession


def _shuffle_partitions() -> str:
    """Scale-adaptive shuffle parallelism (r12 optimization, guide §2.2).

    The r1-r11 value was a constant 32 — tuned for neither the bench box
    nor a cluster. Derive from the core budget instead: 2x the driver-set
    core count (``SPARK_GRAFT_CPUS``, the same knob the external bench
    harness scales), floor 16, so the driver's lower-core scaling runs get
    proportionally fewer, larger partitions instead of a fixed fan-out.
    ``SPARK_GRAFT_SHUFFLE_PARTITIONS`` overrides outright — on a real
    cluster set it to ~2-3x total executor cores (or leave AQE's
    ``coalescePartitions.initialPartitionNum`` to size down from a high
    initial value); AQE coalescing keeps small stages from over-splitting
    at any setting.

    r13 A/B (verdict task 1): the r12 driver bench's iterative-kernel
    slowdowns at 64 partitions were ambient noise, not this derivation —
    two interleaved one-JVM A/Bs (16/32/64, both orders, best-of-4) put
    every suspect key (chsql_parts_persistence, dedup_semantic,
    embed_kmeans, dedup_substring, dedup_survivors, chsql_mutation_ddl)
    within 2-5% across all three settings. The derivation stays.

    Resolved at session-setup time (not module import — r12 advice):
    env changes between sessions in one process are honored.
    """
    explicit = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
    if explicit:
        return explicit
    cpus_env = os.environ.get("SPARK_GRAFT_CPUS", "*")
    try:
        cpus = int(cpus_env)
    except ValueError:  # "*" or malformed -> all local cores
        cpus = os.cpu_count() or 8
    return str(max(16, 2 * cpus))


# Runtime-settable confs: safe to apply to any session, including the driver's.
# Static entries only — env-derived values (shuffle partitions) are resolved
# per call in runtime_conf() so they track the driver's knobs at session-setup
# time instead of first-import time (r12 advice item 1).
RUNTIME_CONF: dict[str, str] = {
    # UTC is load-bearing: parquet timestamps are tz-naive and the DuckDB
    # oracle runs in UTC; every date_trunc/window oracle depends on this.
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.cbo.enabled": "true",
    # Fixture dims (region/nation/customer/part) are far under this; at 100 TB
    # the explicit broadcast() hints in operator code carry the intent.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # events.parquet carries TIMESTAMP(NANOS) which the vectorized reader
    # rejects; read as long and convert in catalog.table (ns -> us floor,
    # matching DuckDB's own ns -> us truncation).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # events.parquet (current fixture) is tz-naive timestamp[us]; Spark 4
    # infers that as TIMESTAMP_NTZ, which withWatermark rejects. With the
    # session tz pinned UTC the LTZ reading is value-identical, so disable NTZ
    # inference — this covers every read path incl. readStream.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    # ANSI off: reference pipelines are permissive (stringly-typed CDC values,
    # NULL on bad cast) and DuckDB TRY_CAST is the oracle analog.
    "spark.sql.ansi.enabled": "false",
}

def runtime_conf() -> dict[str, str]:
    """RUNTIME_CONF plus the env-derived entries, resolved NOW."""
    return {**RUNTIME_CONF,
            "spark.sql.shuffle.partitions": _shuffle_partitions()}


_STATIC_CONF: dict[str, str] = {
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
    "spark.ui.enabled": "false",
    "spark.sql.warehouse.dir": "/tmp/spark-warehouse",
    "spark.driver.extraJavaOptions": "-Duser.timezone=UTC",
}


_PKG_DIR = Path(__file__).resolve().parent


def _ship_package(spark: SparkSession) -> None:
    """addPyFile the package zip so executor Python workers can unpickle
    functions that live in this module tree.

    Module-level functions (and globals referenced from closures) pickle by
    REFERENCE — the worker re-imports them by name. That only works if the
    driver process happens to run with the repo on the worker path (cwd);
    an external driver launched from any other directory gets
    ModuleNotFoundError inside mapInPandas. Shipping the zip makes the
    engine location-independent — same mechanism (``--py-files``) a real
    1000-executor cluster uses.
    """
    sc = spark.sparkContext
    if getattr(sc, "_ccs_pkg_shipped", False):
        return
    zpath = Path(tempfile.gettempdir()) / f"ccs_pkg_{os.getpid()}.zip"
    if not zpath.exists():
        with zipfile.ZipFile(zpath, "w") as zf:
            for p in sorted(_PKG_DIR.rglob("*.py")):
                zf.write(p, f"{_PKG_DIR.name}/{p.relative_to(_PKG_DIR)}")
    try:
        sc.addPyFile(str(zpath))
    except Exception:  # already registered in this JVM — that's the goal
        pass
    sc._ccs_pkg_shipped = True


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable conf to an externally-provided session.

    Memoized per session object (r12 optimization, guide §1/§5: driver-side
    work): ``tune`` sits on every ``catalog.table`` call, and the ~9
    ``conf.set`` py4j round trips cost ~4-30 ms per call — pure fixed
    overhead re-applying values that never change mid-session (nothing in
    the engine or the driver contract flips them back; the SET/SETTINGS
    dialect paths refuse timezone/result-shape knobs). A fresh Python
    SparkSession object (new driver session) re-tunes.
    """
    if spark.__dict__.get("_ccs_tuned"):
        # Cheap re-verify of the one conf the oracle hash depends on (r12
        # advice item 2): if external driver code flipped the session
        # timezone mid-session, re-correct it — one conf.get on the fast
        # path instead of 9 unconditional conf.sets.
        try:
            if spark.conf.get("spark.sql.session.timeZone") != "UTC":
                spark.conf.set("spark.sql.session.timeZone", "UTC")
        except Exception:
            pass
        return spark
    for k, v in runtime_conf().items():
        try:
            spark.conf.set(k, v)
        except Exception:  # immutable in some builds — keep going
            pass
    _ship_package(spark)
    spark.__dict__["_ccs_tuned"] = True
    return spark


def get_spark(app_name: str = "canal-clickhouse-spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name).master(f"local[{cpus}]")
    for k, v in {**_STATIC_CONF, **runtime_conf()}.items():
        builder = builder.config(k, v)
    return tune(builder.getOrCreate())
