"""canal_clickhouse_spark — PySpark-native analytics engine.

A from-scratch engine with the query/data-processing capabilities of the
``ssnhqzj/canal-clickhouse`` pipeline (reference identity:
/root/reference/README.md:1): CDC change-log ingestion with
Replacing/Collapsing merge semantics, a ClickHouse-class analytic SQL surface,
Structured Streaming equivalents, and LLM-data-pipeline operators — all
expressed Spark-first (DataFrame/Catalyst, no RDDs).

Importing this package populates the operator registry; the driver entry point
(``__spark_entry__.py``) just re-exports it.
"""

from __future__ import annotations

from .registry import ORACLES, QUERIES  # noqa: F401
from .session import get_spark, tune  # noqa: F401

# Operator modules self-register on import (SURVEY.md §2 categories).
from . import cdc, chsql, chsql_ddl, llm, sinks, sources, streaming, udfs  # noqa: F401,E402
from .functions import packs, web  # noqa: F401,E402
from .operators import (  # noqa: F401,E402
    aggregates,
    analytics,
    composite,
    joins,
    relational,
    subqueries,
    table_mgmt,
    tpch_extra,
    windows,
)

__all__ = ["ORACLES", "QUERIES", "get_spark", "tune"]
