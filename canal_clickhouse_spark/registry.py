"""Operator registry: binds SURVEY.md §2 keys to (Spark callable, DuckDB oracle).

The driver contract (``/root/repo/__spark_entry__.py``) wants two dicts:
``queries()[key] -> Callable[(SparkSession, sf_dir), DataFrame]`` and
``oracle_sql()[key] -> str`` (ANSI SQL DuckDB runs on the same parquet views).
Every operator module registers via the ``@query`` decorator so the entry
point is a single import of the package.

Reference parity: the reference snapshot (/root/reference/README.md:1) is the
canal->clickhouse pipeline identity; the key inventory mirrors SURVEY.md §2.
"""

from __future__ import annotations

import textwrap
from collections.abc import Callable
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[["SparkSession", str], "DataFrame"]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register an operator key.

    ``oracle`` is the DuckDB-dialect SQL the driver hash-matches against; omit
    it for ops the driver should check rows-only (hash-seed-dependent, map
    ordering, streaming-infra keys).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate operator key: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = textwrap.dedent(oracle).strip()
        fn.__operator_key__ = name  # type: ignore[attr-defined]
        return fn

    return deco
