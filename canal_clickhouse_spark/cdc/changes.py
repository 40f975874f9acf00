"""Derived CDC fixtures: deterministic change/sign logs over ``orders``.

FIXTURES.md §3 defines ``cdc_changes`` in-query (no new files) so CDC apply
semantics are oracle-checkable: round 0 INSERTs every order (version 0),
round 1 UPDATEs ``o_orderstatus → 'F'`` where ``o_orderkey % 10 = 0``
(version 1), round 2 DELETEs where ``o_orderkey % 100 = 0`` (version 2).
The same derivation is emitted as a DuckDB CTE so both engines see an
identical stream.

The sign log is the CollapsingMergeTree view of the same history: UPDATE =
(−1 @ old version, +1 @ new version), DELETE = −1 @ latest version
(/root/reference/README.md:1 pipeline identity; ClickHouse collapsing
semantics are public knowledge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table

PK = "o_orderkey"
PAYLOAD_COLS: tuple[str, ...] = (
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)
ORDER_COLS: tuple[str, ...] = (PK, *PAYLOAD_COLS)

_COLS = ", ".join(ORDER_COLS)
_COLS_F = ", ".join(
    "'F' AS o_orderstatus" if c == "o_orderstatus" else c for c in ORDER_COLS
)

# DuckDB CTE body — keep in exact lockstep with change_log() below.
CDC_CHANGES_CTE = f"""cdc_changes AS (
    SELECT {_COLS}, 'INSERT' AS op, 0 AS version FROM orders
    UNION ALL
    SELECT {_COLS_F}, 'UPDATE' AS op, 1 AS version
    FROM orders WHERE o_orderkey % 10 = 0
    UNION ALL
    SELECT {_COLS}, 'DELETE' AS op, 2 AS version
    FROM orders WHERE o_orderkey % 100 = 0
)"""

SIGN_STREAM_CTE = f"""sign_stream AS (
    SELECT {_COLS}, 1 AS sign, 0 AS version FROM orders
    UNION ALL
    SELECT {_COLS}, -1 AS sign, 0 AS version FROM orders WHERE o_orderkey % 10 = 0
    UNION ALL
    SELECT {_COLS_F}, 1 AS sign, 1 AS version FROM orders WHERE o_orderkey % 10 = 0
    UNION ALL
    SELECT {_COLS_F}, -1 AS sign, 1 AS version FROM orders WHERE o_orderkey % 100 = 0
)"""

# Expected final table state after all three rounds (ReplacingMergeTree read):
# every order except %100==0, with %10==0 rows carrying status 'F'.
FINAL_STATE_SQL = f"""
WITH {CDC_CHANGES_CTE},
ranked AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY version DESC) AS rn
    FROM cdc_changes
)
SELECT {_COLS} FROM ranked WHERE rn = 1 AND op <> 'DELETE'
"""


def change_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The versioned change log: (order payload, op, version)."""
    o = table(spark, sf_dir, "orders").select(*ORDER_COLS)
    r0 = o.withColumn("op", F.lit("INSERT")).withColumn("version", F.lit(0))
    r1 = (
        o.filter(F.col(PK) % 10 == 0)
        .withColumn("o_orderstatus", F.lit("F"))
        .withColumn("op", F.lit("UPDATE"))
        .withColumn("version", F.lit(1))
    )
    r2 = (
        o.filter(F.col(PK) % 100 == 0)
        .withColumn("op", F.lit("DELETE"))
        .withColumn("version", F.lit(2))
    )
    return r0.unionByName(r1).unionByName(r2)


def sign_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same history as +1/−1 sign rows (CollapsingMergeTree view)."""
    o = table(spark, sf_dir, "orders").select(*ORDER_COLS)
    upd = o.filter(F.col(PK) % 10 == 0)
    ins = o.withColumn("sign", F.lit(1)).withColumn("version", F.lit(0))
    upd_minus = upd.withColumn("sign", F.lit(-1)).withColumn("version", F.lit(0))
    upd_plus = (
        upd.withColumn("o_orderstatus", F.lit("F"))
        .withColumn("sign", F.lit(1))
        .withColumn("version", F.lit(1))
    )
    del_minus = (
        o.filter(F.col(PK) % 100 == 0)
        .withColumn("o_orderstatus", F.lit("F"))
        .withColumn("sign", F.lit(-1))
        .withColumn("version", F.lit(1))
    )
    return ins.unionByName(upd_minus).unionByName(upd_plus).unionByName(del_minus)
