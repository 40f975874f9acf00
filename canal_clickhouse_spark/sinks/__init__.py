"""§2 A sinks: partitioned parquet, ClickHouse (pluggable), memory.

The reference's sink side is batched inserts into ClickHouse MergeTree
tables [P-ch]; ours is a pluggable writer with the same batching/idempotency
contract (clickhouse.py) plus the native columnar layout (partitioned,
sorted parquet — the MergeTree analog, SURVEY.md §1.3).
"""

from . import clickhouse, writers  # noqa: F401
