"""§2 J — Streaming operators: windows, watermarks, state, stream joins.

The reference's continuous side (binlog stream → continuously-maintained
aggregates; /root/reference/README.md:1). Spark-native shape: unbounded
DataFrames with event-time windows + watermarks. ``window()`` and
``session_window()`` are the same functions in batch and streaming, so the
windowed keys get batch-mode DuckDB oracles; the genuinely streaming-only
behaviors (watermark cutoff, state, output modes, checkpointed sinks) run
real micro-batch queries against memory sinks.
"""

from . import infra, windows  # noqa: F401
