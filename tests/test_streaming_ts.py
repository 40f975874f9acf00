"""Streaming time-series subsequence matching == the batch operator.

The EDBT-2019-style streaming variant of `ts_subsequence_match`: per-user
state (`applyInPandasWithState`) buffers the last m−1 points, each arriving
micro-batch extends the series, scores every NEW complete window against the
z-normalized query pattern, and emits (user_id, event_id, dist). The
equivalence contract: the union of emissions across a checkpoint-resumed
two-batch run equals `ts_distances` over the whole series in one batch —
the streaming state machine and the batch window plan pinned to one
definition.

Batch order is made deterministic the honest way: part A (event_id ≤ median)
is processed to completion with availableNow, then part B is added and the
stream RESUMES FROM THE CHECKPOINT — so per-user state genuinely carries
across separately-committed batches, and within a user batch A's events all
precede batch B's.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from canal_clickhouse_spark.catalog import table as fixture_table
from canal_clickhouse_spark.operators.analytics import (
    _TS_M,
    _TS_PATTERN_Z,
    ts_distances,
)


def _track(key, pdfs, state):
    from pyspark.sql.streaming.state import GroupState  # noqa: F401

    ids, vals = state.get if state.exists else ([], [])
    ids, vals = list(ids), list(vals)
    rows = pd.concat(list(pdfs)).sort_values("event_id")
    out_ids, out_dists = [], []
    for eid, v in zip(rows["event_id"], rows["value"]):
        ids.append(int(eid))
        vals.append(float(v))
        if len(vals) >= _TS_M:
            win = vals[-_TS_M:]
            mu = sum(win) / _TS_M
            var = sum((x - mu) ** 2 for x in win) / _TS_M
            sigma = var**0.5
            if sigma > 1e-9:
                d = sum(
                    ((x - mu) / sigma - q) ** 2
                    for x, q in zip(win, _TS_PATTERN_Z)
                )
                out_ids.append(int(eid))
                out_dists.append(round(d, 6))
    state.update((ids[-(_TS_M - 1):], vals[-(_TS_M - 1):]))
    yield pd.DataFrame(
        {
            "user_id": [key[0]] * len(out_ids),
            "event_id": out_ids,
            "dist": out_dists,
        }
    )


def test_streaming_ts_match_equals_batch(spark, sf_dir, tmp_path):
    from pyspark.sql.streaming.state import GroupStateTimeout

    ev = fixture_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.col("value").cast("double").alias("value")
    )
    median = ev.approxQuantile("event_id", [0.5], 0.0)[0]

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    ev.filter(F.col("event_id") <= median).coalesce(2).write.parquet(
        f"{src}/a"
    )

    emitted: list[tuple] = []

    def run_available():
        stream = (
            spark.readStream.schema("user_id bigint, event_id bigint, value double")
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )
        res = stream.groupBy("user_id").applyInPandasWithState(
            _track,
            outputStructType="user_id bigint, event_id bigint, dist double",
            stateStructType="ids array<bigint>, vals array<double>",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        q = (
            # foreachBatch: the memory sink cannot recover from a
            # checkpoint; batch-collecting emissions supports resume
            res.writeStream.foreachBatch(
                lambda bdf, _bid: emitted.extend(
                    (r.user_id, r.event_id, r.dist) for r in bdf.collect()
                )
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_available()  # batch(es) for part A, committed to the checkpoint
    n_a = len(emitted)
    ev.filter(F.col("event_id") > median).coalesce(2).write.parquet(
        f"{src}/b"
    )
    run_available()  # resume: processes ONLY part B, state carried over

    got = set(emitted)
    expect = {
        (r.user_id, r.event_id, r.dist) for r in ts_distances(ev).collect()
    }
    assert got == expect and len(expect) > 0
    # both runs emitted: windows straddling the A/B cut only exist because
    # state (the buffered tail) crossed the checkpoint
    assert 0 < n_a < len(got)
