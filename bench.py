"""Benchmark harness: headline queries at the bench scale factor.

Runs one representative per SURVEY.md §2 category plus the flagship, each
executed to completion (count() forces the full pipeline without paying
driver-side collect serialization), and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"agg_groupby": sec, ...}, "sf": 0.1}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default all cores).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from canal_clickhouse_spark import QUERIES, get_spark  # noqa: E402

# Headline set: flagship + one representative per category (scan, filter,
# join×2, agg, window, set-op, functions, CDC, streaming-window, LLM ops,
# UDF surface). Streaming-infra keys (memory-sink rigs) are excluded —
# bench times the engine, not the test scaffolding.
HEADLINE: tuple[str, ...] = (
    "agg_groupby",          # flagship TPC-H Q1 shape
    "scan_parquet",         # pushdown + pruning scan
    "filter_compound",      # predicate stack
    "join_inner_broadcast", # broadcast hash join
    "join_inner_shuffle",   # large-large sort-merge
    "join_asof",            # windowed asof emulation
    "agg_distinct",         # multi-distinct
    "agg_percentile",       # exact quantile
    "win_running_sum",      # running window
    "topk_per_group",       # LIMIT BY analog
    "union_distinct",       # set op
    "fn_string",            # scalar pack
    "fn_json",              # JSON extraction
    "cdc_apply_replacing",  # latest-wins compaction
    "cdc_read_final",       # FINAL read
    "stream_tumbling",      # time windows (batch mode)
    "stream_session",       # session windows (batch mode)
    "text_stats",           # corpus stats
    "tfidf_topterms",       # explode + join + window
    "dedup_exact",          # hash dedup
    "dedup_minhash_lsh",    # LSH banding
    "sim_cosine_topk",      # vector search
    "udf_pandas_scalar",    # Arrow UDF path
    "funnel_window",        # behavioral analytics (one user_id exchange)
    "agg_histogram",        # broadcast global-range binning
    "q3_shipping_priority", # multi-join star query, top-k short-circuit
    "q18_large_orders",     # pre-aggregate reduction before wide join
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(os.path.normpath(sf_dir)).replace("sf", "") or 0)
    spark = get_spark("canal-clickhouse-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/codegen once on the cheapest key so q1 doesn't pay JIT.
    QUERIES["scan_parquet"](spark, sf_dir).count()

    # Best of 2: the first execution of a query pays one-time codegen
    # compilation + JIT; the second measures the engine.
    times: dict[str, float] = {}
    for key in HEADLINE:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            QUERIES[key](spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        times[key] = round(best, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline query wall-clock (best of 2), sum over "
                f"{len(HEADLINE)} representative operators",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
