"""Interleaved A/B of spark.sql.shuffle.partitions on the iterative kernels.

r12 verdict task 1: the 2xCPUS derivation (64 at SPARK_GRAFT_CPUS=32) is the
suspected regression source for the many-small-job keys (Lloyd rounds, CC
rounds, DDL-script OPTIMIZE merges, eager localCheckpoints) where AQE
coalescing can't shrink materialized checkpoints. shuffle.partitions is a
runtime SQLConf, so both variants alternate in ONE JVM (the only honest
methodology on this noisy box — see OPTIMIZATION_r12.md "Measurement
conditions").

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
       python tools/ab_shuffle_partitions.py [keys...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from canal_clickhouse_spark import QUERIES, get_spark  # noqa: E402

KEYS = sys.argv[1:] or [
    "chsql_parts_persistence",
    "dedup_semantic",
    "embed_kmeans",
    "dedup_substring",
    "dedup_survivors",
    "chsql_mutation_ddl",
    "chsql_ttl_ddl",
    "dedup_exact",
]

VARIANTS = [v.strip() for v in os.environ.get("AB_VARIANTS", "32,64").split(",")]
ITERS = int(os.environ.get("AB_ITERS", "4"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-shuffle-partitions")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["scan_parquet"](spark, sf_dir).count()  # warm JIT

    results: dict[str, dict[str, list[float]]] = {}
    for key in KEYS:
        per_variant: dict[str, list[float]] = {v: [] for v in VARIANTS}
        # warm the key once (codegen) at the current default
        QUERIES[key](spark, sf_dir).count()
        for _ in range(ITERS):
            for v in VARIANTS:  # interleave: A B A B ...
                spark.conf.set("spark.sql.shuffle.partitions", v)
                t0 = time.perf_counter()
                QUERIES[key](spark, sf_dir).count()
                per_variant[v].append(round(time.perf_counter() - t0, 3))
        results[key] = per_variant
        bests = {v: min(ts) for v, ts in per_variant.items()}
        meds = {v: sorted(ts)[len(ts) // 2] for v, ts in per_variant.items()}
        print(f"{key:26s} best={bests} median={meds}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
