"""Split each key's bench time into DataFrame-construction (py4j + analysis
+ any eager work the operator does, e.g. CC-loop rounds) vs action time —
guide §1/§5: the bench's timed region covers both, and driver-side
construction is a real lever on iterative kernels.

Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
       python tools/build_vs_exec.py [keys...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from canal_clickhouse_spark import QUERIES, get_spark  # noqa: E402

KEYS = sys.argv[1:] or [
    "dedup_survivors",
    "dedup_near_jaccard",
    "dedup_semantic",
    "embed_kmeans",
    "chsql_parts_persistence",
    "decontam_ngram",
    "tfidf_topterms",
]
ITERS = int(os.environ.get("BE_ITERS", "4"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("build-vs-exec")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["scan_parquet"](spark, sf_dir).count()
    for key in KEYS:
        QUERIES[key](spark, sf_dir).count()  # warm
        builds, execs = [], []
        for _ in range(ITERS):
            t0 = time.perf_counter()
            df = QUERIES[key](spark, sf_dir)
            t1 = time.perf_counter()
            df.count()
            t2 = time.perf_counter()
            builds.append(round(t1 - t0, 3))
            execs.append(round(t2 - t1, 3))
        print(f"{key:26s} build best={min(builds):6.3f} all={builds}"
              f"  exec best={min(execs):6.3f} all={execs}", flush=True)


if __name__ == "__main__":
    main()
