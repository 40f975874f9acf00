"""Differential tests: every oracle-checkable key, Spark vs DuckDB.

This mirrors the driver's t2 gate locally so mismatches are caught
pre-submission. Parametrized over the registry, so newly registered operators
are covered automatically.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.oracle_compare import assert_tables_match

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_every_oracle_key_has_a_query():
    missing = sorted(set(ORACLES) - set(QUERIES))
    assert not missing, f"oracle_sql keys without queries(): {missing}"


@pytest.mark.parametrize("key", sorted(ORACLES))
def test_oracle_match(key, spark, duck, sf_dir):
    sdf = QUERIES[key](spark, sf_dir)
    # The driver's canonicalizer (pandas sort_values over all columns) can
    # only hash atomic cells — an array/map output column fails it with
    # "unhashable type: numpy.ndarray" (round-1 err rows). Guard here so a
    # locally-green key can't re-introduce that failure mode.
    nested = [
        f.name
        for f in sdf.schema.fields
        if f.dataType.typeName() in ("array", "map", "struct")
    ]
    assert not nested, (
        f"[{key}] oracle-bearing key emits nested column(s) {nested}; "
        "encode them as deterministic strings (array_join/to_json)"
    )
    # Arrow on BOTH sides — no pandas dtype coercion; keeps int64 vs
    # decimal128 vs float64 distinguishable exactly like the driver's hash
    # (r4 post-mortem: .df() flattened HUGEINT to float64 and shipped a red).
    spark_tbl = sdf.toArrow()
    duck_tbl = duck.sql(ORACLES[key]).arrow()
    assert_tables_match(spark_tbl, duck_tbl, key)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[:2] == ["l_returnflag", "l_linestatus"]
