"""Permanent Arrow-schema gate over the full oracle registry (r5 verdict
task 6): the r5 type-skew sweep found 6 latent int-vs-decimal/float skews by
a one-off audit; this test makes that audit a standing invariant.

For every oracle-bearing key, the Spark result's Arrow schema must match the
DuckDB oracle's Arrow schema field-for-field:

- same field NAMES (the driver sorts columns by name before hashing, so a
  name mismatch is an automatic driver red);
- same TYPE CLASS per field (int/float/decimal/bool/string/date/timestamp/
  list<...> — the exact skew class that shipped red in r4);
- NULLABILITY may differ only in the safe direction: Spark non-nullable
  where DuckDB says nullable (Spark's analyzer proves more NOT NULLs, e.g.
  count(*); the reverse would mean Spark could emit a NULL the oracle's
  hash never sees).

Runs on ``LIMIT 0`` plans so the whole registry gates in seconds — schema
resolution doesn't need rows.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.oracle_compare import type_class

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.mark.parametrize("key", sorted(ORACLES))
def test_oracle_arrow_schema_invariant(key, spark, duck, sf_dir):
    s_schema = QUERIES[key](spark, sf_dir).limit(0).toArrow().schema
    oracle = ORACLES[key].strip().rstrip(";")
    # newline before the closing paren: several oracles end in a `--`
    # comment line which would otherwise swallow it
    d_schema = duck.sql(f"SELECT * FROM ({oracle}\n) LIMIT 0").arrow().schema

    s_fields = {f.name: f for f in s_schema}
    d_fields = {f.name: f for f in d_schema}
    assert sorted(s_fields) == sorted(d_fields), (
        f"[{key}] field names differ: spark={sorted(s_fields)}"
        f" duckdb={sorted(d_fields)}"
    )
    skews = {
        c: (type_class(s_fields[c].type), type_class(d_fields[c].type))
        for c in s_fields
        if type_class(s_fields[c].type) != type_class(d_fields[c].type)
    }
    assert not skews, f"[{key}] type-class skew: {skews}"
    unsafe_null = {
        c
        for c in s_fields
        if s_fields[c].nullable and not d_fields[c].nullable
    }
    assert not unsafe_null, (
        f"[{key}] Spark nullable where the oracle is NOT NULL: {unsafe_null}"
    )
