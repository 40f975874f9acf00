"""Self-tests for the type-faithful oracle canonicalizer.

The load-bearing one is the r4 regression: an int64 frame and an equal-valued
decimal128 frame MUST fail the comparison — this is exactly the skew the old
pandas-based canon was blind to (VERDICT r4 "What's wrong" #2:
``chsql_agg_array_combinators`` passed the mirror, failed the driver).
"""

from __future__ import annotations

import decimal

import pyarrow as pa
import pytest

from tests.oracle_compare import assert_tables_match, canon_table


def _t(**cols) -> pa.Table:
    return pa.table(cols)


def test_int64_vs_decimal128_fails():
    ints = _t(s=pa.array([400, 7], type=pa.int64()))
    decs = _t(
        s=pa.array(
            [decimal.Decimal(400), decimal.Decimal(7)], type=pa.decimal128(38, 0)
        )
    )
    with pytest.raises(AssertionError, match="type-class skew"):
        assert_tables_match(ints, decs, "regression_r4")


def test_int64_vs_float64_fails():
    ints = _t(s=pa.array([400], type=pa.int64()))
    flts = _t(s=pa.array([400.0], type=pa.float64()))
    with pytest.raises(AssertionError):
        assert_tables_match(ints, flts, "int_vs_float")


def test_int_widths_agree():
    # Width is not a semantic difference: int32 400 == int64 400.
    a = _t(s=pa.array([400], type=pa.int32()))
    b = _t(s=pa.array([400], type=pa.int64()))
    assert_tables_match(a, b, "widths")


def test_decimal_scale_normalized():
    a = _t(s=pa.array([decimal.Decimal("400.00")], type=pa.decimal128(10, 2)))
    b = _t(s=pa.array([decimal.Decimal("400")], type=pa.decimal128(38, 0)))
    assert_tables_match(a, b, "dec_scales")


def test_row_order_and_column_order_insensitive():
    a = pa.table({"x": [1, 2], "y": ["b", "a"]})
    b = pa.table({"y": ["a", "b"], "x": [2, 1]})
    assert_tables_match(a, b, "order")


def test_mixed_row_no_upcast():
    # The old iterrows() canon upcast int columns to float when a float
    # column sat beside them; column-wise canon must not.
    tbl = pa.table(
        {"i": pa.array([400], type=pa.int64()), "f": pa.array([1.5], type=pa.float64())}
    )
    assert canon_table(tbl) == [("1.5", "400")]


def test_null_and_nan_canon():
    a = _t(s=pa.array([None, float("nan"), 1.0], type=pa.float64()))
    b = _t(s=pa.array([float("nan"), None, 1.0], type=pa.float64()))
    assert_tables_match(a, b, "null_nan")


def test_value_mismatch_still_fails():
    a = _t(s=pa.array([1], type=pa.int64()))
    b = _t(s=pa.array([2], type=pa.int64()))
    with pytest.raises(AssertionError, match="value mismatch"):
        assert_tables_match(a, b, "values")
