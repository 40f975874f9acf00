"""Local mirror of the driver's oracle comparison (SURVEY.md §5.1).

Driver semantics: row-count + schema + order-insensitive value hash, columns
sorted by name. We mirror it strictly: canonicalize every cell to a string
(floats via shortest repr, so a match here implies bit-identical doubles),
sort columns by name and rows by value, then compare lists.
"""

from __future__ import annotations

import datetime as dt
import decimal
import math
from typing import Any

import numpy as np
import pandas as pd


def canon_cell(x: Any) -> str:
    if x is None:
        return "∅"
    if isinstance(x, (np.floating, float)):
        x = float(x)
        if math.isnan(x):
            return "∅"
        return repr(x)
    if isinstance(x, (bool, np.bool_)):
        return "T" if x else "F"
    if isinstance(x, (int, np.integer)):
        return str(int(x))
    if isinstance(x, decimal.Decimal):
        return f"dec:{x}"
    if isinstance(x, pd.Timestamp):
        return x.isoformat()
    if isinstance(x, dt.datetime):
        return x.isoformat()
    if isinstance(x, dt.date):
        return x.isoformat()
    if isinstance(x, (bytes, bytearray)):
        return "0x" + bytes(x).hex()
    if isinstance(x, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon_cell(v) for v in x) + "]"
    if isinstance(x, dict):
        items = sorted((str(k), canon_cell(v)) for k, v in x.items())
        return "{" + ",".join(f"{k}:{v}" for k, v in items) + "}"
    if isinstance(x, float) and math.isnan(x):  # pragma: no cover
        return "∅"
    return str(x)


def canon_frame(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    rows = [
        tuple(canon_cell(row[c]) for c in cols)
        for _, row in df[cols].iterrows()
    ]
    return sorted(rows)


def assert_frames_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, key: str) -> None:
    s_cols, d_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    assert s_cols == d_cols, f"[{key}] column mismatch: spark={s_cols} duckdb={d_cols}"
    assert len(spark_pdf) == len(duck_pdf), (
        f"[{key}] row count mismatch: spark={len(spark_pdf)} duckdb={len(duck_pdf)}"
    )
    s_rows = canon_frame(spark_pdf)
    d_rows = canon_frame(duck_pdf)
    if s_rows != d_rows:
        diffs = [
            (i, s, d)
            for i, (s, d) in enumerate(zip(s_rows, d_rows))
            if s != d
        ][:5]
        msg = "\n".join(
            f"  row {i}:\n    spark : {s}\n    duckdb: {d}" for i, s, d in diffs
        )
        raise AssertionError(
            f"[{key}] value mismatch ({len(diffs)}+ differing rows, cols={s_cols}):\n{msg}"
        )
