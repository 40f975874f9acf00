"""Differential grammar fuzz for the ClickHouse-SQL translator.

A seeded generator builds random queries from a small AST whose nodes render
BOTH dialects — ClickHouse text (fed through ``chsql.translate`` and run on
Spark) and plain ANSI text (run in DuckDB) — so the translator itself is the
only untrusted link in the chain. This systematizes the per-round hand
probes that caught the r5/r6 clause-corruption bugs (PREWHERE swallowing a
subquery's closing paren, multi-array ARRAY JOIN emitting broken SQL,
literal-mask gaps): instead of a handful of hand-written compositions, every
run checks hundreds of random clause × expression × literal combinations,
value-compared through the same type-faithful Arrow canon as the oracle
gate (tests/oracle_compare.py).

Design notes:
- Every output column is aliased ``cN`` on both sides; the compare is
  order-insensitive (canon sorts rows), so no ORDER BY is needed.
- Type discipline: int expressions are always BIGINT on both sides (CH
  ``toInt64`` wrappers ↔ DuckDB's native BIGINT results), float sums are
  avoided entirely (accumulation-order drift — the curated oracle keys own
  that problem), doubles appear only element-wise or under exact min/max.
- "Poison" string literals contain clause keywords, ``--``, brackets and
  doubled quotes — the exact payloads that corrupted earlier text rewrites.
- Executed differential cases are capped to keep the suite fast; a much
  larger analysis-only sweep (Spark parse + resolve, no job) backstops
  syntax corruption cheaply.
"""

from __future__ import annotations

import os
import random

import pytest

from canal_clickhouse_spark.catalog import register_views
from canal_clickhouse_spark.chsql import translate

from tests.oracle_compare import assert_tables_match

# Deep-soak knobs: CHSQL_FUZZ_N=1000 CHSQL_FUZZ_SEED=7 pytest ... runs a
# bigger sweep from a different stream without touching the pinned default.
N_EXECUTED = int(os.environ.get("CHSQL_FUZZ_N", "150"))
N_ANALYZED = int(os.environ.get("CHSQL_FUZZ_N_ANALYZE", "800"))
SEED = int(os.environ.get("CHSQL_FUZZ_SEED", "20260814"))

# ---------------------------------------------------------------------------
# Expression generators: each returns (ch_text, duck_text). Int expressions
# are BIGINT in both dialects by construction.
# ---------------------------------------------------------------------------

POISON_LITERALS = [
    "x PREWHERE y",
    "a ARRAY JOIN b",
    "ORDER BY x LIMIT 2 BY y",
    "UNION ALL",
    "INTERSECT",
    " -- not a comment",
    "FROM t FINAL SAMPLE 0.5",
    "LIMIT 3 WITH TIES",
    "it''s quoted",
    "toYear(x) AS y",
    "[1, 2] in (3)",
    "GROUP BY WITH TOTALS",
]
PLAIN_LITERALS = ["URGENT", "promo", "A", "1-", ""]

TABLES = {
    "orders": {
        "int": ["o_orderkey", "o_custkey"],
        "double": ["o_totalprice"],
        "str": ["o_orderstatus", "o_orderpriority"],
        "ts": ["o_orderdate"],
        "uniq": "o_orderkey",
    },
    "lineitem": {
        "int": ["l_orderkey", "l_partkey", "l_suppkey"],
        "double": ["l_quantity", "l_extendedprice", "l_discount"],
        "str": ["l_returnflag", "l_linestatus"],
        "ts": ["l_shipdate"],
        "uniq": None,
    },
    "customer": {
        "int": ["c_custkey", "c_nationkey"],
        "double": ["c_acctbal"],
        "str": ["c_name", "c_mktsegment"],
        "ts": [],
        "uniq": "c_custkey",
    },
    "documents": {
        "int": ["doc_id", "n_chars"],
        "double": [],
        "str": ["lang", "source"],
        "ts": [],
        "uniq": "doc_id",
    },
    "events": {
        "int": ["event_id", "user_id"],
        "double": ["value"],
        "str": ["event_type"],
        "ts": ["ts"],
        "uniq": "event_id",
    },
}


class Gen:
    def __init__(self, rng: random.Random, table: str):
        self.rng = rng
        self.t = TABLES[table]
        self.table = table

    # ---- int (BIGINT both sides) ----
    def int_expr(self, d: int = 2) -> tuple[str, str]:
        r = self.rng
        if d <= 0 or r.random() < 0.3:
            if self.t["int"] and r.random() < 0.75:
                c = r.choice(self.t["int"])
                return c, c
            k = r.randint(1, 50)
            return f"toInt64({k})", f"CAST({k} AS BIGINT)"
        pick = r.randrange(8)
        if pick == 0:
            (a_ch, a_dk), (b_ch, b_dk) = self.int_expr(d - 1), self.int_expr(d - 1)
            op = r.choice(["+", "-"])
            return f"({a_ch} {op} {b_ch})", f"({a_dk} {op} {b_dk})"
        if pick == 1:
            a_ch, a_dk = self.int_expr(d - 1)
            k = r.randint(2, 9)
            # positive dividend: intDiv truncates toward zero, DuckDB //
            # floors — equal only for non-negative numerators.
            return (
                f"intDiv(abs({a_ch}), {k})",
                f"CAST(abs({a_dk}) // {k} AS BIGINT)",
            )
        if pick == 2:
            a_ch, a_dk = self.int_expr(d - 1)
            k = r.randint(2, 9)
            return f"({a_ch} % {k})", f"({a_dk} % {k})"
        if pick == 3:
            s_ch, s_dk = self.str_expr(d - 1)
            return f"toInt64(length({s_ch}))", f"length({s_dk})"
        if pick == 4 and self.t["ts"]:
            c = r.choice(self.t["ts"])
            fn_ch, fn_dk = r.choice(
                [("toYear", "year"), ("toMonth", "month")]
            )
            return f"toInt64({fn_ch}({c}))", f"{fn_dk}({c})"
        if pick == 4 and self.table == "events":
            # r6 gap-batch surface: JSON extraction into the int pool
            return (
                "JSONExtractInt(props, 'k')",
                "CAST(json_extract_string(props, '$.k') AS BIGINT)",
            )
        if pick == 5:
            p_ch, p_dk = self.bool_expr(d - 1)
            (a_ch, a_dk), (b_ch, b_dk) = self.int_expr(0), self.int_expr(0)
            return (
                f"if({p_ch}, {a_ch}, {b_ch})",
                f"(CASE WHEN {p_dk} THEN {a_dk} ELSE {b_dk} END)",
            )
        if pick == 6 and self.t["double"]:
            c = r.choice(self.t["double"])
            # floor(double) is BIGINT in Spark, DOUBLE in DuckDB.
            return f"floor({c})", f"CAST(floor({c}) AS BIGINT)"
        if pick == 7 and r.random() < 0.5:
            # r11: modulo-2^width wrapping casts (CH's overflow contract)
            a_ch, a_dk = self.int_expr(d - 1)
            w, fn = r.choice([(256, "toUInt8"), (65536, "toUInt16")])
            return (
                f"toInt64({fn}({a_ch}))",
                f"CAST((({a_dk}) % {w} + {w}) % {w} AS BIGINT)",
            )
        (a_ch, a_dk), (b_ch, b_dk) = self.int_expr(d - 1), self.int_expr(0)
        fn = r.choice(["greatest", "least"])
        return f"{fn}({a_ch}, {b_ch})", f"{fn}({a_dk}, {b_dk})"

    # ---- string ----
    def str_expr(self, d: int = 2) -> tuple[str, str]:
        r = self.rng
        if d <= 0 or r.random() < 0.4:
            if r.random() < 0.7:
                c = r.choice(self.t["str"])
                return c, c
            pool = POISON_LITERALS if r.random() < 0.5 else PLAIN_LITERALS
            raw = r.choice(pool)
            lit = raw.replace("'", "''")
            if "$" not in raw and r.random() < 0.25:
                # r11: CH dollar-quoted spelling — raw body, no escaping;
                # the oracle side stays standard-quoted (same value)
                return f"$${raw}$$", f"'{lit}'"
            return f"'{lit}'", f"'{lit}'"
        pick = r.randrange(4)
        if pick == 0:
            (a_ch, a_dk), (b_ch, b_dk) = self.str_expr(d - 1), self.str_expr(0)
            return f"concat({a_ch}, {b_ch})", f"({a_dk} || {b_dk})"
        if pick == 1:
            a_ch, a_dk = self.str_expr(d - 1)
            fn = r.choice(["upper", "lower"])
            return f"{fn}({a_ch})", f"{fn}({a_dk})"
        if pick == 2:
            a_ch, a_dk = self.str_expr(d - 1)
            if r.random() < 0.3:
                # r11: two-arg trim family — Spark's ltrim/rtrim argument
                # order is reversed vs CH; DuckDB's matches CH
                ch_fn, dk_fn = r.choice(
                    [("trimBoth", "trim"), ("trimLeft", "ltrim"),
                     ("trimRight", "rtrim")]
                )
                tc = r.choice(["x", "A", " "])
                return (
                    f"{ch_fn}({a_ch}, '{tc}')",
                    f"{dk_fn}({a_dk}, '{tc}')",
                )
            i, n = r.randint(1, 3), r.randint(2, 5)
            return (
                f"substring({a_ch}, {i}, {n})",
                f"substring({a_dk}, {i}, {n})",
            )
        if pick == 3 and r.random() < 0.5:
            # r6 gap-batch surface: CH's decode transform over a column
            c = r.choice(self.t["str"])
            vals = sorted({r.choice(PLAIN_LITERALS) for _ in range(2)})
            frm = ", ".join(f"'{v}'" for v in vals)
            to = ", ".join(f"'m{i}'" for i in range(len(vals)))
            whens = " ".join(
                f"WHEN '{v}' THEN 'm{i}'" for i, v in enumerate(vals)
            )
            return (
                f"transform({c}, [{frm}], [{to}], '?')",
                f"(CASE {c} {whens} ELSE '?' END)",
            )
        a_ch, a_dk = self.str_expr(d - 1)
        return f"replaceAll({a_ch}, '-', '_')", f"replace({a_dk}, '-', '_')"

    # ---- double: element-wise deterministic only ----
    def dbl_expr(self, d: int = 1) -> tuple[str, str]:
        r = self.rng
        if not self.t["double"]:
            a_ch, a_dk = self.int_expr(0)
            return f"(toFloat64({a_ch}) * 0.5)", f"(CAST({a_dk} AS DOUBLE) * 0.5)"
        c = r.choice(self.t["double"])
        if d <= 0 or r.random() < 0.4:
            return c, c
        pick = r.randrange(3)
        if pick == 0:
            return f"round({c}, 2)", f"round({c}, 2)"
        if pick == 1:
            k = r.choice([2, 4, 8])
            return f"({c} / {k})", f"({c} / {k})"
        c2 = r.choice(self.t["double"])
        return f"({c} + {c2})", f"({c} + {c2})"

    # ---- bool ----
    def bool_expr(self, d: int = 2) -> tuple[str, str]:
        r = self.rng
        pick = r.randrange(7 if d > 0 else 5)
        if pick == 0:
            a_ch, a_dk = self.int_expr(min(d, 1))
            op = r.choice(["=", "<", ">", "<=", ">=", "!="])
            k = r.randint(0, 2000)
            return f"({a_ch} {op} {k})", f"({a_dk} {op} {k})"
        if pick == 1:
            s_ch, s_dk = self.str_expr(0)
            t_ch, t_dk = self.str_expr(0)
            op = r.choice(["=", "<", ">", "!="])
            return f"({s_ch} {op} {t_ch})", f"({s_dk} {op} {t_dk})"
        if pick == 2:
            c = r.choice(self.t["str"])
            pat = r.choice(["1%", "%a%", "P%", "%T"])
            return f"({c} LIKE '{pat}')", f"({c} LIKE '{pat}')"
        if pick == 3:
            a_ch, a_dk = self.int_expr(0)
            lo = r.randint(0, 500)
            hi = lo + r.randint(1, 1500)
            return (
                f"({a_ch} BETWEEN {lo} AND {hi})",
                f"({a_dk} BETWEEN {lo} AND {hi})",
            )
        if pick == 4:
            c = r.choice(self.t["int"])
            vals = sorted({r.randint(0, 300) for _ in range(r.randint(2, 5))})
            lst = ", ".join(map(str, vals))
            # r10: CH's three IN-collection spellings — plain list, array
            # literal, tuple() call — all one value list
            spell = r.choice([f"({lst})", f"[{lst}]", f"tuple({lst})"])
            return f"({c} IN {spell})", f"({c} IN ({lst}))"
        if pick == 5:
            (a_ch, a_dk), (b_ch, b_dk) = (
                self.bool_expr(d - 1),
                self.bool_expr(d - 1),
            )
            op = r.choice(["AND", "OR"])
            return f"({a_ch} {op} {b_ch})", f"({a_dk} {op} {b_dk})"
        a_ch, a_dk = self.bool_expr(d - 1)
        return f"(NOT {a_ch})", f"(NOT {a_dk})"

    # ---- projections / aggregates ----
    def scalar(self) -> tuple[str, str]:
        k = self.rng.random()
        if k < 0.4:
            return self.int_expr()
        if k < 0.7:
            return self.str_expr()
        if k < 0.85:
            return self.dbl_expr()
        return self.bool_expr()

    def agg(self) -> tuple[str, str]:
        r = self.rng
        pick = r.randrange(8)
        if pick == 7:
            c = r.choice(self.t["int"] + self.t["str"])
            p_ch, p_dk = self.bool_expr(1)
            return (
                f"uniqExactIf({c}, {p_ch})",
                f"COUNT(DISTINCT {c}) FILTER (WHERE {p_dk})",
            )
        if pick == 0:
            return "count()", "COUNT(*)"
        if pick == 1:
            p_ch, p_dk = self.bool_expr(1)
            return f"countIf({p_ch})", f"COUNT(*) FILTER (WHERE {p_dk})"
        if pick == 2:
            a_ch, a_dk = self.int_expr(1)
            return f"sum({a_ch})", f"CAST(SUM({a_dk}) AS BIGINT)"
        if pick == 3:
            a_ch, a_dk = self.int_expr(1)
            p_ch, p_dk = self.bool_expr(1)
            return (
                f"sumIf({a_ch}, {p_ch})",
                f"CAST(SUM({a_dk}) FILTER (WHERE {p_dk}) AS BIGINT)",
            )
        if pick == 4:
            c = r.choice(self.t["int"] + self.t["str"])
            return f"uniqExact({c})", f"COUNT(DISTINCT {c})"
        if pick == 5:
            a_ch, a_dk = self.scalar()
            fn = r.choice(["min", "max"])
            return f"{fn}({a_ch})", f"{fn}({a_dk})"
        if self.t["uniq"]:
            v = r.choice(self.t["int"] + self.t["str"])
            u = self.t["uniq"]
            return f"argMax({v}, {u})", f"arg_max({v}, {u})"
        return "count()", "COUNT(*)"

    def group_key(self) -> tuple[str, str]:
        r = self.rng
        pick = r.randrange(3)
        if pick == 0:
            c = r.choice(self.t["str"])
            return c, c
        if pick == 1:
            c = r.choice(self.t["int"])
            k = r.choice([7, 10, 100])
            return f"({c} % {k})", f"({c} % {k})"
        if self.t["ts"]:
            c = r.choice(self.t["ts"])
            return f"toInt64(toYear({c}))", f"year({c})"
        c = r.choice(self.t["int"])
        return f"intDiv({c}, 100)", f"CAST({c} // 100 AS BIGINT)"


# ---------------------------------------------------------------------------
# Query generators: return (ch_sql_text, duck_sql_text).
# ---------------------------------------------------------------------------


def q_flat(rng: random.Random) -> tuple[str, str]:
    table = rng.choice(list(TABLES))
    g = Gen(rng, table)
    n = rng.randint(1, 4)
    items = [g.scalar() for _ in range(n)]
    sel_ch = ", ".join(f"{c} AS c{i}" for i, (c, _) in enumerate(items))
    sel_dk = ", ".join(f"{d} AS c{i}" for i, (_, d) in enumerate(items))
    w1 = g.bool_expr() if rng.random() < 0.8 else None
    w2 = g.bool_expr() if rng.random() < 0.4 else None
    # CH textual order: PREWHERE before WHERE; ANSI side conjoins.
    ch = f"SELECT {sel_ch} FROM {table}"
    dk = f"SELECT {sel_dk} FROM {table}"
    if w1 and w2:
        ch += f" PREWHERE {w1[0]} WHERE {w2[0]}"
        dk += f" WHERE ({w1[1]}) AND ({w2[1]})"
    elif w1:
        kw = "PREWHERE" if rng.random() < 0.5 else "WHERE"
        if rng.random() < 0.15:
            # r10: bare integer-truthy predicate (CH nonzero = true) —
            # SOLO clause only: truthiness is resolved at the clause
            # level, a truthy TERM under AND/OR has no textual spelling
            c = g.rng.choice(g.t["int"])
            k = g.rng.randint(2, 9)
            ch += f" {kw} {c} % {k}"
            dk += f" WHERE ({c} % {k}) <> 0"
        else:
            ch += f" {kw} {w1[0]}"
            dk += f" WHERE {w1[1]}"
    return ch, dk


def q_grouped(rng: random.Random) -> tuple[str, str]:
    table = rng.choice(list(TABLES))
    g = Gen(rng, table)
    k_ch, k_dk = g.group_key()
    n = rng.randint(1, 3)
    aggs = [g.agg() for _ in range(n)]
    sel_ch = ", ".join([f"{k_ch} AS c0"] + [
        f"{c} AS c{i + 1}" for i, (c, _) in enumerate(aggs)
    ])
    sel_dk = ", ".join([f"{k_dk} AS c0"] + [
        f"{d} AS c{i + 1}" for i, (_, d) in enumerate(aggs)
    ])
    w = g.bool_expr() if rng.random() < 0.6 else None
    ch = f"SELECT {sel_ch} FROM {table}"
    dk = f"SELECT {sel_dk} FROM {table}"
    if w:
        kw = "PREWHERE" if rng.random() < 0.3 else "WHERE"
        ch += f" {kw} {w[0]}"
        dk += f" WHERE {w[1]}"
    ch += f" GROUP BY {k_ch}"
    dk += f" GROUP BY {k_dk}"
    if rng.random() < 0.4:
        hv = rng.randint(1, 5)
        ch += f" HAVING count() > {hv}"
        dk += f" HAVING COUNT(*) > {hv}"
    return ch, dk


def q_subquery(rng: random.Random) -> tuple[str, str]:
    in_ch, in_dk = (q_grouped if rng.random() < 0.4 else q_flat)(rng)
    # Outer predicate over c0 — works for both int and str c0 via a
    # string-safe comparison on the rendered type: compare to itself.
    ch = f"SELECT * FROM ({in_ch}) sub WHERE c0 = c0"
    dk = f"SELECT * FROM ({in_dk}) sub WHERE c0 = c0"
    if rng.random() < 0.5:
        ch = f"SELECT c0 FROM ({in_ch}) sub"
        dk = f"SELECT c0 FROM ({in_dk}) sub"
    return ch, dk


def q_limit_by(rng: random.Random) -> tuple[str, str]:
    table = rng.choice([t for t, m in TABLES.items() if m["uniq"]])
    g = Gen(rng, table)
    u = TABLES[table]["uniq"]
    k_ch, k_dk = g.group_key()
    n = rng.randint(1, 3)
    project_by = rng.random() < 0.5
    if project_by:
        ch = (
            f"SELECT {u} AS c0, {k_ch} AS c1 FROM {table}"
            f" ORDER BY {u} LIMIT {n} BY {k_ch}"
        )
        dk = (
            f"SELECT {u} AS c0, {k_dk} AS c1 FROM {table}"
            f" QUALIFY row_number() OVER (PARTITION BY {k_dk}"
            f" ORDER BY {u}) <= {n}"
        )
    else:
        # BY expression NOT in the projection — the r6 splice capability.
        ch = (
            f"SELECT {u} AS c0 FROM {table}"
            f" ORDER BY {u} LIMIT {n} BY {k_ch}"
        )
        dk = (
            f"SELECT {u} AS c0 FROM {table}"
            f" QUALIFY row_number() OVER (PARTITION BY {k_dk}"
            f" ORDER BY {u}) <= {n}"
        )
    return ch, dk


def q_with_ties(rng: random.Random) -> tuple[str, str]:
    table = rng.choice(list(TABLES))
    g = Gen(rng, table)
    k_ch, k_dk = g.group_key()
    u_cols = TABLES[table]["int"]
    u = rng.choice(u_cols)
    n = rng.randint(1, 4)
    ch = f"SELECT {u} AS c0 FROM {table} ORDER BY {k_ch} LIMIT {n} WITH TIES"
    dk = (
        f"SELECT {u} AS c0 FROM {table}"
        f" QUALIFY rank() OVER (ORDER BY {k_dk}) <= {n}"
    )
    return ch, dk


def q_setop(rng: random.Random) -> tuple[str, str]:
    table = rng.choice(list(TABLES))
    g = Gen(rng, table)
    item = g.int_expr() if rng.random() < 0.5 else g.str_expr()
    w1, w2 = g.bool_expr(), g.bool_expr()
    lhs_ch = f"SELECT {item[0]} AS c0 FROM {table} WHERE {w1[0]}"
    lhs_dk = f"SELECT {item[1]} AS c0 FROM {table} WHERE {w1[1]}"
    rhs_ch = f"SELECT {item[0]} AS c0 FROM {table} WHERE {w2[0]}"
    rhs_dk = f"SELECT {item[1]} AS c0 FROM {table} WHERE {w2[1]}"
    op = rng.choice(
        ["UNION ALL", "UNION DISTINCT", "INTERSECT", "EXCEPT",
         "INTERSECT DISTINCT", "EXCEPT DISTINCT"]
    )
    # CH bare INTERSECT/EXCEPT keep duplicates (ALL); DuckDB's bare form is
    # DISTINCT — render the CH semantics explicitly on the DuckDB side.
    dk_op = {"INTERSECT": "INTERSECT ALL", "EXCEPT": "EXCEPT ALL"}.get(op, op)
    return f"{lhs_ch} {op} {rhs_ch}", f"{lhs_dk} {dk_op} {rhs_dk}"


def q_array_join(rng: random.Random) -> tuple[str, str]:
    k = rng.randint(5, 60)
    pick = rng.random()
    if pick < 0.25:
        # bare form (r8): the array COLUMN name becomes its element
        ch = (
            "SELECT vec_id AS c0,"
            " toInt64(floor(toFloat64(embedding) * 1000)) AS c1"
            f" FROM embeddings ARRAY JOIN embedding WHERE vec_id < {k}"
        )
        dk = (
            "SELECT vec_id AS c0,"
            " CAST(floor(CAST(e AS DOUBLE) * 1000) AS BIGINT) AS c1"
            f" FROM embeddings, UNNEST(embedding) AS u(e) WHERE vec_id < {k}"
        )
        return ch, dk
    if pick < 0.5:
        ch = (
            "SELECT doc_id AS c0, tok AS c1 FROM documents"
            " ARRAY JOIN splitByChar(' ', text) AS tok"
            f" WHERE doc_id < {k}"
        )
        dk = (
            "SELECT doc_id AS c0, t.tok AS c1 FROM documents,"
            " UNNEST(string_split(text, ' ')) AS t(tok)"
            f" WHERE doc_id < {k}"
        )
    else:
        ch = (
            "SELECT doc_id AS c0, tok AS c1, idx AS c2 FROM documents"
            " ARRAY JOIN splitByChar(' ', text) AS tok,"
            " arrayEnumerate(splitByChar(' ', text)) AS idx"
            f" WHERE doc_id < {k}"
        )
        dk = (
            "WITH ex AS (SELECT doc_id, string_split(text, ' ') AS toks"
            f" FROM documents WHERE doc_id < {k})"
            " SELECT doc_id AS c0, toks[i] AS c1, CAST(i AS BIGINT) AS c2"
            " FROM ex, UNNEST(range(1, len(toks) + 1)) AS g(i)"
        )
    return ch, dk


def q_arrayjoin_fn(rng: random.Random) -> tuple[str, str]:
    """arrayJoin() FUNCTION form in expressions (r11): lifts to LATERAL
    VIEW — identical args share one expansion (CSE), distinct args
    multiply, WHERE filters post-expansion, aggregates see expanded rows."""
    k = rng.randint(5, 60)
    a, b = rng.randint(1, 9), rng.randint(10, 99)
    vals = f"(VALUES ({a}), ({b})) AS t(v)"
    pick = rng.random()
    if pick < 0.3:
        ch = (
            f"SELECT doc_id AS c0, arrayJoin([{a}, {b}]) * doc_id AS c1"
            f" FROM documents WHERE doc_id < {k}"
        )
        dk = (
            f"SELECT doc_id AS c0, v * doc_id AS c1 FROM documents,"
            f" {vals} WHERE doc_id < {k}"
        )
    elif pick < 0.55:
        # CSE: two textually identical calls = ONE expansion
        ch = (
            "SELECT doc_id AS c0,"
            " length(arrayJoin(splitByChar(' ', text)))"
            " + length(arrayJoin(splitByChar(' ', text))) AS c1"
            f" FROM documents WHERE doc_id < {k}"
        )
        dk = (
            "SELECT doc_id AS c0, 2 * length(u.tok) AS c1 FROM documents,"
            f" UNNEST(string_split(text, ' ')) AS u(tok) WHERE doc_id < {k}"
        )
    elif pick < 0.8:
        # post-expansion WHERE filter
        ch = (
            f"SELECT doc_id AS c0 FROM documents"
            f" WHERE arrayJoin([{a}, {b}]) % 2 = doc_id % 2"
            f" AND doc_id < {k}"
        )
        dk = (
            f"SELECT doc_id AS c0 FROM documents, {vals}"
            f" WHERE v % 2 = doc_id % 2 AND doc_id < {k}"
        )
    else:
        # aggregate over the expanded rows
        ch = (
            f"SELECT toInt64(sum(arrayJoin([{a}, {b}]) + doc_id)) AS c0"
            f" FROM documents WHERE doc_id < {k}"
        )
        dk = (
            f"SELECT CAST(SUM(v + doc_id) AS BIGINT) AS c0"
            f" FROM documents, {vals} WHERE doc_id < {k}"
        )
    return ch, dk


def q_distinct(rng: random.Random) -> tuple[str, str]:
    table = rng.choice(list(TABLES))
    g = Gen(rng, table)
    items = [g.str_expr(), g.int_expr(1)]
    sel_ch = ", ".join(f"{c} AS c{i}" for i, (c, _) in enumerate(items))
    sel_dk = ", ".join(f"{d} AS c{i}" for i, (_, d) in enumerate(items))
    w = g.bool_expr()
    return (
        f"SELECT DISTINCT {sel_ch} FROM {table} WHERE {w[0]}",
        f"SELECT DISTINCT {sel_dk} FROM {table} WHERE {w[1]}",
    )


JOIN_PAIRS = [
    ("orders", "o", "customer", "c", "o.o_custkey = c.c_custkey"),
    ("lineitem", "l", "orders", "o", "l.l_orderkey = o.o_orderkey"),
    ("events", "e", "customer", "c", "e.user_id = c.c_custkey"),
]


def q_join(rng: random.Random) -> tuple[str, str]:
    lt, la, rt, ra, cond = rng.choice(JOIN_PAIRS)
    lc = rng.choice(TABLES[lt]["int"] + TABLES[lt]["str"])
    rc = rng.choice(TABLES[rt]["int"] + TABLES[rt]["str"])
    jt = rng.choice(["JOIN", "LEFT JOIN", "INNER JOIN"])
    # CH's GLOBAL prefix must strip to a plain join (broadcast-vs-shuffle
    # is Catalyst/AQE's call from actual sizes).
    ch_jt = f"GLOBAL {jt}" if rng.random() < 0.3 else jt
    sel = f"{la}.{lc} AS c0, {ra}.{rc} AS c1"
    ch = f"SELECT {sel} FROM {lt} {la} {ch_jt} {rt} {ra} ON {cond}"
    dk = f"SELECT {sel} FROM {lt} {la} {jt} {rt} {ra} ON {cond}"
    if rng.random() < 0.5:
        g = Gen(rng, lt)
        p_ch, p_dk = g.bool_expr(1)
        # Unqualified predicate columns: both engines resolve them against
        # the (disjoint-named) join output.
        ch += f" WHERE {p_ch}"
        dk += f" WHERE {p_dk}"
    return ch, dk


def q_any_join(rng: random.Random) -> tuple[str, str]:
    # ANY JOIN pins ONE right row per left row; the engine's documented
    # deterministic refinement picks the smallest right unique key, so the
    # DuckDB side renders that contract explicitly.
    lt, la, lpk = rng.choice(
        [("customer", "c", "c_custkey"), ("events", "e", "event_id")]
    )
    on = f"{la}.{'c_custkey' if lt == 'customer' else 'user_id'} = o.o_custkey"
    rc = rng.choice(["o_orderkey", "o_orderstatus", "o_orderpriority"])
    left = "LEFT " if rng.random() < 0.6 else ""
    sel = f"{la}.{lpk} AS c0, o.{rc} AS c1"
    ch = f"SELECT {sel} FROM {lt} {la} ANY {left}JOIN orders o ON {on}"
    dk = (
        f"SELECT {sel} FROM {lt} {la} {left or 'INNER '}JOIN orders o"
        f" ON {on} QUALIFY row_number() OVER (PARTITION BY {la}.{lpk}"
        f" ORDER BY o.o_orderkey) = 1"
    )
    return ch, dk


def q_asof_join(rng: random.Random) -> tuple[str, str]:
    # Project the right side's ASOF key only: on timestamp ties CH/DuckDB
    # may pick different physical rows, but the matched timestamp itself is
    # deterministic (same discipline as the curated chsql_asof key).
    left = "LEFT " if rng.random() < 0.5 else ""
    sel = "e.event_id AS c0, e.user_id AS c1, o.o_orderdate AS c2"
    on = "e.user_id = o.o_custkey AND e.ts >= o.o_orderdate"
    ch = f"SELECT {sel} FROM events AS e ASOF {left}JOIN orders AS o ON {on}"
    dk = f"SELECT {sel} FROM events e ASOF {left}JOIN orders o ON {on}"
    if rng.random() < 0.5:
        k = rng.randint(2, 5)
        ch += f" WHERE event_id % {k} = 0"
        dk += f" WHERE e.event_id % {k} = 0"
    return ch, dk


def q_join3(rng: random.Random) -> tuple[str, str]:
    # three-table chain with optional GLOBAL prefixes and a grouped tail —
    # multi-join clause composition.
    g = Gen(rng, "customer")
    a_ch, a_dk = g.agg()
    g1 = "GLOBAL " if rng.random() < 0.3 else ""
    g2 = "GLOBAL " if rng.random() < 0.3 else ""
    p = Gen(rng, "lineitem").bool_expr(1)
    ch = (
        f"SELECT c.c_mktsegment AS c0, {a_ch} AS c1 FROM lineitem l"
        f" {g1}JOIN orders o ON l.l_orderkey = o.o_orderkey"
        f" {g2}JOIN customer c ON o.o_custkey = c.c_custkey"
        f" WHERE {p[0]} GROUP BY c.c_mktsegment"
    )
    dk = (
        f"SELECT c.c_mktsegment AS c0, {a_dk} AS c1 FROM lineitem l"
        f" JOIN orders o ON l.l_orderkey = o.o_orderkey"
        f" JOIN customer c ON o.o_custkey = c.c_custkey"
        f" WHERE {p[1]} GROUP BY c.c_mktsegment"
    )
    return ch, dk


def q_in_subquery(rng: random.Random) -> tuple[str, str]:
    # IN / NOT IN / EXISTS subquery predicates (ANSI-shared text, but the
    # inner query may carry CH clauses — PREWHERE inside an IN subquery).
    lt, la, rt, ra, cond = rng.choice(JOIN_PAIRS)
    lcol = cond.split("=")[0].strip().split(".")[1]
    rcol = cond.split("=")[1].strip().split(".")[1]
    g = Gen(rng, rt)
    p_ch, p_dk = g.bool_expr(1)
    sel = rng.choice(TABLES[lt]["int"] + TABLES[lt]["str"])
    form = rng.choice(["in", "not_in", "exists"])
    if form == "exists":
        ch = (
            f"SELECT {sel} AS c0 FROM {lt} {la} WHERE EXISTS ("
            f"SELECT 1 FROM {rt} {ra} WHERE {cond} AND {p_ch})"
        )
        dk = (
            f"SELECT {sel} AS c0 FROM {lt} {la} WHERE EXISTS ("
            f"SELECT 1 FROM {rt} {ra} WHERE {cond} AND {p_dk})"
        )
    else:
        neg = "NOT " if form == "not_in" else ""
        kw_ch = "PREWHERE" if rng.random() < 0.4 else "WHERE"
        # r7: GLOBAL IN / GLOBAL NOT IN — the distributed-CH spelling
        # strips to plain IN (semantics identical on one planner)
        glob = "GLOBAL " if rng.random() < 0.35 else ""
        ch = (
            f"SELECT {sel} AS c0 FROM {lt} WHERE {lcol} {glob}{neg}IN ("
            f"SELECT {rcol} FROM {rt} {kw_ch} {p_ch})"
        )
        dk = (
            f"SELECT {sel} AS c0 FROM {lt} WHERE {lcol} {neg}IN ("
            f"SELECT {rcol} FROM {rt} WHERE {p_dk})"
        )
    return ch, dk


def q_rollup(rng: random.Random) -> tuple[str, str]:
    # GROUP BY ... WITH ROLLUP/CUBE is a pinned pass-through; exercise it
    # against DuckDB's native ROLLUP/CUBE with super-aggregate NULL keys.
    table = rng.choice(list(TABLES))
    g = Gen(rng, table)
    k1 = rng.choice(TABLES[table]["str"])
    k2_ch, k2_dk = g.group_key()
    a_ch, a_dk = g.agg()
    mode = rng.choice(["ROLLUP", "CUBE"])
    ch = (
        f"SELECT {k1} AS c0, {k2_ch} AS c1, {a_ch} AS c2 FROM {table}"
        f" GROUP BY {k1}, {k2_ch} WITH {mode}"
    )
    dk = (
        f"SELECT {k1} AS c0, {k2_dk} AS c1, {a_dk} AS c2 FROM {table}"
        f" GROUP BY {mode} ({k1}, {k2_dk})"
    )
    return ch, dk


def q_scalar_with(rng: random.Random) -> tuple[str, str]:
    # CH scalar WITH binding (a named constant, NOT a CTE) — the DuckDB
    # side simply inlines the constant.
    table = rng.choice(list(TABLES))
    g = Gen(rng, table)
    k = rng.randint(10, 900)
    c = rng.choice(TABLES[table]["int"])
    i_ch, i_dk = g.int_expr(1)
    ch = (
        f"WITH {k} AS _cut SELECT {i_ch} AS c0 FROM {table}"
        f" WHERE {c} < _cut"
    )
    dk = f"SELECT {i_dk} AS c0 FROM {table} WHERE {c} < {k}"
    return ch, dk


def q_cte(rng: random.Random) -> tuple[str, str]:
    # Real CTE; the inner query may carry PREWHERE (rewritten inside the
    # CTE body — the r6 subquery-safety class).
    in_ch, in_dk = (q_grouped if rng.random() < 0.5 else q_flat)(rng)
    ch = f"WITH base AS ({in_ch}) SELECT c0 FROM base"
    dk = f"WITH base AS ({in_dk}) SELECT c0 FROM base"
    return ch, dk


def q_final(rng: random.Random) -> tuple[str, str]:
    # FROM cdc_changes FINAL: latest-version-per-key collapse dropping
    # DELETE tombstones. The DuckDB side replays the documented contract
    # over the lockstep CDC_CHANGES_CTE.
    from canal_clickhouse_spark.cdc.changes import CDC_CHANGES_CTE

    cols = rng.sample(
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"], 2
    )
    sel = ", ".join(f"{c} AS c{i}" for i, c in enumerate(cols))
    k = rng.randint(2, 7)
    ch = (
        f"SELECT {sel} FROM cdc_changes FINAL"
        f" WHERE o_custkey % {k} = 0"
    )
    dk = (
        f"WITH {CDC_CHANGES_CTE} SELECT {sel} FROM ("
        f" SELECT * FROM cdc_changes QUALIFY row_number() OVER"
        f" (PARTITION BY o_orderkey ORDER BY version DESC) = 1)"
        f" WHERE op <> 'DELETE' AND o_custkey % {k} = 0"
    )
    return ch, dk


def q_sample(rng: random.Random) -> tuple[str, str]:
    # SAMPLE k: the engine's deterministic Knuth-hash key cut — pure
    # arithmetic DuckDB reproduces exactly (divergence from any real CH
    # server's sampling-key read is documented at the rewrite).
    frac = rng.choice(["0.1", "0.25", "0.5"])
    cut = int(float(frac) * 4294967296)
    ch = f"SELECT o_orderkey AS c0 FROM orders SAMPLE {frac}"
    dk = (
        f"SELECT o_orderkey AS c0 FROM orders"
        f" WHERE ((o_orderkey * 2654435761) % 4294967296) < {cut}"
    )
    if rng.random() < 0.5:
        g = Gen(rng, "orders")
        p_ch, p_dk = g.bool_expr(1)
        ch += f" WHERE {p_ch}"
        dk += f" AND ({p_dk})"
    return ch, dk


def q_with_fill(rng: random.Random) -> tuple[str, str]:
    # ORDER BY ... WITH FILL FROM 0 TO M: dense spine, gaps filled with 0
    # (exclusive TO). DuckDB replays it with a range() spine left-join.
    m = rng.choice([100, 250, 500])
    g = Gen(rng, "orders")
    p_ch, p_dk = g.bool_expr(1)
    variant = rng.random()  # r8: linear INTERPOLATE; r9: STALENESS
    interp, stale = variant < 0.35, 0.35 <= variant < 0.6
    k = rng.randint(1, 5)
    itail = f" INTERPOLATE (n AS n + {k})" if interp else ""
    if stale:
        # r9: per-original-row fill windows on the step grid; DuckDB
        # replays with a DISTINCT per-row range() spine full-joined back
        st = rng.choice([2, 3, 5])
        step = rng.choice([1, 1, 2])
        stail = (f" STEP {step}" if step != 1 else "") + f" STALENESS {st}"
        ch = (
            f"SELECT o_orderkey % {m} AS bucket, count() AS n FROM orders"
            f" WHERE {p_ch} GROUP BY o_orderkey % {m}"
            f" ORDER BY bucket WITH FILL{stail}"
        )
        dk = (
            f"WITH q AS (SELECT CAST(o_orderkey % {m} AS BIGINT)"
            f" AS bucket, count(*) AS n FROM orders WHERE {p_dk}"
            " GROUP BY 1),"
            " spine AS (SELECT DISTINCT unnest(range(bucket,"
            f" bucket + {st}, {step})) AS bucket FROM q)"
            " SELECT COALESCE(s.bucket, q.bucket) AS bucket,"
            " COALESCE(q.n, 0) AS n FROM spine s FULL OUTER JOIN q"
            " ON s.bucket = q.bucket ORDER BY bucket"
        )
        return ch, dk
    ch = (
        f"SELECT o_orderkey % {m} AS bucket, count() AS n FROM orders"
        f" WHERE {p_ch} GROUP BY o_orderkey % {m}"
        f" ORDER BY bucket WITH FILL FROM 0 TO {m}{itail}"
    )
    if interp:
        # linear fill: last actual n + k × steps since that actual row
        dk = (
            f"WITH q AS (SELECT CAST(o_orderkey % {m} AS BIGINT)"
            f" AS bucket, count(*) AS n FROM orders WHERE {p_dk}"
            " GROUP BY 1),"
            f" j AS (SELECT s.bucket AS bucket, q.n AS n"
            f" FROM (SELECT unnest(range(0, {m})) AS bucket) s"
            " LEFT JOIN q ON s.bucket = q.bucket)"
            " SELECT bucket, COALESCE(CASE WHEN n IS NOT NULL THEN n"
            " ELSE last_value(n IGNORE NULLS) OVER w"
            f" + {k} * (bucket - last_value(CASE WHEN n IS NOT NULL"
            " THEN bucket END IGNORE NULLS) OVER w) END, 0) AS n"
            " FROM j WINDOW w AS (ORDER BY bucket ROWS BETWEEN UNBOUNDED"
            " PRECEDING AND CURRENT ROW) ORDER BY bucket"
        )
        return ch, dk
    dk = (
        f"WITH q AS (SELECT CAST(o_orderkey % {m} AS BIGINT) AS bucket,"
        f" count(*) AS n FROM orders WHERE {p_dk} GROUP BY 1)"
        f" SELECT s.bucket AS bucket, COALESCE(q.n, 0) AS n"
        f" FROM (SELECT unnest(range(0, {m})) AS bucket) s"
        f" LEFT JOIN q ON s.bucket = q.bucket"
    )
    return ch, dk


def q_qualify(rng: random.Random) -> tuple[str, str]:
    # r9: QUALIFY (post-window filter). DuckDB supports QUALIFY natively,
    # so the oracle is the SAME clause — only Spark needs the rewrite.
    table = rng.choice([t for t in TABLES if TABLES[t].get("uniq")])
    meta = TABLES[table]
    k = rng.choice(meta["str"])
    v = rng.choice(meta["int"] + meta["double"])
    u = meta["uniq"]
    n = rng.randint(1, 3)
    fn = rng.choice(["row_number()", "rank()", "dense_rank()"])
    body = (
        f"SELECT {k} AS c0, {v} AS c1, {u} AS c2 FROM {table}"
        f" QUALIFY {fn} OVER (PARTITION BY {k} ORDER BY {v}, {u})"
        f" <= {n} ORDER BY c0, c1, c2"
    )
    return body, body


def q_totals(rng: random.Random) -> tuple[str, str]:
    # GROUP BY k WITH TOTALS → grouping sets; DuckDB's grouping sets share
    # the NULL-key totals-row convention (the documented CH divergence),
    # so the two engines must agree with each other exactly.
    table = rng.choice(list(TABLES))
    g = Gen(rng, table)
    k = rng.choice(TABLES[table]["str"])
    a_ch, a_dk = g.agg()
    # Guaranteed-non-empty predicate: on EMPTY input Spark's grouping sets
    # emit no totals row while DuckDB emits one (engine-level divergence
    # the WITH TOTALS rewrite inherits — documented in the chsql module
    # docstring; fuzz pins the non-degenerate behavior).
    c = rng.choice(TABLES[table]["int"])
    where_ch = where_dk = f" WHERE {c} > {rng.randint(0, 5)}"
    if rng.random() < 0.4 and k != "c_name":
        # r8: TOTALS × HAVING — after_having_exclusive (totals over only
        # the passing groups, totals row itself kept unconditionally).
        # c_name is skipped: unique per row, so every group would fail the
        # HAVING and the empty-input totals divergence (Spark: no row,
        # DuckDB: one zero row) would fire — same guard as the WHERE note
        # above. hn stays small so the low-cardinality keys always keep
        # at least one passing group at sf0.001.
        hn = rng.randint(1, 3)
        ch = (
            f"SELECT {k} AS c0, {a_ch} AS c1 FROM {table}{where_ch}"
            f" GROUP BY {k} WITH TOTALS HAVING count() > {hn}"
        )
        dk = (
            f"SELECT {k} AS c0, {a_dk} AS c1 FROM {table}{where_dk}"
            f" AND {k} IN (SELECT {k} FROM {table}{where_dk}"
            f" GROUP BY {k} HAVING count(*) > {hn})"
            f" GROUP BY GROUPING SETS (({k}), ())"
        )
        return ch, dk
    ch = (
        f"SELECT {k} AS c0, {a_ch} AS c1 FROM {table}{where_ch}"
        f" GROUP BY {k} WITH TOTALS"
    )
    dk = (
        f"SELECT {k} AS c0, {a_dk} AS c1 FROM {table}{where_dk}"
        f" GROUP BY GROUPING SETS (({k}), ())"
    )
    return ch, dk


def q_window(rng: random.Random) -> tuple[str, str]:
    # Window functions are pass-through spellings; the differential value
    # is the type discipline (Spark window SUM of BIGINT stays BIGINT,
    # DuckDB's widens to HUGEINT) and interplay with WHERE/PREWHERE.
    table = rng.choice([t for t, m in TABLES.items() if m["uniq"]])
    g = Gen(rng, table)
    u = TABLES[table]["uniq"]
    k_ch, k_dk = g.group_key()
    i_ch, i_dk = g.int_expr(1)
    fn = rng.choice(["sum", "count", "min", "max", "rank_family"])
    if fn == "rank_family":
        w = rng.choice(["row_number()", "rank()", "dense_rank()"])
        win_ch = f"{w} OVER (PARTITION BY {k_ch} ORDER BY {u})"
        win_dk = f"{w} OVER (PARTITION BY {k_dk} ORDER BY {u})"
    elif fn == "count":
        win_ch = f"count() OVER (PARTITION BY {k_ch})"
        win_dk = f"COUNT(*) OVER (PARTITION BY {k_dk})"
    elif fn == "sum":
        win_ch = f"sum({i_ch}) OVER (PARTITION BY {k_ch})"
        win_dk = f"CAST(SUM({i_dk}) OVER (PARTITION BY {k_dk}) AS BIGINT)"
    else:
        win_ch = f"{fn}({i_ch}) OVER (PARTITION BY {k_ch})"
        win_dk = f"{fn}({i_dk}) OVER (PARTITION BY {k_dk})"
    p = g.bool_expr(1)
    kw = "PREWHERE" if rng.random() < 0.3 else "WHERE"
    ch = f"SELECT {u} AS c0, {win_ch} AS c1 FROM {table} {kw} {p[0]}"
    dk = f"SELECT {u} AS c0, {win_dk} AS c1 FROM {table} WHERE {p[1]}"
    return ch, dk


def q_r7_spellings(rng: random.Random) -> tuple[str, str]:
    """r7 surface: tuple positional access, -ForEach elementwise folds,
    -OrDefault/-OrNull empty-set combinators, bucket rounding, string
    distance — each paired with its independent DuckDB algebra."""
    table = rng.choice(["orders", "events", "customer"])
    t = TABLES[table]
    ic = rng.choice(t["int"])
    sc = rng.choice(t["str"])
    m1, m2 = rng.randint(2, 7), rng.randint(2, 5)
    needle = rng.choice(["a", "e", "ck", "zz"])
    pick = rng.randrange(5)
    if pick == 4:
        # r7 scanner rewrites: bracket literal + 1-based subscript in the
        # SELECT list, alias macro in WHERE, tuple IN on a literal list
        # (unique sort key: the LIMIT boundary must be deterministic)
        ic = t["uniq"]
        m3 = rng.randint(2, 4)
        ch = (
            f"SELECT {ic} * 2 AS d,"
            f" toInt64([7, 8, 9][toInt32({ic} % 3) + 1]) AS sub"
            f" FROM {table}"
            f" WHERE d % {m1} = 0"
            f" AND ({ic} % {m3}, {ic} % 2) IN ((0, 0), (1, 1))"
            f" ORDER BY d LIMIT 400"
        )
        dk = (
            f"SELECT {ic} * 2 AS d,"
            f" CAST(([7, 8, 9])[CAST({ic} % 3 AS INT) + 1] AS BIGINT)"
            f" AS sub"
            f" FROM {table}"
            f" WHERE ({ic} * 2) % {m1} = 0"
            f" AND (({ic} % {m3} = 0 AND {ic} % 2 = 0)"
            f" OR ({ic} % {m3} = 1 AND {ic} % 2 = 1))"
            f" ORDER BY d LIMIT 400"
        )
        return ch, dk
    if pick == 0:
        # tuple construction + positional access through an aggregate
        ch = (
            f"SELECT {sc} AS g, tuple(min({ic}), max({ic})).1 AS lo,"
            f" tuple(min({ic}), max({ic})).2 AS hi"
            f" FROM {table} GROUP BY {sc} ORDER BY g"
        )
        dk = (
            f"SELECT {sc} AS g, min({ic}) AS lo, max({ic}) AS hi"
            f" FROM {table} GROUP BY {sc} ORDER BY g"
        )
    elif pick == 1:
        # sumForEach/countForEach over an inline 2-array vs positional
        # unnest regroup
        ch = (
            f"SELECT {sc} AS g, arrayStringConcat(arrayMap(x ->"
            f" toString(x), sumForEach([{ic} % {m1}, {ic} % {m2}])),"
            f" ',') AS s"
            f" FROM {table} GROUP BY {sc} ORDER BY g"
        )
        dk = (
            f"SELECT g, array_to_string(list(CAST(s AS BIGINT)"
            f" ORDER BY pos), ',') AS s FROM ("
            f"SELECT {sc} AS g, pos, SUM(v) AS s FROM ("
            f"SELECT {sc}, unnest([{ic} % {m1}, {ic} % {m2}]) AS v,"
            f" generate_subscripts([{ic} % {m1}, {ic} % {m2}], 1) AS pos"
            f" FROM {table}) GROUP BY {sc}, pos) GROUP BY g ORDER BY g"
        )
    elif pick == 2:
        # -OrDefault / -OrNull under a selective (possibly empty) filter
        sel = rng.randint(0, 1200)
        ch = (
            f"SELECT toInt64(sumOrDefault({ic})) AS sd,"
            f" countOrNull({ic}) AS cn,"
            f" toInt64(uniqExactOrDefault({sc})) AS ud"
            f" FROM {table} WHERE {ic} % 1000 = {sel}"
        )
        dk = (
            f"SELECT CAST(COALESCE(SUM({ic}), 0) AS BIGINT) AS sd,"
            f" CASE WHEN COUNT({ic}) = 0 THEN NULL"
            f" ELSE COUNT({ic}) END AS cn,"
            f" CAST(COUNT(DISTINCT {sc}) AS BIGINT) AS ud"
            f" FROM {table} WHERE {ic} % 1000 = {sel}"
        )
    else:
        # bucket rounding + string distance, row-wise (unique sort key so
        # the LIMIT boundary is deterministic)
        ic = t["uniq"]
        ch = (
            f"SELECT {ic} AS k, toInt64(roundAge({ic} % 90)) AS ra,"
            f" toInt64(roundToExp2({ic} % 100 + 1)) AS r2,"
            f" toInt64(editDistance({sc}, '{needle}')) AS ed"
            f" FROM {table} ORDER BY k LIMIT 500"
        )
        dk = (
            f"SELECT {ic} AS k,"
            f" CAST(CASE WHEN {ic} % 90 < 1 THEN 0"
            f" WHEN {ic} % 90 <= 17 THEN 17 WHEN {ic} % 90 <= 24 THEN 18"
            f" WHEN {ic} % 90 <= 34 THEN 25 WHEN {ic} % 90 <= 44 THEN 35"
            f" WHEN {ic} % 90 <= 54 THEN 45 ELSE 55 END AS BIGINT) AS ra,"
            f" CAST(pow(2, floor(log2({ic} % 100 + 1))) AS BIGINT) AS r2,"
            f" CAST(levenshtein({sc}, '{needle}') AS BIGINT) AS ed"
            f" FROM {table} ORDER BY k LIMIT 500"
        )
    return ch, dk


def q_table_fns(rng: random.Random) -> tuple[str, str]:
    """r8 surface: values()/generate_series()/zeros() table functions in
    FROM position — DuckDB implements VALUES and the inclusive-stop
    generate_series natively, zeros() is an explicit constant series."""
    pick = rng.randrange(3)
    if pick == 0:
        vals = [(rng.randint(-50, 50), rng.choice("abcde")) for _ in range(
            rng.randint(1, 5))]
        rows_ch = ", ".join(f"({a}, '{s}')" for a, s in vals)
        rows_dk = ", ".join(
            f"(CAST({a} AS BIGINT), '{s}')" for a, s in vals)
        ch = (
            f"SELECT a AS c0, b AS c1 FROM values('a Int64, b String',"
            f" {rows_ch}) ORDER BY a, b"
        )
        dk = (
            f"SELECT a AS c0, b AS c1 FROM (VALUES {rows_dk}) t(a, b)"
            " ORDER BY a, b"
        )
    elif pick == 1:
        a = rng.randint(-10, 10)
        b = a + rng.randint(0, 40)
        s = rng.randint(1, 5)
        ch = (
            "SELECT generate_series AS c0"
            f" FROM generate_series({a}, {b}, {s}) ORDER BY c0"
        )
        dk = (
            "SELECT CAST(generate_series AS BIGINT) AS c0"
            f" FROM generate_series({a}, {b}, {s}) ORDER BY c0"
        )
    else:
        n = rng.randint(1, 200)
        ch = f"SELECT count() AS c0, sum(zero) AS c1 FROM zeros({n})"
        dk = (
            f"SELECT CAST({n} AS BIGINT) AS c0,"
            " CAST(0 AS BIGINT) AS c1"
        )
    return ch, dk


def q_r8_spellings(rng: random.Random) -> tuple[str, str]:
    """r8 surface: the ternary operator, ANSI position(needle IN
    haystack), combinator stacks (-Array∘-If), and two-array zipped HOF
    lambdas — each against an independent DuckDB algebra."""
    table = rng.choice(["orders", "events", "customer"])
    t = TABLES[table]
    ic, sc, uq = rng.choice(t["int"]), rng.choice(t["str"]), t["uniq"]
    m1, m2 = rng.randint(2, 7), rng.randint(2, 5)
    needle = rng.choice(["a", "e", "ck"])
    pick = rng.randrange(3)
    if pick == 0:
        ch = (
            f"SELECT {uq} AS k, {ic} % 2 = 0 ? 'e' : 'o' AS t,"
            f" toInt64(position('{needle}' IN {sc})) AS p"
            f" FROM {table} ORDER BY k LIMIT 500"
        )
        dk = (
            f"SELECT {uq} AS k,"
            f" CASE WHEN {ic} % 2 = 0 THEN 'e' ELSE 'o' END AS t,"
            f" CAST(strpos({sc}, '{needle}') AS BIGINT) AS p"
            f" FROM {table} ORDER BY k LIMIT 500"
        )
    elif pick == 1:
        ch = (
            f"SELECT {sc} AS g,"
            f" sumArrayIf([{ic} % {m1}, 1], {ic} % {m2} = 0) AS s"
            f" FROM {table} GROUP BY g ORDER BY g"
        )
        dk = (
            f"SELECT {sc} AS g,"
            f" CAST(sum(CASE WHEN {ic} % {m2} = 0"
            f" THEN ({ic} % {m1}) + 1 ELSE 0 END) AS DOUBLE) AS s"
            f" FROM {table} GROUP BY g ORDER BY g"
        )
    else:
        ch = (
            f"SELECT {uq} AS k, arrayCount((x, y) -> x < y,"
            f" [{ic} % {m1}, {m2}], [{m2}, {ic} % {m1}]) AS c"
            f" FROM {table} ORDER BY k LIMIT 400"
        )
        dk = (
            f"SELECT {uq} AS k,"
            f" CAST((CASE WHEN {ic} % {m1} < {m2} THEN 1 ELSE 0 END)"
            f" + (CASE WHEN {m2} < {ic} % {m1} THEN 1 ELSE 0 END)"
            f" AS INT) AS c"
            f" FROM {table} ORDER BY k LIMIT 400"
        )
    return ch, dk


def q_r12_spellings(rng: random.Random) -> tuple[str, str]:
    """r12 surface: arrayReduce -If combinators, the NULL-skip any()
    default + the *_respect_nulls twin, 3-arg numbers(begin, end, step),
    toUInt8OrNull, MySQL-style # comments, and lagInFrame's canonical
    full-frame spelling — each against an independent DuckDB algebra."""
    table = rng.choice(["orders", "customer", "events", "documents"])
    t = TABLES[table]
    ic, sc, uq = rng.choice(t["int"]), rng.choice(t["str"]), t["uniq"]
    m1, m2 = rng.randint(2, 7), rng.randint(2, 5)
    pick = rng.randrange(4)
    if pick == 0:
        ch = (
            f"SELECT {uq} AS k, arrayReduce('sumIf',"
            f" [{ic} % {m1}, 2, 3], [1, 0, {ic} % 2]) AS s"
            f" FROM {table} ORDER BY k LIMIT 400"
        )
        dk = (
            f"SELECT {uq} AS k, CAST(({ic} % {m1})"
            f" + 3 * (CASE WHEN {ic} % 2 <> 0 THEN 1 ELSE 0 END)"
            f" AS DOUBLE) AS s FROM {table} ORDER BY k LIMIT 400"
        )
    elif pick == 1:
        # single-row groups make any() deterministic; the nullIf twin
        # exercises the NULL-skip default and the respect_nulls spelling;
        # the trailing # comment exercises the MySQL comment strip
        ch = (
            f"SELECT {uq} AS k, any({ic} % {m1}) AS a,"
            f" any(nullIf({ic}, {ic})) IS NULL AS sk,"
            f" any_respect_nulls(nullIf({sc}, {sc})) IS NULL AS rn"
            f" FROM {table} GROUP BY k ORDER BY k LIMIT 500 # r12"
        )
        dk = (
            f"SELECT {uq} AS k, {ic} % {m1} AS a, TRUE AS sk, TRUE AS rn"
            f" FROM {table} ORDER BY k LIMIT 500"
        )
    elif pick == 2:
        b, step = rng.randint(0, 5), rng.randint(1, 4)
        e = b + rng.randint(1, 20)
        n = len(range(b, e, step))
        ch = (
            f"SELECT {uq} AS k,"
            f" (SELECT count() FROM numbers({b}, {e}, {step})) AS n,"
            f" toUInt8OrNull(toString({ic} % 200)) AS u"
            f" FROM {table} ORDER BY k LIMIT 300"
        )
        dk = (
            f"SELECT {uq} AS k, CAST({n} AS BIGINT) AS n,"
            f" TRY_CAST(CAST({ic} % 200 AS VARCHAR) AS SMALLINT) AS u"
            f" FROM {table} ORDER BY k LIMIT 300"
        )
    else:
        ch = (
            f"SELECT {uq} AS k, lagInFrame({ic}, 1, -1) OVER"
            f" (ORDER BY {uq} ROWS BETWEEN UNBOUNDED PRECEDING AND"
            f" UNBOUNDED FOLLOWING) AS l"
            f" FROM {table} ORDER BY k LIMIT 400"
        )
        dk = (
            f"SELECT {uq} AS k, lag({ic}, 1, -1) OVER (ORDER BY {uq})"
            f" AS l FROM {table} ORDER BY k LIMIT 400"
        )
    return ch, dk


QUERY_GENS = [
    (q_flat, 30),
    (q_grouped, 25),
    (q_subquery, 15),
    (q_limit_by, 10),
    (q_with_ties, 8),
    (q_setop, 12),
    (q_array_join, 8),
    (q_arrayjoin_fn, 6),
    (q_distinct, 8),
    (q_join, 12),
    (q_any_join, 6),
    (q_asof_join, 5),
    (q_rollup, 8),
    (q_scalar_with, 6),
    (q_cte, 8),
    (q_window, 8),
    (q_final, 6),
    (q_sample, 6),
    (q_with_fill, 5),
    (q_totals, 6),
    (q_in_subquery, 8),
    (q_join3, 6),
    (q_r7_spellings, 8),
    (q_table_fns, 5),
    (q_r8_spellings, 6),
    (q_qualify, 4),
    (q_r12_spellings, 6),
]


def gen_case(rng: random.Random) -> tuple[str, str]:
    total = sum(w for _, w in QUERY_GENS)
    pick = rng.randrange(total)
    acc = 0
    for fn, w in QUERY_GENS:
        acc += w
        if pick < acc:
            return fn(rng)
    return q_flat(rng)


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def fuzz_views(spark, sf_dir):
    # One registration for the whole module: ch_sql re-registers the
    # fixture views per call, which at 500+ fuzz cases dominated runtime.
    register_views(spark, sf_dir)
    from canal_clickhouse_spark.cdc.changes import change_log

    change_log(spark, sf_dir).createOrReplaceTempView("cdc_changes")


def test_chsql_differential_fuzz(spark, duck, sf_dir, fuzz_views):
    """N executed cases: translated CH text on Spark vs independent ANSI
    rendering in DuckDB, hash-compared through the type-faithful canon."""
    rng = random.Random(SEED)
    failures = []
    for i in range(N_EXECUTED):
        ch, dk = gen_case(rng)
        try:
            s_tbl = spark.sql(translate(ch)).toArrow()
            d_tbl = duck.sql(dk).arrow()
            assert_tables_match(s_tbl, d_tbl, f"fuzz[{i}]")
        except AssertionError as exc:
            failures.append(f"case {i}:\n  CH : {ch}\n  DK : {dk}\n  {exc}")
        except Exception as exc:  # noqa: BLE001 — report with repro text
            failures.append(
                f"case {i} raised {type(exc).__name__}:\n  CH : {ch}\n"
                f"  DK : {dk}\n  {str(exc)[:400]}"
            )
        if len(failures) >= 5:
            break
    assert not failures, (
        f"{len(failures)} differential mismatches:\n\n" + "\n\n".join(failures)
    )


def test_chsql_analysis_fuzz(spark, sf_dir, fuzz_views):
    """A larger sweep through Spark's parser/analyzer only (no job): every
    generated CH query must translate to SQL Spark can fully resolve.
    Catches text corruption (unbalanced parens, mangled literals, dangling
    keywords) at ~ms per case."""
    rng = random.Random(SEED + 1)
    failures = []
    for i in range(N_ANALYZED):
        ch, _ = gen_case(rng)
        try:
            spark.sql(translate(ch)).schema  # analysis only, no action
        except Exception as exc:  # noqa: BLE001
            failures.append(
                f"case {i} ({type(exc).__name__}):\n  CH : {ch}\n"
                f"  {str(exc)[:300]}"
            )
        if len(failures) >= 5:
            break
    assert not failures, (
        f"{len(failures)} analysis failures:\n\n" + "\n\n".join(failures)
    )


def test_chsql_fuzz_generator_is_stable():
    """The seeded stream is deterministic — a failing case number from CI
    reproduces locally byte-for-byte."""
    a = [gen_case(random.Random(SEED)) for _ in range(5)]
    b = [gen_case(random.Random(SEED)) for _ in range(5)]
    assert a == b
