"""Property-based tests (SURVEY.md §5.3): invariants golden fixtures miss.

Each example builds a tiny change log and checks algebraic laws of the CDC
merge and of the relational operators. Spark jobs are slow per example, so
examples are capped and the data is small — hypothesis's shrinking still
finds minimal counterexamples within those bounds.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from canal_clickhouse_spark.cdc.apply import apply_replacing, latest_per_key

CHANGE = st.tuples(
    st.integers(min_value=0, max_value=5),          # pk
    st.integers(min_value=0, max_value=9),          # version
    st.sampled_from(["INSERT", "UPDATE", "DELETE"]),
    st.integers(min_value=-100, max_value=100),     # payload
)

# Unique (pk, version) per log: at-least-once duplicates are modeled
# explicitly by replaying slices, not by ambiguous same-version rows with
# different payloads (which no version-resolved store can order).
CHANGE_LOG = st.lists(CHANGE, min_size=1, max_size=12, unique_by=lambda c: (c[0], c[1]))


def log_df(spark, log):
    return spark.createDataFrame(log, "pk int, version int, op string, payload int")


def final_state(spark, log):
    return {
        (r.pk, r.payload)
        for r in apply_replacing(log_df(spark, log), pk="pk").collect()
    }


@settings(max_examples=12, deadline=None)
@given(log=CHANGE_LOG, split=st.integers(min_value=0, max_value=12))
def test_batch_split_invariance(spark, log, split):
    """Applying a log in one batch == applying any two-way split then
    merging: micro-batch boundaries must be invisible."""
    split = min(split, len(log))
    whole = final_state(spark, log)
    parts = [log_df(spark, part) for part in (log[:split], log[split:]) if part]
    # two-phase: collapse each part, then collapse the collapsed parts
    staged = latest_per_key(
        parts[0] if len(parts) == 1
        else latest_per_key(parts[0], pk="pk").unionByName(
            latest_per_key(parts[1], pk="pk")
        ),
        pk="pk",
    )
    got = {
        (r.pk, r.payload)
        for r in staged.filter(F.col("op") != "DELETE").drop("op", "version").collect()
    }
    assert got == whole


@settings(max_examples=10, deadline=None)
@given(log=CHANGE_LOG, start=st.integers(min_value=0, max_value=11))
def test_suffix_replay_idempotent(spark, log, start):
    """Replaying any suffix of an applied log changes nothing
    (at-least-once transport safety)."""
    start = min(start, len(log) - 1)
    whole = final_state(spark, log)
    replayed = log + log[start:]
    assert final_state(spark, replayed) == whole


@settings(max_examples=8, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(-1000, 1000), st.integers(0, 3)),
        min_size=1,
        max_size=20,
    )
)
def test_semi_join_is_inner_distinct_on_keys(spark, rows):
    """left_semi(a, b) == distinct keys of inner(a, b) projected to a."""
    a = spark.createDataFrame([(k, v) for k, v in rows], "k int, v int")
    b = spark.createDataFrame([(v,) for _, v in rows[::2]], "k int")
    semi = {tuple(r) for r in a.join(b, "k", "left_semi").collect()}
    inner = {
        tuple(r)
        for r in a.join(b.distinct(), "k", "inner").select("k", "v").collect()
    }
    assert semi == inner


@settings(max_examples=8, deadline=None)
@given(vals=st.lists(st.integers(-(2**31), 2**31 - 1), min_size=1, max_size=15))
def test_stringly_typed_cast_roundtrip(spark, vals):
    """The CDC mapping contract: value → string (wire) → typed cast is
    lossless for integer payloads (FlatMessage data is stringly-typed)."""
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    wire = df.select(F.col("x").cast("string").alias("s"))
    back = wire.select(F.col("s").cast("long").alias("x"))
    assert sorted(r.x for r in back.collect()) == sorted(vals)


@settings(max_examples=30, deadline=None)
@given(seq=st.lists(st.sampled_from(["view", "click"]), min_size=1, max_size=40))
def test_sequence_count_closed_form_equals_greedy(seq):
    """`sequence_count`'s König/Hall closed form C − max(0, max_r(r − vb_r))
    must equal the sequential greedy matcher (each click consumes the
    earliest unconsumed preceding view) — pure-Python check of the formula
    the Spark/DuckDB twins both evaluate."""
    # greedy non-overlapping view→click matching
    unmatched_views = matched = 0
    for ev in seq:
        if ev == "view":
            unmatched_views += 1
        elif unmatched_views > 0:
            unmatched_views -= 1
            matched += 1
    # closed form over click ranks
    views_before = 0
    rank = 0
    max_deficiency = 0
    for ev in seq:
        if ev == "view":
            views_before += 1
        else:
            rank += 1
            max_deficiency = max(max_deficiency, rank - views_before)
    closed = rank - max(0, max_deficiency)
    assert closed == matched


# -- chsql translator: random composition parse-safety ------------------------

# Numeric-only leaves/wraps: Spark resolves mixed numeric types but
# (unlike CH) will not coerce strings in numeric contexts — string
# spellings are pinned by the unit cases instead.
_CH_LEAVES = ["value", "user_id", "event_id", "1.5", "3"]
_CH_WRAPS = [
    "toInt64({0})", "round({0}, 2)", "ifNull({0}, {1})",
    "multiIf({0} > 1, {1}, {0})", "greatest({0}, {1})", "intDiv({0}, 2)",
    "modulo({0}, 7)",
]
_CH_AGGS = [
    "sumIf({0}, {0} > 1)", "uniqExact({0})", "quantile(0.9)({0})",
    "argMax({0}, {1})", "median({0})", "avgIf({0}, {1} > 0)",
    "groupArray({0})", "anyIf({0}, {1} > 0)",
    "quantileExactWeighted(0.5)({0}, toInt64(abs({1})) + 1)",
    "groupArray(3)({0})", "uniqUpTo(4)({0})",
    "quantileDeterministic(0.9)({0}, {1})", "anyHeavy({0})",
]


@st.composite
def _ch_expr(draw, depth=0):
    if depth >= 2 or draw(st.booleans()):
        return draw(st.sampled_from(_CH_LEAVES))
    tmpl = draw(st.sampled_from(_CH_WRAPS))
    a = draw(_ch_expr(depth=depth + 1))
    b = draw(_ch_expr(depth=depth + 1))
    return tmpl.format(a, b)


@settings(max_examples=15, deadline=None)
@given(inner=_ch_expr(), agg=st.sampled_from(_CH_AGGS), data=st.data())
def test_chsql_random_compositions_parse_and_run(spark, inner, agg, data):
    """Any composition of covered CH spellings must translate into SQL that
    Spark PARSES AND EXECUTES — the translator's recursive-rewrite contract
    (paren matching, argument splitting, parametric double-calls) holds
    under nesting, not just on the hand-written unit cases. `greatest` stays
    untranslated (shared ANSI-name passthrough is part of the contract)."""
    from canal_clickhouse_spark.chsql import translate

    sel = agg.format(inner, data.draw(_ch_expr()))
    q = f"SELECT event_type, {sel} AS v FROM events GROUP BY event_type"
    translated = translate(q)
    assert "quantile(" not in translated.lower() or "percentile" in translated
    spark.sql(
        "SELECT * FROM (" + translated.replace(
            "FROM events", "FROM {ev}"
        ) + ") LIMIT 3",
        ev=spark.range(0, 50).selectExpr(
            "CAST(id % 5 AS STRING) AS event_type",
            "CAST(id AS DOUBLE) AS value",
            "id AS user_id",
            "id AS event_id",
        ),
    ).collect()
