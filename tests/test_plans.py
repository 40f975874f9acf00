"""Physical-plan assertions — the 100 TB posture checks (SURVEY.md §4, §6).

Correctness says the operator computes the right rows; these tests pin the
plan SHAPE that survives a 1000-executor scale-up: filters pushed to the
parquet reader, projections pruned to referenced columns, small dims
broadcast (no shuffle), top-k short-circuited, partial aggregation before
the exchange, and Python kept out of JVM-only paths.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from canal_clickhouse_spark import QUERIES


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_scan_pushdown_and_pruning(spark, sf_dir):
    plan = plan_of(QUERIES["scan_parquet"](spark, sf_dir))
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate" in plan
    # Projection pruned to the 4 selected + 1 filter column — the wide money
    # columns must not reach the reader.
    assert "l_extendedprice" in plan
    assert "l_tax" not in plan and "l_comment" not in plan


def test_small_dim_join_broadcasts(spark, sf_dir):
    plan = plan_of(QUERIES["join_inner_broadcast"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_flagship_agg_is_partial_and_codegen(spark, sf_dir):
    plan = plan_of(QUERIES["agg_groupby"](spark, sf_dir))
    # Two HashAggregates (partial + final) around one exchange: map-side
    # combine keeps the shuffle at |groups| not |rows|.
    assert plan.count("HashAggregate") >= 2
    assert "partial_sum" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # Codegen stars (`*(n)`) only appear on the AQE final plan — execute,
    # then re-explain.
    df = QUERIES["agg_groupby"](spark, sf_dir)
    df.collect()
    executed = plan_of(df, "simple")
    assert "isFinalPlan=true" in executed
    assert "*(" in executed, "flagship must run inside WholeStageCodegen"


def test_topk_short_circuits(spark, sf_dir):
    plan = plan_of(QUERIES["topk_global"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_cosine_topk_broadcasts_queries(spark, sf_dir):
    plan = plan_of(QUERIES["sim_cosine_topk"](spark, sf_dir))
    # The 5-vector query side must broadcast; the corpus side must stream.
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_tfidf_no_python_in_plan(spark, sf_dir):
    plan = plan_of(QUERIES["tfidf_topterms"](spark, sf_dir))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_minhash_no_cross_join(spark, sf_dir):
    """LSH candidate generation must never plan a cartesian/nested-loop
    corpus×corpus join — that is the entire point of banding."""
    plan = plan_of(QUERIES["dedup_minhash_lsh"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pair_kernels_are_bucketed(spark, sf_dir):
    """The exact pair kernels must form candidates via a bucketed equi-join
    (prefix token / projection-grid cell), never an all-pairs block self-join:
    a join keyed only on the block column (lang/label) is the (N/blocks)²
    shape that dies at 100×."""
    import re

    for key, bucket_col in [
        ("dedup_near_jaccard", "tok"),
        ("dedup_ngram_jaccard", "tok"),
        ("dedup_embedding_cosine", "cell0"),
    ]:
        plan = plan_of(QUERIES[key](spark, sf_dir))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        key_lines = [
            ln for ln in plan.splitlines() if re.match(r"\s*(Left|Right) keys", ln)
        ]
        assert any(
            f"{bucket_col}#" in ln for ln in key_lines
        ), f"{key}: no join keyed on bucket column {bucket_col!r}:\n" + "\n".join(key_lines)
        # No join may be keyed on the block column alone.
        solo_block = [
            ln
            for ln in key_lines
            if re.search(r"keys \[1\]: \[(a_|b_)?(lang|label)#", ln)
        ]
        assert not solo_block, f"{key}: block-only join keys: {solo_block}"


def test_cdc_read_final_partial_agg(spark, sf_dir):
    """max_by plans as SortAggregate (struct buffer isn't hash-mutable) but
    must still partial-aggregate: the exchange carries one partial row per
    (partition, key), not the raw change log."""
    plan = plan_of(QUERIES["cdc_read_final"](spark, sf_dir))
    n_aggs = plan.count("SortAggregate") + plan.count("HashAggregate") + plan.count(
        "ObjectHashAggregate"
    )
    assert n_aggs >= 2, "FINAL collapse must partial-agg before the shuffle"
    assert "partial_" in plan


# Keys whose callables execute streaming queries / stage side files rather
# than returning a lazy plan — excluded from the static sweep (their rigs
# are exercised by their own oracle/unit tests).
_EAGER_PREFIXES = ("stream_", "source_", "sink_", "scan_csv", "scan_jsonl")
_EAGER_KEYS = {
    "cdc_stream_apply", "cdc_checkpoint_resume", "cdc_schema_evolve",
    "join_interval_stream",
}
# Python-on-purpose keys (§2 L surface + the sanctioned decode path).
_PYTHON_OK = {
    "udf_python", "udf_pandas_scalar", "udaf_pandas_agg",
    "udtf_map_in_pandas", "udtf_apply_in_pandas", "udtf_python",
    "multimodal_decode", "multimodal_framesample", "multimodal_resize",
    "multimodal_features", "stream_stateful",
}
# Cartesian/broadcast-nested-loop by design: explicit cross join, tiny
# broadcast probe sides, non-equi range predicates, or a broadcast 1-row
# aggregate (tfidf's corpus-size N) attached via cross join.
_CARTESIAN_OK = {
    "join_cross", "join_theta_range",
    "sim_cosine_topk", "knn_classify", "sim_ivf_topk",
    "tfidf_topterms",
    # broadcast 1-row global aggregate (min/max range, corpus total,
    # TTL horizon) attached via cross join — O(1) rows on the broadcast side.
    "agg_histogram", "agg_freq_items", "ttl_expire", "ttl_rollup",
    "agg_bitmap_ops",
    # r7: the TTL DDL composite enforces expiry through the same
    # broadcast 1-row max-anchor attach as ttl_expire.
    "chsql_ttl_ddl",
    # deterministic Lloyd's: per-row probe of a broadcast k-row (k=8)
    # centroid table via crossJoin — map-side by construction.
    "embed_kmeans",
    # sample_token_budget attaches its 1-row broadcast budget scalar via
    # cross join (same class as ttl_expire's horizon).
    "sample_token_budget",
    # text_perplexity attaches its 1-row (N, V) smoothing constants the
    # same way; the score join itself is a keyed shuffle join.
    "text_perplexity",
    # r8: the table-functions key CROSS JOINs a 2-row VALUES relation
    # with a 1-row generate_series aggregate — both sides are driver-side
    # constants, the broadcast-scalar attach class by construction.
    "chsql_table_fns",
}


def test_bucketed_join_has_no_input_exchange(spark, sf_dir):
    """The bucketed co-located join must consume both bucketed scans
    WITHOUT shuffling them: the SortMergeJoin's inputs come straight from
    the bucket layout; the only exchanges in the plan are the post-join
    aggregate/sort. This is the write-once-shuffle-never layout contract."""
    plan = plan_of(QUERIES["join_bucketed_colocated"](spark, sf_dir), mode="simple")
    assert "SortMergeJoin" in plan and plan.count("Bucketed: true") == 2
    pre_join = plan.split("SortMergeJoin", 1)[1]  # subtree below the join
    assert "Exchange" not in pre_join, "bucketed join inputs must not shuffle"


def test_curation_ops_broadcast_small_sides(spark, sf_dir):
    """The scale-critical join sides of the round-3 curation ops must plan
    as broadcasts: decontam's eval-set gram table (KBs vs a 100 TB corpus),
    boilerplate's df≥K survivor set, and source-mix's per-source target
    table. A shuffle join on any of these would couple corpus-side cost to
    a table that is tiny by construction."""
    for key in ("decontam_ngram", "doc_boilerplate", "source_mix_sample"):
        plan = plan_of(QUERIES[key](spark, sf_dir))
        assert "BroadcastHashJoin" in plan, f"{key}: small side not broadcast"


def test_perplexity_score_join_is_preaggregated(spark, sf_dir):
    """r8 verdict #2: text_perplexity's score join must consume the
    document side pre-aggregated to distinct (doc_id, token) pairs — the
    raw-occurrence join made the most frequent token a hot shuffle key at
    scale. Both join inputs must therefore be aggregates: the optimized
    plan's Join subtree contains the doc-side Aggregate and the vocab-side
    Aggregate (3 keyed aggregates total with the final per-doc average)."""
    df = QUERIES["text_perplexity"](spark, sf_dir)
    logical = df._jdf.queryExecution().optimizedPlan().toString()
    join_subtree = logical.split("Join", 1)[1]
    assert join_subtree.count("Aggregate") >= 2, (
        "perplexity join inputs must both be pre-aggregated:\n" + logical
    )


def test_no_accidental_cartesian_or_python(spark, sf_dir):
    """Repo-wide invariant sweep: no batch key may plan a cartesian product
    or drop into Python evaluation unless it is one by design."""
    from canal_clickhouse_spark import QUERIES

    offenders = {}
    for key, fn in sorted(QUERIES.items()):
        if key.startswith(_EAGER_PREFIXES) or key in _EAGER_KEYS:
            continue
        plan = plan_of(fn(spark, sf_dir))
        bad = []
        if key not in _CARTESIAN_OK and (
            "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan
        ):
            bad.append("cartesian")
        if key not in _PYTHON_OK and (
            "BatchEvalPython" in plan or "ArrowEvalPython" in plan
        ):
            bad.append("python")
        if bad:
            offenders[key] = bad
    assert not offenders, f"plan smells: {offenders}"


def test_partition_prune_reaches_reader(spark, sf_dir):
    """scan_partition_prune's event_type predicate must land in
    PartitionFilters (directory pruning), not in the row-level data
    filters — at 100 TB that's the difference between listing one
    partition directory and scanning every file."""
    plan = plan_of(QUERIES["scan_partition_prune"](spark, sf_dir))
    assert "PartitionFilters" in plan
    import re

    pf = re.search(r"PartitionFilters: \[(?P<f>[^\]]*)\]", plan)
    assert pf and "event_type" in pf["f"], plan
    # The partition predicate must NOT degrade to a post-scan Filter on
    # event_type (that would mean full-scan + row filter).
    data_filters = re.search(r"PushedFilters: \[(?P<f>[^\]]*)\]", plan)
    assert data_filters is None or "event_type" not in data_filters["f"]


def test_dict_get_decorrelates_to_broadcast_joins(spark, sf_dir):
    """chsql dictGet spellings become correlated scalar subqueries; Catalyst
    must decorrelate them into joins with the dictionary side BROADCAST —
    the in-RAM-dictionary cost model. A CartesianProduct or a shuffled join
    on a 25-row dict would be the scale failure."""
    plan = plan_of(QUERIES["chsql_dict_get"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_mv_ddl_merge_read_is_partial_agg(spark, sf_dir):
    """The MV merge read (sum over per-block partial states) must itself be
    a partial+final HashAggregate — states merge map-side before the
    exchange, so the shuffle carries |groups|, not |state rows|."""
    plan = plan_of(QUERIES["chsql_mv_ddl"](spark, sf_dir))
    assert plan.count("HashAggregate") >= 2
    assert "partial_sum" in plan or "partial_finalmerge" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_state_merge_is_two_level_hash_agg(spark, sf_dir):
    """-State/-Merge is Spark's partial+final algebra made explicit: both
    levels must be hash aggregates with no Python and no cartesian."""
    plan = plan_of(QUERIES["chsql_state_merge"](spark, sf_dir))
    assert plan.count("HashAggregate") >= 2
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ts_subsequence_single_exchange_topk(spark, sf_dir):
    """Time-series subsequence search: ONE user_id exchange feeds the
    sliding window, the distance folds stay JVM-side, and the global top-5
    short-circuits (TakeOrderedAndProject, never a full sort)."""
    # simple mode: each node printed once, so the Exchange count is exact
    plan = plan_of(QUERIES["ts_subsequence_match"](spark, sf_dir), "simple")
    assert plan.count("Exchange") == 1
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_merge_engine_union_prunes_on_table_filter(spark, sf_dir):
    """ENGINE = Merge's union is a plain multi-branch UNION ALL, so a
    `_table = 'x'` filter must CONSTANT-FOLD the other branches away —
    at 100 TB a Merge over N member tables filtered to one member scans
    one member, like ClickHouse. Predicate pushdown on data columns must
    reach every surviving branch's scan."""
    from canal_clickhouse_spark.chsql_ddl import ChSession

    sess = ChSession(spark, sf_dir)
    sess.execute("CREATE TABLE mp_a (k Int64, v Float64)"
                 " ENGINE = MergeTree ORDER BY k")
    sess.execute("CREATE TABLE mp_b (k Int64, v Float64)"
                 " ENGINE = MergeTree ORDER BY k")
    sess.execute("INSERT INTO mp_a SELECT o_orderkey, o_totalprice"
                 " FROM orders WHERE o_orderkey % 2 = 0")
    sess.execute("INSERT INTO mp_b SELECT o_orderkey, o_totalprice"
                 " FROM orders WHERE o_orderkey % 2 = 1")
    sess.execute("CREATE TABLE mp (k Int64, v Float64)"
                 " ENGINE = Merge(currentDatabase(), '^mp_')")
    pruned = plan_of(
        sess.execute("SELECT sum(v) AS s FROM mp WHERE _table = 'mp_a'")
    )
    # the mp_b branch folds away: exactly one Union input survives, so
    # no Union node remains in the optimized plan
    assert "Union" not in pruned
    both = plan_of(sess.execute("SELECT sum(v) AS s FROM mp WHERE k > 5"))
    assert "Union" in both
    # the data-column predicate is pushed into each surviving branch
    assert both.count("(k#") >= 2 or both.count("k > 5") >= 2 or (
        both.count("GreaterThan") >= 2
    )
