"""Focused pins for the r12 optimization round's internals changes.

Covers the semantics that the memoized fixture-view registration
(catalog.register_views / forget_view), the memoized cdc_changes view
(chsql.ch_sql), and the tfidf single-exchange restructure must preserve.
The output-level correctness of every touched key stays pinned by the
oracle mirror; these tests pin the *mechanisms*.
"""
from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F


def test_register_views_memoized_and_drop_restores(spark, sf_dir):
    """DROP TABLE <fixture> drops the temp view (pre-memo behavior); the
    next register_views must restore it even though the memo was warm."""
    from canal_clickhouse_spark.catalog import register_views
    from canal_clickhouse_spark.chsql_ddl import ChSession

    register_views(spark, sf_dir)
    assert spark.catalog.tableExists("orders")
    memo = spark.__dict__.get("_ccs_view_memo", {})
    assert "orders" in memo  # memo is armed

    ChSession(spark, sf_dir).execute("DROP TABLE orders")
    assert not spark.catalog.tableExists("orders")
    assert "orders" not in memo  # forget_view fired

    register_views(spark, sf_dir)
    assert spark.catalog.tableExists("orders")
    assert spark.sql("SELECT count(*) AS n FROM orders").collect()[0].n > 0


def test_ch_sql_cdc_changes_clobbers_user_table(spark, sf_dir):
    """A session table named cdc_changes is shadowed again by the next
    ch_sql call — the exact pre-memo clobber semantics."""
    from canal_clickhouse_spark.chsql import ch_sql
    from canal_clickhouse_spark.chsql_ddl import ChSession

    n_log = ch_sql(spark, sf_dir, "SELECT count() AS n FROM cdc_changes")
    n_log = n_log.collect()[0].n

    s = ChSession(spark, sf_dir)
    s.execute("CREATE TABLE cdc_changes (x Int64) ENGINE = Memory")
    s.execute("INSERT INTO cdc_changes VALUES (42)")
    assert spark.sql("SELECT count(*) AS n FROM cdc_changes").collect()[0].n == 1

    n_again = ch_sql(
        spark, sf_dir, "SELECT count() AS n FROM cdc_changes"
    ).collect()[0].n
    assert n_again == n_log  # change-log view re-registered over the table


def test_rename_forgets_registered_name(spark, sf_dir):
    """RENAME's dropTempView(old) must also clear the memo entry so a
    later registration of that name is not silently skipped."""
    from canal_clickhouse_spark.catalog import forget_view
    from canal_clickhouse_spark.chsql_ddl import ChSession

    s = ChSession(spark, sf_dir)
    s.execute("CREATE TABLE r12_ren (x Int64) ENGINE = Memory")
    memo = spark.__dict__.setdefault("_ccs_view_memo", {})
    memo["r12_ren"] = "sentinel"  # simulate a stale memo entry
    s.execute("RENAME TABLE r12_ren TO r12_ren2")
    assert "r12_ren" not in memo
    s.execute("DROP TABLE r12_ren2")
    forget_view(spark, "r12_ren2")


def test_tune_memoized_once(spark):
    """tune() applies once per session object and flags itself."""
    from canal_clickhouse_spark.session import tune

    tune(spark)
    assert spark.__dict__.get("_ccs_tuned") is True
    # second call is a no-op fast path (flag short-circuits)
    assert tune(spark) is spark
    # the load-bearing conf is in force either way
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"


def test_tfidf_single_doc_id_exchange(spark, sf_dir):
    """tfidf plan pin: the token explode feeds REPARTITION_BY_COL(doc_id)
    exchanges (runtime-deduplicated by AQE stage reuse) and the top-k
    window introduces NO additional exchange of its own."""
    from canal_clickhouse_spark import QUERIES

    df = QUERIES["tfidf_topterms"](spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert plan.count("REPARTITION_BY_COL") == 2  # the reusable pair
    # exactly one ENSURE_REQUIREMENTS hash exchange (the term/df branch);
    # a doc_id window exchange would make it two
    import re

    ensure = [
        l for l in plan.splitlines()
        if "ENSURE_REQUIREMENTS" in l and "hashpartitioning" in l
    ]
    assert len(ensure) == 1 and "term" in ensure[0]
    assert re.search(r"^\(\d+\) Window$", plan, re.M)  # window still there


def test_minhash_expr_lanes_match_column_form(spark, sf_dir):
    """The expr-string MinHash lanes produce byte-identical signatures to
    the original Column-operator form."""
    import canal_clickhouse_spark.llm.dedup as dd

    docs = dd.doc_dups(spark, sf_dir)
    new = dd.minhash_signatures(docs).orderBy("doc_id").limit(25).collect()

    ex = dd.with_tokens(docs).withColumn(
        "sh", F.explode(dd.shingle_set())
    ).select("doc_id", F.xxhash64("sh").alias("h"))
    lanes = [
        F.min(F.col("h") * F.lit(a) + F.lit(b)).alias(f"m{i}")
        for i, (a, b) in enumerate(zip(dd._MIX_A, dd._MIX_B))
    ]
    old = (
        ex.groupBy("doc_id")
        .agg(*lanes)
        .select(
            "doc_id", F.array(*[f"m{i}" for i in range(dd.N_HASHES)]).alias("sig")
        )
        .orderBy("doc_id")
        .limit(25)
        .collect()
    )
    assert [(r.doc_id, r.sig) for r in new] == [(r.doc_id, r.sig) for r in old]
