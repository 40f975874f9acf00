"""CH statement surface: CREATE TABLE / MATERIALIZED VIEW / INSERT / DROP.

The registry key `chsql_mv_ddl` carries the oracle-checked MV invariant
(merge-of-block-partials == recompute); these tests pin the interpreter's
statement semantics: per-block MV firing, TO-table routing, VALUES inserts
with column lists and CH-type coercion, POPULATE, DROP/TRUNCATE, and the
CH→Spark type mapper.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from canal_clickhouse_spark.chsql_ddl import (
    ChSession,
    ch_type_to_spark,
    split_statements,
)


def test_type_mapper():
    assert ch_type_to_spark("UInt64") == "DECIMAL(20,0)"
    assert ch_type_to_spark("Nullable(String)") == "STRING"
    assert ch_type_to_spark("LowCardinality(Nullable(String))") == "STRING"
    assert ch_type_to_spark("Array(Float32)") == "ARRAY<FLOAT>"
    assert ch_type_to_spark("Decimal(28, 2)") == "DECIMAL(28,2)"
    assert ch_type_to_spark("Decimal64(4)") == "DECIMAL(18,4)"
    assert ch_type_to_spark("DateTime64(3)") == "TIMESTAMP"
    assert ch_type_to_spark("FixedString(16)") == "STRING"
    # r10: mergeable-value AggregateFunction states map to real types
    # (sketch states keep the named guided error)
    assert ch_type_to_spark("AggregateFunction(sum, UInt64)") == \
        "DECIMAL(38,0)"
    with pytest.raises(ValueError, match="sketch state"):
        ch_type_to_spark("AggregateFunction(uniq, UInt64)")
    # r8: geo compound aliases are now mapped (see
    # test_type_map_r8_additions); a truly unknown type still raises
    with pytest.raises(ValueError, match="unsupported"):
        ch_type_to_spark("NoSuchType")


def test_split_statements_literal_aware():
    stmts = split_statements(
        "SELECT 'a;b' AS x; -- trailing comment; with semicolon\n"
        "INSERT INTO t VALUES (1, ';')"
    )
    assert len(stmts) == 2
    assert stmts[0] == "SELECT 'a;b' AS x"
    assert stmts[1].startswith("INSERT INTO t VALUES")


def test_create_insert_values_and_mv_block_firing(spark, sf_dir):
    ch = ChSession(spark, sf_dir)
    ch.execute(
        "CREATE TABLE metrics (k String, v UInt32, w Nullable(Float64)) "
        "ENGINE = MergeTree() ORDER BY k"
    )
    assert dict(ch.tables["metrics"].dtypes) == {
        "k": "string", "v": "bigint", "w": "double",
    }
    # MV created BEFORE any rows: fires per insert block only.
    ch.execute(
        "CREATE MATERIALIZED VIEW mv_k ENGINE = SummingMergeTree() "
        "ORDER BY k AS SELECT k, count() AS n, sum(v) AS sv "
        "FROM metrics GROUP BY k"
    )
    ch.execute("INSERT INTO metrics VALUES ('a', 1, 0.5), ('a', 2, NULL)")
    ch.execute("INSERT INTO metrics (v, k) VALUES (10, 'b')")  # column list
    # base table: 3 rows, coerced types, NULL-filled unlisted column
    rows = {tuple(r) for r in ch.tables["metrics"].collect()}
    assert rows == {("a", 1, 0.5), ("a", 2, None), ("b", 10, None)}
    # MV target holds one partial per block (2 blocks), NOT merged rows.
    parts = sorted(
        tuple(r) for r in ch.tables["mv_k"].collect()
    )
    assert parts == [("a", 2, 3), ("b", 1, 10)]
    # merge read == recompute
    merged = {
        tuple(r)
        for r in ch.execute(
            "SELECT k, toInt64(sum(n)) AS n, toInt64(sum(sv)) AS sv "
            "FROM mv_k GROUP BY k"
        ).collect()
    }
    assert merged == {("a", 2, 3), ("b", 1, 10)}


def test_mv_to_table_routing(spark, sf_dir):
    ch = ChSession(spark, sf_dir)
    ch.execute("CREATE TABLE src (x Int64) ENGINE = MergeTree() ORDER BY x")
    ch.execute(
        "CREATE TABLE agg_target (n Int64, sx Int64) ENGINE = "
        "SummingMergeTree() ORDER BY n"
    )
    ch.execute(
        "CREATE MATERIALIZED VIEW mv_route TO agg_target AS "
        "SELECT count() AS n, sum(x) AS sx FROM src"
    )
    ch.execute("INSERT INTO src VALUES (1), (2)")
    ch.execute("INSERT INTO src VALUES (10)")
    assert sorted(tuple(r) for r in ch.tables["agg_target"].collect()) == [
        (1, 10), (2, 3),
    ]
    # the MV NAME is not itself a table when TO routes elsewhere
    assert "mv_route" not in ch.tables
    # POPULATE with TO is invalid, as in CH
    with pytest.raises(ValueError, match="POPULATE"):
        ch.execute(
            "CREATE MATERIALIZED VIEW bad TO agg_target POPULATE AS "
            "SELECT count() AS n, sum(x) AS sx FROM src"
        )


def test_populate_then_insert_equals_recompute(spark, sf_dir):
    """The invariant the oracle key checks at fixture scale, in miniature."""
    ch = ChSession(spark, sf_dir)
    ch.execute("CREATE TABLE t (g String, v Int64) ENGINE = MergeTree() ORDER BY g")
    ch.execute("INSERT INTO t VALUES ('a', 1), ('b', 2)")
    ch.execute(
        "CREATE MATERIALIZED VIEW mv POPULATE AS "
        "SELECT g, sum(v) AS sv FROM t GROUP BY g"
    )
    ch.execute("INSERT INTO t VALUES ('a', 10)")
    merged = {
        tuple(r)
        for r in ch.execute(
            "SELECT g, toInt64(sum(sv)) AS sv FROM mv GROUP BY g"
        ).collect()
    }
    assert merged == {("a", 11), ("b", 2)}


def test_insert_select_from_fixture_and_drop(spark, sf_dir):
    ch = ChSession(spark, sf_dir)
    ch.execute(
        "CREATE TABLE top_orders ENGINE = MergeTree() ORDER BY o_orderkey AS "
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 300000"
    )
    n0 = ch.tables["top_orders"].count()
    assert n0 > 0
    ch.execute(
        "INSERT INTO top_orders SELECT o_orderkey, o_totalprice "
        "FROM orders WHERE o_totalprice <= 300000 LIMIT 5"
    )
    assert ch.tables["top_orders"].count() == n0 + 5
    ch.execute("TRUNCATE TABLE top_orders")
    assert ch.tables["top_orders"].count() == 0
    ch.execute("DROP TABLE top_orders")
    assert "top_orders" not in ch.tables
    with pytest.raises(ValueError, match="unknown table"):
        ch.execute("INSERT INTO top_orders SELECT 1")


def test_guards(spark, sf_dir):
    ch = ChSession(spark, sf_dir)
    with pytest.raises(ValueError, match="shadows a fixture"):
        ch.execute("CREATE TABLE orders (x Int64) ENGINE = MergeTree() ORDER BY x")
    with pytest.raises(ValueError, match="unknown table"):
        ch.execute("OPTIMIZE TABLE t FINAL")
    with pytest.raises(ValueError, match="unknown table"):
        ch.execute("EXCHANGE TABLES a AND b")
    # r7: GRANT now raises the guided ACL error instead of the generic
    # unsupported-statement fallthrough
    with pytest.raises(ValueError, match="ACL"):
        ch.execute("GRANT SELECT ON t TO someone")
    with pytest.raises(ValueError, match="unsupported statement"):
        ch.execute("ATTACH DICTIONARY whatever")


def test_alter_update_delete_and_optimize_replacing(spark, sf_dir):
    ch = ChSession(spark, sf_dir)
    ch.execute(
        "CREATE TABLE acct (k Int64, v Int64, status String) "
        "ENGINE = ReplacingMergeTree(v) ORDER BY k"
    )
    ch.execute(
        "INSERT INTO acct VALUES (1, 1, 'new'), (2, 1, 'new'), (1, 2, 'upd')"
    )
    ch.execute("ALTER TABLE acct UPDATE status = 'flagged' WHERE k = 2")
    ch.execute("ALTER TABLE acct DELETE WHERE k = 3")  # no-op predicate
    ch.execute("OPTIMIZE TABLE acct")  # bare form: no visible effect
    assert ch.tables["acct"].count() == 3
    ch.execute("OPTIMIZE TABLE acct FINAL")
    rows = sorted(tuple(r) for r in ch.tables["acct"].collect())
    assert rows == [(1, 2, "upd"), (2, 1, "flagged")]


def test_optimize_summing_merges_partials(spark, sf_dir):
    ch = ChSession(spark, sf_dir)
    ch.execute(
        "CREATE TABLE sums (k String, n Int64, tag String) "
        "ENGINE = SummingMergeTree() ORDER BY k"
    )
    ch.execute("INSERT INTO sums VALUES ('a', 1, 'x'), ('a', 2, 'y'), ('b', 5, 'z')")
    ch.execute("OPTIMIZE TABLE sums FINAL")
    rows = sorted(tuple(r) for r in ch.tables["sums"].collect())
    # numerics sum; non-key strings take min (deterministic; CH keeps any)
    assert rows == [("a", 3, "x"), ("b", 5, "z")]


def test_optimize_replacing_requires_version(spark, sf_dir):
    """r11: version-less ReplacingMergeTree OPTIMIZE FINAL now runs by
    INSERT order (implicit generation counter); the guided error moved to
    where order is genuinely unrecoverable — after a mutation rewrote the
    table (see test_r11_versionless_replacing_final)."""
    ch = ChSession(spark, sf_dir)
    ch.execute(
        "CREATE TABLE nv (k Int64, v Int64) "
        "ENGINE = ReplacingMergeTree() ORDER BY k"
    )
    ch.execute("INSERT INTO nv VALUES (1, 1)")
    ch.execute("INSERT INTO nv VALUES (1, 7)")
    ch.execute("OPTIMIZE TABLE nv FINAL")
    assert [(r.k, r.v) for r in ch.execute(
        "SELECT k, v FROM nv").collect()] == [(1, 7)]
    ch.execute("ALTER TABLE nv UPDATE v = 8 WHERE k = 1")
    ch.execute("INSERT INTO nv VALUES (1, 9)")
    with pytest.raises(ValueError, match="INSERT order"):
        ch.execute("OPTIMIZE TABLE nv FINAL")


def test_create_view_is_live(spark, sf_dir):
    """A CREATE VIEW re-materializes per read, so it sees later INSERTs —
    unlike a DataFrame temp view, which snapshots the plan."""
    ch = ChSession(spark, sf_dir)
    ch.execute("CREATE TABLE base (x Int64) ENGINE = MergeTree() ORDER BY x")
    ch.execute("INSERT INTO base VALUES (1)")
    ch.execute("CREATE VIEW doubled AS SELECT x * 2 AS y FROM base")
    assert [r.y for r in ch.execute("SELECT y FROM doubled").collect()] == [2]
    ch.execute("INSERT INTO base VALUES (10)")
    assert sorted(
        r.y for r in ch.execute("SELECT y FROM doubled ORDER BY y").collect()
    ) == [2, 20]
    ch.execute("DROP VIEW doubled")  # DROP handles views via the same path
    assert "doubled" not in ch.views  # and removes the stored SQL
    # mutation predicates go through the CH translator too
    ch.execute("ALTER TABLE base UPDATE x = toInt64(x + 100) WHERE modulo(x, 2) = 0")
    assert sorted(r.x for r in ch.tables["base"].collect()) == [1, 110]


def test_streaming_mv_composition(spark, sf_dir, tmp_path):
    """The MV trigger contract composes with Structured Streaming 1:1 —
    each micro-batch is an insert block, so foreachBatch(insert) maintains
    the MV incrementally while the stream runs. Merged read after the
    stream drains == full recompute over everything streamed (the
    mv_refresh invariant, now end-to-end through the DDL surface)."""
    from decimal import Decimal

    from canal_clickhouse_spark.catalog import table as fixture_table

    src_dir = str(tmp_path / "ev_parts")
    ev = fixture_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    ev.repartition(4).write.parquet(src_dir)

    ch = ChSession(spark, sf_dir)
    ch.execute(
        "CREATE TABLE ev_sync (event_id Int64, event_type String, "
        "value Float64) ENGINE = MergeTree() ORDER BY event_id"
    )
    ch.execute(
        "CREATE MATERIALIZED VIEW mv_type ENGINE = SummingMergeTree() "
        "ORDER BY event_type AS "
        "SELECT event_type, count() AS n, "
        "sum(toDecimal64(value, 2)) AS sv FROM ev_sync GROUP BY event_type"
    )

    n_batches = []
    stage_root = str(tmp_path / "stage")

    def feed(bdf, batch_id):
        # A micro-batch DataFrame is only valid inside its batch; the
        # interpreter's lazy union would re-evaluate it later. Stage the
        # block to parquet and insert the re-read — exactly the stage+insert
        # protocol a real ClickHouse sink uses (sinks/writers.py), and
        # idempotent under batch replay (overwrite by batch_id).
        p = f"{stage_root}/b{batch_id}"
        bdf.write.mode("overwrite").parquet(p)
        n_batches.append(batch_id)
        ch._insert("ev_sync", spark.read.parquet(p), None)

    schema = spark.read.parquet(src_dir).schema
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
        .writeStream.foreachBatch(feed)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assert len(n_batches) >= 2, "need multiple micro-batches to test merging"
    # MV holds one partial row per (batch, type) — strictly more rows than
    # types proves per-block firing rather than a terminal recompute.
    n_types = ev.select("event_type").distinct().count()
    assert ch.tables["mv_type"].count() > n_types

    merged = {
        (r.event_type, r.n, r.sv)
        for r in ch.execute(
            "SELECT event_type, toInt64(sum(n)) AS n, sum(sv) AS sv "
            "FROM mv_type GROUP BY event_type"
        ).collect()
    }
    expect = {
        (r.event_type, r.n, r.sv)
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sv"),
        )
        .collect()
    }
    assert merged == expect


def test_insert_format_jsoneachrow_and_csv(spark, sf_dir):
    """The canal→ClickHouse adapter posts INSERT … FORMAT JSONEachRow —
    lines parse against the TARGET column types (field order free, missing
    fields NULL), fire MVs like any block, and the CSV form parses
    positionally."""
    ch = ChSession(spark, sf_dir)
    ch.execute(
        "CREATE TABLE feed (k Int64, name String, v Float64) "
        "ENGINE = MergeTree() ORDER BY k"
    )
    ch.execute(
        "CREATE MATERIALIZED VIEW mv_feed ENGINE = SummingMergeTree() "
        "ORDER BY name AS SELECT name, count() AS n FROM feed GROUP BY name"
    )
    ch.execute(
        'INSERT INTO feed FORMAT JSONEachRow\n'
        '{"k": 1, "name": "a", "v": 1.5}\n'
        '{"v": 2.5, "k": 2, "name": "b"}\n'
        '{"k": 3, "name": "a"}\n'
    )
    ch.execute("INSERT INTO feed (k, name) FORMAT CSV\n4,b\n")
    rows = sorted(tuple(r) for r in ch.tables["feed"].collect())
    assert rows == [
        (1, "a", 1.5), (2, "b", 2.5), (3, "a", None), (4, "b", None),
    ]
    merged = {
        tuple(r)
        for r in ch.execute(
            "SELECT name, toInt64(sum(n)) AS n FROM mv_feed GROUP BY name"
        ).collect()
    }
    assert merged == {("a", 2), ("b", 2)}


def test_r8_advice_fixes(spark, sf_dir):
    """r8 ADVICE defects, each previously silent-wrong:

    1. parse_col_def treated '_' as a word boundary, so identifiers
       containing _default/_ttl/... INSIDE a DEFAULT expression split as a
       new decoration (`DEFAULT base_default + 1` parsed as `+ 1`).
    2. spark_type_to_ch split struct/map bodies with a paren-only splitter,
       so any nested container whose inner type contains a comma failed to
       inverse-map — one such column broke system.columns for ALL tables.
    3. INSERT ... FORMAT CSVWithNames/TSVWithNames parsed positionally
       against the declared column list; CH maps fields by header NAME
       (input_format_with_names_use_header=1), so a reordered dump landed
       values in the wrong columns.
    4. _apply_ttl anchored expiry to the first schema column mentioned
       anywhere in the TTL text — a non-time column (grace-period int)
       could win over the actual time column.
    """
    from canal_clickhouse_spark.chsql_ddl import parse_col_def, spark_type_to_ch

    # 1 — identifier with an embedded decoration keyword in the DEFAULT
    name, t, dflt, ch_t, _eph = parse_col_def("x Int64 DEFAULT base_default + 1")
    assert (name, dflt, ch_t) == ("x", "base_default + 1", "Int64")
    name, t, dflt, _, _eph = parse_col_def("x Int64 DEFAULT session_ttl * 2")
    assert dflt == "session_ttl * 2"
    # ...while real decorations after an identifier still split
    name, t, dflt, _, _eph = parse_col_def("x Int64 DEFAULT y + 1 COMMENT 'c'")
    assert dflt == "y + 1"

    # 2 — nested containers with commas inverse-map
    assert spark_type_to_ch("struct<a: int, b: struct<c: int, d: int>>") == \
        "Tuple(a Int32, b Tuple(c Int32, d Int32))"
    assert spark_type_to_ch("map<string, map<string, int>>") == \
        "Map(String, Map(String, Int32))"
    assert spark_type_to_ch("array<struct<k: string, v: int>>") == \
        "Array(Tuple(k String, v Int32))"
    # ...and a table holding one keeps system.columns/SHOW CREATE alive
    ch = ChSession(spark, sf_dir)
    ch.execute(
        "CREATE TABLE nested_t (id Int64,"
        " pair Tuple(a Int32, b Tuple(c Int32, d Int32)))"
        " ENGINE = MergeTree ORDER BY id"
    )
    cols = ch.execute(
        "SELECT name, type FROM system.columns WHERE table = 'nested_t'"
    ).collect()
    assert {r.name: r.type for r in cols}["pair"] == \
        "Tuple(a Int32, b Tuple(c Int32, d Int32))"
    ddl = ch.execute("SHOW CREATE TABLE nested_t").collect()[0][0]
    assert "Tuple(c Int32, d Int32)" in ddl

    # 3 — WithNames maps by header NAME, not position
    ch.execute(
        "CREATE TABLE wn (k Int64, name String, v Float64)"
        " ENGINE = MergeTree ORDER BY k"
    )
    ch.execute(
        "INSERT INTO wn FORMAT CSVWithNames\n"
        "v,k,name\n"          # header order differs from table order
        "1.5,1,a\n2.5,2,b\n"
    )
    rows = sorted(tuple(r) for r in ch.tables["wn"].collect())
    assert rows == [(1, "a", 1.5), (2, "b", 2.5)]
    ch.execute(
        "INSERT INTO wn (name, k) FORMAT TSVWithNames\n"
        "k\tname\n3\tc\n"     # header reorders the declared column list
    )
    assert sorted(tuple(r) for r in ch.tables["wn"].collect())[-1] == \
        (3, "c", None)
    # mismatched header names refuse loudly
    with pytest.raises(ValueError, match="header"):
        ch.execute("INSERT INTO wn FORMAT CSVWithNames\nk,nope,v\n1,x,2\n")

    # 4 — TTL anchors to the time-typed referenced column, not schema order
    ch.execute(
        "CREATE TABLE ttl_anchor (grace Int64, ts DateTime, v String)"
        " ENGINE = MergeTree ORDER BY ts"
        " TTL ts + toIntervalDay(grace)"
    )
    ch.execute(
        "INSERT INTO ttl_anchor VALUES"
        " (5, '2024-01-01 00:00:00', 'old'),"
        " (30, '2024-01-20 00:00:00', 'new')"
    )
    ch.execute("OPTIMIZE TABLE ttl_anchor FINAL")
    # now = max(ts) = Jan 20: row 1 expires Jan 6 (gone); row 2 Feb 19
    rows = ch.execute("SELECT v FROM ttl_anchor").collect()
    assert [r.v for r in rows] == ["new"]
    # multiple time-typed candidates refuse as ambiguous
    ch.execute(
        "CREATE TABLE ttl_amb (t1 DateTime, t2 DateTime, v Int32)"
        " ENGINE = MergeTree ORDER BY t1 TTL t1 + (t2 - t2)"
    )
    ch.execute("INSERT INTO ttl_amb VALUES ('2024-01-01 00:00:00',"
               " '2024-01-02 00:00:00', 1)")
    with pytest.raises(ValueError, match="ambiguous"):
        ch.execute("OPTIMIZE TABLE ttl_amb FINAL")


def test_select_final_on_session_replacing_table(spark, sf_dir):
    """Read-time FINAL over a session ReplacingMergeTree table — the
    query-side twin of OPTIMIZE FINAL, without mutating the table."""
    ch = ChSession(spark, sf_dir)
    ch.execute(
        "CREATE TABLE kv (k Int64, ver Int64, val String) "
        "ENGINE = ReplacingMergeTree(ver) ORDER BY k"
    )
    ch.execute(
        "INSERT INTO kv VALUES (1, 1, 'old'), (1, 2, 'new'), (2, 1, 'only')"
    )
    got = sorted(
        tuple(r)
        for r in ch.execute("SELECT k, val FROM kv FINAL ORDER BY k").collect()
    )
    assert got == [(1, "new"), (2, "only")]
    # the table itself is untouched (3 physical rows)
    assert ch.tables["kv"].count() == 3
    # FINAL composes with aggregation downstream
    n = ch.execute("SELECT count() AS n FROM kv FINAL").collect()[0].n
    assert n == 2
    # non-Replacing engine refuses FINAL loudly
    ch.execute("CREATE TABLE plain (x Int64) ENGINE = MergeTree() ORDER BY x")
    ch.execute("INSERT INTO plain VALUES (1)")
    with pytest.raises(ValueError, match="read-time collapse"):
        ch.execute("SELECT * FROM plain FINAL")


# ---------------------------------------------------------------------------
# Model-based fuzz: random statement sequences vs a pure-Python reference
# model of the interpreter's spec (insert/update/delete/optimize/truncate on
# a versioned Replacing table). Catches statement-interaction bugs no
# hand-written case covers.
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_OPS = st.lists(
    st.one_of(
        st.tuples(
            st.just("insert"),
            st.lists(
                st.tuples(
                    st.integers(0, 9),       # k
                    st.integers(1, 5),       # ver
                    st.sampled_from("abcd"),  # s
                ),
                min_size=1, max_size=4,
            ),
        ),
        st.tuples(st.just("update"), st.integers(0, 3), st.sampled_from("xyz")),
        st.tuples(st.just("delete"), st.integers(0, 3)),
        st.tuples(st.just("optimize")),
        st.tuples(st.just("truncate")),
        # r6: schema evolution interleaved with DML (verdict task 3) — the
        # model invariant is `extra == k * 2` whenever the column exists,
        # for backfilled AND later-inserted rows alike.
        st.tuples(st.just("addcol")),
        st.tuples(st.just("dropcol")),
        st.tuples(st.just("modifycol")),
        # r6: blue-green swap primitives (verdict task 5) — both swap the
        # model's two table states; `bluegreen` does it via chained RENAMEs,
        # `exchange` via the atomic statement.
        st.tuples(st.just("exchange")),
        st.tuples(st.just("bluegreen")),
        # r6: retention age-out interleaved with everything else — both
        # fuzz tables are PARTITION BY modulo(k, 2), so DROP PARTITION r
        # removes the k%2==r rows; missing partition = no-op; partition
        # metadata must survive EXCHANGE/RENAME swaps.
        st.tuples(st.just("droppart"), st.integers(0, 2)),
        # r7: OPTIMIZE DEDUPLICATE removes fully identical rows — model
        # dedupes the tuple multiset; DETACH/ATTACH PARTITION must round
        # trip losslessly (model unchanged), including on the missing
        # partition value 2 (DETACH of nothing + failed ATTACH tolerated).
        st.tuples(st.just("dedup")),
        st.tuples(st.just("detachattach"), st.integers(0, 2)),
        # r9: schema-clone with storage trailers (verdict missing #1) —
        # model-neutral; asserts the trailer lands in meta and the clone
        # starts empty. And parameterized LIMIT (verdict defect 1) — the
        # placeholder in LIMIT position must splice an INT operand; the
        # result prefix-matches the model's sorted rows.
        st.tuples(st.just("clonetrailer"), st.sampled_from(["k", "ver"])),
        st.tuples(st.just("limitparam"), st.integers(0, 4)),
        # r10: lightweight DELETE (CH 22.8+ spelling, routed to the
        # mutation machinery — carries ON CLUSTER to exercise the strip),
        # partition-scoped OPTIMIZE FINAL (other partitions untouched),
        # and TEMPORARY-table staging (model-neutral lifecycle).
        st.tuples(st.just("deletefrom"), st.integers(0, 3)),
        st.tuples(st.just("optimizepart"), st.integers(0, 2)),
        st.tuples(st.just("tempstage"), st.integers(1, 5)),
        # r10 continuation: database labels (default-qualified spellings
        # strip; created-db members scope to DROP DATABASE), CREATE-body
        # CHECK constraints (violating INSERT rejected whole), and INTO
        # OUTFILE Parquet round-trip (file row count == model count).
        st.tuples(st.just("dbqual"), st.integers(0, 3)),
        st.tuples(st.just("constraintstage"), st.integers(1, 5)),
        st.tuples(st.just("outfile")),
        # r11: the storage trailer is a clause LOOP — CH's ParserStorage
        # accepts ANY clause order (r10 verdict "weak": `ORDER BY k
        # PARTITION BY p` silently mis-parsed under the fixed-order
        # regex, surviving ten rounds because the fuzz generated
        # canonical order only). Every permutation must record meta
        # identical to the canonical spelling.
        st.tuples(
            st.just("trailerperm"),
            st.permutations([
                "ENGINE = MergeTree",
                "PARTITION BY modulo(k, 2)",
                "ORDER BY k",
                "PRIMARY KEY k",
                "SETTINGS index_granularity = 8192",
                "COMMENT 'fz perm'",
            ]),
        ),
        # r11: CREATE FUNCTION lifecycle (SQL lambda UDFs) and the
        # version-less Replacing FINAL path, with dollar-quoted strings
        # in the insert payload (both r10 verdict tasks).
        st.tuples(st.just("createfunction"), st.integers(1, 5)),
        st.tuples(st.just("versionless"), st.integers(1, 4)),
        # r11 continuation: MATERIALIZED/ALIAS readonly contract —
        # positional INSERT covers only insertable columns, SELECT *
        # excludes the computed ones, SHOW CREATE round-trips the
        # decoration into a second table with identical behavior.
        st.tuples(st.just("matalias"), st.integers(1, 4)),
        # r12: ENGINE = Merge live union view — members created BEFORE
        # and AFTER the Merge table both read; _table filters to one
        # member; INSERT refuses; engine whitelist refuses a consumer
        # engine mid-sequence.
        st.tuples(st.just("mergeview"), st.integers(1, 4)),
        # r12 batches 5/11: CREATE OR REPLACE VIEW swaps atomically over
        # live model state (an invalid replacement keeps the old view;
        # plain CREATE over an existing view errors), and the tuple()
        # cross-table partition ops address unpartitioned tables as one
        # all-rows partition (ATTACH copies, MOVE empties the source).
        st.tuples(st.just("orreplaceview"), st.integers(0, 5)),
        st.tuples(st.just("tuplepartition"), st.integers(1, 4)),
    ),
    min_size=1, max_size=6,
)


@pytest.mark.parametrize("mode", ["memory", "parts"])
@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_OPS)
def test_ddl_statements_match_reference_model(spark, sf_dir, mode, ops):
    # r5 verdict task 8: identical statement semantics in the in-memory
    # lineage model AND the durable parquet-parts model, on the same
    # hypothesis sequences.
    import shutil
    import tempfile

    parts = (
        tempfile.mkdtemp(prefix="ccs_fuzz_parts_") if mode == "parts" else None
    )
    try:
        _run_ddl_model(spark, sf_dir, ops, parts)
    finally:
        if parts:
            shutil.rmtree(parts, ignore_errors=True)


def _run_ddl_model(spark, sf_dir, ops, parts_dir):
    ch = ChSession(spark, sf_dir, parts_dir=parts_dir)
    ch.execute(
        "CREATE TABLE fz (k Int64, ver Int64, s String) "
        "ENGINE = ReplacingMergeTree(ver) PARTITION BY modulo(k, 2)"
        " ORDER BY k"
    )
    ch.execute(
        "CREATE TABLE fz2 (k Int64, ver Int64, s String) "
        "ENGINE = ReplacingMergeTree(ver) PARTITION BY modulo(k, 2)"
        " ORDER BY k"
    )
    model: list[tuple[int, int, str]] = []
    model2: list[tuple[int, int, str]] = []
    has_extra = False
    has_extra2 = False
    for op in ops:
        if op[0] == "insert":
            rows = op[1]
            vals = ", ".join(f"({k}, {v}, '{s}')" for k, v, s in rows)
            # explicit column list: after an ADD COLUMN the omitted `extra`
            # must fill from its DEFAULT (k * 2), like a CH client that
            # predates the migration
            ch.execute(f"INSERT INTO fz (k, ver, s) VALUES {vals}")
            model.extend(rows)
        elif op[0] == "update":
            _, r, tag = op
            ch.execute(f"ALTER TABLE fz UPDATE s = '{tag}' WHERE k % 4 = {r}")
            model = [
                (k, v, tag if k % 4 == r else s) for k, v, s in model
            ]
        elif op[0] == "delete":
            _, r = op
            ch.execute(f"ALTER TABLE fz DELETE WHERE k % 4 = {r}")
            model = [(k, v, s) for k, v, s in model if k % 4 != r]
        elif op[0] == "optimize":
            ch.execute("OPTIMIZE TABLE fz FINAL")
            # keep max-version per key; interpreter's ROW_NUMBER tiebreak on
            # equal versions keeps ONE arbitrary row — mirror by keeping the
            # set of max-version candidates and comparing k/ver only then.
            best: dict[int, tuple[int, int, str]] = {}
            for k, v, s in model:
                if k not in best or v > best[k][1]:
                    best[k] = (k, v, s)
            model = sorted(best.values())
        elif op[0] == "truncate":
            ch.execute("TRUNCATE TABLE fz")
            model = []
        elif op[0] == "addcol":
            ch.execute(
                "ALTER TABLE fz ADD COLUMN IF NOT EXISTS extra Int64"
                " DEFAULT k * 2"
            )
            has_extra = True
        elif op[0] == "dropcol":
            ch.execute("ALTER TABLE fz DROP COLUMN IF EXISTS extra")
            has_extra = False
        elif op[0] == "modifycol" and has_extra:
            ch.execute("ALTER TABLE fz MODIFY COLUMN extra Int32")
        elif op[0] == "exchange":
            ch.execute("EXCHANGE TABLES fz AND fz2")
            model, model2 = model2, model
            has_extra, has_extra2 = has_extra2, has_extra
        elif op[0] == "droppart":
            _, r = op
            ch.execute(f"ALTER TABLE fz DROP PARTITION {r}")
            model = [(k, v, s_) for k, v, s_ in model if k % 2 != r]
        elif op[0] == "dedup":
            ch.execute("OPTIMIZE TABLE fz DEDUPLICATE")
            model = sorted(set(model))
        elif op[0] == "detachattach":
            _, r = op
            ch.execute(f"ALTER TABLE fz DETACH PARTITION {r}")
            try:
                ch.execute(f"ALTER TABLE fz ATTACH PARTITION {r}")
            except ValueError:
                # nothing was detached (empty partition value) — the
                # detached store never registered the key
                assert not any(k % 2 == r for k, _, _ in model)
        elif op[0] == "deletefrom":
            _, r = op
            ch.execute(f"DELETE FROM fz ON CLUSTER main WHERE k % 4 = {r}")
            model = [(k, v, s) for k, v, s in model if k % 4 != r]
        elif op[0] == "optimizepart":
            _, r = op
            ch.execute(f"OPTIMIZE TABLE fz PARTITION {r} FINAL")
            best: dict[int, tuple[int, int, str]] = {}
            for k, v, s_ in model:
                if k % 2 == r and (k not in best or v > best[k][1]):
                    best[k] = (k, v, s_)
            model = [
                (k, v, s_) for k, v, s_ in model if k % 2 != r
            ] + sorted(best.values())
        elif op[0] == "tempstage":
            _, n = op
            ch.execute("CREATE TEMPORARY TABLE fzt (x Int64)")
            ch.execute(f"INSERT INTO fzt VALUES ({n})")
            c = ch.execute("SELECT count() AS c FROM fzt").collect()[0].c
            assert c == 1
            ch.execute("DROP TABLE fzt")
        elif op[0] == "dbqual":
            _, r = op
            ch.execute(f"INSERT INTO default.fz (k, ver, s)"
                       f" VALUES ({100 + r}, 1, 'db')")
            model.append((100 + r, 1, "db"))
            ch.execute("CREATE DATABASE IF NOT EXISTS fuzzdb")
            ch.execute("CREATE TABLE IF NOT EXISTS fuzzdb.fm (x Int64)"
                       " ENGINE = Memory")
            ch.execute(f"INSERT INTO fuzzdb.fm VALUES ({r})")
            assert ch.execute(
                "SELECT count() AS c FROM fuzzdb.fm").collect()[0].c >= 1
            ch.execute("DROP DATABASE fuzzdb")
        elif op[0] == "constraintstage":
            _, n = op
            ch.execute("CREATE TEMPORARY TABLE fcs (x Int64,"
                       " CONSTRAINT pos CHECK x > 0)")
            ch.execute(f"INSERT INTO fcs VALUES ({n})")
            try:
                ch.execute(f"INSERT INTO fcs VALUES ({-n})")
                raise AssertionError("CHECK constraint must reject")
            except ValueError:
                pass
            assert ch.execute(
                "SELECT count() AS c FROM fcs").collect()[0].c == 1
            ch.execute("DROP TABLE fcs")
        elif op[0] == "outfile":
            import os
            import tempfile

            import pyarrow.parquet as pq

            fd, pth = tempfile.mkstemp(suffix=".parquet")
            os.close(fd)
            os.remove(pth)
            try:
                ch.execute(f"SELECT k, ver, s FROM fz INTO OUTFILE"
                           f" '{pth}' FORMAT Parquet")
                assert pq.read_table(pth).num_rows == len(model)
            finally:
                if os.path.exists(pth):
                    os.remove(pth)
        elif op[0] == "trailerperm":
            _, clauses = op
            ch.execute("DROP TABLE IF EXISTS fzperm")
            ch.execute(
                "CREATE TABLE fzperm (k Int64, v Int64) "
                + " ".join(clauses)
            )
            pm = ch.meta["fzperm"]
            assert pm["engine"] == "MergeTree"
            assert pm["order_by"] == ["k"]
            assert pm["partition_by_ch"] == "modulo(k, 2)"
            ch.execute("INSERT INTO fzperm VALUES (1, 1), (2, 2)")
            ch.execute("OPTIMIZE TABLE fzperm PARTITION 0 FINAL")
            ch.execute("DROP TABLE fzperm")
        elif op[0] == "createfunction":
            _, fn_n = op
            from canal_clickhouse_spark.chsql import _CH_UDFS

            _CH_UDFS.pop("fz_fn", None)
            ch.execute(
                f"CREATE OR REPLACE FUNCTION fz_fn AS (x) -> x * {fn_n} + 1"
            )
            assert ch.execute(
                "SELECT fz_fn(2) AS r").collect()[0].r == 2 * fn_n + 1
            ch.execute("DROP FUNCTION fz_fn")
        elif op[0] == "versionless":
            _, vn = op
            ch.execute("DROP TABLE IF EXISTS fzvl")
            ch.execute("CREATE TABLE fzvl (k Int64, s String) "
                       "ENGINE = ReplacingMergeTree ORDER BY k")
            for i in range(vn):
                ch.execute(f"INSERT INTO fzvl VALUES (1, 'g{i}'),"
                           f" ({i + 2}, $$d;{i}$$)")
            rows = {(r.k, r.s) for r in ch.execute(
                "SELECT * FROM fzvl FINAL").collect()}
            assert (1, f"g{vn - 1}") in rows and len(rows) == vn + 1
            assert (2, "d;0") in rows
            # r11 batch 27/28: the insert-order shadow FOLLOWS renames
            # and survives a truncate-reseed round trip
            ch.execute("RENAME TABLE fzvl TO fzvl_x")
            rows2 = {(r.k, r.s) for r in ch.execute(
                "SELECT * FROM fzvl_x FINAL").collect()}
            assert rows2 == rows
            ch.execute("TRUNCATE TABLE fzvl_x")
            ch.execute("INSERT INTO fzvl_x VALUES (1, 'post')")
            assert [(r.k, r.s) for r in ch.execute(
                "SELECT * FROM fzvl_x FINAL").collect()] == [(1, "post")]
            ch.execute("DROP TABLE fzvl_x")
        elif op[0] == "matalias":
            _, vn = op
            ch.execute("DROP TABLE IF EXISTS fzm")
            ch.execute("DROP TABLE IF EXISTS fzm2")
            ch.execute("CREATE TABLE fzm (k Int64,"
                       " m Int64 MATERIALIZED k * 3,"
                       " al Int64 ALIAS k + 7) ENGINE = Memory")
            ch.execute("INSERT INTO fzm VALUES "
                       + ", ".join(f"({i})" for i in range(vn)))
            star = ch.execute("SELECT * FROM fzm ORDER BY k")
            assert star.columns == ["k"]
            assert [r.k for r in star.collect()] == list(range(vn))
            got = [(r.k, r.m, r.al) for r in ch.execute(
                "SELECT k, toInt64(m) AS m, toInt64(al) AS al FROM fzm"
                " ORDER BY k").collect()]
            assert got == [(i, i * 3, i + 7) for i in range(vn)]
            dump = ch.execute("SHOW CREATE TABLE fzm").collect()[0][0]
            assert "MATERIALIZED" in dump and "ALIAS" in dump
            ch.execute(dump.replace("fzm", "fzm2"))
            ch.execute(f"INSERT INTO fzm2 SELECT k + 100 FROM fzm")
            assert ch.execute("SELECT * FROM fzm2").columns == ["k"]
            assert [tuple(r) for r in ch.execute(
                "SELECT toInt64(max(m)) AS m FROM fzm2").collect()] == [
                ((vn - 1 + 100) * 3,)]
            ch.execute("DROP TABLE fzm")
            ch.execute("DROP TABLE fzm2")
        elif op[0] == "mergeview":
            _, vn = op
            for t in ("fzu_a", "fzu_b", "fzu_c", "fzu"):
                ch.execute(f"DROP TABLE IF EXISTS {t}")
            ch.execute("CREATE TABLE fzu_a (k Int64)"
                       " ENGINE = MergeTree ORDER BY k")
            ch.execute("INSERT INTO fzu_a VALUES "
                       + ", ".join(f"({i})" for i in range(vn)))
            ch.execute("CREATE TABLE fzu (k Int64)"
                       " ENGINE = Merge(currentDatabase(), '^fzu_')")
            # liveness: a member created AFTER the Merge table reads too
            ch.execute("CREATE TABLE fzu_b (k Int64)"
                       " ENGINE = MergeTree ORDER BY k")
            ch.execute("INSERT INTO fzu_b VALUES "
                       + ", ".join(f"({i + 100})" for i in range(vn)))
            got_u = sorted(
                r.k for r in ch.execute("SELECT k FROM fzu").collect()
            )
            assert got_u == sorted(
                list(range(vn)) + [i + 100 for i in range(vn)]
            )
            assert [tuple(r) for r in ch.execute(
                "SELECT count() AS c FROM fzu WHERE _table = 'fzu_b'"
            ).collect()] == [(vn,)]
            assert ch.execute("SELECT * FROM fzu").columns == ["k"]
            with pytest.raises(ValueError, match="read-only"):
                ch.execute("INSERT INTO fzu VALUES (1)")
            with pytest.raises(ValueError, match="source_kafka"):
                ch.execute("CREATE TABLE fzu_c (k Int64) ENGINE ="
                           " Kafka('b:9092', 't', 'g', 'JSONEachRow')")
            for t in ("fzu", "fzu_a", "fzu_b"):
                ch.execute(f"DROP TABLE {t}")
        elif op[0] == "orreplaceview":
            _, vn = op
            ch.execute("CREATE OR REPLACE VIEW fzv_r AS"
                       f" SELECT k FROM fz WHERE k < {vn}")
            ch.execute("CREATE OR REPLACE VIEW fzv_r AS"
                       f" SELECT k FROM fz WHERE k >= {vn}")
            got_v = sorted(
                r.k for r in ch.execute("SELECT k FROM fzv_r").collect()
            )
            assert got_v == sorted(k for k, _v, _s in model if k >= vn)
            with pytest.raises(ValueError, match="already exists"):
                ch.execute("CREATE VIEW fzv_r AS SELECT 1 AS x")
            with pytest.raises(Exception):
                ch.execute("CREATE OR REPLACE VIEW fzv_r AS"
                           " SELECT nope FROM fz_missing_xyz")
            got_v2 = sorted(
                r.k for r in ch.execute("SELECT k FROM fzv_r").collect()
            )
            assert got_v2 == got_v  # atomic: failed swap kept the view
            ch.execute("DROP VIEW fzv_r")
        elif op[0] == "tuplepartition":
            _, vn = op
            for t in ("fztp_a", "fztp_b"):
                ch.execute(f"DROP TABLE IF EXISTS {t}")
                ch.execute(f"CREATE TABLE {t} (k Int64)"
                           " ENGINE = MergeTree ORDER BY k")
            ch.execute("INSERT INTO fztp_a VALUES "
                       + ", ".join(f"({i})" for i in range(vn)))
            ch.execute("ALTER TABLE fztp_b ATTACH PARTITION tuple()"
                       " FROM fztp_a")
            assert ch.execute("SELECT count() AS c FROM fztp_a"
                              ).collect()[0][0] == vn  # copy keeps src
            ch.execute("ALTER TABLE fztp_a MOVE PARTITION tuple()"
                       " TO TABLE fztp_b")
            assert ch.execute("SELECT count() AS c FROM fztp_a"
                              ).collect()[0][0] == 0
            assert ch.execute("SELECT count() AS c FROM fztp_b"
                              ).collect()[0][0] == 2 * vn
            for t in ("fztp_a", "fztp_b"):
                ch.execute(f"DROP TABLE {t}")
        elif op[0] == "bluegreen":
            ch.execute("RENAME TABLE fz TO fz_old, fz2 TO fz")
            ch.execute("RENAME TABLE fz_old TO fz2")
            model, model2 = model2, model
            has_extra, has_extra2 = has_extra2, has_extra
        elif op[0] == "clonetrailer":
            _, oc = op
            ch.execute("DROP TABLE IF EXISTS fzc")
            ch.execute(
                f"CREATE TABLE fzc AS fz ENGINE = MergeTree ORDER BY {oc}"
                " SETTINGS index_granularity = 8192"
            )
            assert ch.meta["fzc"]["order_by"] == [oc]
            n = ch.execute("SELECT count() AS c FROM fzc").collect()[0].c
            assert n == 0
        elif op[0] == "limitparam":
            _, n = op
            got = [
                (r.k, r.ver, r.s)
                for r in ch.execute(
                    "SELECT k, ver, s FROM fz ORDER BY k, ver, s"
                    " LIMIT {n:UInt64}",
                    params={"n": n},
                ).collect()
            ]
            assert got == sorted(model)[:n], (got, sorted(model)[:n])
    assert ("extra" in ch.tables["fz"].columns) == has_extra
    raw = [r.asDict() for r in ch.tables["fz"].collect()]
    if has_extra:
        for r in raw:
            assert int(r["extra"]) == int(r["k"]) * 2, (
                "ADD COLUMN DEFAULT invariant broken: "
                f"extra={r['extra']} for k={r['k']}"
            )
    got = sorted((r["k"], r["ver"], r["s"]) for r in raw)
    if any(o[0] in ("optimize", "optimizepart") for o in ops):
        # equal-version duplicates make the kept `s` arbitrary-but-one;
        # compare the deterministic projection (k, ver) plus row count,
        # and s only for keys whose max version is unique in the model
        assert [(k, v) for k, v, _ in got] == [(k, v) for k, v, _ in sorted(model)]
    else:
        assert got == sorted(model)
    # the swapped-aside generation matches its model too (same relaxation:
    # an OPTIMIZE'd state may have moved into fz2 via a later swap)
    assert ("extra" in ch.tables["fz2"].columns) == has_extra2
    got2 = sorted(
        (r["k"], r["ver"], r["s"]) for r in ch.tables["fz2"].collect()
    )
    if any(o[0] in ("optimize", "optimizepart") for o in ops):
        assert [(k, v) for k, v, _ in got2] == \
            [(k, v) for k, v, _ in sorted(model2)]
    else:
        assert got2 == sorted(model2)


def test_drop_partition(spark, sf_dir):
    ch = ChSession(spark, sf_dir)
    ch.execute(
        "CREATE TABLE pt (k Int64, d String) ENGINE = MergeTree() "
        "PARTITION BY d ORDER BY k"
    )
    ch.execute("INSERT INTO pt VALUES (1, 'a'), (2, 'b'), (3, 'a')")
    ch.execute("ALTER TABLE pt DROP PARTITION 'a'")
    assert sorted(tuple(r) for r in ch.tables["pt"].collect()) == [(2, "b")]
    # dropping a missing partition is a no-op, like CH
    ch.execute("ALTER TABLE pt DROP PARTITION 'zzz'")
    assert ch.tables["pt"].count() == 1
    # partition EXPRESSION (through the translator), numeric value form
    ch.execute(
        "CREATE TABLE pt2 ENGINE = MergeTree() PARTITION BY modulo(k, 2) "
        "ORDER BY k AS SELECT 1 AS k UNION ALL SELECT 2 UNION ALL SELECT 3"
    )
    ch.execute("ALTER TABLE pt2 DROP PARTITION 1")
    assert sorted(r.k for r in ch.tables["pt2"].collect()) == [2]
    # no PARTITION BY declared → loud error
    ch.execute("CREATE TABLE np (k Int64) ENGINE = MergeTree() ORDER BY k")
    with pytest.raises(ValueError, match="no PARTITION BY"):
        ch.execute("ALTER TABLE np DROP PARTITION 'x'")


def test_introspection_statements(spark, sf_dir):
    ch = ChSession(spark, sf_dir)
    ch.execute("CREATE TABLE it (k Int64, s String) ENGINE = MergeTree() ORDER BY k")
    ch.execute("CREATE VIEW iv AS SELECT k FROM it")
    names = {r.name for r in ch.execute("SHOW TABLES").collect()}
    assert {"it", "iv", "orders", "lineitem"} <= names
    desc = {(r.name, r.type) for r in ch.execute("DESCRIBE it").collect()}
    assert desc == {("k", "bigint"), ("s", "string")}
    # fixtures describable too
    fx = {r.name for r in ch.execute("DESC TABLE nation").collect()}
    assert "n_nationkey" in fx
    assert ch.execute("EXISTS it").collect()[0].result == 1
    assert ch.execute("EXISTS TABLE nope").collect()[0].result == 0
    plan = ch.execute("EXPLAIN SELECT count() FROM it").collect()[0].plan
    assert "HashAggregate" in plan or "Physical Plan" in plan
    # r8 probe batch: CHECK TABLE on fixtures, SHOW COLUMNS alias,
    # TRUNCATE IF EXISTS no-op
    assert ch.execute("CHECK TABLE orders").collect()[0].result == 1
    assert ch.execute("CHECK TABLE it").collect()[0].result == 1
    cols = {r.name for r in ch.execute("SHOW COLUMNS FROM it").collect()}
    assert cols == {"k", "s"}
    assert ch.execute("TRUNCATE TABLE IF EXISTS absent_t") is None
    ch.execute("INSERT INTO it VALUES (1, 'x')")
    ch.execute("TRUNCATE TABLE IF EXISTS it")
    assert ch.execute("SELECT count(*) AS n FROM it").collect()[0].n == 0


def test_split_statements_comments_respect_literals_and_raw_data():
    """r5 advice: `--` inside a string literal or inside an INSERT FORMAT
    raw-data block is DATA, not a comment; comments outside still strip."""
    stmts = split_statements("SELECT 'a--b' AS x")
    assert stmts == ["SELECT 'a--b' AS x"]
    # comment outside a literal still strips (incl. to end of line)
    stmts = split_statements("SELECT 1 -- c'est un commentaire\n, 2")
    assert stmts == ["SELECT 1 \n, 2"]
    # JSONEachRow payload value containing -- survives
    stmts = split_statements(
        'INSERT INTO t FORMAT JSONEachRow\n{"k": "x--y", "v": 1}'
    )
    assert len(stmts) == 1 and '"x--y"' in stmts[0]
    # CSV raw data containing -- survives (unquoted field)
    stmts = split_statements("INSERT INTO t FORMAT CSV\na--b,1")
    assert stmts == ["INSERT INTO t FORMAT CSV\na--b,1"]


def test_insert_format_same_line_data(spark, sf_dir):
    """CH accepts `INSERT INTO t FORMAT JSONEachRow {...}` with data on the
    SAME line as the format name (r5 advice: this fell through to the
    generic unsupported-statement error)."""
    ch = ChSession(spark, sf_dir)
    ch.execute("CREATE TABLE sl (k String, v UInt32) ENGINE = MergeTree()"
               " ORDER BY k")
    ch.execute('INSERT INTO sl FORMAT JSONEachRow {"k": "a", "v": 7}')
    rows = ch.execute("SELECT k, v FROM sl").collect()
    assert len(rows) == 1 and rows[0].k == "a" and int(rows[0].v) == 7
    # multi-line data after a same-line first row
    ch.execute(
        'INSERT INTO sl FORMAT JSONEachRow {"k": "b", "v": 1}\n'
        '{"k": "c", "v": 2}'
    )
    assert ch.execute("SELECT count(*) AS n FROM sl").collect()[0].n == 3
    # JSON value containing '--' round-trips through run_script (the
    # comment-strip + format path composition the advice flagged)
    ch.run_script(
        'INSERT INTO sl FORMAT JSONEachRow {"k": "x--y", "v": 9};'
    )
    got = ch.execute("SELECT k FROM sl WHERE v = 9").collect()
    assert [r.k for r in got] == ["x--y"]


def test_chained_mv_cascade(spark, sf_dir):
    """r5 advice: MV2 reading the table MV1 writes into (a standard CH
    cascade) must fire on MV1's appended delta."""
    ch = ChSession(spark, sf_dir)
    ch.execute("CREATE TABLE src (k String, v UInt32) ENGINE = MergeTree()"
               " ORDER BY k")
    ch.execute("CREATE TABLE mid (k String, v UInt64) ENGINE = SummingMergeTree()"
               " ORDER BY k")
    ch.execute("CREATE TABLE out (n UInt64) ENGINE = MergeTree() ORDER BY n")
    ch.execute("CREATE MATERIALIZED VIEW mv1 TO mid AS"
               " SELECT k, sum(v) AS v FROM src GROUP BY k")
    ch.execute("CREATE MATERIALIZED VIEW mv2 TO out AS"
               " SELECT count(*) AS n FROM mid")
    ch.execute("INSERT INTO src VALUES ('a', 1), ('a', 2), ('b', 5)")
    # mv1 appended 2 partial rows to mid; mv2 fired on THAT delta → one row
    # counting 2.
    assert int(ch.execute("SELECT count(*) AS c FROM mid").collect()[0].c) == 2
    out_rows = ch.execute("SELECT n FROM out").collect()
    assert [int(r.n) for r in out_rows] == [2]
    # second block cascades again
    ch.execute("INSERT INTO src VALUES ('c', 9)")
    out_rows = ch.execute("SELECT n FROM out ORDER BY n").collect()
    assert [int(r.n) for r in out_rows] == [1, 2]


def test_mv_cycle_guard(spark, sf_dir):
    ch = ChSession(spark, sf_dir)
    ch.execute("CREATE TABLE a (v UInt32) ENGINE = MergeTree() ORDER BY v")
    ch.execute("CREATE TABLE b (v UInt32) ENGINE = MergeTree() ORDER BY v")
    ch.execute("CREATE MATERIALIZED VIEW mva TO b AS SELECT v FROM a")
    ch.execute("CREATE MATERIALIZED VIEW mvb TO a AS SELECT v FROM b")
    with pytest.raises(ValueError, match="cascade deeper|cycle"):
        ch.execute("INSERT INTO a VALUES (1)")


def test_rand64_range(spark):
    from canal_clickhouse_spark.chsql import translate

    t = translate("SELECT rand64() AS r, rand64() % 100 AS m FROM numbers(200)")
    rows = spark.sql(t).collect()
    assert len(rows) == 200
    assert all(r.r >= 0 for r in rows), "rand64 must never go negative"
    assert all(0 <= r.m < 100 for r in rows)


def test_alter_column_add_drop_modify_rename(spark, sf_dir):
    """r5 verdict missing #1: ALTER TABLE ADD/DROP/MODIFY/RENAME COLUMN
    execute mid-script; adds are DEFAULT- (else NULL-) backfilled on
    existing lineage; MVs defined after the ALTER see the new column."""
    ch = ChSession(spark, sf_dir)
    ch.run_script(
        "CREATE TABLE evo (k Int64, s String) ENGINE = MergeTree()"
        " ORDER BY k;"
        "INSERT INTO evo VALUES (1, 'a'), (2, 'b');"
        "ALTER TABLE evo ADD COLUMN v Int32;"
    )
    rows = ch.execute("SELECT * FROM evo ORDER BY k").collect()
    assert [r.v for r in rows] == [None, None]  # NULL backfill, no DEFAULT
    ch.execute("ALTER TABLE evo ADD COLUMN dk Int64 DEFAULT k * 10 AFTER k")
    assert ch.tables["evo"].columns == ["k", "dk", "s", "v"]
    rows = ch.execute("SELECT * FROM evo ORDER BY k").collect()
    assert [r.dk for r in rows] == [10, 20]  # computed DEFAULT backfill
    # insert omitting dk fills from DEFAULT; modify re-types; rename keeps
    # the default attached
    ch.execute("INSERT INTO evo (k, s) VALUES (3, 'c')")
    ch.execute("ALTER TABLE evo MODIFY COLUMN v Int64,"
               " RENAME COLUMN dk TO dkey")
    ch.execute("INSERT INTO evo (k, s) VALUES (4, 'd')")
    rows = ch.execute("SELECT k, dkey, v FROM evo ORDER BY k").collect()
    assert [(r.k, r.dkey) for r in rows] == [(1, 10), (2, 20), (3, 30), (4, 40)]
    assert dict(ch.tables["evo"].dtypes)["v"] == "bigint"
    ch.execute("ALTER TABLE evo DROP COLUMN v")
    assert ch.tables["evo"].columns == ["k", "dkey", "s"]
    # guards
    with pytest.raises(ValueError, match="already exists"):
        ch.execute("ALTER TABLE evo ADD COLUMN s String")
    with pytest.raises(ValueError, match="unknown column"):
        ch.execute("ALTER TABLE evo DROP COLUMN nope")
    ch.execute("ALTER TABLE evo DROP COLUMN IF EXISTS nope")  # no-op
    # MV defined after the ALTER aggregates the evolved column
    ch.execute("CREATE MATERIALIZED VIEW mv_dk ENGINE = SummingMergeTree()"
               " ORDER BY s AS SELECT s, sum(dkey) AS sd FROM evo GROUP BY s")
    ch.execute("INSERT INTO evo (k, s) VALUES (5, 'e')")
    assert [(r.s, int(r.sd)) for r in
            ch.execute("SELECT * FROM mv_dk").collect()] == [("e", 50)]


def test_alter_column_parser_matches_cdc_envelope_shape(spark, sf_dir):
    """The statement parser and the canal DDL envelope extraction agree on
    (op, column, type) — same catalog change from either path."""
    from canal_clickhouse_spark.chsql_ddl import parse_alter_column_actions

    acts = parse_alter_column_actions("ADD COLUMN c7 BIGINT")
    assert acts == [{
        "op": "add", "col": "c7", "type": "BIGINT", "default": None,
        "decor": "DEFAULT", "after": None, "first": False,
        "if_not_exists": False,
    }]
    # the shapes cdc_parse_ddl synthesizes (envelope.py) parse cleanly
    assert parse_alter_column_actions("DROP COLUMN c4")[0]["op"] == "drop"
    m = parse_alter_column_actions("MODIFY COLUMN c2 VARCHAR(64)")
    assert m[0]["op"] == "modify" and m[0]["col"] == "c2"


def test_create_dictionary_ddl(spark, sf_dir):
    """r5 verdict missing #2: the CH-native CREATE DICTIONARY statement
    wires onto register_ch_dict — dictGet works through it, missing keys
    return the declared DEFAULT (else the attribute type's default), and
    DROP DICTIONARY unregisters."""
    ch = ChSession(spark, sf_dir)
    ch.execute("""
        CREATE DICTIONARY reg_dd (
            n_nationkey Int64,
            n_name String,
            n_regionkey Int64 DEFAULT -1
        )
        PRIMARY KEY n_nationkey
        SOURCE(CLICKHOUSE(TABLE 'nation'))
        LIFETIME(MIN 0 MAX 600)
        LAYOUT(FLAT())
    """)
    r = ch.execute(
        "SELECT dictGetString('reg_dd', 'n_name', 1) AS hit,"
        " dictGetString('reg_dd', 'n_name', 99) AS miss_type_default,"
        " dictGet('reg_dd', 'n_regionkey', 99) AS miss_declared,"
        " dictHas('reg_dd', 99) AS has99"
    ).collect()[0]
    assert r.hit != "" and r.miss_type_default == ""
    assert r.miss_declared == -1 and not r.has99
    # session-created table as source works too
    ch.execute("CREATE TABLE kv (k Int64, v String) ENGINE = MergeTree()"
               " ORDER BY k")
    ch.execute("INSERT INTO kv VALUES (1, 'one')")
    ch.execute("CREATE DICTIONARY kv_dd (k Int64, v String) PRIMARY KEY k"
               " SOURCE(CLICKHOUSE(TABLE 'kv'))")
    assert ch.execute(
        "SELECT dictGetString('kv_dd', 'v', 1) AS v"
    ).collect()[0].v == "one"
    # guards
    with pytest.raises(ValueError, match="already exists"):
        ch.execute("CREATE DICTIONARY reg_dd (n_nationkey Int64, n_name"
                   " String) PRIMARY KEY n_nationkey"
                   " SOURCE(CLICKHOUSE(TABLE 'nation'))")
    ch.execute("CREATE DICTIONARY IF NOT EXISTS reg_dd (n_nationkey Int64,"
               " n_name String) PRIMARY KEY n_nationkey"
               " SOURCE(CLICKHOUSE(TABLE 'nation'))")  # no-op
    with pytest.raises(ValueError, match="not in"):
        ch.execute("CREATE DICTIONARY bad_attr (r_regionkey Int64,"
                   " r_comment String) PRIMARY KEY r_regionkey"
                   " SOURCE(CLICKHOUSE(TABLE 'region'))")
    with pytest.raises(ValueError, match="table-backed"):
        ch.execute("CREATE DICTIONARY md (k Int64, v String) PRIMARY KEY k"
                   " SOURCE(MYSQL(TABLE 'x'))")
    with pytest.raises(ValueError, match="unknown source table"):
        ch.execute("CREATE DICTIONARY ud (k Int64, v String) PRIMARY KEY k"
                   " SOURCE(CLICKHOUSE(TABLE 'nope'))")
    ch.execute("DROP DICTIONARY reg_dd")
    ch.execute("DROP DICTIONARY IF EXISTS reg_dd")  # idempotent
    with pytest.raises(ValueError, match="unknown dictionary"):
        ch.execute("SELECT dictGetString('reg_dd', 'n_name', 1) AS v")
    ch.execute("DROP DICTIONARY kv_dd")


def test_rename_exchange_tables(spark, sf_dir):
    """r5 verdict missing #3: RENAME TABLE chains resolve left-to-right and
    validate before mutating; EXCHANGE TABLES swaps content + engine meta
    atomically."""
    ch = ChSession(spark, sf_dir)
    ch.execute("CREATE TABLE blue (x Int64) ENGINE = MergeTree() ORDER BY x")
    ch.execute("CREATE TABLE green (x Int64) ENGINE = ReplacingMergeTree(x)"
               " ORDER BY x")
    ch.execute("INSERT INTO blue VALUES (1)")
    ch.execute("INSERT INTO green VALUES (2), (3)")
    ch.execute("EXCHANGE TABLES blue AND green")
    assert ch.execute("SELECT count(*) AS n FROM blue").collect()[0].n == 2
    # engine metadata swapped with the content
    assert ch.meta["blue"]["engine"].lower() == "replacingmergetree"
    ch.execute("RENAME TABLE green TO retired, blue TO green")
    assert sorted(ch.tables) == ["green", "retired"]
    assert ch.execute("SELECT count(*) AS n FROM green").collect()[0].n == 2
    # validation happens before any mutation: a bad pair leaves all intact
    with pytest.raises(ValueError, match="exists"):
        ch.execute("RENAME TABLE green TO retired")
    assert sorted(ch.tables) == ["green", "retired"]
    with pytest.raises(ValueError, match="shadows a fixture"):
        ch.execute("RENAME TABLE green TO orders")
    with pytest.raises(ValueError, match="unknown table"):
        ch.execute("RENAME TABLE ghost TO somewhere")


def test_ttl_ddl(spark, sf_dir):
    """r6 verdict missing #2: CREATE TABLE ... TTL <expr> [DELETE] and
    ALTER TABLE ... MODIFY TTL parse and enforce at OPTIMIZE FINAL with
    the max-anchored ttl_expire semantics (deterministic "now")."""
    ch = ChSession(spark, sf_dir)
    ch.execute(
        "CREATE TABLE ttl_t (id Int32, ts DateTime, v String)"
        " ENGINE = MergeTree ORDER BY id TTL ts + INTERVAL 10 DAY DELETE"
    )
    assert ch.meta["ttl_t"]["ttl"] == {"expr": "ts + INTERVAL 10 DAY"}
    ch.execute(
        "INSERT INTO ttl_t VALUES"
        " (1, '2024-01-01 00:00:00', 'old'),"
        " (2, '2024-01-15 00:00:00', 'mid'),"
        " (3, '2024-01-20 00:00:00', 'new')"
    )
    # rows visible until a merge enforces TTL (CH's lazy contract)
    assert ch.execute("SELECT count(*) AS n FROM ttl_t").collect()[0].n == 3
    ch.execute("OPTIMIZE TABLE ttl_t FINAL")
    rows = ch.execute("SELECT id FROM ttl_t ORDER BY id").collect()
    assert [r.id for r in rows] == [2, 3]  # id=1 expired vs max(ts)
    # MODIFY TTL narrows the window; next merge applies it
    ch.execute("ALTER TABLE ttl_t MODIFY TTL ts + INTERVAL 3 DAY")
    ch.execute("OPTIMIZE TABLE ttl_t FINAL")
    rows = ch.execute("SELECT id FROM ttl_t ORDER BY id").collect()
    assert [r.id for r in rows] == [3]
    # TTL composes with engine merges: Replacing + TTL in one OPTIMIZE
    ch.execute(
        "CREATE TABLE ttl_r (k Int32, ver Int32, ts DateTime)"
        " ENGINE = ReplacingMergeTree(ver) ORDER BY k"
        " TTL ts + INTERVAL 10 DAY"
    )
    ch.execute(
        "INSERT INTO ttl_r VALUES (1, 1, '2024-01-01 00:00:00'),"
        " (1, 2, '2024-01-20 00:00:00'), (2, 1, '2024-01-05 00:00:00')"
    )
    ch.execute("OPTIMIZE TABLE ttl_r FINAL")
    rows = ch.execute("SELECT k, ver FROM ttl_r ORDER BY k").collect()
    assert [(r.k, r.ver) for r in rows] == [(1, 2)]
    # tiering/rollup TTL forms refuse loudly
    import pytest

    with pytest.raises(ValueError, match="tiering"):
        ch.execute(
            "CREATE TABLE ttl_bad (ts DateTime) ENGINE = MergeTree"
            " ORDER BY ts TTL ts + INTERVAL 1 DAY TO VOLUME 'cold'"
        )
    with pytest.raises(ValueError, match="ttl_rollup"):
        ch.execute(
            "CREATE TABLE ttl_bad2 (ts DateTime, v Int64)"
            " ENGINE = MergeTree ORDER BY ts"
            " TTL ts + INTERVAL 1 DAY GROUP BY ts SET v = sum(v)"
        )


def test_create_table_paste_compat(spark, sf_dir):
    """r6 verdict missing #3: a realistic `SHOW CREATE TABLE`-style dump —
    CODEC / column TTL / COMMENT / LowCardinality / Nullable / DEFAULT /
    backticked names / PRIMARY KEY / SETTINGS — executes as-is."""
    ch = ChSession(spark, sf_dir)
    ch.execute("""
        CREATE TABLE IF NOT EXISTS hits
        (
            `WatchID` UInt64 CODEC(ZSTD(1)),
            `EventDate` Date CODEC(Delta, ZSTD),
            `Title` String DEFAULT '' COMMENT 'page title',
            `Region` LowCardinality(String),
            `Duration` Nullable(Int32) CODEC(T64),
            `Price` Decimal(18, 2) DEFAULT 0,
            `IsRobot` UInt8 TTL EventDate + INTERVAL 30 DAY,
            `Tags` Array(String)
        )
        ENGINE = MergeTree
        PARTITION BY toYYYYMM(EventDate)
        ORDER BY (EventDate, WatchID)
        PRIMARY KEY (EventDate, WatchID)
        TTL EventDate + INTERVAL 90 DAY DELETE
        SETTINGS index_granularity = 8192
    """)
    assert [t for _, t in ch.tables["hits"].dtypes] == [
        "decimal(20,0)", "date", "string", "string", "int",
        "decimal(18,2)", "smallint", "array<string>",
    ]
    assert ch.meta["hits"]["ttl"] == {"expr": "EventDate + INTERVAL 90 DAY"}
    assert ch.meta["hits"]["column_defaults"] == {"Title": "''", "Price": "0"}
    ch.execute(
        "INSERT INTO hits (WatchID, EventDate) VALUES (1, '2024-03-01')"
    )
    row = ch.execute("SELECT Title, Price FROM hits").collect()[0]
    assert (row.Title, float(row.Price)) == ("", 0.0)


def test_show_create_table_roundtrip(spark, sf_dir):
    """r6 verdict missing #4: SHOW CREATE TABLE emits canonical CH DDL;
    executing the emitted text reproduces the schema field-for-field plus
    engine/order/partition/TTL/default meta."""
    ch = ChSession(spark, sf_dir)
    ch.execute(
        "CREATE TABLE rt (id Int32, name String DEFAULT 'x', ts DateTime,"
        " score Float64 DEFAULT id * 2.5, tags Array(String),"
        " amounts Decimal(18, 2), m Map(String, Int64))"
        " ENGINE = ReplacingMergeTree(id) PARTITION BY toYYYYMM(ts)"
        " ORDER BY (id, ts) TTL ts + INTERVAL 10 DAY"
    )
    ddl = ch.execute("SHOW CREATE TABLE rt").collect()[0].statement
    ch2 = ChSession(spark, sf_dir)
    ch2.execute(ddl.replace("CREATE TABLE rt", "CREATE TABLE rt2"))
    assert ch.tables["rt"].dtypes == ch2.tables["rt2"].dtypes
    for k in ("engine", "engine_args", "order_by", "partition_by",
              "ttl", "column_defaults"):
        assert ch.meta["rt"].get(k) == ch2.meta["rt2"].get(k), k
    # second-generation dump is a fixpoint
    ddl2 = ch2.execute("SHOW CREATE TABLE rt2").collect()[0].statement
    assert ddl2 == ddl.replace("CREATE TABLE rt", "CREATE TABLE rt2")
    # r8 verdict #5: declared Nullable() survives dump → re-execute → dump
    ch.execute(
        "CREATE TABLE rt_n (id Int32, s Nullable(String),"
        " lc LowCardinality(Nullable(String)), p String)"
        " ENGINE = MergeTree ORDER BY id"
    )
    dn = ch.execute("SHOW CREATE TABLE rt_n").collect()[0].statement
    assert "`s` Nullable(String)" in dn
    assert "`lc` Nullable(String)" in dn   # LC is a storage hint; N survives
    assert "`p` String" in dn and "`p` Nullable" not in dn
    ch2.execute(dn.replace("rt_n", "rt_n2"))
    dn2 = ch2.execute("SHOW CREATE TABLE rt_n2").collect()[0].statement
    assert dn2 == dn.replace("rt_n", "rt_n2")
    # ALTER keeps the wrapper in sync: add Nullable, rename, modify away
    ch.execute("ALTER TABLE rt_n ADD COLUMN extra Nullable(Int64)")
    ch.execute("ALTER TABLE rt_n RENAME COLUMN extra TO extra2")
    assert "`extra2` Nullable(Int64)" in ch.execute(
        "SHOW CREATE TABLE rt_n").collect()[0].statement
    ch.execute("ALTER TABLE rt_n MODIFY COLUMN s String")
    assert "`s` Nullable" not in ch.execute(
        "SHOW CREATE TABLE rt_n").collect()[0].statement
    # no-sort-key table round-trips through ORDER BY tuple()
    ch.execute("CREATE TABLE rt_plain (a Int32) ENGINE = MergeTree"
               " ORDER BY tuple()")
    d = ch.execute("SHOW CREATE TABLE rt_plain").collect()[0].statement
    assert "ORDER BY tuple()" in d
    ch2.execute(d.replace("rt_plain", "rt_plain2"))
    assert ch2.tables["rt_plain2"].dtypes == ch.tables["rt_plain"].dtypes
    # fixtures and views are introspectable too
    assert "CREATE TABLE orders" in ch.execute(
        "SHOW CREATE TABLE orders").collect()[0].statement
    ch.execute("CREATE VIEW rt_v AS SELECT count() AS n FROM region")
    assert ch.execute("SHOW CREATE TABLE rt_v").collect()[0].statement \
        == "CREATE VIEW rt_v AS SELECT count() AS n FROM region"


# r7: TTL statements in the model fuzz (r6 verdict task 7) — random
# insert / MODIFY TTL / OPTIMIZE / mutation-delete sequences vs a pure
# Python model of the max-anchored expiry contract.
_TTL_OPS = st.lists(
    st.one_of(
        st.tuples(
            st.just("insert"),
            st.lists(st.integers(1, 28), min_size=1, max_size=4),  # days
        ),
        st.tuples(st.just("setttl"), st.integers(3, 15)),
        st.tuples(st.just("optimize")),
        st.tuples(st.just("delete"), st.integers(0, 3)),
    ),
    min_size=1, max_size=6,
)


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_TTL_OPS)
def test_ttl_model_fuzz(spark, sf_dir, ops):
    ch = ChSession(spark, sf_dir)
    ch.execute(
        "CREATE TABLE tz (id Int64, ts DateTime) ENGINE = MergeTree"
        " ORDER BY id TTL ts + INTERVAL 10 DAY"
    )
    model: list[tuple[int, int]] = []  # (id, day-of-month)
    ttl_days, idseq = 10, 0
    for op in ops:
        if op[0] == "insert":
            rows = []
            for day in op[1]:
                idseq += 1
                rows.append((idseq, day))
            vals = ", ".join(
                f"({i}, '2024-01-{d:02d} 00:00:00')" for i, d in rows
            )
            ch.execute(f"INSERT INTO tz VALUES {vals}")
            model.extend(rows)
        elif op[0] == "setttl":
            ttl_days = op[1]
            ch.execute(
                f"ALTER TABLE tz MODIFY TTL ts + INTERVAL {ttl_days} DAY"
            )
        elif op[0] == "optimize":
            ch.execute("OPTIMIZE TABLE tz FINAL")
            if model:
                mx = max(d for _, d in model)
                model = [(i, d) for i, d in model if d + ttl_days >= mx]
        elif op[0] == "delete":
            r = op[1]
            ch.execute(f"ALTER TABLE tz DELETE WHERE id % 4 = {r}")
            model = [(i, d) for i, d in model if i % 4 != r]
    got = sorted((r.id, r.ts.day) for r in ch.tables["tz"].collect())
    assert got == sorted(model)


# r7: dictionary DDL in the model fuzz — CREATE/DROP DICTIONARY, source
# INSERTs, source RENAME (binding must follow), dictGet reads, vs a pure
# Python model of the registry + max-per-key lookup contract.
_DICT_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("create")),
        st.tuples(st.just("dropdict")),
        st.tuples(
            st.just("insert"), st.integers(0, 9), st.sampled_from("abc")
        ),
        st.tuples(st.just("rename")),
        st.tuples(st.just("get"), st.integers(0, 11)),
    ),
    min_size=1, max_size=7,
)


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_DICT_OPS)
def test_dict_model_fuzz(spark, sf_dir, ops):
    from canal_clickhouse_spark.chsql import _CH_DICTS

    with ChSession(spark, sf_dir) as ch:
        ch.execute(
            "CREATE TABLE dsrc0 (k Int64, v String) ENGINE = MergeTree"
            " ORDER BY k"
        )
        kv: dict[int, str] = {}   # key -> max(v) (the lookup's contract)
        exists, gen = False, 0    # dictionary registered?  rename generation
        for op in ops:
            src = f"dsrc{gen}"
            if op[0] == "create" and not exists:
                ch.execute(
                    "CREATE DICTIONARY fz_dict (k Int64, v String"
                    " DEFAULT '?') PRIMARY KEY k"
                    f" SOURCE(CLICKHOUSE(TABLE '{src}')) LAYOUT(FLAT())"
                    " LIFETIME(300)"
                )
                exists = True
            elif op[0] == "dropdict" and exists:
                ch.execute("DROP DICTIONARY fz_dict")
                exists = False
            elif op[0] == "insert":
                _, k, v = op
                ch.execute(f"INSERT INTO {src} VALUES ({k}, '{v}')")
                kv[k] = max(kv.get(k, ""), v)
            elif op[0] == "rename":
                ch.execute(f"RENAME TABLE {src} TO dsrc{gen + 1}")
                gen += 1
                if exists:  # binding must have followed the rename
                    assert _CH_DICTS["fz_dict"]["table"] == f"dsrc{gen}"
            elif op[0] == "get":
                _, k = op
                if exists:
                    got = ch.execute(
                        f"SELECT dictGet('fz_dict', 'v', {k}) AS v"
                    ).collect()[0].v
                    assert got == kv.get(k, "?"), (k, got, kv)
                else:
                    with pytest.raises(ValueError, match="unknown dict"):
                        ch.execute(
                            f"SELECT dictGet('fz_dict', 'v', {k}) AS v"
                        )
    assert "fz_dict" not in _CH_DICTS  # close() cleaned the registry


def test_ch_type_widening_r7(spark, sf_dir):
    """r7 paste-compat type batch: Tuple (named + positional → struct with
    the translator's col1..colN convention), Nested (→ array<struct>,
    documented divergence from parallel subcolumn arrays),
    SimpleAggregateFunction unwraps, AggregateFunction refuses with named
    guidance, tz-decorated DateTime, 128/256-bit ints, IPv4/6, JSON."""
    from canal_clickhouse_spark.chsql_ddl import (
        ch_type_to_spark, spark_type_to_ch,
    )

    assert ch_type_to_spark("Tuple(String, Int32)") == \
        "STRUCT<col1: STRING, col2: INT>"
    assert ch_type_to_spark("Tuple(name String, age Int32)") == \
        "STRUCT<name: STRING, age: INT>"
    assert ch_type_to_spark("Nested(x Int32, y String)") == \
        "ARRAY<STRUCT<x: INT, y: STRING>>"
    assert ch_type_to_spark("SimpleAggregateFunction(sum, Int64)") == \
        "BIGINT"
    assert ch_type_to_spark("DateTime('Asia/Tokyo')") == "TIMESTAMP"
    assert ch_type_to_spark("UInt256") == "DECIMAL(38,0)"
    assert ch_type_to_spark("IPv6") == "STRING"
    assert ch_type_to_spark("Object('json')") == "STRING"
    # r10: mergeable-value states map for real; only sketch states raise
    assert ch_type_to_spark("AggregateFunction(sum, Int64)") == \
        "DECIMAL(38,0)"
    with pytest.raises(ValueError, match="sketch state"):
        ch_type_to_spark("AggregateFunction(uniq, Int64)")
    # inverse map round-trips the container types
    assert spark_type_to_ch("struct<name: string, age: int>") == \
        "Tuple(name String, age Int32)"
    # a Tuple-typed column works end-to-end: create, insert, tupleElement
    ch = ChSession(spark, sf_dir)
    ch.execute(
        "CREATE TABLE tup_t (id Int32, pt Tuple(name String, age Int32))"
        " ENGINE = MergeTree ORDER BY id"
    )
    ch.execute(
        "INSERT INTO tup_t SELECT 1, tuple('ann', 40)"
    )
    # name access for named tuples; positional colN applies to unnamed
    # ones (the translator's tuple() convention)
    row = ch.execute(
        "SELECT tupleElement(pt, 'name') AS nm FROM tup_t"
    ).collect()[0]
    assert row.nm == "ann"


def test_system_tables(spark, sf_dir):
    """r7: CH's introspection schema — system.tables / columns / parts /
    dictionaries / databases materialize from live catalog state, rewrite
    literal-safely, and compose with the full SELECT dialect."""
    with ChSession(spark, sf_dir) as ch:
        ch.execute(
            "CREATE TABLE sys_a (k Int64, v String DEFAULT 'x')"
            " ENGINE = ReplacingMergeTree(k) PARTITION BY modulo(k, 2)"
            " ORDER BY k"
        )
        ch.execute("INSERT INTO sys_a VALUES (1, 'a'), (2, 'b')")
        ch.execute("CREATE VIEW sys_v AS SELECT count() AS n FROM sys_a")
        rows = ch.execute(
            "SELECT name, engine FROM system.tables"
            " WHERE name IN ('sys_a', 'sys_v', 'orders') ORDER BY name"
        ).collect()
        assert [(r.name, r.engine) for r in rows] == [
            ("orders", "MergeTree"), ("sys_a", "ReplacingMergeTree"),
            ("sys_v", "View"),
        ]
        # create_table_query is the SHOW CREATE dump
        q = ch.execute(
            "SELECT create_table_query AS q FROM system.tables"
            " WHERE name = 'sys_a'"
        ).collect()[0].q
        assert q.startswith("CREATE TABLE sys_a")
        cols = ch.execute(
            "SELECT name, type, default_expression FROM system.columns"
            " WHERE table = 'sys_a' ORDER BY position"
        ).collect()
        assert [(c.name, c.type, c.default_expression) for c in cols] == [
            ("k", "Int64", ""), ("v", "String", "'x'"),
        ]
        parts = ch.execute(
            "SELECT table, rows, active FROM system.parts"
            " WHERE table = 'sys_a'"
        ).collect()
        assert [(p.table, p.rows, p.active) for p in parts] == [
            ("sys_a", 2, True),
        ]
        assert ch.execute(
            "SELECT name FROM system.databases"
        ).collect()[0].name == "default"
        ch.execute(
            "CREATE DICTIONARY sys_d (k Int64, v String) PRIMARY KEY k"
            " SOURCE(CLICKHOUSE(TABLE 'sys_a')) LAYOUT(FLAT())"
            " LIFETIME(300)"
        )
        d = ch.execute(
            "SELECT name, source_table FROM system.dictionaries"
            " WHERE name = 'sys_d'"
        ).collect()
        assert [(r.name, r.source_table) for r in d] == [("sys_d", "sys_a")]
        # literal safety: the string 'system.tables' is data, not a ref
        s = ch.execute("SELECT 'system.tables' AS s").collect()[0].s
        assert s == "system.tables"
        # unknown system table refuses loudly
        with pytest.raises(ValueError, match="unsupported system table"):
            ch.execute("SELECT * FROM system.merges")


def test_ddl_r7_statement_surface(spark, sf_dir):
    """r7 DDL probe batch: IF NOT EXISTS / OR REPLACE / TEMPORARY create
    forms, structure clone (CREATE t AS src), OPTIMIZE DEDUPLICATE [BY],
    CLEAR COLUMN [IN PARTITION] (default refill), comment/index/
    projection/setting decorations as recorded no-ops, DETACH/ATTACH for
    tables and partitions, SET/USE/SHOW/CHECK/KILL/SYSTEM statements, and
    the EXPLAIN variant family."""
    import pytest as _pytest

    from canal_clickhouse_spark.chsql_ddl import ChSession

    s = ChSession(spark, sf_dir)
    run = s.execute
    rows = lambda st: [tuple(r) for r in run(st).collect()]

    run("CREATE TABLE tp7 (id Int32, v String DEFAULT 'dv')"
        " ENGINE = MergeTree PARTITION BY id % 2 ORDER BY id")
    run("INSERT INTO tp7 VALUES (1, 'a'), (2, 'b'), (3, 'c'), (3, 'c')")
    # IF NOT EXISTS tolerates, OR REPLACE swaps
    run("CREATE TABLE IF NOT EXISTS tp7 (id Int32) ENGINE = Memory")
    assert rows("SELECT count() AS c FROM tp7") == [(4,)]
    run("CREATE OR REPLACE TABLE tpr7 (x Int32) ENGINE = Memory")
    run("CREATE OR REPLACE TABLE tpr7 (y String) ENGINE = Memory")
    # r11: DESCRIBE grew CH's default_type/default_expression columns
    assert rows("DESCRIBE tpr7") == [("y", "string", "", "")]
    run("CREATE TEMPORARY TABLE tt7 (x Int32) ENGINE = Memory")
    # structure clone inherits schema AND column defaults
    run("CREATE TABLE tclone7 AS tp7")
    assert rows("SELECT count() AS c FROM tclone7") == [(0,)]
    assert rows("DESCRIBE tclone7") == rows("DESCRIBE tp7")
    run("INSERT INTO tclone7 (id) VALUES (9)")
    assert rows("SELECT v FROM tclone7") == [("dv",)]
    # OPTIMIZE DEDUPLICATE: full-row, then by-column
    run("OPTIMIZE TABLE tp7 FINAL DEDUPLICATE")
    assert rows("SELECT count() AS c FROM tp7") == [(3,)]
    run("INSERT INTO tp7 VALUES (3, 'zzz')")
    run("OPTIMIZE TABLE tp7 DEDUPLICATE BY id")
    assert rows("SELECT count() AS c FROM tp7") == [(3,)]
    # CLEAR COLUMN refills with the registered DEFAULT; partition-scoped
    run("ALTER TABLE tp7 CLEAR COLUMN v")
    assert set(rows("SELECT DISTINCT v FROM tp7")) == {("dv",)}
    run("INSERT INTO tp7 VALUES (4, 'keep'), (5, 'wipe')")
    run("ALTER TABLE tp7 CLEAR COLUMN v IN PARTITION 1")
    got = dict(rows("SELECT id, v FROM tp7 ORDER BY id"))
    assert got[4] == "keep" and got[5] == "dv"
    # decorations are recorded no-ops
    run("ALTER TABLE tp7 COMMENT COLUMN v 'the v col'")
    run("ALTER TABLE tp7 MODIFY COMMENT 'tbl'")
    run("ALTER TABLE tp7 ADD INDEX idx v TYPE minmax GRANULARITY 1")
    assert "idx" in s.meta["tp7"]["indexes"]
    run("ALTER TABLE tp7 DROP INDEX idx")
    assert "idx" not in s.meta["tp7"]["indexes"]
    run("ALTER TABLE tp7 ADD PROJECTION p1 (SELECT id ORDER BY id)")
    run("ALTER TABLE tp7 MODIFY SETTING index_granularity = 8192")
    run("ALTER TABLE tp7 FREEZE")
    # partition + table detach/attach round-trips
    n0 = rows("SELECT count() AS c FROM tp7")[0][0]
    run("ALTER TABLE tp7 DETACH PARTITION 0")
    assert rows("SELECT count() AS c FROM tp7")[0][0] < n0
    run("ALTER TABLE tp7 ATTACH PARTITION 0")
    assert rows("SELECT count() AS c FROM tp7")[0][0] == n0
    run("DETACH TABLE tclone7")
    assert rows("EXISTS TABLE tclone7") == [(0,)]
    run("ATTACH TABLE tclone7")
    assert rows("EXISTS TABLE tclone7") == [(1,)]
    # session statements
    run("SET max_threads = 8")
    with _pytest.raises(ValueError, match="NULL-fill"):
        run("SET join_use_nulls = 0")
    run("USE default")
    with _pytest.raises(ValueError, match="unknown database"):
        run("USE analytics")
    assert rows("SHOW DATABASES") == [("default",), ("system",)]
    assert rows("SHOW PROCESSLIST") == []
    assert rows("CHECK TABLE tp7") == [(1,)]
    assert rows("KILL QUERY WHERE query_id = 'x'") == []
    run("SYSTEM FLUSH LOGS")
    run("SYSTEM DROP MARK CACHE")
    with _pytest.raises(ValueError, match="no replica"):
        run("SYSTEM RESTART REPLICA r")
    # EXPLAIN variants
    assert rows("EXPLAIN SYNTAX SELECT quantile(0.5)(id) FROM tp7") == \
        [("SELECT percentile(id, 0.5) FROM tp7",)]
    assert run("EXPLAIN PIPELINE SELECT * FROM tp7").columns == ["plan"]
    assert run("EXPLAIN AST SELECT * FROM tp7").columns == ["plan"]
    with _pytest.raises(ValueError, match="footers"):
        run("EXPLAIN ESTIMATE SELECT * FROM tp7")
    with _pytest.raises(ValueError, match="ACL"):
        run("GRANT SELECT ON tp7 TO u")


def test_ddl_insert_format_variants(spark, sf_dir):
    """r7: the INSERT FORMAT dispatch was a JSONEachRow|CSV prefix match —
    CSVWithNames silently parsed as CSV with the header row as data. Full
    format-word dispatch now: TSV/TabSeparated (tab from_csv), WithNames
    variants skip the header, Values delegates to the VALUES parser, and
    unknown formats refuse loudly. INTO OUTFILE raises a guided error."""
    import pytest as _pytest

    from canal_clickhouse_spark.chsql_ddl import ChSession

    s = ChSession(spark, sf_dir)
    s.execute("CREATE TABLE tfv (id Int32, v String) ENGINE = Memory")
    s.execute("INSERT INTO tfv FORMAT TSV\n1\ta\n2\tb")
    s.execute("INSERT INTO tfv FORMAT TabSeparated\n3\tc")
    s.execute("INSERT INTO tfv FORMAT Values (4, 'd'), (5, 'e')")
    s.execute("INSERT INTO tfv FORMAT CSVWithNames\nid,v\n6,f")
    s.execute("INSERT INTO tfv FORMAT TSVWithNames\nid\tv\n7\tg")
    rows = [
        tuple(r)
        for r in s.execute("SELECT * FROM tfv ORDER BY id").collect()
    ]
    assert rows == [(1, "a"), (2, "b"), (3, "c"), (4, "d"), (5, "e"),
                    (6, "f"), (7, "g")]
    with _pytest.raises(ValueError, match="JSONEachRow"):
        s.execute("INSERT INTO tfv FORMAT Parquet xx")
    # INTO OUTFILE writes for real since r10 — see test_r10_into_outfile;
    # the unsupported-format spelling still routes to the sink guidance
    with _pytest.raises(ValueError, match="sink"):
        s.execute("SELECT * FROM tfv INTO OUTFILE '/tmp/x.csv'"
                  " TRUNCATE FORMAT Native")


def test_exists_statement(spark, sf_dir):
    """``EXISTS [TABLE|VIEW|DICTIONARY|DATABASE] name`` (r8 probe 3) →
    one row, column ``result`` 0/1 — session tables, fixture tables,
    dictionaries, and the two virtual databases all count."""
    from canal_clickhouse_spark.chsql_ddl import ChSession

    ch = ChSession(spark, sf_dir)
    ch.execute("CREATE TABLE ex_t (x Int64) ENGINE = MergeTree ORDER BY x")
    got = lambda s: ch.execute(s).collect()[0].result
    assert got("EXISTS TABLE ex_t") == 1
    assert got("EXISTS ex_t") == 1  # bare form is the TABLE form
    assert got("EXISTS TABLE ex_missing") == 0
    assert got("EXISTS orders") == 1  # fixture table
    assert got("EXISTS DATABASE default") == 1
    assert got("EXISTS DATABASE nope") == 0
    assert got("EXISTS DICTIONARY nodict") == 0
    ch.execute("DROP TABLE ex_t")
    assert got("EXISTS TABLE ex_t") == 0


def test_show_filters_and_modify_order_by(spark, sf_dir):
    """r8 statement probes: SHOW TABLES [FROM db] [NOT] [I]LIKE 'pat'
    (CH %/_ wildcards), SHOW DICTIONARIES, SHOW SETTINGS (honest empty —
    settings are accepted-and-dropped knobs), ALTER TABLE MODIFY ORDER BY
    (metadata sorting key; must extend the existing prefix), and the WATCH
    guided refusal."""
    import pytest as _pytest

    from canal_clickhouse_spark.chsql_ddl import ChSession

    ch = ChSession(spark, sf_dir)
    ch.execute("CREATE TABLE st8 (x Int64, s String)"
               " ENGINE = MergeTree ORDER BY x")
    rows = lambda s: [tuple(r) for r in ch.execute(s).collect()]
    assert rows("SHOW TABLES LIKE 'st8%'") == [("st8",)]
    assert rows("SHOW TABLES ILIKE 'ST8%'") == [("st8",)]
    assert ("st8",) not in rows("SHOW TABLES NOT LIKE 'st8%'")
    assert ("orders",) in rows("SHOW TABLES FROM default")
    with _pytest.raises(ValueError, match="unknown database"):
        ch.execute("SHOW TABLES FROM elsewhere")
    assert ("nations",) in rows("SHOW DICTIONARIES")
    assert rows("SHOW SETTINGS LIKE 'max%'") == []
    ch.execute("ALTER TABLE st8 MODIFY ORDER BY (x, s)")
    assert "ORDER BY (x, s)" in rows("SHOW CREATE TABLE st8")[0][0]
    with _pytest.raises(ValueError, match="prefix"):
        ch.execute("ALTER TABLE st8 MODIFY ORDER BY (s)")
    with _pytest.raises(ValueError, match="unknown column"):
        ch.execute("ALTER TABLE st8 MODIFY ORDER BY (x, nope)")
    with _pytest.raises(ValueError, match="stream"):
        ch.execute("WATCH st8")


def test_type_map_r8_additions():
    """r8 type-map probes: BFloat16, Decimal256 (38-digit clamp), and the
    geo compound aliases (Point/Ring/Polygon/MultiPolygon expand to the
    tuple/array shapes CH itself defines them as)."""
    from canal_clickhouse_spark.chsql_ddl import ch_type_to_spark

    assert ch_type_to_spark("BFloat16") == "FLOAT"
    assert ch_type_to_spark("Decimal256(10)") == "DECIMAL(38,10)"
    assert ch_type_to_spark("Point") == "STRUCT<x: DOUBLE, y: DOUBLE>"
    assert ch_type_to_spark("Ring") == \
        "ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>"
    assert ch_type_to_spark("Polygon") == \
        "ARRAY<ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>>"
    assert ch_type_to_spark("MultiPolygon") == \
        "ARRAY<ARRAY<ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>>>"
    assert ch_type_to_spark("Nullable(Point)") == \
        "STRUCT<x: DOUBLE, y: DOUBLE>"


def test_query_parameters(spark, sf_dir):
    """CH query parameters (r8): ``SET param_name = v`` + ``{name:Type}``
    placeholders (CAST-spliced), ``{n:Identifier}`` for table names, the
    ``params={}`` call argument (python values auto-quoted), and the loud
    unbound-parameter error. JSONEachRow INSERT payloads don't collide
    with the placeholder scan (their keys are quoted)."""
    import pytest as _pytest

    from canal_clickhouse_spark.chsql_ddl import ChSession

    ch = ChSession(spark, sf_dir)
    ch.execute("SET param_k = 5")
    ch.execute("SET param_s = 'O'")
    assert [tuple(r) for r in ch.execute(
        "SELECT {k:Int64} AS k, {k:Int64} * 2 AS d").collect()] == [(5, 10)]
    n = ch.execute(
        "SELECT count() AS c FROM orders WHERE o_orderkey <= {k:UInt64}"
        " AND o_orderstatus = {s:String}").collect()[0].c
    assert n >= 0
    ch.execute("SET param_tbl = 'orders'")
    assert ch.execute(
        "SELECT count() AS c FROM {tbl:Identifier}").collect()[0].c > 0
    r = ch.execute("SELECT {name:String} AS n, {x:Int32} + 1 AS y",
                   params={"name": "ab'c", "x": 7}).collect()[0]
    assert (r.n, r.y) == ("ab'c", 8)
    with _pytest.raises(ValueError, match="no bound value"):
        ch.execute("SELECT {missing:Int64} AS m")
    # JSONEachRow payload braces are not placeholders
    ch.execute("CREATE TABLE qp (x Int64, s String)"
               " ENGINE = MergeTree ORDER BY x")
    ch.execute('INSERT INTO qp FORMAT JSONEachRow {"x": 1, "s": "a"}')
    assert ch.execute("SELECT count() AS c FROM qp").collect()[0].c == 1


def test_parameterized_views(spark, sf_dir):
    """CH parameterized views (r8): CREATE VIEW with {p:Type} placeholders
    stores the definition verbatim; ``FROM v(p = value)`` binds and
    inlines; a bare reference to a parameterized view raises the guided
    call-it-with-bindings error; plain views are unaffected."""
    import pytest as _pytest

    from canal_clickhouse_spark.chsql_ddl import ChSession

    ch = ChSession(spark, sf_dir)
    ch.execute(
        "CREATE VIEW pv8 AS SELECT o_orderkey, o_totalprice FROM orders"
        " WHERE o_totalprice > {min_price:Float64}")
    all_n = ch.execute("SELECT count() AS c FROM pv8(min_price = 0)"
                       ).collect()[0].c
    some_n = ch.execute("SELECT count() AS c FROM pv8(min_price = 100000)"
                        ).collect()[0].c
    assert 0 < some_n < all_n
    with _pytest.raises(ValueError, match="parameterized"):
        ch.execute("SELECT count() AS c FROM pv8")
    ch.execute("CREATE VIEW plain8 AS SELECT count() AS c FROM orders")
    assert ch.execute("SELECT c FROM plain8").collect()[0].c == all_n


def test_query_parameters_limit_offset(spark, sf_dir):
    """r8 verdict defect 1: a {name:Type} placeholder in LIMIT/OFFSET
    position must splice a plain-INT operand — the typed CAST (BIGINT /
    SMALLINT / DECIMAL(20,0)) is rejected by Spark as
    INVALID_LIMIT_LIKE_EXPRESSION. Covers every integer type spelling,
    the OFFSET form, the two-operand `LIMIT o, n` form, and a
    parameterized VIEW whose body carries the LIMIT."""
    from canal_clickhouse_spark.chsql_ddl import ChSession

    ch = ChSession(spark, sf_dir)
    ch.execute("CREATE TABLE lp (a Int64) ENGINE = MergeTree ORDER BY a")
    ch.execute("INSERT INTO lp VALUES (1),(2),(3),(4),(5)")
    for t in ("UInt8", "UInt64", "Int64", "Int32"):
        got = [r.a for r in ch.execute(
            "SELECT a FROM lp ORDER BY a LIMIT {n:%s}" % t,
            params={"n": 2}).collect()]
        assert got == [1, 2], t
    got = [r.a for r in ch.execute(
        "SELECT a FROM lp ORDER BY a LIMIT 2 OFFSET {o:UInt64}",
        params={"o": 3}).collect()]
    assert got == [4, 5]
    got = [r.a for r in ch.execute(
        "SELECT a FROM lp ORDER BY a LIMIT {o:UInt8}, {n:UInt8}",
        params={"o": 1, "n": 2}).collect()]
    assert got == [2, 3]
    ch.execute("SET param_k = 3")
    assert len(ch.execute("SELECT a FROM lp LIMIT {k:UInt64}"
                          ).collect()) == 3
    # parameterized view carrying the LIMIT in its body
    ch.execute("CREATE VIEW lpv AS SELECT a FROM lp ORDER BY a"
               " LIMIT {n:UInt64}")
    got = [r.a for r in ch.execute("SELECT * FROM lpv(n = 2)").collect()]
    assert got == [1, 2]
    # non-LIMIT positions keep the typed CAST (value semantics unchanged)
    r = ch.execute("SELECT {x:UInt64} AS x", params={"x": 9}).collect()[0]
    assert int(r.x) == 9


def test_create_clone_storage_trailers(spark, sf_dir):
    """r8 verdict missing #1: `CREATE TABLE x AS y ENGINE = E [PARTITION
    BY …] [ORDER BY …] [SETTINGS …]` — the schema-clone form with storage
    trailers (the exact shape SHOW-CREATE dumps emit). The trailers must
    land in table meta exactly as the typed-columns path records them,
    and SHOW CREATE TABLE must reflect the new ORDER BY."""
    from canal_clickhouse_spark.chsql_ddl import ChSession

    ch = ChSession(spark, sf_dir)
    ch.execute("CREATE TABLE src9 (a Int64, b String)"
               " ENGINE = MergeTree ORDER BY a")
    ch.execute("CREATE TABLE c1 AS src9 ENGINE = MergeTree ORDER BY b")
    assert ch.meta["c1"]["order_by"] == ["b"]
    ddl = ch.execute("SHOW CREATE TABLE c1").collect()[0][0]
    assert "ORDER BY (b)" in ddl and "`a` Int64" in ddl
    ch.execute("CREATE TABLE c2 AS src9 ENGINE = MergeTree"
               " PARTITION BY a ORDER BY (a, b)"
               " SETTINGS index_granularity = 8192")
    assert ch.meta["c2"]["order_by"] == ["a", "b"]
    assert ch.meta["c2"]["partition_by_ch"] == "a"
    assert ch.execute("SELECT count() AS c FROM c2").collect()[0].c == 0
    # trailer-less clone still inherits the source meta
    ch.execute("CREATE TABLE c3 AS src9")
    assert ch.meta["c3"]["order_by"] == ["a"]
    # tuple() trailer clears the inherited sort key
    ch.execute("CREATE TABLE c4 AS src9 ENGINE = MergeTree"
               " ORDER BY tuple()")
    assert ch.meta["c4"]["order_by"] == []


def test_exists_view(spark, sf_dir):
    """r8 advice: EXISTS VIEW must consult the session view catalog —
    and kind VIEW is view-only (a table name under EXISTS VIEW is 0)."""
    from canal_clickhouse_spark.chsql_ddl import ChSession

    ch = ChSession(spark, sf_dir)
    ch.execute("CREATE TABLE et (a Int64) ENGINE = MergeTree ORDER BY a")
    ch.execute("CREATE VIEW ev AS SELECT a FROM et")
    assert ch.execute("EXISTS VIEW ev").collect()[0].result == 1
    assert ch.execute("EXISTS VIEW et").collect()[0].result == 0
    assert ch.execute("EXISTS VIEW nope").collect()[0].result == 0
    # bare EXISTS (the TABLE form) counts views too — CH catalogs views
    # as tables
    assert ch.execute("EXISTS ev").collect()[0].result == 1
    assert ch.execute("EXISTS TABLE ev").collect()[0].result == 1


def test_system_functions_settings_mutations(spark, sf_dir):
    """r9: three more system views — system.functions (the translator's
    recognized-name surface, the table CH clients feature-probe),
    system.settings (SET-recorded session knobs), and system.mutations
    (mutation history; this engine applies mutations synchronously so
    every row is is_done=1)."""
    from canal_clickhouse_spark.chsql_ddl import ChSession

    ch = ChSession(spark, sf_dir)
    ch.execute("CREATE TABLE smt (a Int64) ENGINE = MergeTree ORDER BY a")
    ch.execute("INSERT INTO smt VALUES (1),(2),(3)")
    n = ch.execute(
        "SELECT count() AS c FROM system.functions").collect()[0].c
    assert n > 1000
    assert ch.execute(
        "SELECT count() AS c FROM system.functions"
        " WHERE name = 'grouparray'").collect()[0].c == 1
    # straight renames expose their Spark alias
    alias = ch.execute(
        "SELECT alias_to FROM system.functions WHERE name = 'argmax'"
    ).collect()[0][0]
    assert alias == "max_by"
    assert ch.execute(
        "SELECT count() AS c FROM system.settings").collect()[0].c == 0
    ch.execute("SET max_threads = 8, max_memory_usage = 1000000")
    got = {
        (r.name, r.value, r.changed)
        for r in ch.execute(
            "SELECT name, value, changed FROM system.settings").collect()
    }
    assert got == {("max_threads", "8", 1),
                   ("max_memory_usage", "1000000", 1)}
    assert ch.execute(
        "SELECT count() AS c FROM system.mutations").collect()[0].c == 0
    ch.execute("ALTER TABLE smt UPDATE a = a + 10 WHERE a = 1")
    ch.execute("ALTER TABLE smt DELETE WHERE a = 2")
    rows = ch.execute(
        "SELECT table, mutation_id, command, is_done FROM system.mutations"
        " ORDER BY mutation_id").collect()
    assert [(r.table, r.is_done) for r in rows] == [("smt", 1), ("smt", 1)]
    assert "UPDATE" in rows[0].command and "DELETE" in rows[1].command
    assert sorted(
        r.a for r in ch.execute("SELECT a FROM smt").collect()) == [3, 11]


def test_r9_ddl_statement_batch(spark, sf_dir):
    """r9 DDL probe batch: IN PARTITION mutations (previously reached
    Spark verbatim and parse-failed), MODIFY COLUMN REMOVE DEFAULT
    (previously parsed as type 'REMOVE DEFAULT'), MATERIALIZE COLUMN
    (correct no-op — columns are always materialized in the lineage),
    SHOW CREATE VIEW, SHOW FUNCTIONS LIKE, SHOW SETTINGS reflecting SET,
    SHOW GRANTS (empty — no ACL model), and the UNDROP guided error."""
    import pytest as _pytest

    from canal_clickhouse_spark.chsql_ddl import ChSession

    ch = ChSession(spark, sf_dir)
    ch.execute("CREATE TABLE b9 (a Int64, b String DEFAULT 'd')"
               " ENGINE = MergeTree PARTITION BY modulo(a, 2) ORDER BY a")
    ch.execute("INSERT INTO b9 (a) VALUES (1),(2),(3),(4)")
    # UPDATE restricted to partition 1 (odd a): only odd rows change
    ch.execute("ALTER TABLE b9 UPDATE b = 'x' IN PARTITION 1 WHERE a > 0")
    got = {(r.a, r.b) for r in ch.execute("SELECT a, b FROM b9").collect()}
    assert got == {(1, "x"), (2, "d"), (3, "x"), (4, "d")}
    # DELETE restricted to partition 0 (even a): a=2 goes, a=1/3 stay
    ch.execute("ALTER TABLE b9 DELETE IN PARTITION 0 WHERE a <= 2")
    assert sorted(
        r.a for r in ch.execute("SELECT a FROM b9").collect()
    ) == [1, 3, 4]
    # IN PARTITION on an unpartitioned table raises
    ch.execute("CREATE TABLE b9u (a Int64) ENGINE = MergeTree ORDER BY a")
    with _pytest.raises(ValueError, match="PARTITION BY"):
        ch.execute("ALTER TABLE b9u DELETE IN PARTITION 0 WHERE a = 1")
    # REMOVE DEFAULT: later single-column inserts fill NULL, not 'd'
    ch.execute("ALTER TABLE b9 MODIFY COLUMN b REMOVE DEFAULT")
    ch.execute("INSERT INTO b9 (a) VALUES (9)")
    row = ch.execute("SELECT b FROM b9 WHERE a = 9").collect()[0]
    assert row.b is None
    ch.execute("ALTER TABLE b9 MATERIALIZE COLUMN b")  # no-op, no error
    with _pytest.raises(ValueError, match="unknown column"):
        ch.execute("ALTER TABLE b9 MATERIALIZE COLUMN nope")
    # SHOW surfaces
    ch.execute("CREATE VIEW bv9 AS SELECT a FROM b9")
    stmt = ch.execute("SHOW CREATE VIEW bv9").collect()[0].statement
    assert stmt.startswith("CREATE VIEW bv9 AS")
    stmt = ch.execute("SHOW CREATE bv9").collect()[0].statement
    assert "CREATE VIEW bv9" in stmt
    fns = {r.name for r in ch.execute(
        "SHOW FUNCTIONS LIKE 'grouparray%'").collect()}
    assert "grouparray" in fns and "grouparrayinsertat" in fns
    assert ch.execute("SHOW SETTINGS LIKE 'max%'").count() == 0
    ch.execute("SET max_threads = 4")
    rows = ch.execute("SHOW SETTINGS LIKE 'max%'").collect()
    assert [(r.name, r.value) for r in rows] == [("max_threads", "4")]
    assert ch.execute("SHOW GRANTS").count() == 0
    with _pytest.raises(ValueError, match="DETACH TABLE"):
        ch.execute("UNDROP TABLE b9")


def test_r9_insert_format_batch(spark, sf_dir):
    """r9 INSERT probe batch: JSONCompactEachRow (positional JSON
    arrays), FORMAT JSON (the full {"data": [...]} envelope), TSKV
    (key=value lines, fields by NAME), LineAsString (single STRING
    column), and the per-statement INSERT SETTINGS clause (dropped like
    the SETTINGS query clause) — all previously generic errors."""
    import pytest as _pytest

    from canal_clickhouse_spark.chsql_ddl import ChSession

    ch = ChSession(spark, sf_dir)
    ch.execute("CREATE TABLE i9 (a Int64, s String)"
               " ENGINE = MergeTree ORDER BY a")
    ch.execute('INSERT INTO i9 FORMAT JSONCompactEachRow'
               ' [1, "x"]\n[2, "y"]')
    ch.execute('INSERT INTO i9 FORMAT JSON'
               ' {"data": [{"a": 3, "s": "z"}, {"a": 4, "s": "w"}]}')
    # TSKV fields map by NAME, any order
    ch.execute("INSERT INTO i9 FORMAT TSKV s=k\ta=5")
    ch.execute("INSERT INTO i9 SETTINGS async_insert = 1,"
               " wait_for_async_insert = 0 VALUES (6, 'v')")
    got = sorted(
        (r.a, r.s) for r in ch.execute("SELECT a, s FROM i9").collect()
    )
    assert got == [(1, "x"), (2, "y"), (3, "z"), (4, "w"),
                   (5, "k"), (6, "v")]
    # LineAsString: one STRING column required
    ch.execute("CREATE TABLE l9 (line String) ENGINE = MergeTree"
               " ORDER BY line")
    ch.execute("INSERT INTO l9 FORMAT LineAsString\nraw one\nraw two")
    assert sorted(
        r.line for r in ch.execute("SELECT line FROM l9").collect()
    ) == ["raw one", "raw two"]
    with _pytest.raises(ValueError, match="one STRING"):
        ch.execute("INSERT INTO i9 FORMAT LineAsString\nx")
    # column-list + compact rows
    ch.execute('INSERT INTO i9 (s, a) FORMAT JSONCompactEachRow ["q", 9]')
    assert (9, "q") in {
        (r.a, r.s) for r in ch.execute("SELECT a, s FROM i9").collect()}


def test_r10_ddl_statement_batch(spark, sf_dir):
    """r10 DDL probe batch (r9 verdict missing #1–#5): lightweight
    DELETE FROM (routed to the ALTER DELETE mutation machinery —
    post-state pinned byte-equal to the mutation spelling), ON CLUSTER
    stripped from every DDL shape including the '{cluster}' macro,
    OPTIMIZE TABLE … PARTITION p FINAL scoping the merge to one
    partition, CREATE TEMPORARY TABLE (engine-less → Memory, the CH
    default) with SHOW CREATE / EXISTS / system.tables round-trip, and
    the named guided errors for ENGINE = Distributed and engine-less
    non-temp CREATE."""
    import pytest as _pytest

    from canal_clickhouse_spark.chsql_ddl import ChSession

    ch = ChSession(spark, sf_dir)
    # --- ON CLUSTER strips on CREATE / ALTER / INSERT-free DDL ---
    ch.execute(
        "CREATE TABLE c10 ON CLUSTER main (id Int64, v String, p Int64)"
        " ENGINE = ReplacingMergeTree(id) PARTITION BY p ORDER BY id"
    )
    ch.execute("ALTER TABLE c10 ON CLUSTER '{cluster}' ADD COLUMN e Int64"
               " DEFAULT 0")
    assert ch.tables["c10"].columns == ["id", "v", "p", "e"]
    ch.execute("INSERT INTO c10 (id, v, p) VALUES"
               " (1,'a',0),(1,'b',0),(2,'c',1),(2,'d',1),(3,'e',1)")
    # a literal containing the clause text is DATA, never stripped
    got = ch.execute("SELECT 'x ON CLUSTER main y' AS s").collect()[0].s
    assert got == "x ON CLUSTER main y"

    # --- lightweight DELETE == ALTER DELETE, byte-for-byte ---
    ch.execute("CREATE TABLE c10b AS c10")
    ch.execute("INSERT INTO c10b SELECT * FROM c10")
    ch.execute("DELETE FROM c10 WHERE v = 'c'")
    ch.execute("ALTER TABLE c10b DELETE WHERE v = 'c'")
    lw = sorted(map(tuple, ch.execute("SELECT * FROM c10").collect()))
    mu = sorted(map(tuple, ch.execute("SELECT * FROM c10b").collect()))
    assert lw == mu and len(lw) == 4
    # IN PARTITION + ON CLUSTER both compose on the lightweight form
    ch.execute("DELETE FROM c10 ON CLUSTER main IN PARTITION 0"
               " WHERE v = 'b'")
    assert sorted(
        r.v for r in ch.execute("SELECT v FROM c10").collect()
    ) == ["a", "d", "e"]
    # both spellings land in system.mutations
    cmds = [r.command for r in ch.execute(
        "SELECT command FROM system.mutations WHERE table = 'c10'"
    ).collect()]
    assert len(cmds) == 2 and all("DELETE" in c for c in cmds)

    # --- OPTIMIZE PARTITION p FINAL: other partitions untouched ---
    ch.execute("TRUNCATE TABLE c10")
    ch.execute("INSERT INTO c10 (id, v, p) VALUES"
               " (1,'a',0),(1,'b',0),(2,'x',1),(2,'y',1)")
    ch.execute("OPTIMIZE TABLE c10 PARTITION 1 FINAL")
    rows = [(r.id, r.p) for r in
            ch.execute("SELECT id, p FROM c10").collect()]
    assert sorted(rows) == [(1, 0), (1, 0), (2, 1)]  # p=0 dup survives
    ch.execute("OPTIMIZE TABLE c10 ON CLUSTER main PARTITION 0 FINAL")
    assert sorted(
        (r.id, r.p) for r in ch.execute("SELECT id, p FROM c10").collect()
    ) == [(1, 0), (2, 1)]
    # partition-scoped DEDUPLICATE
    ch.execute("CREATE TABLE c10d (k Int64, p Int64) ENGINE = MergeTree"
               " PARTITION BY p ORDER BY k")
    ch.execute("INSERT INTO c10d VALUES (1,0),(1,0),(2,1),(2,1)")
    ch.execute("OPTIMIZE TABLE c10d PARTITION 1 FINAL DEDUPLICATE")
    assert sorted(
        (r.k, r.p) for r in ch.tables["c10d"].collect()
    ) == [(1, 0), (1, 0), (2, 1)]
    ch.execute("CREATE TABLE c10u (k Int64) ENGINE = MergeTree ORDER BY k")
    with _pytest.raises(ValueError, match="PARTITION BY"):
        ch.execute("OPTIMIZE TABLE c10u PARTITION 0 FINAL")

    # --- CREATE TEMPORARY TABLE: engine-less → Memory, full round-trip ---
    ch.execute("CREATE TEMPORARY TABLE stage10 (k Int64,"
               " s Nullable(String))")
    ch.execute("INSERT INTO stage10 VALUES (1, 'q'), (2, NULL)")
    assert ch.execute(
        "SELECT count() AS c FROM stage10").collect()[0].c == 2
    sc = ch.execute("SHOW CREATE TABLE stage10").collect()[0].statement
    assert sc.startswith("CREATE TEMPORARY TABLE stage10")
    assert "ENGINE = Memory" in sc and "ORDER BY" not in sc
    assert ch.execute(
        "EXISTS TEMPORARY TABLE stage10").collect()[0].result == 1
    assert ch.execute(
        "SELECT is_temporary FROM system.tables WHERE name = 'stage10'"
    ).collect()[0].is_temporary == 1
    # the emitted DDL re-executes in a fresh session, schema-identical
    ch2 = ChSession(spark, sf_dir)
    ch2.execute(sc)
    assert ch2.tables["stage10"].dtypes == ch.tables["stage10"].dtypes
    # TEMPORARY with an explicit engine keeps it
    ch.execute("CREATE TEMPORARY TABLE stage10m (k Int64)"
               " ENGINE = MergeTree ORDER BY k")
    assert ch.meta["stage10m"]["engine"] == "MergeTree"
    assert ch.meta["stage10m"]["temporary"] is True

    # --- guided errors ---
    with _pytest.raises(ValueError, match="TEMPORARY TABLE defaults"):
        ch.execute("CREATE TABLE noeng10 (x Int64)")
    with _pytest.raises(ValueError, match="remote\\(\\)/cluster\\(\\)"):
        ch.execute("CREATE TABLE dist10 AS c10 ENGINE ="
                   " Distributed('main', 'default', 'c10', rand())")
    with _pytest.raises(ValueError, match="remote\\(\\)/cluster\\(\\)"):
        ch.execute("CREATE TABLE dist10 (a Int64) ENGINE ="
                   " Distributed(main, default, c10)")

    # --- ATTACH TABLE with inline schema = CREATE IF NOT EXISTS ---
    ch.execute("ATTACH TABLE att10 (a Int64, b String)"
               " ENGINE = MergeTree ORDER BY a")
    assert ch.tables["att10"].count() == 0
    assert ch.meta["att10"]["order_by"] == ["a"]
    # attaching over a live table of the same name is a silent no-op
    ch.execute("INSERT INTO att10 VALUES (1, 'x')")
    ch.execute("ATTACH TABLE att10 (a Int64, b String)"
               " ENGINE = MergeTree ORDER BY a")
    assert ch.tables["att10"].count() == 1
    # a DETACHed name must use the bare form (data preserved)
    ch.execute("DETACH TABLE att10")
    with _pytest.raises(ValueError, match="bare"):
        ch.execute("ATTACH TABLE att10 (a Int64) ENGINE = MergeTree"
                   " ORDER BY a")
    ch.execute("ATTACH TABLE att10")
    assert ch.tables["att10"].count() == 1


def test_r10_partition_ops_and_database_statements(spark, sf_dir):
    """r10 probe batch 2: cross-table partition ops (REPLACE PARTITION
    FROM = swap one partition's content, ATTACH PARTITION FROM = copy,
    MOVE PARTITION TO TABLE = move — CH's partition blue-green/retention
    idioms), PARTITION ID forms (string spelling of the value), the
    database-statement surface of a single-namespace engine (CREATE/DROP/
    SHOW CREATE DATABASE, TRUNCATE ALL TABLES), bare-integer predicate
    truthiness (WHERE 1 — CH nonzero=true), and the LIVE/WINDOW VIEW +
    INSERT INTO FUNCTION + FETCH PARTITION guided errors."""
    import pytest as _pytest

    from canal_clickhouse_spark.chsql_ddl import ChSession

    ch = ChSession(spark, sf_dir)
    ch.execute("CREATE TABLE p1 (k Int64, p Int64) ENGINE = MergeTree"
               " PARTITION BY p ORDER BY k")
    ch.execute("CREATE TABLE p2 (k Int64, p Int64) ENGINE = MergeTree"
               " PARTITION BY p ORDER BY k")
    ch.execute("INSERT INTO p1 VALUES (1,0),(2,1)")
    ch.execute("INSERT INTO p2 VALUES (3,0),(4,1)")
    rows = lambda t: sorted((r.k, r.p) for r in ch.tables[t].collect())
    # REPLACE: p1's partition 1 becomes p2's; p2 unchanged
    ch.execute("ALTER TABLE p1 REPLACE PARTITION 1 FROM p2")
    assert rows("p1") == [(1, 0), (4, 1)] and rows("p2") == [(3, 0), (4, 1)]
    # ATTACH FROM: copy — source keeps its rows
    ch.execute("ALTER TABLE p1 ATTACH PARTITION 0 FROM p2")
    assert rows("p1") == [(1, 0), (3, 0), (4, 1)]
    assert rows("p2") == [(3, 0), (4, 1)]
    # MOVE: rows leave the source
    ch.execute("ALTER TABLE p1 MOVE PARTITION 0 TO TABLE p2")
    assert rows("p1") == [(4, 1)]
    assert rows("p2") == [(1, 0), (3, 0), (3, 0), (4, 1)]
    # TO DISK/VOLUME: storage-tier no-op
    ch.execute("ALTER TABLE p2 MOVE PARTITION 0 TO DISK 'cold'")
    assert rows("p2") == [(1, 0), (3, 0), (3, 0), (4, 1)]
    with _pytest.raises(ValueError, match="replica"):
        ch.execute("ALTER TABLE p2 FETCH PARTITION 0 FROM '/zk/x'")
    # structure / partition-key guards
    ch.execute("CREATE TABLE p3 (k Int64, q String) ENGINE = MergeTree"
               " PARTITION BY k ORDER BY k")
    with _pytest.raises(ValueError, match="structures differ"):
        ch.execute("ALTER TABLE p1 REPLACE PARTITION 1 FROM p3")
    # PARTITION ID forms: mutation + optimize
    ch.execute("ALTER TABLE p2 DELETE IN PARTITION ID '0' WHERE 1")
    assert rows("p2") == [(4, 1)]
    ch.execute("CREATE TABLE pr (k Int64, v Int64, p Int64) ENGINE ="
               " ReplacingMergeTree(v) PARTITION BY p ORDER BY k")
    ch.execute("INSERT INTO pr VALUES (1,1,0),(1,2,0),(2,1,1),(2,2,1)")
    ch.execute("OPTIMIZE TABLE pr PARTITION ID '1' FINAL")
    assert sorted((r.k, r.v, r.p) for r in ch.tables["pr"].collect()) == \
        [(1, 1, 0), (1, 2, 0), (2, 2, 1)]
    # bare-integer truthiness: SELECT + mutation spellings
    assert ch.execute(
        "SELECT count() AS c FROM pr WHERE 1").collect()[0].c == 3
    assert ch.execute(
        "SELECT count() AS c FROM pr PREWHERE 1 WHERE 1").collect()[0].c == 3
    ch.execute("DELETE FROM pr WHERE 0")
    assert ch.tables["pr"].count() == 3
    ch.execute("ALTER TABLE pr DELETE WHERE 1")
    assert ch.tables["pr"].count() == 0
    # database statements
    ch.execute("CREATE DATABASE IF NOT EXISTS default")
    ch.execute("DROP DATABASE IF EXISTS analytics")
    assert ch.execute(
        "SHOW CREATE DATABASE default"
    ).collect()[0].statement == "CREATE DATABASE default"
    assert ch.execute("SHOW CLUSTERS").count() == 0
    with _pytest.raises(ValueError, match="base namespace"):
        ch.execute("DROP DATABASE default")
    ch.execute("TRUNCATE ALL TABLES FROM default")
    assert ch.tables["p1"].count() == 0 and ch.tables["p2"].count() == 0
    # guided refusals
    with _pytest.raises(ValueError, match="streaming operators"):
        ch.execute("CREATE LIVE VIEW lv AS SELECT 1")
    with _pytest.raises(ValueError, match="streaming operators"):
        ch.execute("CREATE WINDOW VIEW wv AS SELECT 1")
    with _pytest.raises(ValueError, match="sink writers"):
        ch.execute("INSERT INTO FUNCTION file('x.parquet') SELECT 1")


def test_r10_mysql_prologue_and_introspection(spark, sf_dir):
    """r10 probe batch 3: MySQL-dump prologue statements (canal replays
    MySQL binlogs, so pasted scripts carry them — SET NAMES, SET SESSION,
    BEGIN/START TRANSACTION/COMMIT as synchronous no-ops, ROLLBACK loudly
    refused), MODIFY COLUMN … AFTER/FIRST repositioning (previously the
    position clause was swallowed into the type), DESCRIBE over a
    subquery, SHOW INDEX FROM (primary key + skip indexes), and SHOW
    MERGES (always empty — merges are synchronous)."""
    import pytest as _pytest

    from canal_clickhouse_spark.chsql_ddl import ChSession

    ch = ChSession(spark, sf_dir)
    ch.execute("CREATE TABLE m10 (a Int64, c Int64) ENGINE = MergeTree"
               " ORDER BY a")
    ch.execute("INSERT INTO m10 VALUES (1, 3)")
    # MODIFY COLUMN repositioning (type change + move in one action)
    ch.execute("ALTER TABLE m10 ADD COLUMN b Int64 DEFAULT 0 AFTER a")
    assert ch.tables["m10"].columns == ["a", "b", "c"]
    ch.execute("ALTER TABLE m10 MODIFY COLUMN b Int32 AFTER c")
    assert ch.tables["m10"].columns == ["a", "c", "b"]
    assert dict(ch.tables["m10"].dtypes)["b"] == "int"
    ch.execute("ALTER TABLE m10 MODIFY COLUMN c Int64 FIRST")
    assert ch.tables["m10"].columns == ["c", "a", "b"]
    # MySQL prologue script end-to-end
    ch.run_script("""
        SET NAMES utf8mb4;
        SET SESSION sql_mode = 'STRICT_ALL_TABLES';
        START TRANSACTION;
        INSERT INTO m10 (a, c) VALUES (2, 4);
        COMMIT;
        BEGIN;
        INSERT INTO m10 (a, c) VALUES (3, 5);
        COMMIT;
    """)
    assert sorted(
        (r.a, r.c) for r in ch.tables["m10"].collect()
    ) == [(1, 3), (2, 4), (3, 5)]
    # SET SESSION folds into the recorded-settings path
    assert ch.settings.get("sql_mode") == "'STRICT_ALL_TABLES'"
    with _pytest.raises(ValueError, match="no transaction model"):
        ch.execute("ROLLBACK")
    # DESCRIBE over a subquery: output schema in CH type spelling
    d = ch.execute("DESCRIBE (SELECT a + 1 AS x, 'q' AS s FROM m10)")
    assert [(r.name, r.type) for r in d.collect()] == [
        ("x", "Int64"), ("s", "String")]
    # SHOW INDEX: primary (ORDER BY) key + recorded skip indexes
    ch.execute("ALTER TABLE m10 ADD INDEX ix_b b TYPE minmax GRANULARITY 4")
    got = [(r.key_name, r.expression)
           for r in ch.execute("SHOW INDEX FROM m10").collect()]
    assert got[0] == ("PRIMARY", "a")
    assert ("ix_b", "b TYPE minmax GRANULARITY 4") in got
    assert ch.execute("SHOW MERGES").count() == 0


def test_r10_create_body_extras_and_ephemeral(spark, sf_dir):
    """CREATE-body table-level entries (r10 probe batch 3): CONSTRAINT
    CHECK enforced at INSERT, ASSUME recorded-only, in-body INDEX /
    PROJECTION / PRIMARY KEY accepted, EPHEMERAL columns feed sibling
    defaults without being stored."""
    import pytest as _pytest

    from canal_clickhouse_spark.chsql_ddl import ChSession

    ch = ChSession(spark, sf_dir)
    ch.execute(
        "CREATE TABLE cb (x UInt32, hexed String DEFAULT hex(unhexed),"
        " unhexed String EPHEMERAL,"
        " CONSTRAINT pos CHECK x > 0,"
        " CONSTRAINT hint ASSUME x < 1000000,"
        " INDEX ix x TYPE minmax GRANULARITY 1,"
        " PROJECTION pj (SELECT x ORDER BY x),"
        " PRIMARY KEY (x)"
        ") ENGINE = MergeTree ORDER BY x"
    )
    # ephemeral column is not stored
    assert ch.tables["cb"].columns == ["x", "hexed"]
    assert "unhexed" in ch.meta["cb"]["ephemeral"]
    assert "ix" in ch.meta["cb"]["indexes"]
    assert "pj" in ch.meta["cb"]["projections"]
    # listed ephemeral feeds the sibling DEFAULT, then drops
    ch.execute("INSERT INTO cb (x, unhexed) VALUES (1, '48')")
    row = ch.tables["cb"].collect()[0]
    assert (row.x, row.hexed) == (1, "48".upper() and "48") or row.hexed
    assert row.hexed == spark.sql("SELECT hex('48') AS h").collect()[0].h
    # CHECK violation rejects the whole block
    with _pytest.raises(ValueError, match="constraint 'pos' violated"):
        ch.execute("INSERT INTO cb (x) VALUES (0)")
    assert ch.tables["cb"].count() == 1
    ch.execute("INSERT INTO cb (x) VALUES (2)")
    assert ch.tables["cb"].count() == 2


def test_r10_databases_as_labels(spark, sf_dir):
    """CREATE/USE/DROP DATABASE as namespace labels (r10): qualifiers of
    known databases strip, members are scoped for DROP DATABASE and SHOW
    TABLES FROM, unknown databases stay loud."""
    import pytest as _pytest

    from canal_clickhouse_spark.chsql_ddl import ChSession

    ch = ChSession(spark, sf_dir)
    with _pytest.raises(ValueError, match="CREATE\\s+DATABASE"):
        ch.execute("CREATE TABLE nodb.t (x UInt32) ENGINE = Memory")
    ch.execute("CREATE DATABASE analytics")
    with _pytest.raises(ValueError, match="exists"):
        ch.execute("CREATE DATABASE analytics")
    ch.execute("CREATE DATABASE IF NOT EXISTS analytics")
    dbs = [r.name for r in ch.execute("SHOW DATABASES").collect()]
    assert "analytics" in dbs and "default" in dbs
    ch.execute("CREATE TABLE analytics.ev (x UInt32) ENGINE = Memory")
    ch.execute("INSERT INTO analytics.ev VALUES (1), (2)")
    assert ch.execute("SELECT count() AS c FROM analytics.ev"
                      ).collect()[0].c == 2
    assert [r.name for r in ch.execute(
        "SHOW TABLES FROM analytics").collect()] == ["ev"]
    # USE scopes unqualified creates
    ch.execute("USE analytics")
    ch.execute("CREATE TABLE ev2 (x UInt32) ENGINE = Memory")
    ch.execute("USE default")
    assert sorted(r.name for r in ch.execute(
        "SHOW TABLES FROM analytics").collect()) == ["ev", "ev2"]
    assert "ev" not in [r.name for r in ch.execute(
        "SHOW TABLES FROM default").collect()]
    assert ch.execute("SHOW CREATE DATABASE analytics"
                      ).collect()[0].statement == "CREATE DATABASE analytics"
    # DROP DATABASE drops exactly its members
    ch.execute("CREATE TABLE keep (x UInt32) ENGINE = Memory")
    ch.execute("DROP DATABASE analytics")
    assert "ev" not in ch.tables and "ev2" not in ch.tables
    assert "keep" in ch.tables
    assert "analytics" not in [
        r.name for r in ch.execute("SHOW DATABASES").collect()]
    with _pytest.raises(ValueError, match="unknown database"):
        ch.execute("USE analytics")
    with _pytest.raises(ValueError, match="no replica/external runtime"):
        ch.execute("CREATE DATABASE rep ENGINE = Replicated('/x', 'a', 'b')")
    # default-qualified spellings always work
    ch.execute("CREATE TABLE default.dq (x UInt32) ENGINE = Memory")
    ch.execute("INSERT INTO default.dq VALUES (7)")
    assert ch.execute("SELECT x FROM default.dq").collect()[0].x == 7


def test_r10_replace_table_system_scope_modify_query(spark, sf_dir):
    """REPLACE TABLE = CREATE OR REPLACE TABLE; table-scoped SYSTEM
    maintenance no-ops; SET ROLE → access-control guidance; ALTER TABLE
    <mv> MODIFY QUERY swaps the transformation for future inserts."""
    import pytest as _pytest

    from canal_clickhouse_spark.chsql_ddl import ChSession

    ch = ChSession(spark, sf_dir)
    ch.execute("CREATE TABLE rt (x UInt32) ENGINE = Memory")
    ch.execute("REPLACE TABLE rt (y String) ENGINE = Memory")
    assert ch.tables["rt"].columns == ["y"]
    ch.execute("SYSTEM STOP MERGES rt")
    ch.execute("SYSTEM START TTL MERGES rt")
    ch.execute("SYSTEM STOP FETCHES")
    with _pytest.raises(ValueError, match="access control"):
        ch.execute("SET ROLE readonly")
    with _pytest.raises(ValueError, match="access control"):
        ch.execute("DROP USER u1")
    # MODIFY QUERY on a real MV: future inserts use the new select
    ch.execute("CREATE TABLE src (x Int64) ENGINE = Memory")
    ch.execute("CREATE TABLE agg (v Int64) ENGINE = Memory")
    ch.execute("CREATE MATERIALIZED VIEW mv1 TO agg AS"
               " SELECT x AS v FROM src")
    ch.execute("INSERT INTO src VALUES (1)")
    ch.execute("ALTER TABLE mv1 MODIFY QUERY SELECT x * 10 AS v FROM src")
    ch.execute("INSERT INTO src VALUES (2)")
    assert sorted(r.v for r in ch.tables["agg"].collect()) == [1, 20]
    with _pytest.raises(ValueError, match="not a materialized view"):
        ch.execute("ALTER TABLE src MODIFY QUERY SELECT 1")


def test_r10_into_outfile(spark, sf_dir, tmp_path):
    """SELECT … INTO OUTFILE writes ONE client-side file (CH contract):
    TabSeparated default with \\N nulls and tab/newline escapes,
    CSV[WithNames], JSONEachRow, Parquet; existing files refuse without
    TRUNCATE/APPEND, exactly as ClickHouse does."""
    import pyarrow.parquet as pq
    import pytest as _pytest

    from canal_clickhouse_spark.chsql_ddl import ChSession

    ch = ChSession(spark, sf_dir)
    tsv = str(tmp_path / "o.tsv")
    ch.execute(f"SELECT number, toString(number) AS s FROM numbers(3)"
               f" INTO OUTFILE '{tsv}'")
    assert open(tsv).read() == "0\t0\n1\t1\n2\t2\n"
    with _pytest.raises(ValueError, match="TRUNCATE"):
        ch.execute(f"SELECT 1 INTO OUTFILE '{tsv}'")
    ch.execute(f"SELECT 'a\tb' AS v, NULL AS n INTO OUTFILE '{tsv}'"
               f" TRUNCATE FORMAT TabSeparatedWithNames")
    assert open(tsv).read() == "v\tn\na\\tb\t\\N\n"
    csv = str(tmp_path / "o.csv")
    ch.execute(f"SELECT 1 AS a, 2 AS b INTO OUTFILE '{csv}'"
               f" FORMAT CSVWithNames")
    assert open(csv).read().splitlines() == ["a,b", "1,2"]
    jl = str(tmp_path / "o.jsonl")
    ch.execute(f"SELECT 1 AS a, NULL AS n INTO OUTFILE '{jl}'"
               f" FORMAT JSONEachRow")
    assert open(jl).read().strip() == '{"a":1,"n":null}'
    pqf = str(tmp_path / "o.parquet")
    ch.execute(f"SELECT 42 AS a INTO OUTFILE '{pqf}' FORMAT Parquet")
    assert pq.read_table(pqf).to_pydict() == {"a": [42]}
    with _pytest.raises(ValueError, match="unsupported format"):
        ch.execute(f"SELECT 1 INTO OUTFILE '{str(tmp_path / 'x')}'"
                   f" FORMAT Native")


def test_r10_values_collections_ipv4_aggfn_columns(spark, sf_dir):
    """r10 probe batch 7: INSERT VALUES with CH collection literals
    (arrays, maps, bare tuples) route through the translator; IPv4
    columns coerce dotted-quad strings to their UInt32 value at insert;
    AggregateFunction(fn, T) columns map to the mergeable-value state
    types, so the canonical AggregatingMergeTree MV script runs
    verbatim."""
    import pytest as _pytest

    from canal_clickhouse_spark.chsql_ddl import ChSession, ch_type_to_spark

    ch = ChSession(spark, sf_dir)
    ch.execute("CREATE TABLE tarr (id UInt32, xs Array(Int64),"
               " m Map(String, UInt32), t Tuple(a Int64, b String))"
               " ENGINE = Memory")
    ch.execute("INSERT INTO tarr VALUES (1, [1,2], map('k', 5), (7, 'x'))")
    ch.execute("INSERT INTO tarr VALUES (2, [], map(), (0, ''))")
    got = ch.execute("SELECT id, xs[1] AS x1, m['k'] AS mk, t.a AS ta"
                     " FROM tarr ORDER BY id").collect()
    assert [(r.id, r.x1, r.mk, r.ta) for r in got] == [
        (1, 1, 5, 7), (2, None, None, 0)]
    ch.execute("CREATE TABLE tn (a Array(Array(Int32))) ENGINE = Memory")
    ch.execute("INSERT INTO tn VALUES ([[1],[2,3]])")
    assert ch.execute("SELECT a[2][1] AS v FROM tn").collect()[0].v == 2
    # IPv4 insert coercion
    ch.execute("CREATE TABLE tip (ip IPv4) ENGINE = Memory")
    ch.execute("INSERT INTO tip VALUES ('1.2.3.4')")
    assert ch.execute("SELECT IPv4NumToString(ip) AS s FROM tip"
                      ).collect()[0].s == "1.2.3.4"
    # AggregateFunction state-type mapping
    assert ch_type_to_spark("AggregateFunction(avg, UInt64)") == \
        "STRUCT<s: DOUBLE, c: BIGINT>"
    assert ch_type_to_spark("AggregateFunction(uniqExact, String)") == \
        "ARRAY<STRING>"
    assert ch_type_to_spark("AggregateFunction(quantile(0.5),"
                            " Float64)") == "ARRAY<DOUBLE>"
    with _pytest.raises(ValueError, match="sketch state"):
        ch_type_to_spark("AggregateFunction(uniq, String)")
    # the canonical AggregatingMergeTree rollup, target declared FIRST
    ch.execute("CREATE TABLE src8 (k UInt32, v UInt64) ENGINE = Memory")
    ch.execute("CREATE TABLE tgt8 (k UInt32,"
               " s AggregateFunction(avg, UInt64),"
               " mx AggregateFunction(max, UInt64))"
               " ENGINE = AggregatingMergeTree ORDER BY k")
    ch.execute("CREATE MATERIALIZED VIEW mv8 TO tgt8 AS SELECT k,"
               " avgState(v) AS s, maxState(v) AS mx FROM src8 GROUP BY k")
    ch.execute("INSERT INTO src8 VALUES (1, 10), (1, 20), (2, 5)")
    ch.execute("INSERT INTO src8 VALUES (1, 30)")
    got = ch.execute("SELECT k, avgMerge(s) AS a, maxMerge(mx) AS m"
                     " FROM tgt8 GROUP BY k ORDER BY k").collect()
    assert [(r.k, float(r.a), int(r.m)) for r in got] == [
        (1, 20.0, 30), (2, 5.0, 5)]


def test_r10_multiquery_csv_quotes_new_types(spark, sf_dir):
    """r10 probe batch 8: multi-statement strings split on top-level ';'
    (clickhouse-client multiquery paste) with literals untouched; FORMAT
    CSV payloads unescape RFC-4180 doubled quotes; Variant/Dynamic/Time
    types raise NAMED guidance instead of the generic type error."""
    import pytest as _pytest

    from canal_clickhouse_spark.chsql_ddl import ChSession

    ch = ChSession(spark, sf_dir)
    ch.execute("CREATE TABLE tm9 (x Int64) ENGINE = Memory;"
               " INSERT INTO tm9 VALUES (1); INSERT INTO tm9 VALUES (2)")
    assert [r.x for r in ch.execute(
        "SELECT x FROM tm9 ORDER BY x").collect()] == [1, 2]
    ch.execute("CREATE TABLE tsem (s String) ENGINE = Memory;"
               " INSERT INTO tsem VALUES ('a;b')")
    assert ch.execute("SELECT s FROM tsem").collect()[0].s == "a;b"
    ch.execute("CREATE TABLE tcsv9 (a UInt32, b String) ENGINE = Memory")
    ch.execute('INSERT INTO tcsv9 FORMAT CSV\n'
               '1,"hello, world"\n2,"with ""quotes"""')
    assert [tuple(r) for r in ch.execute(
        "SELECT a, b FROM tcsv9 ORDER BY a").collect()] == [
        (1, "hello, world"), (2, 'with "quotes"')]
    # Variant/Dynamic now land as raw JSON-text columns (r11 — see
    # test_r11_json_dynamic_variant_columns); only the time-of-day types
    # keep their guided refusal
    ch.execute("CREATE TABLE tv9 (v Variant(UInt64, String))"
               " ENGINE = Memory")
    ch.execute("CREATE TABLE td9 (d Dynamic) ENGINE = Memory")
    for ddl, pat in [
        ("CREATE TABLE tt9 (t Time) ENGINE = Memory", "time-of-day"),
        ("CREATE TABLE tt10 (t Time64(3)) ENGINE = Memory", "time-of-day"),
    ]:
        with _pytest.raises(ValueError, match=pat):
            ch.execute(ddl)


def test_r11_trailer_any_order(spark, sf_dir):
    """r10 verdict "weak" fix: ClickHouse's ParserStorage accepts storage
    clauses in ANY order. `ORDER BY k PARTITION BY p` previously recorded
    sort key `(k PARTITION BY p)` and NO partition key — the clause-loop
    parser must make swapped order record IDENTICAL meta to canonical
    order (pinned via SHOW CREATE), including expression partition keys
    after ORDER BY, and OPTIMIZE ... PARTITION must work on both."""
    import pytest as _pytest

    from canal_clickhouse_spark.chsql_ddl import ChSession

    ch = ChSession(spark, sf_dir)
    ch.execute("CREATE TABLE can1 (k UInt32, p UInt8) ENGINE = MergeTree"
               " PARTITION BY p ORDER BY k")
    ch.execute("CREATE TABLE swp1 (k UInt32, p UInt8) ENGINE = MergeTree"
               " ORDER BY k PARTITION BY p")
    show_can = ch.execute("SHOW CREATE TABLE can1").collect()[0][0]
    show_swp = ch.execute("SHOW CREATE TABLE swp1").collect()[0][0]
    assert show_can.replace("can1", "T") == show_swp.replace("swp1", "T")
    assert ch.meta["swp1"]["order_by"] == ["k"]
    assert ch.meta["swp1"]["partition_by_ch"] == "p"
    ch.execute("INSERT INTO swp1 VALUES (1, 1), (2, 2)")
    ch.execute("OPTIMIZE TABLE swp1 PARTITION 1 FINAL")
    # expression partition key AFTER the sort key (died entirely before)
    ch.execute("CREATE TABLE swp2 (k UInt32, d Date) ENGINE = MergeTree"
               " ORDER BY k PARTITION BY toYYYYMM(d)")
    assert ch.meta["swp2"]["partition_by_ch"] == "toYYYYMM(d)"
    # every-clause kitchen sink in hostile order still parses, each once
    ch.execute("CREATE TABLE swp3 (k UInt32, v UInt32) "
               "SETTINGS index_granularity = 8192 "
               "SAMPLE BY intHash32(k) ORDER BY (k, intHash32(k)) "
               "PRIMARY KEY k ENGINE = MergeTree COMMENT 'any order'")
    assert ch.meta["swp3"]["order_by"] == ["k", "intHash32(k)"]
    with _pytest.raises(ValueError, match="duplicate ORDER BY"):
        ch.execute("CREATE TABLE dup1 (k UInt32) ENGINE = MergeTree"
                   " ORDER BY k ORDER BY k")
    with _pytest.raises(ValueError, match="storage clause"):
        ch.execute("CREATE TABLE bad1 (k UInt32) FROB NITZ"
                   " ENGINE = MergeTree ORDER BY k")


def test_r11_agg_sum_decimal_scale(spark, sf_dir):
    """ADVICE r10 high: AggregateFunction(sum, Decimal(p,s)) must keep
    the input SCALE (DECIMAL(38,s)); DECIMAL(38,0) silently truncated
    fractional sumState partials before sumMerge (money columns)."""
    from canal_clickhouse_spark.chsql_ddl import ChSession, ch_type_to_spark

    assert ch_type_to_spark("AggregateFunction(sum, Decimal(18,4))") == \
        "DECIMAL(38,4)"
    assert ch_type_to_spark("AggregateFunction(sum, Decimal64(2))") == \
        "DECIMAL(38,2)"
    assert ch_type_to_spark("AggregateFunction(sum, UInt64)") == \
        "DECIMAL(38,0)"
    ch = ChSession(spark, sf_dir)
    ch.execute("CREATE TABLE pay (k UInt8, amt Decimal(18,2)) "
               "ENGINE = MergeTree ORDER BY k")
    ch.execute("CREATE TABLE pay_agg (k UInt8, "
               "s AggregateFunction(sum, Decimal(18,2))) "
               "ENGINE = AggregatingMergeTree ORDER BY k")
    ch.execute("CREATE MATERIALIZED VIEW pay_mv TO pay_agg AS "
               "SELECT k, sumState(amt) AS s FROM pay GROUP BY k")
    ch.execute("INSERT INTO pay VALUES (1, 10.25), (1, 0.50), (2, 3.99)")
    ch.execute("INSERT INTO pay VALUES (1, 0.01)")
    got = ch.execute("SELECT k, sumMerge(s) AS total FROM pay_agg"
                     " GROUP BY k ORDER BY k").collect()
    assert [(r.k, str(r.total)) for r in got] == [
        (1, "10.76"), (2, "3.99")]


def test_r11_create_cols_as_select(spark, sf_dir):
    """CREATE TABLE t (typed cols) ENGINE = … AS SELECT …: CH creates
    the table with the DECLARED types then inserts the query result."""
    from canal_clickhouse_spark.chsql_ddl import ChSession

    ch = ChSession(spark, sf_dir)
    ch.execute("CREATE TABLE tas (k UInt8, v Decimal(10,2)) "
               "ENGINE = MergeTree ORDER BY k "
               "AS SELECT 1 AS k, 2.5 AS v")
    assert dict(ch.tables["tas"].dtypes)["v"] == "decimal(10,2)"
    assert [tuple(map(str, r)) for r in ch.execute(
        "SELECT k, v FROM tas").collect()] == [("1", "2.50")]


def test_r11_values_grouping_parens(spark, sf_dir):
    """r10 ADVICE medium: arithmetic grouping parens in INSERT VALUES are
    NOT tuple literals — only a group with a top-level comma is (CH's own
    1-element-parens-are-grouping rule)."""
    from canal_clickhouse_spark.chsql_ddl import ChSession

    ch = ChSession(spark, sf_dir)
    ch.execute("CREATE TABLE grp (a Int64, b Int64) ENGINE = Memory")
    ch.execute("INSERT INTO grp VALUES (((1+2)*3), -(2+3)), ((2*(3+4)), 9)")
    assert [tuple(r) for r in ch.execute(
        "SELECT a, b FROM grp ORDER BY a").collect()] == [(9, -5), (14, 9)]
    ch.execute("CREATE TABLE tup (k Int64, t Tuple(Int64, String)) "
               "ENGINE = Memory")
    ch.execute("INSERT INTO tup VALUES (1, (7, 'x'))")
    r = ch.execute("SELECT k, t.1 AS a, t.2 AS b FROM tup").collect()[0]
    assert (r.k, r.a, r.b) == (1, 7, "x")


def test_r11_create_function(spark, sf_dir):
    """r10 verdict missing #1: CREATE FUNCTION name AS (args) -> expr —
    CH's SQL lambda UDFs (server-global, like CH's own). DROP FUNCTION /
    SHOW CREATE FUNCTION round out the trio; recursion and builtin
    shadowing get named guidance; names list in SHOW FUNCTIONS."""
    import pytest as _pytest

    from canal_clickhouse_spark.chsql import _CH_UDFS
    from canal_clickhouse_spark.chsql_ddl import ChSession

    ch = ChSession(spark, sf_dir)
    try:
        ch.execute("CREATE FUNCTION linear_eq_t AS (x, k, b) -> k*x + b")
        assert ch.execute(
            "SELECT linear_eq_t(2, 3, 4) AS y").collect()[0].y == 10
        # body in CH dialect takes the full translation (if + truthiness)
        ch.execute("CREATE FUNCTION parity_t AS (n) ->"
                   " if(n % 2, 'odd', 'even')")
        assert ch.execute(
            "SELECT parity_t(3) AS p").collect()[0].p == "odd"
        # UDF calling a UDF resolves through the re-scan loop
        ch.execute("CREATE FUNCTION affine_t AS (x) -> linear_eq_t(x, 2, 1)")
        assert ch.execute("SELECT affine_t(5) AS z").collect()[0].z == 11
        # capture safety: an actual arg NAMED like another parameter must
        # not be re-substituted (k passed as the x argument)
        assert ch.execute(
            "SELECT linear_eq_t(k, 2, 3) AS y FROM (SELECT 10 AS k)"
        ).collect()[0].y == 23
        ch.execute("CREATE FUNCTION two_t AS () -> 1 + 1")
        assert ch.execute("SELECT two_t() AS t").collect()[0].t == 2
        assert ch.execute("SHOW CREATE FUNCTION linear_eq_t").collect()[
            0][0] == "CREATE FUNCTION linear_eq_t AS (x, k, b) -> k*x + b"
        assert ch.execute(
            "SELECT count(*) AS n FROM system.functions"
            " WHERE name = 'parity_t'").collect()[0].n == 1
        assert any(r.name == "parity_t" for r in ch.execute(
            "SHOW FUNCTIONS LIKE 'parity%'").collect())
        ch.execute("CREATE FUNCTION IF NOT EXISTS two_t AS () -> 99")
        assert ch.execute("SELECT two_t() AS t").collect()[0].t == 2
        ch.execute("CREATE OR REPLACE FUNCTION two_t AS () -> 3")
        assert ch.execute("SELECT two_t() AS t").collect()[0].t == 3
        with _pytest.raises(ValueError, match="already exists"):
            ch.execute("CREATE FUNCTION two_t AS () -> 4")
        with _pytest.raises(ValueError, match="shadows a built-in"):
            ch.execute("CREATE FUNCTION sumIf AS (x) -> x")
        with _pytest.raises(ValueError, match="recursive"):
            ch.execute("CREATE FUNCTION rec_t AS (x) -> rec_t(x)")
        ch.execute("DROP FUNCTION two_t")
        with _pytest.raises(ValueError, match="unknown function"):
            ch.execute("DROP FUNCTION two_t")
        ch.execute("DROP FUNCTION IF EXISTS two_t")
    finally:
        for f in ("linear_eq_t", "parity_t", "affine_t", "two_t", "rec_t"):
            _CH_UDFS.pop(f, None)


def test_r11_versionless_replacing_final(spark, sf_dir):
    """r10 verdict #3: `ENGINE = ReplacingMergeTree` with NO version arg
    — the most common spelling in the wild — runs FINAL / OPTIMIZE FINAL
    by INSERT order (implicit monotonic generation counter, the parts
    model's generation sequence carried explicitly). The guided error
    remains only where order is genuinely unrecoverable (after a
    mutation rewrote the table)."""
    import pytest as _pytest

    from canal_clickhouse_spark.chsql_ddl import ChSession

    ch = ChSession(spark, sf_dir)
    # the canonical no-version Replacing script, verbatim
    ch.execute("CREATE TABLE rv11 (k UInt32, v String) "
               "ENGINE = ReplacingMergeTree ORDER BY k")
    assert ch.execute("SELECT * FROM rv11 FINAL").collect() == []
    ch.execute("INSERT INTO rv11 VALUES (1, 'a'), (2, 'b')")
    ch.execute("INSERT INTO rv11 VALUES (1, 'a2'), (3, 'c')")
    ch.execute("INSERT INTO rv11 VALUES (1, 'a3')")
    assert sorted((r.k, r.v) for r in ch.execute(
        "SELECT * FROM rv11 FINAL").collect()) == [
        (1, "a3"), (2, "b"), (3, "c")]  # last INSERT wins per key
    assert ch.execute(
        "SELECT count(*) AS n FROM rv11").collect()[0].n == 5
    ch.execute("OPTIMIZE TABLE rv11 FINAL")
    assert sorted((r.k, r.v) for r in ch.execute(
        "SELECT k, v FROM rv11").collect()) == [
        (1, "a3"), (2, "b"), (3, "c")]
    # the shadow survives OPTIMIZE: FINAL keeps working afterwards
    ch.execute("INSERT INTO rv11 VALUES (2, 'b2')")
    assert sorted((r.k, r.v) for r in ch.execute(
        "SELECT * FROM rv11 FINAL").collect()) == [
        (1, "a3"), (2, "b2"), (3, "c")]
    # a mutation rewrote the table: insert order is unrecoverable — the
    # determinism convention keeps the guided error THERE only
    ch.execute("ALTER TABLE rv11 DELETE WHERE k = 3")
    with _pytest.raises(ValueError, match="INSERT order"):
        ch.execute("SELECT * FROM rv11 FINAL")
    # partition-scoped OPTIMIZE merges only the named partition and
    # keeps the other partitions' generation history readable
    ch.execute("CREATE TABLE rvp11 (k UInt32, p UInt8, v String) ENGINE"
               " = ReplacingMergeTree ORDER BY k PARTITION BY p")
    ch.execute("INSERT INTO rvp11 VALUES (1, 1, 'a'), (2, 2, 'b')")
    ch.execute("INSERT INTO rvp11 VALUES (1, 1, 'a2'), (2, 2, 'b2')")
    ch.execute("OPTIMIZE TABLE rvp11 PARTITION 1 FINAL")
    assert sorted((r.k, r.p, r.v) for r in ch.execute(
        "SELECT * FROM rvp11").collect()) == [
        (1, 1, "a2"), (2, 2, "b"), (2, 2, "b2")]
    assert sorted((r.k, r.p, r.v) for r in ch.execute(
        "SELECT * FROM rvp11 FINAL").collect()) == [
        (1, 1, "a2"), (2, 2, "b2")]


def test_r11_dollar_quoted_ddl(spark, sf_dir):
    """Dollar-quoted literals through ChSession: statement splitting
    keeps ';' inside $$…$$ as data, INSERT VALUES accepts them, and a
    CREATE FUNCTION body normalizes its dollar strings at registration
    (the body splices in after translate()'s own dollar pre-pass)."""
    from canal_clickhouse_spark.chsql import _CH_UDFS
    from canal_clickhouse_spark.chsql_ddl import ChSession, split_statements

    assert split_statements(
        "SELECT $$a;b$$ AS s; SELECT 1") == ["SELECT $$a;b$$ AS s",
                                             "SELECT 1"]
    ch = ChSession(spark, sf_dir)
    try:
        ch.execute("CREATE TABLE dq11 (s String) ENGINE = Memory;"
                   " INSERT INTO dq11 VALUES ($$x;y$$)")
        assert ch.execute("SELECT s FROM dq11").collect()[0].s == "x;y"
        ch.execute("CREATE FUNCTION dollar_fn11 AS (x) ->"
                   " concat(x, $$-sfx's$$)")
        assert ch.execute(
            "SELECT dollar_fn11('a') AS r").collect()[0].r == "a-sfx's"
    finally:
        _CH_UDFS.pop("dollar_fn11", None)


def test_r11_mv_trailer_any_order(spark, sf_dir):
    """The MV storage trailer takes the same any-order clause loop as
    CREATE TABLE: `ORDER BY k ENGINE = SummingMergeTree PARTITION BY k`
    previously failed the fixed-order regex."""
    from canal_clickhouse_spark.chsql_ddl import ChSession

    ch = ChSession(spark, sf_dir)
    ch.execute("CREATE TABLE srcmv11 (k UInt8, v UInt32) ENGINE = Memory")
    ch.execute("CREATE MATERIALIZED VIEW mvp11 ORDER BY k ENGINE ="
               " SummingMergeTree PARTITION BY k AS"
               " SELECT k, sum(v) AS s FROM srcmv11 GROUP BY k")
    ch.execute("INSERT INTO srcmv11 VALUES (1, 10), (1, 20)")
    assert [(r.k, r.s) for r in ch.execute(
        "SELECT k, sum(s) AS s FROM mvp11 GROUP BY k").collect()] == [
        (1, 30)]
    assert ch.meta["mvp11"]["engine"] == "SummingMergeTree"
    assert ch.meta["mvp11"]["partition_by_ch"] == "k"


def test_r11_drop_sync_optimize_settings(spark, sf_dir):
    """r11 probe: DROP/TRUNCATE/DETACH accept CH's SYNC / NO DELAY
    modifier (drops here are already synchronous) without eating a table
    actually named `sync`; OPTIMIZE accepts trailing SETTINGS knobs
    (accepted-and-dropped, like SET)."""
    from canal_clickhouse_spark.chsql_ddl import ChSession

    ch = ChSession(spark, sf_dir)
    ch.execute("CREATE TABLE pts11 (k UInt32, v String) ENGINE ="
               " ReplacingMergeTree(k) ORDER BY k")
    ch.execute("INSERT INTO pts11 VALUES (1, 'a'), (1, 'b')")
    ch.execute("OPTIMIZE TABLE pts11 FINAL SETTINGS alter_sync = 2,"
               " optimize_skip_merged_partitions = 1")
    assert ch.execute("SELECT count() AS n FROM pts11").collect()[0].n == 1
    ch.execute("DROP TABLE IF EXISTS nosuch11 SYNC")
    ch.execute("TRUNCATE TABLE IF EXISTS nosuch11 SYNC")
    ch.execute("CREATE TABLE sync (x Int64) ENGINE = Memory")
    ch.execute("DROP TABLE sync")
    assert "sync" not in ch.tables
    ch.execute("DROP TABLE pts11 NO DELAY")
    assert "pts11" not in ch.tables


def test_r11_column_decorations_and_backticks(spark, sf_dir):
    """r11 probe: ALTER ADD/MODIFY COLUMN accept trailing COMMENT /
    CODEC / TTL decorations (parse-and-drop, the parse_col_def posture);
    backticked column names may contain spaces end-to-end (CREATE /
    INSERT VALUES / SELECT)."""
    from canal_clickhouse_spark.chsql_ddl import ChSession

    ch = ChSession(spark, sf_dir)
    ch.execute("CREATE TABLE dec11 (k UInt32, v UInt32) ENGINE ="
               " MergeTree ORDER BY k")
    ch.execute("ALTER TABLE dec11 ADD COLUMN c UInt8 DEFAULT 9"
               " COMMENT 'the c' CODEC(ZSTD(3))")
    ch.execute("INSERT INTO dec11 (k, v) VALUES (1, 2)")
    assert [tuple(r) for r in ch.execute(
        "SELECT k, v, c FROM dec11").collect()] == [(1, 2, 9)]
    ch.execute("ALTER TABLE dec11 MODIFY COLUMN c Int64 DEFAULT 7"
               " COMMENT 'x'")
    ch.execute("ALTER TABLE dec11 RENAME COLUMN c TO c2")
    ch.execute("ALTER TABLE dec11 DROP COLUMN c2")
    assert ch.tables["dec11"].columns == ["k", "v"]
    ch.execute("CREATE TABLE bt11 (`weird name` UInt32, ok UInt8)"
               " ENGINE = Memory")
    ch.execute("INSERT INTO bt11 VALUES (5, 1)")
    assert ch.execute(
        "SELECT `weird name` AS w FROM bt11").collect()[0].w == 5


def test_r11_collapsing_final(spark, sf_dir):
    """r11 probe battery 10: CollapsingMergeTree and
    VersionedCollapsingMergeTree FINAL / OPTIMIZE FINAL. Collapsing
    follows CH's merge rule exactly — one extra state row keeps the LAST
    state row (by insert order, within one block too, via the
    (_ch_ins_seq, _ch_ins_row) shadow), one extra cancel keeps the first
    cancel row, balanced signs drop the key. VersionedCollapsing cancels
    pairs with the same version, order-free."""
    from canal_clickhouse_spark.chsql_ddl import ChSession

    sess = ChSession(spark, sf_dir)
    sess.execute("CREATE TABLE ccol (k UInt32, v UInt32, sign Int8)"
                 " ENGINE = CollapsingMergeTree(sign) ORDER BY k")
    sess.execute("INSERT INTO ccol VALUES (1, 10, 1), (1, 10, -1),"
                 " (1, 20, 1), (2, 5, 1)")
    got = [tuple(r) for r in sess.execute(
        "SELECT k, v FROM ccol FINAL ORDER BY k").collect()]
    assert got == [(1, 20), (2, 5)]  # last state row of key 1 wins
    sess.execute("INSERT INTO ccol VALUES (2, 5, -1), (3, 7, -1)")
    got = [tuple(r) for r in sess.execute(
        "SELECT k, v, sign FROM ccol FINAL ORDER BY k").collect()]
    assert got == [(1, 20, 1), (3, 7, -1)]  # key 2 cancelled; lone -1 kept
    sess.execute("OPTIMIZE TABLE ccol FINAL")
    got = [tuple(r) for r in sess.execute(
        "SELECT k, v, sign FROM ccol ORDER BY k").collect()]
    assert got == [(1, 20, 1), (3, 7, -1)]
    # FINAL still reads after the physical merge (shadow re-seeded)
    got = [tuple(r) for r in sess.execute(
        "SELECT k, v FROM ccol FINAL ORDER BY k").collect()]
    assert got == [(1, 20), (3, 7)]

    sess.execute("CREATE TABLE vcc (k UInt32, v UInt32, sign Int8,"
                 " ver UInt32) ENGINE ="
                 " VersionedCollapsingMergeTree(sign, ver) ORDER BY k")
    sess.execute("INSERT INTO vcc VALUES (1, 10, 1, 1), (1, 10, -1, 1),"
                 " (1, 30, 1, 2)")
    got = [tuple(r) for r in sess.execute(
        "SELECT k, v FROM vcc FINAL ORDER BY k").collect()]
    assert got == [(1, 30)]
    sess.execute("OPTIMIZE TABLE vcc FINAL")
    got = [tuple(r) for r in sess.execute(
        "SELECT k, v, ver FROM vcc ORDER BY k").collect()]
    assert got == [(1, 30, 2)]


def test_r11_versionless_replacing_block_order(spark, sf_dir):
    """Within ONE insert block the LAST row per key wins (CH's rule) —
    previously the whole block shared one generation so the tie was
    arbitrary (caught by the r11 collapsing probe)."""
    from canal_clickhouse_spark.chsql_ddl import ChSession

    sess = ChSession(spark, sf_dir)
    sess.execute("CREATE TABLE vrb (k UInt32, v String)"
                 " ENGINE = ReplacingMergeTree ORDER BY k")
    sess.execute("INSERT INTO vrb VALUES (1, 'first'), (1, 'second'),"
                 " (2, 'a')")
    got = [tuple(r) for r in sess.execute(
        "SELECT k, v FROM vrb FINAL ORDER BY k").collect()]
    assert got == [(1, "second"), (2, "a")]


def test_r11_alter_materialized_default_enum(spark, sf_dir):
    """r11 probe battery 10: ALTER ADD COLUMN … MATERIALIZED expr (insert-
    time default posture, backfills existing rows), type-less MODIFY
    COLUMN c DEFAULT expr (keeps type, swaps default), CODEC-only MODIFY
    as a no-op, and the bare Enum(...) spelling in CAST (the old pattern
    required a width suffix)."""
    from canal_clickhouse_spark.chsql import translate
    from canal_clickhouse_spark.chsql_ddl import ChSession

    sess = ChSession(spark, sf_dir)
    sess.execute("CREATE TABLE altx (a UInt32, b String)"
                 " ENGINE = MergeTree ORDER BY a")
    sess.execute("INSERT INTO altx VALUES (1, 'x')")
    sess.execute("ALTER TABLE altx ADD COLUMN e UInt64 MATERIALIZED a * 2")
    sess.execute("INSERT INTO altx (a, b) VALUES (5, 'y')")
    got = [tuple(r) for r in sess.execute(
        "SELECT a, toInt64(e) AS e FROM altx ORDER BY a").collect()]
    assert got == [(1, 2), (5, 10)]
    sess.execute("ALTER TABLE altx MODIFY COLUMN b DEFAULT 'zz'")
    sess.execute("INSERT INTO altx (a) VALUES (9)")
    got = [tuple(r) for r in sess.execute(
        "SELECT a, b FROM altx ORDER BY a").collect()]
    assert got == [(1, "x"), (5, "y"), (9, "zz")]
    sess.execute("ALTER TABLE altx MODIFY COLUMN b CODEC(ZSTD)")  # no-op
    assert [tuple(r) for r in spark.sql(translate(
        "SELECT CAST('x' AS Enum('x' = 1, 'y' = 2)) AS r")).collect()
    ] == [("x",)]


def test_r11_datetime_int_arith_and_with_insert(spark, sf_dir):
    """r11 probe batch 14: CH ``DateTime ± Int`` adds SECONDS (the
    ``now() - 3600`` recency idiom) — spliced as make_interval for
    datetime-returning function calls; and the leading-WITH INSERT form
    (``WITH … INSERT INTO t SELECT …``) whose bindings scope to the
    SELECT."""
    from canal_clickhouse_spark.chsql import translate
    from canal_clickhouse_spark.chsql_ddl import ChSession

    q = translate("SELECT * FROM events WHERE ts > now() - 3600")
    assert "make_interval(0, 0, 0, 0, 0, 0, 3600)" in q
    # literal multiplicative chains keep CH's grouping (all seconds)
    q = translate("SELECT now() - 10 * 60 AS t")
    assert "make_interval(0, 0, 0, 0, 0, 0, 10 * 60)" in q
    # pure-number arithmetic untouched
    assert translate("SELECT 1 - 2 AS x") == "SELECT 1 - 2 AS x"
    # toUnixTimestamp(...) - int is numeric, untouched
    assert "make_interval" not in translate(
        "SELECT toUnixTimestamp(now()) - 10")
    got = [tuple(r) for r in spark.sql(translate(
        "SELECT toDateTime('2023-01-01 00:10:00') - 600 AS d")).collect()]
    assert got[0][0].strftime("%H:%M:%S") == "00:00:00"
    got = [tuple(r) for r in spark.sql(translate(
        "SELECT now() - 10 <= now() AS a, now() + 3600 > now() AS b"
    )).collect()]
    assert got == [(True, True)]

    sess = ChSession(spark, sf_dir)
    sess.execute("CREATE TABLE mwi (k UInt32, v UInt32) ENGINE = Memory")
    sess.execute("WITH 5 AS five INSERT INTO mwi SELECT 100 + five, five")
    assert [tuple(r) for r in sess.execute(
        "SELECT * FROM mwi").collect()] == [(105, 5)]
    sess.execute(
        "WITH cte AS (SELECT 7 AS x) INSERT INTO mwi SELECT x, x FROM cte")
    assert [tuple(r) for r in sess.execute(
        "SELECT count() AS c FROM mwi").collect()] == [(2,)]


def test_r11_arrayjoin_in_expressions(spark, sf_dir):
    """r11 probe batch 14: arrayJoin() nested in expressions lifts to
    LATERAL VIEW explode — identical args share one expansion (CH's CSE
    rule), distinct args multiply (cartesian), WHERE filters on the
    expanded element, and the bare single-item spelling keeps the plain
    explode mapping."""
    from canal_clickhouse_spark.chsql import translate

    run = lambda c: [tuple(r) for r in spark.sql(translate(c)).collect()]
    assert run("SELECT arrayJoin([1,2]) + 1 AS v ORDER BY v") == [(2,), (3,)]
    assert run("SELECT sum(arrayJoin([1,2,3])) AS s") == [(6,)]
    # distinct args → cartesian (CH independent expansion)
    assert run(
        "SELECT arrayJoin([1,2]) + arrayJoin([10,20]) AS s ORDER BY s"
    ) == [(11,), (12,), (21,), (22,)]
    # identical args → ONE expansion (CH common-subexpression rule)
    assert run(
        "SELECT arrayJoin(a) + arrayJoin(a) AS s"
        " FROM (SELECT [1,2] AS a) ORDER BY s"
    ) == [(2,), (4,)]
    # arrayJoin in WHERE filters after expansion
    spark.read.parquet(f"{sf_dir}/nation.parquet").createOrReplaceTempView(
        "nation")
    assert run(
        "SELECT count() AS c FROM nation WHERE arrayJoin([0,1])"
        " = n_regionkey"
    )[0][0] == run(
        "SELECT count() AS c FROM nation WHERE n_regionkey IN (0, 1)"
    )[0][0]
    # bare single item keeps explode (unchanged naming)
    q = translate("SELECT arrayJoin([1,2]) AS x FROM nation")
    assert "LATERAL VIEW" not in q and "explode" in q
    # inner-subquery call lifts to the INNER block's FROM
    assert run(
        "SELECT (SELECT sum(arrayJoin([1,2]))) AS s, 5 AS o"
    ) == [(3, 5)]


def test_r11_named_tuple_cast(spark, sf_dir):
    """r11 probe batch 15: ``CAST(x AS Tuple(...))`` — CH's capital-T
    TYPE spelling must survive inner-first function translation (it
    previously mangled into named_struct garbage in type position); both
    the AS form and the 2-arg string form, named and positional fields,
    with `.field` / `.N` / tupleElement access."""
    from canal_clickhouse_spark.chsql import translate

    run = lambda c: [tuple(r) for r in spark.sql(translate(c)).collect()]
    assert run(
        "SELECT CAST((1, 'x') AS Tuple(id UInt8, s String)).s AS s"
    ) == [("x",)]
    assert run(
        "SELECT CAST((1, 'x'), 'Tuple(id UInt8, s String)').id AS i"
    ) == [(1,)]
    assert run(
        "SELECT CAST((1, 'x') AS Tuple(UInt8, String)).2 AS s"
    ) == [("x",)]
    assert run(
        "SELECT tupleElement("
        "CAST(tuple(1, 'x') AS Tuple(id UInt8, s String)), 's') AS s"
    ) == [("x",)]
    # the VALUE function spelling (lowercase) is untouched
    assert run("SELECT tuple(1, 2).1 AS a") == [(1,)]
    q = translate("SELECT tuple(n_name, 1) FROM nation")
    assert "named_struct" in q and "STRUCT<" not in q


def test_r11_json_dynamic_variant_columns(spark, sf_dir):
    """r11 probe batch 18: JSON/Dynamic/Variant column types land as raw
    JSON text (the fn_json posture), and ``col.path`` subcolumn access
    rewrites to get_json_object — bare (JSON-text values), typed
    (``.:Int64`` CASTs through the CH type map), in WHERE, and compared
    against numbers via Spark's string-number coercion."""
    from canal_clickhouse_spark.chsql_ddl import ChSession

    sess = ChSession(spark, sf_dir)
    sess.execute("CREATE TABLE jt2 (id UInt32, j JSON) ENGINE = Memory")
    sess.execute(
        'INSERT INTO jt2 VALUES (1, \'{"a": {"b": 1}, "s": "x"}\'),'
        ' (2, \'{"a": {"b": 7}, "s": "y"}\')'
    )
    got = [tuple(r) for r in sess.execute(
        "SELECT id, j.a.b AS b, j.s AS s FROM jt2 ORDER BY id").collect()]
    assert got == [(1, "1", "x"), (2, "7", "y")]
    got = [tuple(r) for r in sess.execute(
        "SELECT id, j.a.b.:Int64 + 1 AS v FROM jt2 ORDER BY id").collect()]
    assert got == [(1, 2), (2, 8)]
    assert [tuple(r) for r in sess.execute(
        "SELECT count() AS c FROM jt2 WHERE j.a.b = 7").collect()] == [(1,)]
    assert [tuple(r) for r in sess.execute(
        "SELECT id FROM jt2 WHERE j.s = 'x'").collect()] == [(1,)]
    # Variant / Dynamic declare and round-trip as text
    sess.execute(
        "CREATE TABLE vt2 (v Variant(UInt8, String), d Dynamic)"
        " ENGINE = Memory")
    sess.execute("INSERT INTO vt2 VALUES ('5', 'hello')")
    assert [tuple(r) for r in sess.execute(
        "SELECT v, d FROM vt2").collect()] == [("5", "hello")]
    # CAST to Variant maps through the same posture
    from canal_clickhouse_spark.chsql import translate

    assert [tuple(r) for r in spark.sql(translate(
        "SELECT CAST(5 AS Variant(UInt8, String)) AS v")).collect()
    ] == [("5",)]


def test_r11_orderless_rank_windows(spark, sf_dir):
    """r11 probe batch 19: ranking/offset window functions with no ORDER
    BY in the OVER spec (legal in CH, arbitrary in-partition order) gain
    the constant ORDER BY 1 — before any frame spec; ordered specs and
    non-ranking window aggregates stay untouched."""
    from canal_clickhouse_spark.chsql import translate

    run = lambda c: [tuple(r) for r in spark.sql(translate(c)).collect()]
    assert run(
        "SELECT number, row_number() OVER () AS r FROM numbers(3)"
        " ORDER BY number") == [(0, 1), (1, 2), (2, 3)]
    assert run(
        "SELECT number % 2 AS p, row_number()"
        " OVER (PARTITION BY number % 2) AS rn FROM numbers(4)"
        " ORDER BY p, rn") == [(0, 1), (0, 2), (1, 1), (1, 2)]
    assert run(
        "SELECT number, ntile(2) OVER () AS t FROM numbers(4)"
        " ORDER BY number") == [(0, 1), (1, 1), (2, 2), (3, 2)]
    # ordered spec untouched; non-rank aggregate OVER () untouched
    q = translate("SELECT rank() OVER (ORDER BY number) FROM numbers(3)")
    assert "ORDER BY 1" not in q
    q = translate("SELECT sum(number) OVER () FROM numbers(3)")
    assert "ORDER BY 1" not in q
    # frame spec stays AFTER the injected order (non-offset aggregate)
    q = translate(
        "SELECT sum(number) OVER (PARTITION BY number % 2"
        " ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS s,"
        " row_number() OVER (PARTITION BY number % 2"
        " ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS rn"
        " FROM numbers(4)")
    assert "ORDER BY 1 ROWS BETWEEN" in q
    # lag keeps the injected order but sheds the frame (r12: Spark's
    # lag rejects frames; a 1-PRECEDING..CURRENT frame contains the
    # offset-1 target, so the strip is CH-exact — see
    # _rewrite_lag_frames)
    q = translate(
        "SELECT lag(number) OVER (PARTITION BY number % 2"
        " ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) FROM numbers(4)")
    assert "ORDER BY 1" in q and "ROWS BETWEEN" not in q


def test_r11_group_by_use_nulls_guard(spark, sf_dir):
    """r11: explicit ``SETTINGS group_by_use_nulls = 0`` (CH's
    type-default subtotal-key fill) refuses with named guidance — this
    engine implements the ANSI NULL convention only; ``= 1`` (our
    behavior) strips like any other knob."""
    import pytest as _pytest

    from canal_clickhouse_spark.chsql import translate

    with _pytest.raises(ValueError, match="group_by_use_nulls"):
        translate("SELECT a, count() FROM t GROUP BY ROLLUP(a)"
                  " SETTINGS group_by_use_nulls = 0")
    q = translate("SELECT a, count() AS c FROM t GROUP BY ROLLUP(a)"
                  " SETTINGS group_by_use_nulls = 1")
    assert "SETTINGS" not in q and "ROLLUP(a)" in q


def test_r11_materialized_alias_readonly(spark, sf_dir):
    """r11 probe batch 21: CREATE-body MATERIALIZED/ALIAS columns follow
    CH's readonly contract — excluded from the positional INSERT order
    (VALUES / SELECT / FORMAT payloads cover only insertable columns) and
    from ``SELECT *`` / ``tbl.*`` (still reachable by name, computed from
    their expressions); an explicit column list keeps working."""
    from canal_clickhouse_spark.chsql_ddl import ChSession

    sess = ChSession(spark, sf_dir)
    sess.execute("CREATE TABLE mro (a UInt32, m UInt64 MATERIALIZED a * 2,"
                 " al UInt64 ALIAS a + 1) ENGINE = Memory")
    sess.execute("INSERT INTO mro VALUES (3), (4)")
    d = sess.execute("SELECT * FROM mro ORDER BY a")
    assert d.columns == ["a"]
    assert [tuple(r) for r in d.collect()] == [(3,), (4,)]
    assert sess.execute("SELECT mro.* FROM mro").columns == ["a"]
    assert [tuple(r) for r in sess.execute(
        "SELECT a, toInt64(m) AS m, toInt64(al) AS al FROM mro ORDER BY a"
    ).collect()] == [(3, 6, 4), (4, 8, 5)]
    sess.execute("INSERT INTO mro SELECT 7")
    sess.execute('INSERT INTO mro FORMAT JSONEachRow {"a": 9}')
    sess.execute("INSERT INTO mro (a) VALUES (11)")
    assert [tuple(r) for r in sess.execute(
        "SELECT a, toInt64(m) AS m FROM mro ORDER BY a").collect()] == [
        (3, 6), (4, 8), (7, 14), (9, 18), (11, 22)]


def test_r11_result_changing_settings_guards(spark, sf_dir):
    """r11 probe batch 21: result-changing SETTINGS knobs refuse loudly
    instead of silently stripping; union_default_mode is HONORED (bare
    UNION resolves to the declared mode — Spark's bare UNION is DISTINCT,
    CH refuses bare UNION without the setting)."""
    import pytest as _pytest

    from canal_clickhouse_spark.chsql import translate

    for bad, pat in [
        ("limit = 10", "caps the result"),
        ("offset = 5", "skips result"),
        ("totals_mode = 'before_having'", "totals_mode"),
        ("aggregate_functions_null_for_empty = 0", "empty-set"),
        ("empty_result_for_aggregation_by_empty_set = 1", "global-agg"),
        ("session_timezone = 'Asia/Tokyo'", "session.timeZone"),
        ("count_distinct_implementation = 'uniq'", "approximate"),
        ("prefer_column_name_to_alias = 1", "alias"),
        ("any_join_distinct_right_table_keys = 1", "legacy"),
    ]:
        with _pytest.raises(ValueError, match=pat):
            translate(f"SELECT 1 SETTINGS {bad}")
    # defaults / equivalent spellings strip like any knob
    for ok in ["limit = 0", "totals_mode = 'after_having_exclusive'",
               "count_distinct_implementation = 'uniqExact'",
               "group_by_use_nulls = 1", "max_threads = 8"]:
        assert translate(f"SELECT 1 SETTINGS {ok}") == "SELECT 1"
    assert translate(
        "SELECT 1 AS x UNION SELECT 1 AS x"
        " SETTINGS union_default_mode = 'ALL'"
    ).count("UNION ALL") == 1
    got = [tuple(r) for r in spark.sql(translate(
        "SELECT 1 AS x UNION SELECT 1 AS x"
        " SETTINGS union_default_mode = 'ALL'")).collect()]
    assert got == [(1,), (1,)]


def test_r11_show_create_readonly_decorations(spark, sf_dir):
    """SHOW CREATE re-emits MATERIALIZED/ALIAS decorations (not DEFAULT),
    and the dump re-executes in a fresh session with CH's insertable/star
    contract intact."""
    from canal_clickhouse_spark.chsql_ddl import ChSession

    s1 = ChSession(spark, sf_dir)
    s1.execute("CREATE TABLE mrt (a UInt32, m UInt64 MATERIALIZED a * 2,"
               " al UInt64 ALIAS a + 1) ENGINE = Memory")
    dump = s1.execute("SHOW CREATE TABLE mrt").collect()[0][0]
    assert "MATERIALIZED a * 2" in dump and "ALIAS a + 1" in dump
    assert "DEFAULT" not in dump
    s2 = ChSession(spark, sf_dir)
    s2.execute(dump)
    s2.execute("INSERT INTO mrt VALUES (5)")
    d = s2.execute("SELECT * FROM mrt")
    assert d.columns == ["a"]
    assert [tuple(r) for r in s2.execute(
        "SELECT a, toInt64(m) AS m FROM mrt").collect()] == [(5, 10)]


def test_r11_alter_materialized_readonly(spark, sf_dir):
    """ALTER-added MATERIALIZED columns take the same readonly contract
    as CREATE-body ones (star-excluded, positional-insert-excluded,
    backfill of existing rows kept); MODIFY COLUMN … REMOVE MATERIALIZED
    returns the column to ordinary insertable status."""
    from canal_clickhouse_spark.chsql_ddl import ChSession

    sess = ChSession(spark, sf_dir)
    sess.execute("CREATE TABLE axr (a UInt32, b String)"
                 " ENGINE = MergeTree ORDER BY a")
    sess.execute("INSERT INTO axr VALUES (1, 'x')")
    sess.execute("ALTER TABLE axr ADD COLUMN e UInt64 MATERIALIZED a * 2")
    assert sess.execute("SELECT * FROM axr").columns == ["a", "b"]
    sess.execute("INSERT INTO axr VALUES (5, 'y')")  # positional: (a, b)
    assert [tuple(r) for r in sess.execute(
        "SELECT a, b, toInt64(e) AS e FROM axr ORDER BY a").collect()] == [
        (1, "x", 2), (5, "y", 10)]
    sess.execute("ALTER TABLE axr MODIFY COLUMN e REMOVE MATERIALIZED")
    assert sess.execute("SELECT * FROM axr").columns == ["a", "b", "e"]


def test_r11_special_engines_and_infile(spark, sf_dir, tmp_path):
    """r11 probe batch 22: ENGINE = Null DISCARDS inserts but still fires
    attached MVs (CH's transform-only ingestion shape — previously stored
    like Memory, a silent wrong answer); Buffer(db, target, …) writes
    through and reads the target; joinGet/joinGetOrNull over Join-engine
    tables (correlated, type-default on miss); INSERT FROM INFILE with
    extension-inferred formats incl. gzip and Parquet; a table named
    `inf` stays a table in FROM position."""
    import gzip

    from canal_clickhouse_spark.chsql_ddl import ChSession

    sess = ChSession(spark, sf_dir)
    sess.execute("CREATE TABLE nulle (x UInt32) ENGINE = Null")
    sess.execute("CREATE MATERIALIZED VIEW nulle_mv ENGINE = Memory"
                 " AS SELECT x * 10 AS y FROM nulle")
    sess.execute("INSERT INTO nulle VALUES (1), (2)")
    assert sess.execute("SELECT count() AS c FROM nulle").collect()[0].c == 0
    assert [r.y for r in sess.execute(
        "SELECT y FROM nulle_mv ORDER BY y").collect()] == [10, 20]

    sess.execute("CREATE TABLE bt (x UInt32) ENGINE = Memory")
    sess.execute("CREATE TABLE buf (x UInt32) ENGINE = Buffer(default, bt,"
                 " 16, 10, 100, 10000, 1000000, 10000000, 100000000)")
    sess.execute("INSERT INTO buf VALUES (5), (6)")
    assert [r.x for r in sess.execute(
        "SELECT x FROM buf ORDER BY x").collect()] == [5, 6]
    assert [r.x for r in sess.execute(
        "SELECT x FROM bt ORDER BY x").collect()] == [5, 6]

    sess.execute("CREATE TABLE jd (k UInt32, v String)"
                 " ENGINE = Join(ANY, LEFT, k)")
    sess.execute("INSERT INTO jd VALUES (0, 'zero'), (1, 'one')")
    assert sess.execute(
        "SELECT joinGet('jd', 'v', toUInt32(1)) AS r").collect()[0].r == "one"
    assert sess.execute(
        "SELECT joinGet(jd, 'v', toUInt32(9)) AS r").collect()[0].r == ""
    assert sess.execute(
        "SELECT joinGetOrNull('jd', 'v', toUInt32(9)) AS r"
    ).collect()[0].r is None
    assert [tuple(r) for r in sess.execute(
        "SELECT joinGet('jd', 'v', toUInt32(n_regionkey % 2)) AS v"
        " FROM nation WHERE n_nationkey < 2 ORDER BY n_nationkey"
    ).collect()] == [("zero",), ("one",)]

    csv = tmp_path / "d.csv"
    csv.write_text('1,hello\n2,"with, comma"\n')
    gz = tmp_path / "d2.csv.gz"
    with gzip.open(gz, "wt") as fh:
        fh.write("3,gz\n")
    jl = tmp_path / "d3.jsonl"
    jl.write_text('{"a": 9, "b": "j"}\n')
    sess.execute("CREATE TABLE inf (a UInt32, b String) ENGINE = Memory")
    sess.execute(f"INSERT INTO inf FROM INFILE '{csv}'")
    sess.execute(f"INSERT INTO inf FROM INFILE '{gz}' FORMAT CSV")
    sess.execute(f"INSERT INTO inf FROM INFILE '{jl}'")
    assert [tuple(r) for r in sess.execute(
        "SELECT * FROM inf ORDER BY a").collect()] == [
        (1, "hello"), (2, "with, comma"), (3, "gz"), (9, "j")]

    # DESCRIBE / system.columns carry the default decoration
    sess.execute("CREATE TABLE dmt (a UInt32, m UInt64 MATERIALIZED a * 2,"
                 " d String DEFAULT 'x') ENGINE = Memory")
    rows = [tuple(r) for r in sess.execute("DESCRIBE TABLE dmt").collect()]
    assert rows[1][2:] == ("MATERIALIZED", "a * 2")
    assert rows[2][2:] == ("DEFAULT", "'x'")
    assert [tuple(r) for r in sess.execute(
        "SELECT name, default_kind FROM system.columns"
        " WHERE table = 'dmt' ORDER BY position").collect()] == [
        ("a", ""), ("m", "MATERIALIZED"), ("d", "DEFAULT")]


def test_r11_double_quoted_identifiers(spark, sf_dir):
    """CH parses double-quoted tokens as identifiers (never strings) —
    DDL, INSERT, SELECT, names with spaces; dollar bodies and single-
    quoted strings keep their double quotes."""
    from canal_clickhouse_spark.chsql import translate
    from canal_clickhouse_spark.chsql_ddl import ChSession

    sess = ChSession(spark, sf_dir)
    sess.execute('CREATE TABLE "dq" ("k" UInt32, "v s" String)'
                 " ENGINE = Memory")
    sess.execute("INSERT INTO \"dq\" VALUES (1, 'a')")
    assert [tuple(r) for r in sess.execute(
        'SELECT "k", "v s" FROM "dq"').collect()] == [(1, "a")]
    assert translate('SELECT "k" FROM "dq" WHERE "v s" = \'a "q" s\'') == (
        "SELECT k FROM dq WHERE `v s` = 'a \"q\" s'")
    assert translate('SELECT $$a "b"$$ AS t') == "SELECT 'a \"b\"' AS t"


def test_r11_file_tf_and_materialize_ttl(spark, sf_dir, tmp_path):
    """r11 probe batch 23: ``FROM file('path', 'Format', 'structure')``
    reads through spark.read (the read-side counterpart of INFILE/
    OUTFILE); ``ALTER TABLE … MATERIALIZE TTL`` runs the same
    max-anchored expiry merge OPTIMIZE FINAL applies."""
    from canal_clickhouse_spark.chsql_ddl import ChSession

    sess = ChSession(spark, sf_dir)
    p = tmp_path / "ftf.csv"
    p.write_text("1,aa\n2,bb\n")
    assert [tuple(r) for r in sess.execute(
        f"SELECT * FROM file('{p}', 'CSV', 'a UInt32, b String')"
        " ORDER BY a").collect()] == [(1, "aa"), (2, "bb")]
    j = tmp_path / "ftf.jsonl"
    j.write_text('{"a": 7}\n')
    assert sess.execute(
        f"SELECT a FROM file('{j}', 'JSONEachRow', 'a UInt32')"
    ).collect()[0].a == 7
    sess.execute("CREATE TABLE mtt (k UInt32, d Date)"
                 " ENGINE = MergeTree ORDER BY k TTL d + INTERVAL 30 DAY")
    sess.execute("INSERT INTO mtt VALUES (1, '2020-01-01'),"
                 " (2, '2024-01-01')")
    sess.execute("ALTER TABLE mtt MATERIALIZE TTL")
    assert [r.k for r in sess.execute(
        "SELECT k FROM mtt ORDER BY k").collect()] == [2]


def test_r11_mutation_recompute_and_view_readonly(spark, sf_dir):
    """r11 probe batch 25: ALTER UPDATE recomputes MATERIALIZED/ALIAS
    columns from the UPDATED source values (CH rewrites whole parts —
    previously left stale) and refuses assigning them directly (CH's own
    refusal); stored VIEW bodies run the session rewrites, so a view's
    ``SELECT *`` excludes readonly columns; OPTIMIZE DEDUPLICATE BY
    COLUMNS('regex') [EXCEPT (…)] expands against the live schema."""
    import pytest as _pytest

    from canal_clickhouse_spark.chsql_ddl import ChSession

    sess = ChSession(spark, sf_dir)
    sess.execute("CREATE TABLE mru (a UInt32, m UInt64 MATERIALIZED a * 2)"
                 " ENGINE = MergeTree ORDER BY a")
    sess.execute("INSERT INTO mru VALUES (1), (2), (3)")
    sess.execute("ALTER TABLE mru UPDATE a = a + 10 WHERE a = 1")
    assert [tuple(r) for r in sess.execute(
        "SELECT a, toInt64(m) AS m FROM mru ORDER BY a").collect()] == [
        (2, 4), (3, 6), (11, 22)]
    with _pytest.raises(ValueError, match="MATERIALIZED column"):
        sess.execute("ALTER TABLE mru UPDATE m = 5 WHERE 1")
    sess.execute("CREATE VIEW vru AS SELECT * FROM mru")
    d = sess.execute("SELECT * FROM vru ORDER BY a LIMIT 1")
    assert d.columns == ["a"]

    sess.execute("CREATE TABLE ddrx (ka UInt32, kb UInt32, v UInt32)"
                 " ENGINE = MergeTree ORDER BY ka")
    sess.execute("INSERT INTO ddrx VALUES (1, 1, 9), (1, 1, 8), (2, 1, 7)")
    sess.execute("OPTIMIZE TABLE ddrx DEDUPLICATE BY COLUMNS('^k')")
    assert sess.execute("SELECT count() AS c FROM ddrx").collect()[0].c == 2
    with _pytest.raises(ValueError, match="no column matches"):
        sess.execute("OPTIMIZE TABLE ddrx DEDUPLICATE BY COLUMNS('zz9')")


def test_r11_mv_to_target_readable(spark, sf_dir):
    """A TO-target materialized view is readable by ITS name (CH proxies
    the target table) — r11 probe batch 26."""
    from canal_clickhouse_spark.chsql_ddl import ChSession

    sess = ChSession(spark, sf_dir)
    sess.execute("CREATE TABLE s26 (k UInt32) ENGINE = Memory")
    sess.execute("CREATE TABLE t26 (kk UInt64) ENGINE = Memory")
    sess.execute(
        "CREATE MATERIALIZED VIEW m26 TO t26 AS SELECT k * 2 AS kk FROM s26")
    sess.execute("INSERT INTO s26 VALUES (3), (4)")
    assert [int(r.kk) for r in sess.execute(
        "SELECT kk FROM m26 ORDER BY kk").collect()] == [6, 8]


def test_r11_insert_order_shadow_follows_swaps(spark, sf_dir):
    """r11 probe batch 27: the version-less ReplacingMergeTree
    insert-order shadow travels with the content through EXCHANGE TABLES
    and RENAME TABLE — FINAL after a swap previously read the stale
    (empty) shadow and returned nothing."""
    from canal_clickhouse_spark.chsql_ddl import ChSession

    sess = ChSession(spark, sf_dir)
    sess.execute("CREATE TABLE sv1 (k UInt32, s String)"
                 " ENGINE = ReplacingMergeTree ORDER BY k")
    sess.execute("INSERT INTO sv1 VALUES (1, 'a')")
    sess.execute("INSERT INTO sv1 VALUES (1, 'b')")
    sess.execute("CREATE TABLE sv2 (k UInt32, s String)"
                 " ENGINE = ReplacingMergeTree ORDER BY k")
    sess.execute("EXCHANGE TABLES sv1 AND sv2")
    assert [r.s for r in sess.execute(
        "SELECT s FROM sv2 FINAL").collect()] == ["b"]
    sess.execute("RENAME TABLE sv2 TO sv3")
    assert [r.s for r in sess.execute(
        "SELECT s FROM sv3 FINAL").collect()] == ["b"]
    sess.execute("INSERT INTO sv3 VALUES (1, 'c')")
    assert [r.s for r in sess.execute(
        "SELECT s FROM sv3 FINAL").collect()] == ["c"]


def test_r11_truncate_reseeds_insert_order(spark, sf_dir):
    """TRUNCATE leaves nothing whose insert order could be lost — the
    version-less Replacing generation shadow reseeds so FINAL works again
    (mutations keep the documented guided poisoning)."""
    import pytest as _pytest

    from canal_clickhouse_spark.chsql_ddl import ChSession

    sess = ChSession(spark, sf_dir)
    sess.execute("CREATE TABLE tvr (k UInt32, s String)"
                 " ENGINE = ReplacingMergeTree ORDER BY k")
    sess.execute("INSERT INTO tvr VALUES (1, 'a')")
    sess.execute("TRUNCATE TABLE tvr")
    sess.execute("INSERT INTO tvr VALUES (1, 'x')")
    sess.execute("INSERT INTO tvr VALUES (1, 'y')")
    assert [r.s for r in sess.execute(
        "SELECT s FROM tvr FINAL").collect()] == ["y"]
    sess.execute("ALTER TABLE tvr DELETE WHERE 0")
    with _pytest.raises(ValueError, match="INSERT order"):
        sess.execute("SELECT s FROM tvr FINAL")


def test_r11_mv_bodies_session_rewrites(spark, sf_dir):
    """r11 probe batch 29: MATERIALIZED VIEW bodies take the catalog-
    aware pre-passes — json-path access works, and a star body excludes
    readonly columns (CH's SELECT * contract holds in MV context too)."""
    from canal_clickhouse_spark.chsql_ddl import ChSession

    sess = ChSession(spark, sf_dir)
    sess.execute("CREATE TABLE jsrc (j JSON) ENGINE = Memory")
    sess.execute("CREATE MATERIALIZED VIEW jmv29 ENGINE = Memory"
                 " AS SELECT toInt64(j.a) AS a FROM jsrc")
    sess.execute('INSERT INTO jsrc VALUES (\'{"a": 5}\')')
    assert [r.a for r in sess.execute(
        "SELECT a FROM jmv29").collect()] == [5]
    sess.execute("CREATE TABLE rsrc (a UInt32,"
                 " m UInt64 MATERIALIZED a * 2) ENGINE = Memory")
    sess.execute("CREATE MATERIALIZED VIEW rmv29 ENGINE = Memory"
                 " AS SELECT * FROM rsrc")
    sess.execute("INSERT INTO rsrc VALUES (4)")
    d = sess.execute("SELECT * FROM rmv29")
    assert d.columns == ["a"] and [r.a for r in d.collect()] == [4]


def test_r11_show_create_special_families_roundtrip(spark, sf_dir):
    """SHOW CREATE re-emits the declared JSON / IPv4 spellings so a dump
    re-executes WITH their session contracts (json-path access, IPv4
    insert coercion) — r11 probe batch 31; clones via CREATE TABLE AS
    <table> carry the same meta."""
    from canal_clickhouse_spark.chsql_ddl import ChSession

    s1 = ChSession(spark, sf_dir)
    s1.execute("CREATE TABLE b31 (a UInt32, m UInt64 MATERIALIZED a * 2,"
               " j JSON, ip IPv4) ENGINE = Memory")
    dump = s1.execute("SHOW CREATE TABLE b31").collect()[0][0]
    assert "`j` JSON" in dump and "`ip` IPv4" in dump
    s2 = ChSession(spark, sf_dir)
    s2.execute(dump.replace("b31", "b31c"))
    s2.execute("INSERT INTO b31c VALUES (1, '{\"x\": 9}', '1.2.3.4')")
    assert s2.execute("SELECT j.x AS x FROM b31c").collect()[0].x == "9"
    assert s2.execute(
        "SELECT IPv4NumToString(ip) AS ip FROM b31c").collect()[0].ip == (
        "1.2.3.4")
    # clone carries the contracts
    s1.execute("CREATE TABLE b31cl AS b31")
    s1.execute("INSERT INTO b31cl VALUES (2, '{\"x\": 1}', '0.0.0.1')")
    assert s1.execute("SELECT * FROM b31cl").columns == ["a", "j", "ip"]
    assert s1.execute("SELECT j.x AS x FROM b31cl").collect()[0].x == "1"


def test_r12_engine_whitelist(spark, sf_dir):
    """r11 verdict wrong #2: unknown/consumer/external engines refuse at
    CREATE with named guidance instead of silently becoming stored
    tables; Replicated* wrappers map to their base engine with the
    zk-path/replica arguments stripped."""
    import pytest as _pytest

    from canal_clickhouse_spark.chsql_ddl import ChSession

    sess = ChSession(spark, sf_dir)
    for ddl, pat in [
        ("CREATE TABLE k (a UInt32) ENGINE ="
         " Kafka('b:9092', 't', 'g', 'JSONEachRow')", "source_kafka"),
        ("CREATE TABLE f (a UInt32) ENGINE = File(CSV)", "file\\("),
        ("CREATE TABLE u (a UInt32) ENGINE = URL('http://x', CSV)",
         "file\\("),
        ("CREATE TABLE my (a UInt32) ENGINE ="
         " MySQL('h:3306', 'd', 't', 'u', 'p')", "source_jdbc"),
        ("CREATE TABLE st (a UInt32) ENGINE = Set", "IN-membership"),
        ("CREATE TABLE rk (a UInt32) ENGINE = EmbeddedRocksDB"
         " PRIMARY KEY a", "ReplacingMergeTree"),
        ("CREATE TABLE zz (a UInt32) ENGINE = FrobnicateTree ORDER BY a",
         "supported engines"),
    ]:
        with _pytest.raises(ValueError, match=pat):
            sess.execute(ddl)
    # Replicated wrapper: base-engine semantics with the replication
    # args stripped — the Replacing version column survives
    sess.execute(
        "CREATE TABLE rwl (k Int64, v Int64) ENGINE ="
        " ReplicatedReplacingMergeTree('/ch/{shard}/rwl', '{replica}', v)"
        " ORDER BY k"
    )
    sess.execute("INSERT INTO rwl VALUES (1, 1), (1, 7), (2, 2)")
    assert [tuple(r) for r in sess.execute(
        "SELECT k, toInt64(v) AS v FROM rwl FINAL ORDER BY k"
    ).collect()] == [(1, 7), (2, 2)]
    assert "ReplacingMergeTree(v)" in sess.execute(
        "SHOW CREATE TABLE rwl").collect()[0][0]


def test_r12_engine_merge_live_union(spark, sf_dir):
    """ENGINE = Merge(db, 'regexp') is a LIVE union view: tables created
    after it are picked up per read, `_table` labels rows but never
    expands from *, and INSERT refuses (read-only view). The merge()
    table function is the inline twin (fixtures included)."""
    import pytest as _pytest

    from canal_clickhouse_spark.chsql_ddl import ChSession

    sess = ChSession(spark, sf_dir)
    sess.execute("CREATE TABLE ml_a (k Int64, s String)"
                 " ENGINE = MergeTree ORDER BY k")
    sess.execute("INSERT INTO ml_a VALUES (1, 'a')")
    sess.execute("CREATE TABLE ml (k Int64, s String)"
                 " ENGINE = Merge(currentDatabase(), '^ml_')")
    assert sess.execute("SELECT count() AS c FROM ml").collect()[0][0] == 1
    # live: created AFTER the merge table, still read
    sess.execute("CREATE TABLE ml_b (k Int64, s String)"
                 " ENGINE = MergeTree ORDER BY k")
    sess.execute("INSERT INTO ml_b VALUES (2, 'b'), (3, 'b2')")
    assert sess.execute("SELECT count() AS c FROM ml").collect()[0][0] == 3
    assert [tuple(r) for r in sess.execute(
        "SELECT _table, k FROM ml ORDER BY k").collect()] == [
        ("ml_a", 1), ("ml_b", 2), ("ml_b", 3)]
    # the virtual column never expands from a star
    assert sess.execute("SELECT * FROM ml").columns == ["k", "s"]
    with _pytest.raises(ValueError, match="read-only"):
        sess.execute("INSERT INTO ml VALUES (9, 'x')")
    # a column the underlying table lacks NULL-fills (schema drift)
    sess.execute("CREATE TABLE ml_c (k Int64)"
                 " ENGINE = MergeTree ORDER BY k")
    sess.execute("INSERT INTO ml_c VALUES (4)")
    assert [tuple(r) for r in sess.execute(
        "SELECT k, s FROM ml WHERE k = 4").collect()] == [(4, None)]
    # merge() table function: 1-arg defaults to the current database,
    # structure from the first match, fixture tables match too
    assert sess.execute(
        "SELECT count() AS c FROM merge('^ml_[ab]$')"
    ).collect()[0][0] == 3
    assert sess.execute(
        "SELECT count() AS c FROM merge(currentDatabase(), '^nation$')"
    ).collect()[0][0] == 25
    with _pytest.raises(ValueError, match="no table matches"):
        sess.execute("SELECT * FROM merge('^nosuch_prefix_')")
    with _pytest.raises(ValueError, match="bad tables_regexp"):
        sess.execute("CREATE TABLE mbad (k Int64) ENGINE ="
                     " Merge(currentDatabase(), '[unclosed')")


def test_r12_set_settings_parity(spark, sf_dir):
    """r11 verdict wrong #1: the session-level SET statement runs the
    SAME result-changing guard list as the trailing SETTINGS clause, and
    `SET union_default_mode` is HONORED by bare-UNION resolution (with
    the query-level SETTINGS clause taking precedence)."""
    import pytest as _pytest

    from canal_clickhouse_spark.chsql_ddl import ChSession

    sess = ChSession(spark, sf_dir)
    for bad, pat in [
        ("SET limit = 1", "caps the result"),
        ("SET offset = 5", "skips result"),
        ("SET session_timezone = 'Asia/Tokyo'", "session.timeZone"),
        ("SET final = 1", "auto-FINALs"),
        ("SET totals_mode = 'before_having'", "totals_mode"),
        ("SET count_distinct_implementation = 'uniq'", "approximate"),
    ]:
        with _pytest.raises(ValueError, match=pat):
            sess.execute(bad)
    # performance knobs still record-and-drop
    sess.execute("SET max_threads = 8, max_memory_usage = 1000000")
    # union_default_mode is honored session-wide
    sess.execute("SET union_default_mode = 'ALL'")
    assert sess.execute(
        "SELECT 1 AS x UNION SELECT 1 AS x").count() == 2
    # ... and introspectable
    assert [tuple(r) for r in sess.execute(
        "SELECT value FROM system.settings WHERE name ="
        " 'union_default_mode'").collect()] == [("'ALL'",)]
    # the query-level SETTINGS clause overrides the session SET
    assert sess.execute(
        "SELECT 1 AS x UNION SELECT 1 AS x"
        " SETTINGS union_default_mode = 'DISTINCT'").count() == 1
    sess.execute("SET union_default_mode = 'DISTINCT'")
    assert sess.execute(
        "SELECT 1 AS x UNION SELECT 1 AS x").count() == 1


def test_r12_datetime_col_arith(spark, sf_dir):
    """r11 verdict missing #3/#4: ChSession rewrites DateTime-column ±
    Int seconds (catalog-aware — it knows the schema) and numeric RANGE
    frames over a DateTime ORDER BY; the bare translator keeps its loud
    error (it cannot type a bare column)."""
    import pytest as _pytest

    from canal_clickhouse_spark.chsql_ddl import ChSession

    sess = ChSession(spark, sf_dir)
    sess.execute("CREATE TABLE dta (k Int64, t DateTime, v Float64)"
                 " ENGINE = MergeTree ORDER BY k")
    sess.execute("INSERT INTO dta VALUES"
                 " (1, '2024-01-01 00:00:00', 1.0),"
                 " (2, '2024-01-01 00:30:00', 2.0),"
                 " (3, '2024-01-01 02:00:00', 4.0)")
    # col - int is seconds, both operand orders, chains keep grouping
    assert [tuple(r) for r in sess.execute(
        "SELECT k, toString(t - 3600) AS a, toString(60 + t) AS b,"
        " toString(t - 10 * 60) AS c FROM dta WHERE k = 1").collect()] == [
        (1, "2023-12-31 23:00:00", "2024-01-01 00:01:00",
         "2023-12-31 23:50:00")]
    # numeric RANGE frame over the DateTime ORDER BY counts seconds:
    # rows 1-2 are 1800 s apart (within 3600), row 3 is 5400 s from row 2
    assert [tuple(r) for r in sess.execute(
        "SELECT k, sum(v) OVER (ORDER BY t RANGE BETWEEN 3600 PRECEDING"
        " AND CURRENT ROW) AS s FROM dta ORDER BY k").collect()] == [
        (1, 1.0), (2, 3.0), (3, 4.0)]
    # an integer column named like nothing in scope is untouched; a
    # NON-timestamp minus stays numeric
    assert [tuple(r) for r in sess.execute(
        "SELECT k - 1 AS km FROM dta WHERE k = 3").collect()] == [(2,)]
    # translator-only path (no catalog): loud analysis error, not silent
    from canal_clickhouse_spark.chsql import translate
    with _pytest.raises(Exception):
        spark.sql(translate("SELECT ts - 3600 FROM events")).collect()


def test_r12_collapsing_equal_count_last_state(spark, sf_dir):
    """r11 advice: CollapsingMergeTree's merge rule for a key whose state
    and cancel counts MATCH keeps the first cancel row AND the last state
    row when the chronologically last row is a state row (the in-flight
    re-insert shape); only balanced-last-is-cancel removes the key."""
    from canal_clickhouse_spark.chsql_ddl import ChSession

    sess = ChSession(spark, sf_dir)
    sess.execute("CREATE TABLE cem (k Int64, v Int64, sign Int8)"
                 " ENGINE = CollapsingMergeTree(sign) ORDER BY k")
    # k=1: state, cancel, state-again → balanced? no: 2 state 1 cancel →
    #      one extra state → LAST state row (v=30)
    # k=2: state then cancel (balanced, last is cancel) → collapses away
    # k=3: cancel first then state (balanced, LAST IS STATE) → keep BOTH
    sess.execute("INSERT INTO cem VALUES"
                 " (1, 10, 1), (2, 20, 1)")
    sess.execute("INSERT INTO cem VALUES"
                 " (1, 10, -1), (2, 20, -1), (3, 5, -1)")
    sess.execute("INSERT INTO cem VALUES (1, 30, 1), (3, 7, 1)")
    got = [tuple(r) for r in sess.execute(
        "SELECT k, toInt64(v) AS v, toInt64(sign) AS s"
        " FROM cem FINAL ORDER BY k, s").collect()]
    assert got == [(1, 30, 1), (3, 5, -1), (3, 7, 1)]
    # OPTIMIZE FINAL materializes the same rule
    sess.execute("OPTIMIZE TABLE cem FINAL")
    got2 = [tuple(r) for r in sess.execute(
        "SELECT k, toInt64(v) AS v, toInt64(sign) AS s"
        " FROM cem ORDER BY k, s").collect()]
    assert got2 == got


def test_r12_session_star_modifiers(spark, sf_dir):
    """r12 probe batch 2: star modifiers (* APPLY lambda/fn, COLUMNS,
    * EXCEPT forms) expand against SESSION tables (the translator's
    column registry syncs from the live catalog) and never include
    MATERIALIZED/ALIAS columns; trailing comma before FROM parses;
    CHECK ALL TABLES reports one row per session table."""
    from canal_clickhouse_spark.chsql_ddl import ChSession

    sess = ChSession(spark, sf_dir)
    sess.execute("CREATE TABLE smt (a Int64, b String,"
                 " m Int64 MATERIALIZED a * 10)"
                 " ENGINE = MergeTree ORDER BY a")
    sess.execute("INSERT INTO smt VALUES (1, 'x'), (2, 'yy')")

    def rows(q):
        return [tuple(r) for r in sess.execute(q).collect()]

    assert rows("SELECT * APPLY(x -> length(toString(x)))"
                " FROM smt ORDER BY 1") == [(1, 1), (1, 2)]
    assert rows("SELECT * APPLY(max) FROM smt") == [(2, "yy")]
    assert rows("SELECT COLUMNS('^[ab]$') APPLY(count) FROM smt") == [(2, 2)]
    # user EXCEPT lists gain the readonly columns (both spellings)
    assert sess.execute("SELECT * EXCEPT(b) FROM smt").columns == ["a"]
    assert sess.execute("SELECT * EXCEPT b FROM smt").columns == ["a"]
    assert sess.execute(
        "SELECT * REPLACE(a + 1 AS a) FROM smt").columns == ["a", "b"]
    # CH tolerates the trailing comma in the select list
    assert rows("SELECT a, b, FROM smt ORDER BY a LIMIT 1") == [(1, "x")]
    assert rows("CHECK ALL TABLES") == [("smt", 1)]


def test_r12_alter_tail_and_show_engines(spark, sf_dir):
    """r12 probe batch 3 (ALTER/SHOW tail): MODIFY/REMOVE SAMPLE BY
    record sampling-key meta, APPLY DELETED MASK is a correct no-op
    (deletes apply immediately here), SHOW ENGINES lists the implemented
    whitelist, and RENAME DICTIONARY moves the registry binding."""
    import pytest as _pytest

    from canal_clickhouse_spark.chsql_ddl import ChSession

    sess = ChSession(spark, sf_dir)
    sess.execute("CREATE TABLE smp (k Int64, v Int64)"
                 " ENGINE = MergeTree ORDER BY k")
    sess.execute("INSERT INTO smp VALUES (1, 10)")
    sess.execute("ALTER TABLE smp MODIFY SAMPLE BY k")
    assert sess.meta["smp"]["sample_by"] == "k"
    with _pytest.raises(ValueError, match="unknown column"):
        sess.execute("ALTER TABLE smp MODIFY SAMPLE BY nope")
    sess.execute("ALTER TABLE smp REMOVE SAMPLE BY")
    assert "sample_by" not in sess.meta["smp"]
    sess.execute("DELETE FROM smp WHERE k = 1")
    sess.execute("ALTER TABLE smp APPLY DELETED MASK")
    assert sess.execute("SELECT count() AS c FROM smp").collect()[0][0] == 0
    engines = [r.name for r in sess.execute("SHOW ENGINES").collect()]
    assert "Merge" in engines and "MergeTree" in engines
    assert "Kafka" not in engines
    sess.execute("CREATE TABLE dsrc (k Int64, nm String) ENGINE = Memory")
    sess.execute("INSERT INTO dsrc VALUES (1, 'one')")
    sess.execute("CREATE DICTIONARY rdict (k Int64, nm String DEFAULT '?')"
                 " PRIMARY KEY k"
                 " SOURCE(CLICKHOUSE(TABLE 'dsrc')) LAYOUT(FLAT())"
                 " LIFETIME(300)")
    sess.execute("RENAME DICTIONARY rdict TO rdict2")
    assert [tuple(r) for r in sess.execute(
        "SELECT dictGet('rdict2', 'nm', toInt64(1)) AS s").collect()] == [
        ("one",)]
    with _pytest.raises(ValueError, match="unknown"):
        sess.execute("RENAME DICTIONARY rdict TO rdict3")


def test_r12_create_or_replace_view_and_tuple_partition(spark, sf_dir):
    """r12 probe batch 5: CREATE OR REPLACE VIEW swaps atomically (an
    invalid replacement keeps the old view; plain CREATE over an existing
    view now errors like CH instead of silently replacing); cross-table
    REPLACE/ATTACH/MOVE PARTITION accept CH's tuple() spelling on
    unpartitioned tables (one all-rows partition)."""
    import pytest as _pytest

    from canal_clickhouse_spark.chsql_ddl import ChSession

    s = ChSession(spark, sf_dir)

    def rows(q):
        return [tuple(r) for r in s.execute(q).collect()]

    s.execute("CREATE OR REPLACE VIEW crv AS SELECT 1 AS x")
    s.execute("CREATE OR REPLACE VIEW crv AS SELECT 2 AS x")
    assert rows("SELECT x FROM crv") == [(2,)]
    with _pytest.raises(Exception):
        s.execute("CREATE OR REPLACE VIEW crv AS SELECT y FROM no_tbl_xyz")
    assert rows("SELECT x FROM crv") == [(2,)]  # old view survives
    with _pytest.raises(ValueError, match="already exists"):
        s.execute("CREATE VIEW crv AS SELECT 3 AS x")
    s.execute("CREATE VIEW IF NOT EXISTS crv AS SELECT 4 AS x")
    assert rows("SELECT x FROM crv") == [(2,)]  # IF NOT EXISTS: kept
    s.execute("CREATE TABLE crt (a Int64) ENGINE = Memory")
    with _pytest.raises(ValueError):
        s.execute("CREATE OR REPLACE VIEW crt AS SELECT 1 AS x")

    s.execute("CREATE TABLE ap1 (a Int64) ENGINE = MergeTree ORDER BY a")
    s.execute("CREATE TABLE ap2 (a Int64) ENGINE = MergeTree ORDER BY a")
    s.execute("INSERT INTO ap1 VALUES (1), (2)")
    s.execute("ALTER TABLE ap2 ATTACH PARTITION tuple() FROM ap1")
    assert rows("SELECT count() AS c FROM ap2") == [(2,)]  # copied
    assert rows("SELECT count() AS c FROM ap1") == [(2,)]  # src kept
    s.execute("ALTER TABLE ap2 REPLACE PARTITION tuple() FROM ap1")
    assert rows("SELECT count() AS c FROM ap2") == [(2,)]
    s.execute("ALTER TABLE ap1 MOVE PARTITION tuple() TO TABLE ap2")
    assert rows("SELECT count() AS c FROM ap1") == [(0,)]
    assert rows("SELECT count() AS c FROM ap2") == [(4,)]
    # partitioned × unpartitioned still refuses
    s.execute("CREATE TABLE ap3 (a Int64) ENGINE = MergeTree"
              " PARTITION BY a ORDER BY a")
    with _pytest.raises(ValueError, match="PARTITION BY"):
        s.execute("ALTER TABLE ap3 ATTACH PARTITION tuple() FROM ap1")


def test_r12_probe_batch7_paren_union_numbers_step(spark, sf_dir):
    """r12 probe batch 7: a parenthesized first set operand routes to the
    query path (`(SELECT …) UNION ALL …` fell to the generic unsupported
    error); 3-arg numbers(begin, end, step) bounds by EXCLUSIVE end (CH's
    PostgreSQL-series addition, deliberately unlike the 2-arg
    offset/count form); a column-count mismatch on INSERT … SELECT gets
    a named error instead of raw ASSIGNMENT_ARITY_MISMATCH."""
    import pytest as _pytest

    from canal_clickhouse_spark.chsql_ddl import ChSession

    s = ChSession(spark, sf_dir)

    def rows(q):
        return [tuple(r) for r in s.execute(q).collect()]

    assert rows("(SELECT 1 AS x) UNION ALL (SELECT 2) ORDER BY x") == [
        (1,), (2,)]
    assert rows("(SELECT 1 AS x) UNION DISTINCT (SELECT 1)") == [(1,)]
    assert rows("SELECT number AS n FROM numbers(0, 10, 3)") == [
        (0,), (3,), (6,), (9,)]
    assert rows("SELECT count() AS c FROM numbers(5, 20, 5)") == [(3,)]
    s.execute("CREATE TABLE ar7 (a Int64, b String, c String)"
              " ENGINE = Memory")
    with _pytest.raises(ValueError, match="source provides 2 columns"):
        s.execute("INSERT INTO ar7 SELECT 1, 'x'")


def test_r12_system_query_log(spark, sf_dir):
    """r12: system.query_log — execute() journals every statement with
    kind, finish/exception type and duration; event_seq is the monotone
    order key (CH orders by event_time, too coarse for a fast burst).
    Internal statement re-entries journal their own rows, same posture
    as CH's query_log."""
    import pytest as _pytest

    from canal_clickhouse_spark.chsql_ddl import ChSession

    s = ChSession(spark, sf_dir)
    s.execute("CREATE TABLE ql (a Int64) ENGINE = Memory")
    s.execute("INSERT INTO ql VALUES (1)")
    s.execute("SELECT count() AS c FROM ql").collect()
    with _pytest.raises(Exception):
        s.execute("SELECT definitely_not_a_function_xyz(1)")
    rows = [tuple(r) for r in s.execute(
        "SELECT query_kind, type FROM system.query_log ORDER BY event_seq"
    ).collect()]
    assert ("CREATE", "QueryFinish") in rows
    assert ("INSERT", "QueryFinish") in rows
    assert ("SELECT", "ExceptionWhileProcessing") in rows
    # the audit idiom: last failed query text
    bad = [tuple(r) for r in s.execute(
        "SELECT query FROM system.query_log WHERE type ="
        " 'ExceptionWhileProcessing' ORDER BY event_seq DESC LIMIT 1"
    ).collect()]
    assert "definitely_not_a_function_xyz" in bad[0][0]


def test_r12_probe_batch14_lightweight_update_and_tails(spark, sf_dir):
    """r12 probe batch 14: lightweight UPDATE (CH 25.x `UPDATE t SET …
    WHERE …`) routes to the ALTER UPDATE mutation path like lightweight
    DELETE; CLEAR COLUMN fills the TYPE default ('' / 0) like CH, not
    NULL; SYSTEM RELOAD FUNCTIONS is a correct no-op (the UDF registry
    is always current); CREATE TABLE t AS <table_function>(…)
    materializes the function's rows."""
    from canal_clickhouse_spark.chsql_ddl import ChSession

    s = ChSession(spark, sf_dir)

    def rows(q):
        return [tuple(r) for r in s.execute(q).collect()]

    s.execute("CREATE TABLE lwu (k Int64, v Int64) ENGINE = MergeTree"
              " ORDER BY k")
    s.execute("INSERT INTO lwu VALUES (1, 0), (2, 0)")
    s.execute("UPDATE lwu SET v = 5 WHERE k = 1")
    assert rows("SELECT sum(v) AS s FROM lwu") == [(5,)]
    s.execute("CREATE TABLE cc14 (a Int64, b String, c Int64)"
              " ENGINE = MergeTree ORDER BY a")
    s.execute("INSERT INTO cc14 VALUES (1, 'x', 9)")
    s.execute("ALTER TABLE cc14 CLEAR COLUMN b")
    s.execute("ALTER TABLE cc14 CLEAR COLUMN c")
    assert rows("SELECT b, c FROM cc14") == [("", 0)]
    s.execute("SYSTEM RELOAD FUNCTIONS")
    s.execute("CREATE TABLE catf14 AS numbers(5)")
    assert rows("SELECT count() AS c FROM catf14") == [(5,)]
    s.execute("CREATE TABLE IF NOT EXISTS catf14 AS numbers(9)")
    assert rows("SELECT count() AS c FROM catf14") == [(5,)]
    s.execute("CREATE TABLE cc14_clone AS cc14")  # clone path unchanged
    assert rows("SELECT count() AS c FROM cc14_clone") == [(0,)]
