"""§2 H — Scalar function packs (ClickHouse function library parity).

One query per pack exercising every listed builtin, so each function is
hash-checked against DuckDB. All JVM-side `pyspark.sql.functions` — no Python
UDFs — so every pack stays inside whole-stage codegen.

Cross-engine notes baked in below:
- Spark dayofweek() is 1=Sunday; DuckDB dayofweek() is 0=Sunday → shift.
- DuckDB regexp_replace needs the 'g' flag to match Spark's replace-all.
- libm transcendentals (ln/log10/exp) differ by ulps across runtimes → 6dp.
- pmod: DuckDB lacks it → ((a % b) + b) % b.
- zip_with: DuckDB list_zip yields unnamed structs; emulate with an index
  list_transform instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


@query(
    "fn_string",
    oracle="""
    SELECT p_partkey,
           lower(p_name) AS lo, upper(p_brand) AS up,
           substr(p_name, 2, 5) AS sub,
           trim(concat(' ', p_name, ' ')) AS trimmed,
           ltrim(concat('  ', p_name)) AS l_trimmed,
           rtrim(concat(p_name, '  ')) AS r_trimmed,
           concat(p_brand, '/', p_type) AS cat,
           concat_ws('-', p_brand, p_type) AS cat_ws,
           length(p_name) AS name_len,
           replace(p_type, ' ', '_') AS type_us,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
           rpad(p_brand, 12, '.') AS brand_pad,
           starts_with(p_type, 'PROMO') AS is_promo,
           ends_with(p_type, 'STEEL') AS is_steel,
           strpos(p_name, 'a') AS pos_a
    FROM part
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("lo"),
        F.upper("p_brand").alias("up"),
        F.substring("p_name", 2, 5).alias("sub"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("trimmed"),
        F.ltrim(F.concat(F.lit("  "), F.col("p_name"))).alias("l_trimmed"),
        F.rtrim(F.concat(F.col("p_name"), F.lit("  "))).alias("r_trimmed"),
        F.concat(F.col("p_brand"), F.lit("/"), F.col("p_type")).alias("cat"),
        F.concat_ws("-", "p_brand", "p_type").alias("cat_ws"),
        F.length("p_name").alias("name_len"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_us"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.rpad("p_brand", 12, ".").alias("brand_pad"),
        F.startswith("p_type", F.lit("PROMO")).alias("is_promo"),
        F.endswith("p_type", F.lit("STEEL")).alias("is_steel"),
        F.locate("a", "p_name").cast("long").alias("pos_a"),
    )


@query(
    "fn_regex",
    oracle=r"""
    SELECT p_partkey,
           regexp_extract(p_brand, '#([0-9]+)', 1) AS brand_num,
           regexp_replace(p_name, '[aeiou]', '*', 'g') AS starred,
           regexp_matches(p_type, '^(PROMO|ECONOMY)') AS promo_or_eco
    FROM part
    """,
)
def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ClickHouse extract()/replaceRegexpAll(); Spark regexp_replace is
    # replace-all, hence DuckDB's 'g' flag in the oracle.
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_brand", r"#([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", r"[aeiou]", "*").alias("starred"),
        F.col("p_type").rlike(r"^(PROMO|ECONOMY)").alias("promo_or_eco"),
    )


@query(
    "fn_split_array",
    oracle="""
    SELECT doc_id,
           string_split(text, ' ')[1] AS first_tok,
           len(string_split(text, ' ')) AS n_toks,
           string_split(text, ' ')[len(string_split(text, ' '))] AS last_tok
    FROM documents
    """,
)
def fn_split_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ClickHouse splitByChar + arrayElement (1-based, negative = from end).
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.element_at(toks, 1).alias("first_tok"),
        F.size(toks).cast("long").alias("n_toks"),
        F.element_at(toks, -1).alias("last_tok"),
    )


@query(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS y, month(o_orderdate) AS m, day(o_orderdate) AS d,
           quarter(o_orderdate) AS q,
           dayofweek(o_orderdate) AS dow,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE)::VARCHAR AS plus30,
           CAST(CAST(o_orderdate AS DATE) - INTERVAL 7 DAY AS DATE)::VARCHAR AS minus7,
           date_diff('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS days_to_2002,
           CAST(last_day(o_orderdate) AS VARCHAR) AS month_end,
           CAST(CAST(o_orderdate + INTERVAL 2 MONTH AS DATE) AS VARCHAR) AS plus2mo
    FROM orders
    """,
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    od = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(od).alias("y"),
        F.month(od).alias("m"),
        F.dayofmonth(od).alias("d"),
        F.quarter(od).alias("q"),
        (F.dayofweek(od) - 1).alias("dow"),  # Spark 1=Sun; DuckDB 0=Sun
        F.date_trunc("month", od).alias("month_start"),
        F.date_add(od.cast("date"), 30).cast("string").alias("plus30"),
        F.date_sub(od.cast("date"), 7).cast("string").alias("minus7"),
        F.datediff(F.lit("2002-01-01").cast("date"), od.cast("date")).alias(
            "days_to_2002"
        ),
        F.last_day(od).cast("string").alias("month_end"),
        F.add_months(od.cast("date"), 2).cast("string").alias("plus2mo"),
    )


@query(
    "fn_timestamp",
    oracle="""
    SELECT event_id,
           CAST(CAST(ts AS DATE) AS VARCHAR) AS as_date,
           CAST(floor(epoch(ts)) AS BIGINT) AS unix_s,
           strftime(CAST(to_timestamp(CAST(floor(epoch(ts)) AS BIGINT)) AS TIMESTAMP),
                    '%Y-%m-%d %H:%M:%S') AS roundtrip,
           hour(ts) AS h, minute(ts) AS mi, second(ts) AS s,
           ts + INTERVAL 1 HOUR AS plus_1h,
           ts - INTERVAL 90 MINUTE AS minus_90m
    FROM events
    """,
)
def fn_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    ts = F.col("ts")
    unix_s = ts.cast("timestamp").cast("long")  # NTZ -> LTZ(UTC) -> epoch
    return ev.select(
        "event_id",
        F.to_date(ts).cast("string").alias("as_date"),
        unix_s.alias("unix_s"),
        F.from_unixtime(unix_s).alias("roundtrip"),
        F.hour(ts).alias("h"),
        F.minute(ts).alias("mi"),
        F.second(ts).alias("s"),
        (ts + F.expr("INTERVAL 1 HOUR")).alias("plus_1h"),
        (ts - F.expr("INTERVAL 90 MINUTE")).alias("minus_90m"),
    )


@query(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 1) AS r1,
           floor(l_extendedprice) AS flr,
           ceil(l_extendedprice) AS cl,
           abs(l_quantity - 25) AS centered,
           pow(l_quantity, 2) AS qty_sq,
           sqrt(l_quantity) AS qty_sqrt,
           round(ln(l_extendedprice), 6) AS ln_price,
           round(log10(l_extendedprice), 6) AS log10_price,
           round(exp(l_discount), 6) AS exp_disc,
           ((CAST(l_quantity AS BIGINT) - 25) % 7 + 7) % 7 AS qmod,
           CAST(sign(l_quantity - 25) AS DOUBLE) AS sgn,
           greatest(l_quantity, 25.0) AS hi,
           least(l_quantity, 25.0) AS lo
    FROM lineitem
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(p, 1).alias("r1"),
        F.floor(p).cast("double").alias("flr"),
        F.ceil(p).cast("double").alias("cl"),
        F.abs(q - 25).alias("centered"),
        F.pow(q, 2).alias("qty_sq"),
        F.sqrt(q).alias("qty_sqrt"),  # IEEE-exact, no rounding needed
        F.round(F.log(p), 6).alias("ln_price"),
        F.round(F.log10(p), 6).alias("log10_price"),
        F.round(F.exp(F.col("l_discount")), 6).alias("exp_disc"),
        F.pmod(q.cast("long") - 25, F.lit(7)).alias("qmod"),
        F.signum(q - 25).alias("sgn"),
        F.greatest(q, F.lit(25.0)).alias("hi"),
        F.least(q, F.lit(25.0)).alias("lo"),
    )


@query(
    "fn_conditional",
    oracle="""
    SELECT o_orderkey,
           coalesce(NULLIF(o_orderstatus, 'O'), 'open') AS status_filled,
           NULLIF(o_orderpriority, '5-LOW') AS prio_or_null,
           coalesce(NULLIF(o_orderpriority, '5-LOW'), 'LOWEST') AS nvl_prio,
           CASE WHEN o_totalprice > 200000 THEN 'big' ELSE 'small' END AS if_like,
           CASE WHEN o_orderstatus = 'F' THEN 'done'
                WHEN o_orderstatus = 'O' THEN 'open'
                ELSE 'partial' END AS multi_if
    FROM orders
    """,
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ClickHouse if()/multiIf()/ifNull().
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("open")).alias(
            "status_filled"
        ),
        F.nullif("o_orderpriority", F.lit("5-LOW")).alias("prio_or_null"),
        F.nvl(F.nullif("o_orderpriority", F.lit("5-LOW")), F.lit("LOWEST")).alias(
            "nvl_prio"
        ),
        F.when(F.col("o_totalprice") > 200000, "big")
        .otherwise("small")
        .alias("if_like"),
        F.when(F.col("o_orderstatus") == "F", "done")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("partial")
        .alias("multi_if"),
    )


@query(
    "fn_hash",
    oracle="""
    SELECT doc_id, md5(text) AS text_md5, sha256(text) AS text_sha256
    FROM documents
    """,
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Content hashing for dedup: hex digests are engine-independent.
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
    )


@query(
    "fn_hash_fast",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT text) AS n_texts,
           CAST(COUNT(DISTINCT hash(text)) AS BIGINT) AS n_hashes,
           MIN(hash(text) % 1024 >= 0 AND hash(text) % 1024 < 1024)
               AS buckets_ok
    FROM documents
    """,
)
def fn_hash_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse cityHash64 analog — fast non-crypto hash for partitioning.

    Hash VALUES are engine-private (xxhash64 vs DuckDB's hash), so the
    oracle checks the partitioner contract instead: the hash is injective
    on this corpus (distinct hashes == distinct texts — both engines are
    collision-free at this size) and the derived bucket stays in range.
    """
    d = table(spark, sf_dir, "documents")
    hashed = d.select(
        "text",
        F.xxhash64("text").alias("h"),
        F.pmod(F.xxhash64("text", "lang"), F.lit(1024)).alias("bucket"),
    )
    return hashed.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("text").alias("n_texts"),
        F.countDistinct("h").alias("n_hashes"),
        F.min((F.col("bucket") >= 0) & (F.col("bucket") < 1024)).alias("buckets_ok"),
    )


@query(
    "fn_array",
    oracle="""
    SELECT doc_id,
           len(toks) AS n,
           array_contains(toks, 'data') AS has_data,
           list_sort(list_distinct(toks))[1] AS first_distinct,
           COALESCE(array_to_string(list_slice(toks, 1, 3), '|'), '') AS head3,
           COALESCE(array_to_string(flatten([toks[1:2], toks[3:4]]), '|'), '')
               AS recombined,
           COALESCE(array_to_string(list_concat(toks[1:1], toks[2:2]), '|'), '')
               AS first_two,
           COALESCE(array_to_string(generate_series(1, 3), ','), '') AS seq
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Array outputs ship '|'-joined (driver canonicalizer hashes scalar
    # cells only); the slices/flatten/concat still exercise the array ops.
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n"),
        F.array_contains(toks, "data").alias("has_data"),
        F.element_at(F.sort_array(F.array_distinct(toks)), 1).alias("first_distinct"),
        F.array_join(F.slice(toks, 1, 3), "|").alias("head3"),
        F.array_join(
            F.flatten(F.array(F.slice(toks, 1, 2), F.slice(toks, 3, 2))), "|"
        ).alias("recombined"),
        F.array_join(F.concat(F.slice(toks, 1, 1), F.slice(toks, 2, 1)), "|").alias(
            "first_two"
        ),
        F.array_join(F.sequence(F.lit(1), F.lit(3)), ",").alias("seq"),
    )


@query(
    "fn_array_hof",
    oracle="""
    SELECT vec_id,
           COALESCE(array_to_string(
               list_transform(list_slice(embedding, 1, 4),
                   x -> CAST(floor(CAST(x AS DOUBLE) * 2 * 1000000 + 0.5)
                             AS BIGINT)), ','), '') AS doubled4,
           len(list_filter(embedding, x -> x > 0)) AS n_pos,
           round(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE)), (a, b) -> a + b), 4) AS total,
           round(list_reduce(list_transform(list_zip(embedding, embedding),
                 s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), (a, b) -> a + b), 4) AS sq_norm,
           len(list_filter(embedding, x -> x > 0.5)) > 0 AS any_big,
           len(list_filter(embedding, x -> abs(x) <= 1.0)) = len(embedding) AS all_unit
    FROM embeddings
    """,
)
def fn_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ClickHouse arrayMap/arrayFilter/arrayFold/arrayExists/arrayAll.
    # Left-fold order is deterministic in both engines -> rounding absorbs
    # float32->float64 promotion noise only at the last digit. doubled4
    # ships as a CSV of micro-units (driver hashes scalar cells only).
    e = table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    embd = F.transform(emb, lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.array_join(
            F.transform(
                F.slice(emb, 1, 4),
                lambda x: F.floor(x.cast("double") * 2 * 1000000 + 0.5).cast("long"),
            ),
            ",",
        ).alias("doubled4"),
        F.size(F.filter(emb, lambda x: x > 0)).cast("long").alias("n_pos"),
        F.round(
            F.aggregate(embd, F.lit(0.0), lambda acc, x: acc + x), 4
        ).alias("total"),
        F.round(
            F.aggregate(
                F.zip_with(embd, embd, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            4,
        ).alias("sq_norm"),
        F.exists(emb, lambda x: x > 0.5).alias("any_big"),
        F.forall(emb, lambda x: F.abs(x) <= 1.0).alias("all_unit"),
    )


@query(
    "fn_explode",
    oracle="""
    SELECT doc_id,
           unnest(list_transform(string_split(text, ' '),
                                 (x, i) -> {'word': x, 'pos': CAST(i - 1 AS INT)}),
                  recursive := true)
    FROM documents
    """,
)
def fn_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ClickHouse arrayJoin: token fan-out with position (0-based in Spark).
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
    ).select("doc_id", "word", "pos")


@query(
    "fn_map",
    oracle="""
    SELECT event_id,
           m['type'][1] AS type_val,
           COALESCE(array_to_string(list_sort(map_keys(m)), ','), '') AS keys,
           CAST(cardinality(m) AS BIGINT) AS n_entries,
           list_contains(map_keys(m), 'uid') AS has_uid
    FROM (SELECT event_id,
                 MAP {'type': event_type, 'uid': CAST(user_id AS VARCHAR)} AS m
          FROM events)
    """,
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map build/access (CH Map type): raw map columns stay out of the
    output (engine map ordering differs); every derived scalar/sorted-array
    is hash-checked."""
    ev = table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"), F.lit("uid"), F.col("user_id").cast("string")
    )
    return ev.select(
        "event_id",
        F.element_at(m, "type").alias("type_val"),
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("keys"),
        F.size(m).cast("long").alias("n_entries"),
        F.map_contains_key(m, "uid").alias("has_uid"),
    )


@query(
    "fn_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
           CAST(json_extract_string(props, '$.missing') AS VARCHAR) AS missing,
           json_valid(props) AS is_valid
    FROM events
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ClickHouse JSONExtract*: events.props is a JSON string {"k": <int>}.
    ev = table(spark, sf_dir, "events")
    from pyspark.sql.types import IntegerType, StructField, StructType

    schema = StructType([StructField("k", IntegerType())])
    parsed = F.from_json("props", schema)
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        parsed.getField("k").alias("k_int"),
        F.get_json_object("props", "$.missing").alias("missing"),
        parsed.isNotNull().alias("is_valid"),
    )


@query(
    "fn_bit",
    oracle="""
    SELECT event_id,
           user_id & 255 AS b_and,
           user_id | 4096 AS b_or,
           xor(user_id, event_id) AS b_xor,
           user_id << 2 AS b_shl,
           user_id >> 1 AS b_shr,
           CAST(bit_count(user_id) AS INT) AS b_cnt
    FROM events
    """,
)
def fn_bit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bit-manipulation pack (CH bitAnd/bitOr/bitXor/bitShift*/bitCount)."""
    ev = table(spark, sf_dir, "events")
    u = F.col("user_id")
    return ev.select(
        "event_id",
        u.bitwiseAND(F.lit(255)).alias("b_and"),
        u.bitwiseOR(F.lit(4096)).alias("b_or"),
        u.bitwiseXOR(F.col("event_id")).alias("b_xor"),
        F.shiftleft(u, 2).alias("b_shl"),
        F.shiftright(u, 1).alias("b_shr"),
        F.bit_count(u).alias("b_cnt"),
    )


@query(
    "fn_struct",
    oracle="""
    SELECT o_orderkey,
           s.price AS price,
           s.status AS status,
           s.price > 100000 AS is_big,
           CAST(s = {'price': o_totalprice, 'status': o_orderstatus} AS BOOLEAN)
               AS self_eq
    FROM (SELECT o_orderkey,
                 {'price': o_totalprice, 'status': o_orderstatus} AS s,
                 o_totalprice, o_orderstatus
          FROM orders)
    """,
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tuple/Nested pack (CH Tuple): build a struct, extract fields, compare
    structs — the composite-type surface MergeTree nested columns need."""
    o = table(spark, sf_dir, "orders")
    s = F.struct(
        F.col("o_totalprice").alias("price"), F.col("o_orderstatus").alias("status")
    )
    return o.select(
        "o_orderkey",
        s.getField("price").alias("price"),
        s.getField("status").alias("status"),
        (s.getField("price") > 100000).alias("is_big"),
        (s == s).alias("self_eq"),
    )


@query(
    "fn_array_series",
    oracle="""
    WITH series AS (
        -- l_linenumber repeats within an order in this fixture; tie-break on
        -- the full payload to mirror Spark's whole-struct sort_array order.
        SELECT l_orderkey,
               list(l_quantity ORDER BY l_linenumber, l_quantity, l_returnflag)
                 AS qtys,
               list(l_returnflag ORDER BY l_linenumber, l_quantity, l_returnflag)
                 AS flags
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT l_orderkey,
           COALESCE(array_to_string(list_transform(qtys,
               x -> CAST(floor(x + 0.5) AS BIGINT)), ','), '') AS qtys,
           CAST(len(qtys) AS BIGINT) AS n,
           COALESCE(array_to_string(
               list_transform(range(1, len(qtys) + 1), i -> i), ','), '')
               AS enum,
           COALESCE(array_to_string(list_transform(range(1, len(qtys) + 1),
               i -> CAST(floor(ROUND(list_sum(qtys[1:i]), 2) + 0.5) AS BIGINT)),
               ','), '') AS cumsum,
           COALESCE(array_to_string(list_transform(range(1, len(qtys) + 1),
               i -> CAST(floor((CASE WHEN i = 1 THEN CAST(0 AS DOUBLE)
                                     ELSE qtys[i] - qtys[i - 1] END) + 0.5)
                         AS BIGINT)), ','), '') AS diffs,
           COALESCE(array_to_string(
               list_filter(flags, (x, i) -> i = 1 OR x <> flags[i - 1]), ','),
               '') AS compacted
    FROM series ORDER BY l_orderkey
    """,
)
def fn_array_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH array-series pack over each order's line-number-ordered quantity
    array: ``arrayEnumerate`` (1..n), ``arrayCumSum`` (prefix sums),
    ``arrayDifference`` (adjacent deltas, first = 0), ``arrayCompact``
    (drop consecutive duplicate return flags).

    Quantities are integer-valued doubles (FIXTURES.md), so prefix sums are
    exact in both engines regardless of fold order, and every series ships
    as a CSV of BIGINTs via floor(x+0.5) (driver canonicalizer hashes
    scalar cells only; integral doubles make the encode lossless). The
    per-element ``slice`` fold is O(n²) per array — fine because n =
    lines-per-order (≤7); for long arrays the scale path is posexplode →
    running-sum window → re-collect.
    """
    li = table(spark, sf_dir, "lineitem")
    series = (
        li.groupBy("l_orderkey")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("l_linenumber", "l_quantity", "l_returnflag"))
            ).alias("_s")
        )
        .select(
            "l_orderkey",
            F.col("_s.l_quantity").alias("qtys"),
            F.col("_s.l_returnflag").alias("flags"),
        )
    )
    return series.select(
        "l_orderkey",
        F.expr(
            "array_join(transform(qtys,"
            " x -> cast(floor(x + 0.5D) as bigint)), ',')"
        ).alias("qtys"),
        F.size("qtys").cast("bigint").alias("n"),
        F.expr("array_join(sequence(1L, cast(size(qtys) AS BIGINT)), ',')").alias(
            "enum"
        ),
        F.expr(
            "array_join(transform(sequence(1, size(qtys)),"
            " i -> cast(floor(round(aggregate(slice(qtys, 1, i), 0D,"
            " (acc, x) -> acc + x), 2) + 0.5D) as bigint)), ',')"
        ).alias("cumsum"),
        F.expr(
            "array_join(transform(sequence(1, size(qtys)),"
            " i -> cast(floor(if(i = 1, 0D,"
            " element_at(qtys, i) - element_at(qtys, i - 1)) + 0.5D)"
            " as bigint)), ',')"
        ).alias("diffs"),
        F.expr(
            "array_join(filter(flags,"
            " (x, i) -> i = 0 OR x != element_at(flags, i)), ',')"
        ).alias("compacted"),
    ).orderBy("l_orderkey")


@query(
    "fn_format_datetime",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y%m') AS yyyymm,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS full_fmt,
           strftime(o_orderdate, '%A') AS day_name,
           strftime(o_orderdate, '%B') AS month_name,
           CAST(week(o_orderdate) AS INT) AS iso_week,
           CAST(isodow(o_orderdate) AS INT) AS iso_dow,
           CAST(to_timestamp((epoch(o_orderdate)::BIGINT // 900) * 900)
                AS TIMESTAMP) AS start_of_15min
    FROM orders ORDER BY o_orderkey
    """,
)
def fn_format_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``formatDateTime`` / ``toYYYYMM`` / ``toStartOfInterval`` /
    ``toISOWeek`` pack: pattern formatting (Java patterns ↔ strftime,
    en-locale names on both engines), ISO week/day numbering (Spark's
    `dayofweek` is 1=Sunday, so ISO dow is derived), and 15-minute interval
    flooring via epoch integer division (UTC session — §7.4 timezone rule).
    """
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyyMM").alias("yyyymm"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("full_fmt"),
        F.date_format("o_orderdate", "EEEE").alias("day_name"),
        F.date_format("o_orderdate", "MMMM").alias("month_name"),
        F.weekofyear("o_orderdate").alias("iso_week"),
        (((F.dayofweek("o_orderdate") + 5) % 7) + 1).alias("iso_dow"),
        F.timestamp_seconds(
            F.expr("unix_timestamp(o_orderdate) div 900") * 900
        ).alias("start_of_15min"),
    ).orderBy("o_orderkey")


@query(
    "fn_string_distance",
    oracle="""
    WITH p AS (
        SELECT p_partkey, p_name,
               LAG(p_name) OVER (ORDER BY p_partkey) AS prev_name
        FROM part
    ),
    c AS (
        SELECT p_partkey, p_name, prev_name,
               list_distinct(list_filter(string_split_regex(p_name, ''),
                                         x -> x <> '')) AS ca,
               list_distinct(list_filter(string_split_regex(prev_name, ''),
                                         x -> x <> '')) AS cb
        FROM p WHERE prev_name IS NOT NULL
    )
    SELECT p_partkey,
           CAST(levenshtein(p_name, prev_name) AS BIGINT) AS edit_dist,
           ROUND(1.0 - levenshtein(p_name, prev_name)
                 / CAST(GREATEST(len(p_name), len(prev_name)) AS DOUBLE), 4)
               AS edit_sim,
           ROUND(CAST(len(list_intersect(ca, cb)) AS DOUBLE)
                 / CAST(len(ca) + len(cb) - len(list_intersect(ca, cb))
                        AS DOUBLE), 4) AS char_jaccard
    FROM c ORDER BY p_partkey
    """,
)
def fn_string_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH string-distance family — ``editDistance`` (levenshtein),
    normalized edit similarity, and ``stringJaccardIndex`` (char-set
    Jaccard) — between each part name and its predecessor in key order
    (the fuzzy-match shape used for entity resolution on synced tables).

    `levenshtein` runs JVM-side (builtin, codegen); the char-set Jaccard is
    split('')→array_distinct→array_intersect — all builtin array ops, no
    Python. The union size is |a|+|b|−|a∩b| (avoids a second array op).
    The LAG pairing is ONE window over the natural sort key — at scale this
    is the standard sorted-neighborhood blocking pass (compare adjacent
    candidates after a sort), not an all-pairs join.
    """
    p = table(spark, sf_dir, "part")
    w = Window.orderBy("p_partkey")
    d = (
        p.select(
            "p_partkey",
            "p_name",
            F.lag("p_name").over(w).alias("prev_name"),
        )
        .where(F.col("prev_name").isNotNull())
    )
    chars = lambda c: F.array_distinct(  # noqa: E731
        F.filter(F.split(F.col(c), ""), lambda x: x != "")
    )
    inter = F.size(F.array_intersect(chars("p_name"), chars("prev_name")))
    union = (
        F.size(chars("p_name")) + F.size(chars("prev_name")) - inter
    )
    lev = F.levenshtein("p_name", "prev_name")
    return d.select(
        "p_partkey",
        lev.cast("bigint").alias("edit_dist"),
        F.round(
            1.0
            - lev
            / F.greatest(F.length("p_name"), F.length("prev_name")).cast(
                "double"
            ),
            4,
        ).alias("edit_sim"),
        F.round(inter.cast("double") / union.cast("double"), 4).alias(
            "char_jaccard"
        ),
    ).orderBy("p_partkey")


@query(
    "fn_rounding",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_quantity / 2, 0) + 0.0 AS half_up,
           round_even(l_quantity / 2, 0) + 0.0 AS bankers,
           floor(l_extendedprice / 100) + 0.0 AS floor_hundreds,
           ceil(l_extendedprice / 100) + 0.0 AS ceil_hundreds,
           trunc(l_extendedprice / 100) + 0.0 AS trunc_hundreds,
           CAST(power(2, floor(log2(l_quantity))) AS BIGINT) AS to_exp2
    FROM lineitem
    WHERE l_orderkey % 31 = 0 AND l_quantity >= 1
    ORDER BY l_orderkey, l_linenumber
    """,
)
def fn_rounding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH rounding family: ``round`` (ties away from zero — Spark round /
    DuckDB round agree), ``roundBankers`` (ties to even — Spark ``bround``
    / DuckDB ``round_even``), ``floor``/``ceil``/``trunc`` at a coarser
    scale, and ``roundToExp2`` (largest power of two ≤ x, via
    2^⌊log2⌋ — exact for the integral quantities: log2 of an exact power
    of two is exact in IEEE).

    quantity/2 lands EXACTLY on .5 for odd quantities (integer halves are
    exact binary doubles), so the half-up vs bankers columns genuinely
    diverge row-by-row — the key pins that each engine's tie rule maps to
    the right CH spelling, not just that ties never happen. All-projection
    scan, no shuffle.
    """
    li = table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    h = F.col("l_extendedprice") / 100
    return (
        li.where((F.col("l_orderkey") % 31 == 0) & (q >= 1))
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.round(q / 2, 0) + 0.0).alias("half_up"),
            (F.bround(q / 2, 0) + 0.0).alias("bankers"),
            (F.floor(h) + 0.0).alias("floor_hundreds"),
            (F.ceil(h) + 0.0).alias("ceil_hundreds"),
            # trunc toward zero: positive prices, so floor == trunc is NOT
            # exercised by sign — use double truncation explicitly.
            (F.col("l_extendedprice") / 100).cast("bigint").cast("double").alias(
                "trunc_hundreds"
            ),
            F.pow(F.lit(2), F.floor(F.log2(q))).cast("bigint").alias("to_exp2"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "fn_variant",
    oracle="""
    WITH j AS (
        SELECT event_id,
               '{"meta":{"type":"' || event_type || '","cents":'
                   || CAST(CAST(floor(value * 100) AS BIGINT) AS VARCHAR)
                   || '},"ids":[' || CAST(user_id AS VARCHAR) || ','
                   || CAST(event_id AS VARCHAR) || '],"k":'
                   || CAST(json_extract_string(props, '$.k') AS VARCHAR)
                   || '}' AS doc
        FROM events
    )
    SELECT event_id,
           json_extract_string(doc, '$.meta.type') AS mtype,
           CAST(json_extract_string(doc, '$.meta.cents') AS BIGINT) AS cents,
           CAST(json_extract_string(doc, '$.ids[1]') AS BIGINT) AS second_id,
           CAST(json_extract_string(doc, '$.k') AS INT) AS k,
           CAST(json_extract_string(doc, '$.meta.absent') AS VARCHAR)
               AS absent
    FROM j ORDER BY event_id
    """,
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT — the engine-side analog of ClickHouse's JSON/Object
    column type: semi-structured documents parsed ONCE into a binary
    columnar encoding (`parse_json`), then path-extracted with per-path
    types (`try_variant_get`), including nested objects, array subscripts,
    and type-safe absent paths (NULL, no error).

    A nested document is synthesized from event columns (the fixture's
    props is flat), parsed to a variant, and five paths are extracted.
    Versus fn_json's per-path string re-parsing, the variant parse cost is
    paid once per row and each extraction is a binary-encoded path walk —
    the right shape when a CDC envelope carries large semi-structured
    payloads queried on many paths. Cents go through floor() (not a
    bigint cast) because Spark's double→bigint cast truncates while
    DuckDB's rounds.
    """
    ev = table(spark, sf_dir, "events")
    doc = F.concat(
        F.lit('{"meta":{"type":"'),
        F.col("event_type"),
        F.lit('","cents":'),
        F.floor(F.col("value") * 100).cast("bigint").cast("string"),
        F.lit('},"ids":['),
        F.col("user_id").cast("string"),
        F.lit(","),
        F.col("event_id").cast("string"),
        F.lit('],"k":'),
        F.get_json_object("props", "$.k"),
        F.lit("}"),
    )
    v = F.parse_json(doc)
    return ev.select(
        "event_id",
        F.try_variant_get(v, "$.meta.type", "string").alias("mtype"),
        F.try_variant_get(v, "$.meta.cents", "bigint").alias("cents"),
        F.try_variant_get(v, "$.ids[1]", "bigint").alias("second_id"),
        F.try_variant_get(v, "$.k", "int").alias("k"),
        F.try_variant_get(v, "$.meta.absent", "string").alias("absent"),
    ).orderBy("event_id")
