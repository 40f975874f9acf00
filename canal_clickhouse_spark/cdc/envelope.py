"""Canal FlatMessage envelope: schema, build, parse.

The Canal wire format (public knowledge; reference identity
/root/reference/README.md:1) ships per-binlog-event JSON with routing keys
(``database``, ``table``), change ``type``, source event time ``es`` (epoch
ms), ``pkNames``, DDL passthrough, and stringly-typed after-images in
``data: [ {col: str} ]`` / before-deltas in ``old``. The sink casts strings
to the target table's types via a mapping config.

Here the envelope is a ``StructType`` and parsing is pure Catalyst
(``from_json`` → ``explode`` → cast projection) — whole-stage-codegen'd, no
Python in the row path. The oracle builds byte-equivalent JSON in DuckDB and
extracts with its JSON functions, so the full build→parse→type roundtrip is
hash-checked.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import table
from ..registry import query

FLAT_MESSAGE_SCHEMA = T.StructType(
    [
        T.StructField("database", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("es", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("isDdl", T.BooleanType()),
        T.StructField("sql", T.StringType()),
        T.StructField("pkNames", T.ArrayType(T.StringType())),
        T.StructField("data", T.ArrayType(T.MapType(T.StringType(), T.StringType()))),
        T.StructField("old", T.ArrayType(T.MapType(T.StringType(), T.StringType()))),
    ]
)

# Per-table mapping config: column -> Spark cast target. The string "ts:es"
# marker means "take the envelope's es epoch-ms instead of a data column".
ORDERS_MAPPING: dict[str, str] = {
    "o_orderkey": "bigint",
    "o_custkey": "bigint",
    "o_orderstatus": "string",
    "o_totalprice": "double",
    "o_orderpriority": "string",
}


def build_envelope(
    df: DataFrame,
    database: str,
    table_name: str,
    pk_names: list[str],
    data_cols: dict[str, Column],
    es: Column,
    op: Column | None = None,
) -> DataFrame:
    """Serialize rows into FlatMessage JSON strings (column ``msg``)."""
    kv: list[Column] = []
    for name, col in data_cols.items():
        kv.extend([F.lit(name), col])
    return df.select(
        F.to_json(
            F.struct(
                F.lit(database).alias("database"),
                F.lit(table_name).alias("table"),
                (op if op is not None else F.lit("INSERT")).alias("type"),
                es.alias("es"),
                F.lit(False).alias("isDdl"),
                F.array(*[F.lit(p) for p in pk_names]).alias("pkNames"),
                F.array(F.create_map(*kv)).alias("data"),
            )
        ).alias("msg")
    )


def parse_envelope(
    msgs: DataFrame, mapping: dict[str, str], msg_col: str = "msg"
) -> DataFrame:
    """FlatMessage JSON → typed change rows.

    ``explode(data)`` fans multi-row messages out; the mapping casts each
    stringly-typed column. Emits the envelope's op and event time alongside.
    """
    parsed = msgs.select(F.from_json(msg_col, FLAT_MESSAGE_SCHEMA).alias("m"))
    rows = parsed.select("m.*", F.explode("m.data").alias("row"))
    typed = [F.col("row").getItem(c).cast(t).alias(c) for c, t in mapping.items()]
    return rows.select(
        *typed,
        F.timestamp_millis(F.col("es")).alias("event_time"),
        F.col("type").alias("op"),
    )


@query(
    "cdc_parse_envelope",
    oracle="""
    WITH env AS (
        SELECT json_object(
            'database', 'shop', 'table', 'orders', 'type', 'INSERT',
            'es', epoch_ms(o_orderdate),
            'isDdl', false,
            'pkNames', ['o_orderkey'],
            'data', [json_object(
                'o_orderkey', CAST(o_orderkey AS VARCHAR),
                'o_custkey', CAST(o_custkey AS VARCHAR),
                'o_orderstatus', o_orderstatus,
                'o_totalprice',
                    CAST(CAST(round(o_totalprice, 2) AS DECIMAL(18,2)) AS VARCHAR),
                'o_orderpriority', o_orderpriority)]
        ) AS msg FROM orders
    )
    SELECT CAST(json_extract_string(msg, '$.data[0].o_orderkey') AS BIGINT) AS o_orderkey,
           CAST(json_extract_string(msg, '$.data[0].o_custkey') AS BIGINT) AS o_custkey,
           json_extract_string(msg, '$.data[0].o_orderstatus') AS o_orderstatus,
           CAST(json_extract_string(msg, '$.data[0].o_totalprice') AS DOUBLE) AS o_totalprice,
           json_extract_string(msg, '$.data[0].o_orderpriority') AS o_orderpriority,
           make_timestamp(CAST(json_extract(msg, '$.es') AS BIGINT) * 1000) AS event_time,
           json_extract_string(msg, '$.type') AS op
    FROM env
    """,
)
def cdc_parse_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build FlatMessage JSON from ``orders``, then parse it back to typed rows.

    o_totalprice goes through ROUND→DECIMAL(18,2)→string in both engines so
    the stringly-typed wire value is format-identical (raw double formatting
    differs engine to engine; decimal rendering does not).
    """
    o = table(spark, sf_dir, "orders")
    msgs = build_envelope(
        o,
        database="shop",
        table_name="orders",
        pk_names=["o_orderkey"],
        data_cols={
            "o_orderkey": F.col("o_orderkey").cast("string"),
            "o_custkey": F.col("o_custkey").cast("string"),
            "o_orderstatus": F.col("o_orderstatus"),
            "o_totalprice": F.round("o_totalprice", 2).cast("decimal(18,2)").cast("string"),
            "o_orderpriority": F.col("o_orderpriority"),
        },
        es=F.unix_millis(F.col("o_orderdate").cast("timestamp")),
    )
    return parse_envelope(msgs, ORDERS_MAPPING)


@query(
    "cdc_parse_ddl",
    oracle="""
    WITH ddl AS (
        SELECT n_nationkey AS seq,
               'ALTER TABLE shop.t' || CAST(n_nationkey % 5 AS VARCHAR)
                 || CASE WHEN n_nationkey % 3 = 0
                         THEN ' ADD COLUMN c' || CAST(n_nationkey AS VARCHAR)
                              || ' BIGINT'
                         WHEN n_nationkey % 3 = 1
                         THEN ' DROP COLUMN c' || CAST(n_nationkey AS VARCHAR)
                         ELSE ' MODIFY COLUMN c' || CAST(n_nationkey AS VARCHAR)
                              || ' VARCHAR(64)' END AS sql_text
        FROM nation
    )
    SELECT seq, sql_text,
           regexp_extract(sql_text,
               'ALTER TABLE (\\S+) (ADD|DROP|MODIFY) COLUMN (\\w+)\\s*(.*)', 1)
             AS target_table,
           regexp_extract(sql_text,
               'ALTER TABLE (\\S+) (ADD|DROP|MODIFY) COLUMN (\\w+)\\s*(.*)', 2)
             AS ddl_op,
           regexp_extract(sql_text,
               'ALTER TABLE (\\S+) (ADD|DROP|MODIFY) COLUMN (\\w+)\\s*(.*)', 3)
             AS column_name,
           regexp_extract(sql_text,
               'ALTER TABLE (\\S+) (ADD|DROP|MODIFY) COLUMN (\\w+)\\s*(.*)', 4)
             AS column_type
    FROM ddl ORDER BY seq
    """,
)
def cdc_parse_ddl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canal DDL passthrough parsing: FlatMessage carries ``isDdl: true``
    with the raw statement in ``sql`` [P-canal]; the consumer must extract
    (table, op, column, type) to evolve the sink mapping
    (`cdc_schema_evolve` exercises the resulting behavior — this key pins
    the parse itself). DDL statements are synthesized deterministically
    from `nation`, covering ADD/DROP/MODIFY COLUMN shapes.
    """
    n = table(spark, sf_dir, "nation")
    sql_text = F.concat(
        F.lit("ALTER TABLE shop.t"),
        (F.col("n_nationkey") % 5).cast("string"),
        F.when(
            F.col("n_nationkey") % 3 == 0,
            F.concat(
                F.lit(" ADD COLUMN c"),
                F.col("n_nationkey").cast("string"),
                F.lit(" BIGINT"),
            ),
        )
        .when(
            F.col("n_nationkey") % 3 == 1,
            F.concat(F.lit(" DROP COLUMN c"), F.col("n_nationkey").cast("string")),
        )
        .otherwise(
            F.concat(
                F.lit(" MODIFY COLUMN c"),
                F.col("n_nationkey").cast("string"),
                F.lit(" VARCHAR(64)"),
            )
        ),
    )
    pat = r"ALTER TABLE (\S+) (ADD|DROP|MODIFY) COLUMN (\w+)\s*(.*)"
    ddl = n.select(F.col("n_nationkey").alias("seq"), sql_text.alias("sql_text"))
    return ddl.select(
        "seq",
        "sql_text",
        F.regexp_extract("sql_text", pat, 1).alias("target_table"),
        F.regexp_extract("sql_text", pat, 2).alias("ddl_op"),
        F.regexp_extract("sql_text", pat, 3).alias("column_name"),
        F.regexp_extract("sql_text", pat, 4).alias("column_type"),
    ).orderBy("seq")
