"""§2 L — the user-defined function surface: UDF, pandas UDF/UDAF, UDTF.

These keys exist to prove the Python extension points work and round-trip
types correctly — NOT as the way to compute these results. Every one is
parity-checked against a builtin-SQL oracle computing identical semantics,
which is exactly the discipline the engine imposes: if a builtin exists, the
UDF is the wrong tool (it breaks whole-stage codegen and pays a per-batch
Arrow hop).

Performance hierarchy demonstrated here, worst→best [P-spark]:
row-at-a-time ``@udf`` (pickle per row) ≪ ``@pandas_udf`` (Arrow batches,
vectorized numpy) < builtin Column exprs (JVM codegen, no Python at all).
At 100 TB the first is banned from hot paths; the middle is reserved for
logic Spark genuinely lacks (see llm/multimodal.py's decoder).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType

from .catalog import table
from .registry import query


@query(
    "udf_python",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_discount > 0.05 THEN 'deep' ELSE 'shallow' END AS tier
    FROM lineitem
    WHERE l_quantity >= 45
    """,
)
def udf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (discount tiering), builtin-parity-checked.

    The slow path on purpose: one Python call per row. The oracle proves the
    semantics; the docstring records the verdict — use `when()` instead.
    """

    @F.udf(returnType="string")
    def tier(discount: float) -> str:
        return "deep" if discount > 0.05 else "shallow"

    li = table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_quantity") >= 45).select(
        "l_orderkey", "l_linenumber", tier("l_discount").alias("tier")
    )


@query(
    "udf_pandas_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS disc_price
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '2001-01-01'
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized Arrow scalar UDF: per-row discount pricing.

    numpy does the same per-element IEEE754 multiply the JVM would, so raw
    doubles hash-match without rounding (per-row ops are order-free —
    exprs.py module doc).
    """

    @F.pandas_udf(DoubleType())
    def disc_price(price: pd.Series, discount: pd.Series) -> pd.Series:
        return price * (1.0 - discount)

    li = table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_shipdate") >= "2001-01-01").select(
        "l_orderkey",
        "l_linenumber",
        disc_price("l_extendedprice", "l_discount").alias("disc_price"),
    )


@query(
    "udaf_pandas_agg",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 2)
               AS wavg_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def udaf_pandas_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom pandas aggregate: quantity-weighted average price per flag.

    GROUPED_AGG pandas_udf — whole group's columns arrive as Series, one
    scalar returns. Ratio rounded at 2dp: the two float sums reorder freely
    (numpy pairwise vs engines' sequential), division drift is ~1e-15
    relative.
    """

    @F.pandas_udf(DoubleType())
    def wavg(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(wavg("l_extendedprice", "l_quantity").alias("wavg_raw"))
        .select("l_returnflag", F.round("wavg_raw", 2).alias("wavg_price"))
    )


@query(
    "udtf_map_in_pandas",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    """,
)
def udtf_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-wise table function: tokenizer fan-out (1 doc → N tokens).

    ``mapInPandas`` is the row-multiplying Python escape hatch — each Arrow
    batch yields a differently-sized frame. Parity-checked against the
    builtin explode the engine would actually use.
    """

    def tokenize(batches):
        for pdf in batches:
            toks = pdf["text"].str.split(" ")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].repeat(toks.str.len()),
                    "token": [t for row in toks for t in row],
                }
            )

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInPandas(tokenize, "doc_id bigint, token string")


@query(
    "udtf_apply_in_pandas",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
           MAX(ts) AS last_ts
    FROM events
    GROUP BY user_id
    """,
)
def udtf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group table function: per-user event feature vector.

    ``groupBy().applyInPandas`` — the whole user's history lands in one
    pandas frame (the per-entity feature-engineering shape). Shuffles on
    user_id like any groupBy; the Python stage replaces only the aggregate.
    """

    def features(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "total_raw": [float(pdf["value"].sum())],
                "n_types": [pdf["event_type"].nunique()],
                "last_ts": [pdf["ts"].max()],
            }
        )

    ev = table(spark, sf_dir, "events")
    feats = ev.groupBy("user_id").applyInPandas(
        features,
        "user_id bigint, n_events bigint, total_raw double,"
        " n_types bigint, last_ts timestamp",
    )
    # Round JVM-side: Python's round() is half-even, Spark/DuckDB ROUND is
    # half-away-from-zero — rounding must happen in engine semantics.
    return feats.select(
        "user_id",
        "n_events",
        F.round("total_raw", 2).alias("total_value"),
        "n_types",
        "last_ts",
    )


@query(
    "udtf_python",
    oracle="""
    SELECT o_orderkey, unnest(range(1, 1 + CAST(FLOOR(o_totalprice) AS BIGINT) % 3))
               AS installment
    FROM orders
    WHERE o_orderkey <= 100
    -- FLOOR before the cast: DuckDB's double->bigint cast rounds while
    -- Python's int() truncates
    """,
)
def udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-registered Python UDTF (Spark 4): fan each order into installments.

    ``@udtf`` classes are full table functions — registered in the session
    catalog and callable from SQL with LATERAL. Deterministic output, so it
    hash-checks against DuckDB's range-unnest.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="installment bigint")
    class Installments:
        def eval(self, total: float):
            for i in range(1, 1 + int(total) % 3):
                yield (i,)

    spark.udtf.register("installments", Installments)
    table(spark, sf_dir, "orders").createOrReplaceTempView("ccs_orders_udtf")
    return spark.sql(
        """
        SELECT o.o_orderkey, t.installment
        FROM ccs_orders_udtf o,
             LATERAL installments(o.o_totalprice) t
        WHERE o.o_orderkey <= 100
        """
    )
