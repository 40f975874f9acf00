"""EP-3 SQL entry path + physical layout (partitioning) checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from canal_clickhouse_spark.catalog import sql, table


def test_sql_entry_matches_dataframe_api(spark, sf_dir):
    """The same query through spark.sql and the DataFrame API — one Catalyst
    path, identical results."""
    via_sql = sql(
        spark,
        sf_dir,
        """
        SELECT n_name, COUNT(*) AS n, ROUND(SUM(c_acctbal), 2) AS bal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        """,
    )
    via_df = (
        table(spark, sf_dir, "customer")
        .join(table(spark, sf_dir, "nation"),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("c_acctbal"), 2).alias("bal"))
    )
    assert sorted(map(tuple, via_sql.collect())) == sorted(map(tuple, via_df.collect()))


def test_partitioned_layout_prunes(spark, sf_dir, tmp_path):
    """The MergeTree-layout analog actually prunes: a partition-key predicate
    must reach the scan as a PartitionFilter, not a row filter."""
    import contextlib
    import io

    out = str(tmp_path / "events_by_type")
    ev = table(spark, sf_dir, "events")
    ev.write.partitionBy("event_type").mode("overwrite").parquet(out)

    q = spark.read.parquet(out).filter(F.col("event_type") == "click")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters: [isnotnull(event_type" in plan
    assert q.count() == ev.filter("event_type = 'click'").count()
