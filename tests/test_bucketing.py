"""Bucketing: pre-shuffled table layout for co-located joins — THE
lever for repeated big-big joins at 100 TB (pay the shuffle once at
write time, never again at read time).

The test writes orders and customer bucketed by the join key into a
local warehouse, joins them, and asserts the physical plan contains NO
Exchange on either side of the SortMergeJoin.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_wlg_metlink_spark.tables import load


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    # spark.sql.warehouse.dir is a static conf — bucketed tables land
    # in the default ./spark-warehouse (gitignored, dropped afterward)
    spark.sql("CREATE DATABASE IF NOT EXISTS bucketdb")
    (
        load(spark, sf_dir, "orders")
        .write.mode("overwrite")
        .bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .saveAsTable("bucketdb.orders_b")
    )
    (
        load(spark, sf_dir, "customer")
        .write.mode("overwrite")
        .bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .saveAsTable("bucketdb.customer_b")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS bucketdb.orders_b")
    spark.sql("DROP TABLE IF EXISTS bucketdb.customer_b")


def test_bucketed_join_has_no_exchange(spark, sf_dir, bucketed):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bucketdb.customer_b").join(
            spark.table("bucketdb.orders_b"),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        # sanity: same result as the plain join
        expected = (
            load(spark, sf_dir, "customer")
            .join(
                load(spark, sf_dir, "orders"),
                F.col("c_custkey") == F.col("o_custkey"),
            )
            .count()
        )
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_repartition_colocates_repeated_aggs(spark, sf_dir):
    """Partitioning reuse: two aggregations on the same key over one
    pre-partitioned frame plan only the single up-front Exchange."""
    events = load(spark, sf_dir, "events").repartition(8, "user_id")
    agg1 = events.groupBy("user_id").agg(F.count("*").alias("n"))
    plan = agg1._jdf.queryExecution().executedPlan().toString()
    # exactly one exchange: the explicit repartition; the groupBy reuses it
    assert plan.count("Exchange") == 1
