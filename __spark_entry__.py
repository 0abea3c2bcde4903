"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Queries/oracles live next to the operators they exercise; this module
only aggregates the per-module registries (see
etl_wlg_metlink_spark/registry.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_wlg_metlink_spark.registry import all_oracles, all_queries
from etl_wlg_metlink_spark.session import ensure_engine_conf
from etl_wlg_metlink_spark.tables import load

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: pricing-summary over lineitem (scan → filter →
    hash-agg → sort; SURVEY.md M1). Exercises pushdown, partial
    aggregation and whole-stage codegen end-to-end."""
    ensure_engine_conf(spark)
    li = load(spark, SMOKE_SF_DIR, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (plus the
    M3 relational and M6 LLM-pipeline extensions). Each callable takes
    (spark, sf_dir) and returns a DataFrame with oracle-aligned column
    names."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query key. Keys missing here (and
    present in ``queries()``) are genuinely non-SQL-expressible ops the
    driver checks rows-only."""
    return all_oracles()
