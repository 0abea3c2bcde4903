"""Central registry aggregating every operator module's named queries
and their DuckDB oracle SQL.

Each operator module exposes ``QUERIES: dict[str, fn]`` and
``ORACLE: dict[str, str]``; this module merges them and asserts key
discipline (a query name is globally unique; every oracle key has a
query). The driver contract (__spark_entry__.py) serves from here.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def _modules():
    # Imported lazily so a syntax error in one module surfaces at call
    # time with a clean traceback (and to avoid import cycles).
    from etl_wlg_metlink_spark.operators import (
        extended,
        llm_pipeline,
        metlink_queries,
        reference_surface,
        relational,
    )
    from etl_wlg_metlink_spark import streaming as streaming_pkg

    return (
        reference_surface,
        relational,
        llm_pipeline,
        metlink_queries,
        extended,
        streaming_pkg,
    )


def all_queries() -> dict[str, QueryFn]:
    merged: dict[str, QueryFn] = {}
    for mod in _modules():
        for name, fn in getattr(mod, "QUERIES", {}).items():
            if name in merged:
                raise ValueError(f"duplicate query name {name!r} in {mod.__name__}")
            merged[name] = fn
    return merged


def all_oracles() -> dict[str, str]:
    queries = all_queries()
    merged: dict[str, str] = {}
    for mod in _modules():
        for name, sql in getattr(mod, "ORACLE", {}).items():
            if name not in queries:
                raise ValueError(f"oracle {name!r} in {mod.__name__} has no query")
            if name in merged:
                raise ValueError(f"duplicate oracle {name!r} in {mod.__name__}")
            merged[name] = sql
    return merged
