"""Contract tests for the driver surface: registry discipline, smoke
execution of every query at sf0.001, and the flagship entry()."""

from __future__ import annotations

import duckdb
import pytest

from __spark_entry__ import entry, oracle_sql, queries
from etl_wlg_metlink_spark.tables import TABLE_NAMES


def test_every_oracle_key_has_a_query():
    qs, os_ = queries(), oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) > 0


def test_oracle_sql_parses_in_duckdb(sf_dir):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    for name, sql in oracle_sql().items():
        try:
            con.execute(f"SELECT * FROM ({sql}) LIMIT 1")
        except Exception as e:  # noqa: BLE001
            pytest.fail(f"oracle for {name!r} failed in duckdb: {e}")


@pytest.mark.parametrize("name", sorted(queries()))
def test_query_runs_at_sf0001(spark, sf_dir, name):
    df = queries()[name](spark, sf_dir)
    assert df.columns, f"{name} returned no columns"
    # touch execution, not just planning
    df.limit(5).collect()


def test_entry_flagship(spark):
    rows = entry(spark).collect()
    assert len(rows) > 0
    assert {"l_returnflag", "l_linestatus", "sum_qty"} <= set(rows[0].asDict())
