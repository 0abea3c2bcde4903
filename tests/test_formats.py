"""File-format scan surface (SURVEY.md §2.5 row 1): parquet is the
native testdata format; CSV and JSON scans are exercised by
round-tripping a table through each format and comparing values.
Schema-on-read is explicit (never inferSchema in production paths —
inference is a full extra pass at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_wlg_metlink_spark.tables import load


def _sorted_rows(df, cols):
    return sorted(tuple(r[c] for r in [row] for c in cols) for row in df.collect())


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    src = load(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_csv")
    src.write.mode("overwrite").option("header", True).csv(path)
    back = (
        spark.read.schema("n_nationkey int, n_name string, n_regionkey int")
        .option("header", True)
        .csv(path)
    )
    cols = ["n_nationkey", "n_name", "n_regionkey"]
    assert _sorted_rows(back, cols) == _sorted_rows(src, cols)


def test_json_roundtrip(spark, sf_dir, tmp_path):
    src = load(spark, sf_dir, "region")
    path = str(tmp_path / "region_json")
    src.write.mode("overwrite").json(path)
    back = spark.read.schema("r_regionkey int, r_name string").json(path)
    cols = ["r_regionkey", "r_name"]
    assert _sorted_rows(back, cols) == _sorted_rows(src, cols)


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    """ORC is the other columnar scan Spark ships natively; round-trip
    the customer table and confirm predicate pushdown reaches the ORC
    scan the same way it does for parquet."""
    src = load(spark, sf_dir, "customer")
    path = str(tmp_path / "customer_orc")
    src.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    cols = ["c_custkey", "c_name", "c_nationkey"]
    assert _sorted_rows(back.select(*cols), cols) == _sorted_rows(
        src.select(*cols), cols
    )
    plan = (
        back.where(F.col("c_nationkey") == 3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "c_nationkey" in plan


def test_json_permissive_corrupt_record(spark, tmp_path):
    """S2's PERMISSIVE mode: malformed lines land in _corrupt_record
    instead of failing the scan (the skip-don't-crash policy,
    task.ts:195)."""
    p = tmp_path / "mixed.jsonl"
    p.write_text('{"a": 1}\n{definitely broken\n{"a": 3}\n')
    df = (
        spark.read.schema("a long, _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(p))
    )
    rows = df.collect()
    assert len(rows) == 3
    good = [r["a"] for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert sorted(good) == [1, 3] and len(bad) == 1


def test_json_failfast_raises(spark, tmp_path):
    """S2's FAILFAST analogue: the mode that turns a malformed record
    into a hard failure (the reference's top-level 'Invalid API
    response format' throw, task.ts:178)."""
    import pytest

    p = tmp_path / "bad.jsonl"
    p.write_text('{"a": 1}\n{broken\n')
    df = (
        spark.read.schema("a long")
        .option("mode", "FAILFAST")
        .json(str(p))
    )
    # surfaces as a file-read SparkException wrapping the malformed-
    # record failure (exact exception class varies by py4j conversion)
    with pytest.raises(Exception, match="FAILED_READ_FILE|Malformed|FAILFAST"):
        df.collect()


def test_parquet_partitioned_write_prunes(spark, sf_dir, tmp_path):
    """Partitioned layout + partition pruning: a filter on the
    partition column must prune directories (the scan's 'partition
    filters', not a data filter)."""
    src = load(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_by_status")
    src.write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
    back = spark.read.parquet(path).where(F.col("o_orderstatus") == "F")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "o_orderstatus" in plan
    assert back.count() == src.where(F.col("o_orderstatus") == "F").count()


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Schema evolution — the 100 TB reality that a corpus written over
    months gains columns: files written under an old schema and a new
    schema must read back as one table with mergeSchema, old rows
    NULL-filling the added column, and WITHOUT mergeSchema the read
    must still succeed on the first-listed schema (Spark's default
    picks one file's schema — documented footgun, pinned here)."""
    from pyspark.sql import functions as F

    out = str(tmp_path / "evolving")
    spark.range(5).select(
        F.col("id").alias("doc_id"), F.lit("v1").alias("source")
    ).write.parquet(out + "/batch=1")
    spark.range(5, 8).select(
        F.col("id").alias("doc_id"),
        F.lit("v2").alias("source"),
        F.lit(0.9).alias("quality"),
    ).write.parquet(out + "/batch=2")

    merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert set(merged.columns) >= {"doc_id", "source", "quality"}
    rows = {r["doc_id"]: r for r in merged.collect()}
    assert len(rows) == 8
    assert rows[0]["quality"] is None  # old rows null-fill
    assert rows[6]["quality"] == 0.9
    # column pruning still reaches the scan on the merged schema
    plan = (
        merged.select("doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "quality" not in plan.split("ReadSchema")[-1][:200]
