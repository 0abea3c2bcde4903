"""Loaders for the driver's synthetic Parquet tables (TESTDATA.md).

One function per table so callers get column pruning + predicate
pushdown for free (Parquet scans are lazily planned by Catalyst).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    # The correctness driver hands us ITS OWN session (no engine confs);
    # every load goes through here, so pin the runtime-settable confs
    # our reads depend on (notably parquet nanos-as-long for events).
    from etl_wlg_metlink_spark.session import ensure_engine_conf

    ensure_engine_conf(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = _normalize_event_ts(df)
    return df


def _normalize_event_ts(df: DataFrame) -> DataFrame:
    """events.ts is parquet TIMESTAMP(NANOS); with
    ``spark.sql.legacy.parquet.nanosAsLong=true`` Spark surfaces it as a
    BIGINT of epoch nanoseconds. Normalize to a real TimestampType
    (microsecond precision — the data carries no sub-microsecond
    component) so downstream window/epoch logic is type-correct.

    Integer ``div`` — ns values (~1.7e18) exceed a double's 53-bit
    exact-integer range, so float division would corrupt low digits.
    """
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(ts_type, T.TimestampNTZType):
        # Defensive: if NTZ inference was on when the schema was built
        # (session tz is UTC, so the cast preserves the instant).
        df = df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return df


#: Respread threshold per core: when a table's bytes-on-disk are below
#: cores × this, the parquet scan cannot produce enough splits to keep
#: the machine busy (testdata is ONE file with ONE row group → one
#: task), so pre-shuffle map work serializes on a single core. 32 MB
#: per core ≈ a quarter of the default 128 MB split: past that the
#: scan itself yields ≥ cores/4 tasks and a respread shuffle costs
#: more than it buys.
SPREAD_BYTES_PER_CORE = 32 << 20


def _table_bytes(sf_dir: str, name: str) -> int:
    """Bytes on disk of a table (file or directory of part files) —
    the same signal the scan planner sizes splits from; cheap
    (metadata only) and safe (missing path → 0 → respread, which is
    always correct, just possibly unnecessary)."""
    import os

    path = f"{sf_dir}/{name}.parquet"
    if os.path.isfile(path):
        return os.path.getsize(path)
    total = 0
    try:
        # Recursive walk (ADVICE r16): a Hive-partitioned layout nests
        # key=value subdirectories; summing only top-level files would
        # measure ~0 bytes and inject the respread shuffle at exactly
        # the scale where it is an anti-pattern.
        for root, _dirs, files in os.walk(path):
            for f in files:
                try:
                    total += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass
    except OSError:
        return 0
    return total


def load_spread(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """``load()`` plus a SCALE-CONDITIONAL respread for lanes whose
    first heavy work is pre-shuffle map compute (explode, shingle
    hashing, per-row feature building). Small inputs scan as one task
    (single file, single row group), serializing that work on one
    core; at real scale the scan already yields ≥ cores of splits and
    an unconditional round-robin repartition would be an EXTRA full
    shuffle of the payload (guide §8's anti-pattern). Condition on
    bytes-on-disk so the respread exists exactly when the scan cannot
    parallelize by itself."""
    df = load(spark, sf_dir, name)
    cores = spark.sparkContext.defaultParallelism
    if _table_bytes(sf_dir, name) < cores * SPREAD_BYTES_PER_CORE:
        df = df.repartition(cores)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for the SQL API surface)."""
    for name in TABLE_NAMES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
