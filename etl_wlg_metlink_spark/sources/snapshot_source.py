"""Spark-4 Python **batch** DataSource for landed GTFS snapshot
directories — the batch twin of ``poll_source`` (which serves the same
files as a stream): a backfill/audit run reads EVERY landed snapshot as
one bounded DataFrame, one task per file.

    spark.read.format("metlink_snapshots").option("path", dir).load()
    -> snapshot string, landed_at double, raw string

Reference lineage: the reference's scheduled task reads exactly one
live response per invocation (task.ts:150-167); a production deployment
of the same pipeline lands every response in object storage, and the
batch reprocessing path ("rebuild the history after a transform fix")
is this source feeding the same downstream pipeline
(pipelines/metlink.run) the stream feeds.

Scale/parallelism contract: ``partitions()`` enumerates files on the
DRIVER (one listing), then each file is read by its OWN task on an
executor (``read(partition)`` runs remotely) — ingest parallelism is
the file count, not 1. Files are immutable once landed (the same
contract poll_source documents), so retries re-read identical bytes.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

__all__ = ["MetlinkSnapshotDataSource", "register", "snapshot_entities"]


class _FilePartition(InputPartition):
    def __init__(self, name: str) -> None:
        self.name = name


class MetlinkSnapshotDataSource(DataSource):
    """`spark.read.format("metlink_snapshots")` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "metlink_snapshots"

    def schema(self) -> str:
        return "snapshot string, landed_at double, raw string"

    def reader(self, schema) -> DataSourceReader:  # noqa: ARG002
        return _SnapshotBatchReader(self.options)


class _SnapshotBatchReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self._dir = options.get("path") or options.get("snapshot_dir")
        if not self._dir:
            raise ValueError(
                "metlink_snapshots requires option 'path' (or 'snapshot_dir')"
            )

    def partitions(self) -> list[InputPartition]:
        # driver-side listing; sorted so partition ids are stable for a
        # given directory state (deterministic task retry)
        return [
            _FilePartition(f)
            for f in sorted(os.listdir(self._dir))
            if f.endswith(".json")
        ]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        path = os.path.join(self._dir, partition.name)
        landed_at = os.path.getmtime(path)
        with open(path, encoding="utf-8") as f:
            yield (partition.name, landed_at, f.read())


def register(spark) -> None:
    """Idempotent `spark.dataSource.register` (same contract as
    poll_source.register)."""
    spark.dataSource.register(MetlinkSnapshotDataSource)


def snapshot_entities(spark, snapshot_dir: str):
    """All landed snapshots exploded to (snapshot, idx, entity) — the
    batch-backfill twin of poll_source.metlink_poll_stream, with the
    identical envelope-validation semantics (a malformed snapshot
    yields `entity IS NULL` rows to count/drop, not a crash; the
    reference's error→empty fallback, task.ts:180-188)."""
    from pyspark.sql import functions as F

    from etl_wlg_metlink_spark.schemas import VEHICLE_POSITIONS_RESPONSE

    register(spark)
    raw = (
        spark.read.format("metlink_snapshots")
        .option("path", snapshot_dir)
        .load()
    )
    parsed = raw.select(
        "snapshot",
        F.from_json(F.col("raw"), VEHICLE_POSITIONS_RESPONSE).alias("body"),
    )
    return parsed.select(
        "snapshot", F.posexplode_outer("body.entity").alias("idx", "entity")
    ).withColumn("idx", F.col("idx").cast("long"))
