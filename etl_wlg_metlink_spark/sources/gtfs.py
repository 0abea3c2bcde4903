"""S1-S3, S9 — GTFS-RT VehiclePositions source: ingest a raw JSON
envelope, validate it, explode to one row per entity, with the
reference's two-level error policy:

- envelope level (S2, task.ts:174-179): body must be an object with an
  `entity` array, else `InvalidEnvelopeError` — the `from_json`
  FAILFAST analogue;
- record level (task.ts:195): a malformed/missing per-entity `vehicle`
  or `position` is tolerated here (NULL struct) and dropped by the
  pipeline's P2 filter — the PERMISSIVE analogue;
- error→empty fallback (S3, task.ts:180-188) is `empty_entities()`,
  which callers use in their try/except around fetch+parse.

The HTTP fetch itself (task.ts:155-160) is driver-side by design: one
poll returns O(10²-10³) records — a snapshot micro-batch, not bulk
data. `fetch_json` is injectable so tests/offline runs never touch the
network.
"""

from __future__ import annotations

import json
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_wlg_metlink_spark.schemas import (
    VEHICLE_ENTITY,
    VEHICLE_POSITIONS_RESPONSE,
)

METLINK_VEHICLE_POSITIONS_URL = (
    "https://api.opendata.metlink.org.nz/v1/gtfs-rt/vehiclepositions"
)


class InvalidEnvelopeError(ValueError):
    """Reference task.ts:178: 'Invalid API response format: missing
    entity data'."""


def entities_from_json(spark: SparkSession, raw_json: str, debug: bool = False) -> DataFrame:
    """Parse one raw envelope string → DataFrame of entity rows.

    Driver-side envelope validation mirrors the reference exactly:
    parseable object + `entity` list, else raise. Per-entity shape
    problems become NULL struct fields (PERMISSIVE) for downstream
    filters to drop.
    """
    if debug:  # S9 — bounded debug sample (task.ts:169-171)
        print(f"Raw API response: {raw_json[:1000]}...")
    try:
        body = json.loads(raw_json)
    except json.JSONDecodeError as e:
        raise InvalidEnvelopeError(f"unparseable response: {e}") from e
    if not (isinstance(body, dict) and isinstance(body.get("entity"), list)):
        raise InvalidEnvelopeError(
            "Invalid API response format: missing entity data"
        )
    # one-row DataFrame of the raw string → from_json with the declared
    # schema → posexplode (the array position is the authoritative
    # ingest order, which last-wins dedup keys on); Catalyst prunes
    # unread entity fields.
    raw_df = spark.createDataFrame([(raw_json,)], "raw string")
    parsed = raw_df.select(
        F.from_json(F.col("raw"), VEHICLE_POSITIONS_RESPONSE).alias("body")
    )
    return parsed.select(
        F.posexplode("body.entity").alias("idx", "entity")
    ).withColumn("idx", F.col("idx").cast("long"))


def empty_entities(spark: SparkSession) -> DataFrame:
    """S3 — the error→empty fallback input (an empty DataFrame with the
    entity schema, which the pipeline turns into an empty
    FeatureCollection, task.ts:183-186)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("idx", T.LongType()),
            T.StructField("entity", VEHICLE_ENTITY),
        ]
    )
    return spark.createDataFrame([], schema)


def fetch_entities(
    spark: SparkSession,
    api_key: str,
    fetch_json: Callable[[str, dict], str] | None = None,
    debug: bool = False,
) -> DataFrame:
    """S1 — the polled source: fetch + validate, with the S3 fallback.

    `fetch_json(url, headers) -> str` is injectable; the default uses
    urllib (stdlib) and is only exercised against a live endpoint.
    """
    headers = {"accept": "application/json", "x-api-key": api_key}
    if fetch_json is None:
        fetch_json = _urllib_fetch
    try:
        raw = fetch_json(METLINK_VEHICLE_POSITIONS_URL, headers)
        return entities_from_json(spark, raw, debug=debug)
    except Exception as e:  # noqa: BLE001 — any fetch/parse error → empty FC
        print(f"Error fetching Metlink data: {e}")
        return empty_entities(spark)


def _urllib_fetch(url: str, headers: dict) -> str:
    import urllib.request

    req = urllib.request.Request(url, headers=headers)
    with urllib.request.urlopen(req, timeout=30) as resp:  # noqa: S310
        return resp.read().decode("utf-8")
