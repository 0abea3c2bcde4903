"""Driver-contract queries for the composed Metlink pipeline (M4).

The fixture is deterministic (pipelines/gtfs_fixture.py) and the
oracle side is a VALUES table rendered from the pure-Python
mini-oracle — so the driver's gate compares the whole composed
DataFrame pipeline (source validation → filters → derivations →
dedup → feature assembly) against an independent re-encoding of
/root/reference/task.ts:147-342, not against Spark itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_wlg_metlink_spark.config import MetlinkConfig
from etl_wlg_metlink_spark.pipelines import metlink
from etl_wlg_metlink_spark.pipelines.gtfs_fixture import (
    RAW_JSON,
    oracle_features,
)
from etl_wlg_metlink_spark.sources import gtfs

_COLS = (
    "ord", "fid", "callsign", "time_utc", "speed", "course",
    "marker_color", "stale", "remarks", "icon", "lon", "lat",
)


def _flatten(features: DataFrame) -> DataFrame:
    f = F.col("feature")
    p = f["properties"]
    w = Window.orderBy("first_idx")

    def _nan_null(c):
        return F.when(F.isnan(c), F.lit(None)).otherwise(c)

    return features.select(
        F.row_number().over(w).cast("long").alias("ord"),
        f["id"].alias("fid"),
        p["callsign"].alias("callsign"),
        F.date_format(p["time"], "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").alias("time_utc"),
        _nan_null(p["speed"]).alias("speed"),
        _nan_null(p["course"]).alias("course"),
        p["marker-color"].alias("marker_color"),
        p["stale"].cast("long").alias("stale"),
        p["remarks"].alias("remarks"),
        p["icon"].alias("icon"),
        f["geometry"]["coordinates"].getItem(0).alias("lon"),
        f["geometry"]["coordinates"].getItem(1).alias("lat"),
    )


def m1_metlink_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full composed pipeline on the branch-covering fixture."""
    entities = gtfs.entities_from_json(spark, RAW_JSON)
    return _flatten(metlink.build_features(entities, MetlinkConfig()))


def m2_metlink_config_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 through the composed pipeline: buses hidden by config."""
    entities = gtfs.entities_from_json(spark, RAW_JSON)
    cfg = MetlinkConfig(show_buses=False)
    return _flatten(metlink.build_features(entities, cfg))


def m3_metlink_empty_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 error→empty path: a failing fetch yields zero features but a
    stable schema."""
    def failing_fetch(url, headers):
        raise OSError("network down")

    entities = gtfs.fetch_entities(spark, "key", fetch_json=failing_fetch)
    return _flatten(metlink.build_features(entities, MetlinkConfig()))


def _sql_lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return repr(v)


def _values_oracle(enabled=("Bus", "Train", "Ship")) -> str:
    feats = oracle_features(enabled=enabled)
    rows = []
    for i, f in enumerate(feats, start=1):
        p = f["properties"]
        rows.append(
            "("
            + ", ".join(
                _sql_lit(v)
                for v in (
                    i, f["id"], p["callsign"], p["time"], p.get("speed"),
                    p.get("course"), p["marker-color"], p["stale"],
                    p["remarks"], p["icon"],
                    f["geometry"]["coordinates"][0],
                    f["geometry"]["coordinates"][1],
                )
            )
            + ")"
        )
    cols = ", ".join(_COLS)
    # explicit casts: VALUES would otherwise infer DECIMAL for float
    # literals (3.5 → '3.50') and hash-mismatch Spark's doubles
    select = (
        "SELECT ord, fid, callsign, time_utc, speed::DOUBLE AS speed,"
        " course::DOUBLE AS course, marker_color, stale, remarks, icon,"
        " lon::DOUBLE AS lon, lat::DOUBLE AS lat"
    )
    return f"{select} FROM (VALUES\n" + ",\n".join(rows) + f"\n) AS t({cols})"


_EMPTY_ORACLE = (
    "SELECT NULL::BIGINT AS ord, NULL::VARCHAR AS fid,"
    " NULL::VARCHAR AS callsign, NULL::VARCHAR AS time_utc,"
    " NULL::DOUBLE AS speed, NULL::DOUBLE AS course,"
    " NULL::VARCHAR AS marker_color, NULL::BIGINT AS stale,"
    " NULL::VARCHAR AS remarks, NULL::VARCHAR AS icon,"
    " NULL::DOUBLE AS lon, NULL::DOUBLE AS lat WHERE FALSE"
)

QUERIES = {
    "m1_metlink_pipeline": m1_metlink_pipeline,
    "m2_metlink_config_filter": m2_metlink_config_filter,
    "m3_metlink_empty_fallback": m3_metlink_empty_fallback,
}

ORACLE = {
    "m1_metlink_pipeline": _values_oracle(),
    "m2_metlink_config_filter": _values_oracle(enabled=("Train", "Ship")),
    "m3_metlink_empty_fallback": _EMPTY_ORACLE,
}
