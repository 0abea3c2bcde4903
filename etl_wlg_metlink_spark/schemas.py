"""S7 — explicit StructType registry + introspection.

The reference declares its schemas twice (TS interface task.ts:57-83,
TypeBox runtime schema task.ts:85-113) and exposes them via
`schema(type, flow)` (task.ts:124-137). Here each schema is a single
StructType; `describe()` is the introspection surface
(≈ `df.schema.json()`).
"""

from __future__ import annotations

from pyspark.sql import types as T

#: GTFS-RT VehiclePositions entity (task.ts:57-83). Optional TS fields
#: are nullable columns; Spark fields are nullable by default.
VEHICLE_ENTITY = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField(
            "vehicle",
            T.StructType(
                [
                    T.StructField(
                        "trip",
                        T.StructType(
                            [
                                T.StructField("trip_id", T.StringType()),
                                T.StructField("route_id", T.LongType()),
                                T.StructField("direction_id", T.LongType()),
                                T.StructField("start_time", T.StringType()),
                                T.StructField("start_date", T.StringType()),
                                T.StructField(
                                    "schedule_relationship", T.LongType()
                                ),
                            ]
                        ),
                    ),
                    T.StructField(
                        "position",
                        T.StructType(
                            [
                                T.StructField("latitude", T.DoubleType()),
                                T.StructField("longitude", T.DoubleType()),
                                T.StructField("bearing", T.DoubleType()),
                                T.StructField("speed", T.DoubleType()),
                            ]
                        ),
                    ),
                    T.StructField("timestamp", T.LongType()),
                    T.StructField(
                        "vehicle",
                        T.StructType([T.StructField("id", T.StringType())]),
                    ),
                    T.StructField("occupancy_status", T.LongType()),
                    T.StructField("current_stop_sequence", T.LongType()),
                    T.StructField("stop_id", T.StringType()),
                    T.StructField("current_status", T.LongType()),
                ]
            ),
        ),
    ]
)

#: Response envelope `{header, entity[]}` (task.ts:174-175). header is
#: carried as an opaque string map — the reference never reads it.
VEHICLE_POSITIONS_RESPONSE = T.StructType(
    [
        T.StructField("header", T.MapType(T.StringType(), T.StringType())),
        T.StructField("entity", T.ArrayType(VEHICLE_ENTITY)),
    ]
)

REGISTRY: dict[str, T.StructType] = {
    "gtfs_rt_entity": VEHICLE_ENTITY,
    "gtfs_rt_vehicle_positions": VEHICLE_POSITIONS_RESPONSE,
}


def describe(name: str) -> str:
    """Introspection: JSON schema string for a registered StructType
    (≈ reference `schema()` returning the TypeBox object)."""
    return REGISTRY[name].json()


def schema(schema_type: str = "input", flow: str = "incoming"):
    """The reference's three-way `schema(type, flow)` dispatch
    (task.ts:124-137), spelled for this engine:

    - incoming + input  → the config FORM schema (the Env object the
      UI renders as a settings form — task.ts:129-130); returns the
      JSON-schema dict from MetlinkConfig.form_schema().
    - incoming + output → the GTFS-RT response StructType
      (MetlinkResponse, task.ts:131-132).
    - outgoing  + *     → an empty object schema (task.ts:134-135 —
      the task has no outgoing flow).

    Unknown ``schema_type``/``flow`` literals raise ValueError: the
    reference's dispatch is over compile-time enums, so a typo there
    is impossible — lenient fallback here would silently hand a
    caller the wrong schema.
    """
    if schema_type not in ("input", "output"):
        raise ValueError(
            f"unknown schema_type {schema_type!r}; expected 'input' or 'output'"
        )
    if flow not in ("incoming", "outgoing"):
        raise ValueError(
            f"unknown flow {flow!r}; expected 'incoming' or 'outgoing'"
        )
    if flow == "incoming":
        if schema_type == "input":
            from etl_wlg_metlink_spark.config import MetlinkConfig

            return MetlinkConfig.form_schema()
        return VEHICLE_POSITIONS_RESPONSE
    return T.StructType([])
