from etl_wlg_metlink_spark.functions.scalar import (  # noqa: F401
    OCCUPANCY_LABELS,
    cot_key,
    epoch_seconds_to_ts,
    format_fixed,
    js_falsy_to_nan,
    kv_remarks,
    nullish_default_str,
    occupancy_label,
    split_head,
)
