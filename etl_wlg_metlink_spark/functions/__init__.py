from etl_wlg_metlink_spark.functions.scalar import (  # noqa: F401
    cot_key,
    format_fixed,
    js_falsy_to_nan,
    nullish_default_str,
    occupancy_label,
    split_head,
)
