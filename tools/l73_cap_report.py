"""Measure what l73's corpus-relative bucket cap actually discards
(ADVICE r11: "log/bank the dropped-bucket fraction as evidence").

Runs the EXACT production signature stage (_l73_signatures) per scale
dir, then reports per-band-key bucket statistics:

- buckets_total / buckets_over_cap: distinct (band_id, band_key) keys
  and how many exceed cap = max(L7_BUCKET_CAP_MIN, ceil(FRAC*N)).
- rows_dropped_frac: fraction of the 8N exploded (doc, band) rows that
  sit in an over-cap bucket — the honest recall-side number, since a
  pair is missed only when EVERY band it shares is over-cap.
- docs_all_bands_dropped: documents whose ENTIRE band set is over-cap —
  these can only be found if some other doc shares nothing; they are
  invisible to the candidate join entirely.

Usage: python tools/l73_cap_report.py [sf_dir ...]
"""

from __future__ import annotations

import json
import math
import sys

sys.path.insert(0, ".")

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from etl_wlg_metlink_spark.operators.llm_pipeline import (  # noqa: E402
    L7_BUCKET_CAP_FRAC,
    L7_BUCKET_CAP_MIN,
    L73_BANDS,
    _l73_signatures,
)
from etl_wlg_metlink_spark.session import build_session  # noqa: E402


def report(spark, sf_dir: str) -> dict:
    sig, n_docs = _l73_signatures(spark, sf_dir)
    cap = max(L7_BUCKET_CAP_MIN, math.ceil(L7_BUCKET_CAP_FRAC * n_docs))
    band_structs = [
        F.struct(
            F.lit(k).alias("band_id"),
            F.element_at("bands", k + 1).alias("band_key"),
        )
        for k in range(L73_BANDS)
    ]
    exploded = sig.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("band")
    ).select("doc_id", "band.band_id", "band.band_key")
    bw = Window.partitionBy("band_id", "band_key")
    tagged = exploded.withColumn(
        "over", (F.count("*").over(bw) > cap).cast("int")
    )
    buckets = (
        tagged.groupBy("band_id", "band_key")
        .agg(F.max("over").alias("over"))
        .agg(
            F.count("*").alias("buckets_total"),
            F.sum("over").alias("buckets_over_cap"),
        )
        .first()
    )
    rows = tagged.agg(
        F.count("*").alias("rows_total"),
        F.sum("over").alias("rows_dropped"),
    ).first()
    all_dropped = (
        tagged.groupBy("doc_id")
        .agg(F.min("over").alias("all_over"))
        .where(F.col("all_over") == 1)
        .count()
    )
    return {
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "cap": cap,
        "buckets_total": buckets["buckets_total"],
        "buckets_over_cap": int(buckets["buckets_over_cap"]),
        "rows_total": rows["rows_total"],
        "rows_dropped": int(rows["rows_dropped"]),
        "rows_dropped_frac": round(
            rows["rows_dropped"] / max(1, rows["rows_total"]), 4
        ),
        "docs_all_bands_dropped": all_dropped,
        "docs_all_bands_dropped_frac": round(
            all_dropped / max(1, n_docs), 4
        ),
    }


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    spark = build_session()
    for d in dirs:
        print(json.dumps(report(spark, d)))


if __name__ == "__main__":
    main()
