"""Measure what l73's corpus-relative bucket cap actually makes
unjoinable (ADVICE r11: "log/bank the dropped-bucket fraction as
evidence"; VERDICT r12 item 1: re-banked for the SPLIT cap).

Runs the EXACT production signature stage (_l73_signatures) per scale
dir, then measures the production candidate-key discipline — over-cap
primary (band_id, band_key) buckets are SPLIT by the secondary byte
into 16-bit refined buckets, and only still-over-cap refined buckets
are dropped — and reports:

- buckets_total / buckets_over_cap: distinct primary (band_id,
  band_key) keys and how many exceed cap = max(L7_BUCKET_CAP_MIN,
  ceil(FRAC*N)). Under the split these are REFINED, not dropped; the
  count shows how much splitting the corpus demands.
- refined_buckets_dropped: refined (band_id, band_key, jk2) buckets
  still over cap at depth 2 — the only rows the engine now drops.
- rows_unjoinable_frac: fraction of the 8N exploded (doc, band) rows
  that end in a dropped refined bucket — the honest recall-side
  number, since a pair is missed only when EVERY band it shares is
  unjoinable.
- docs_all_bands_unjoinable: documents whose ENTIRE band set lands in
  dropped refined buckets — invisible to the candidate join entirely.
  Under the r11/r12 drop-at-depth-1 cap this was 88.3% of sf1 docs;
  the split exists to push it to ~0.

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
    # mirror _l73_pairs' candidate-key discipline exactly
    band_structs = [
        F.struct(
            F.lit(k).alias("band_id"),
            F.element_at("bands", k + 1).alias("band_key"),
            F.element_at("bands", (k + 1) % L73_BANDS + 1).alias("band_key2"),
        )
        for k in range(L73_BANDS)
    ]
    exploded = sig.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("band")
    ).select("doc_id", "band.band_id", "band.band_key", "band.band_key2")
    w1 = Window.partitionBy("band_id", "band_key")
    lvl = exploded.withColumn("bwidth", F.count("*").over(w1)).withColumn(
        "jk2",
        F.when(F.col("bwidth") <= cap, F.lit(-1)).otherwise(
            F.col("band_key2")
        ),
    )
    w2 = Window.partitionBy("band_id", "band_key", "jk2")
    tagged = lvl.withColumn(
        "over1", (F.col("bwidth") > cap).cast("int")
    ).withColumn("unjoinable", (F.count("*").over(w2) > cap).cast("int"))
    tagged = tagged.localCheckpoint(eager=True)  # 3 aggs over one pass
    buckets = (
        tagged.groupBy("band_id", "band_key")
        .agg(F.max("over1").alias("over"))
        .agg(
            F.count("*").alias("buckets_total"),
            F.sum("over").alias("buckets_over_cap"),
        )
        .first()
    )
    refined_dropped = (
        tagged.where(F.col("unjoinable") == 1)
        .select("band_id", "band_key", "jk2")
        .distinct()
        .count()
    )
    rows = tagged.agg(
        F.count("*").alias("rows_total"),
        F.sum("unjoinable").alias("rows_unjoinable"),
    ).first()
    all_unjoinable = (
        tagged.groupBy("doc_id")
        .agg(F.min("unjoinable").alias("all_un"))
        .where(F.col("all_un") == 1)
        .count()
    )
    return {
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "cap": cap,
        "buckets_total": buckets["buckets_total"],
        "buckets_over_cap": int(buckets["buckets_over_cap"]),
        "refined_buckets_dropped": refined_dropped,
        "rows_total": rows["rows_total"],
        "rows_unjoinable": int(rows["rows_unjoinable"]),
        "rows_unjoinable_frac": round(
            rows["rows_unjoinable"] / max(1, rows["rows_total"]), 4
        ),
        "docs_all_bands_unjoinable": all_unjoinable,
        "docs_all_bands_unjoinable_frac": round(
            all_unjoinable / max(1, n_docs), 4
        ),
    }


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    spark = build_session()
    for d in dirs:
        print(json.dumps(report(spark, d)))


if __name__ == "__main__":
    main()
