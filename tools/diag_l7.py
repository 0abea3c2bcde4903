"""Diagnose l7_ngram_jaccard's sf1 super-linearity (VERDICT r07 item 2).

Measures, at sf0.1 and sf1:
  - candidate pair count (post-banding, pre-verify)
  - verified pair count (jaccard >= 0.5) and its cross- vs
    within-replica split (replica = doc_id // 5000 at sf1)
  - band bucket-size distribution (top widths)
  - per-stage wall times (gram hash, banding+candidates, verify)

Usage: python tools/diag_l7.py [sf_dir ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.storagelevel import StorageLevel  # noqa: E402

from etl_wlg_metlink_spark.session import build_session  # noqa: E402
from etl_wlg_metlink_spark.tables import load  # noqa: E402
from etl_wlg_metlink_spark.operators.llm_pipeline import (  # noqa: E402
    L7_BUCKET_CAP_FRAC,
    L7_BUCKET_CAP_MIN,
    MERSENNE_P,
    N_BANDS_L7,
    UH_PARAMS_L7,
    _banded_candidates,
    _md5_int60,
    _uh_perm,
)


def diag(spark, sf_dir: str) -> None:
    print(f"\n=== {sf_dir} ===")
    docs = load(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    cg = F.array_distinct(
        F.expr(r"regexp_extract_all(text, '(?s)(?=(.{4}))', 1)")
    )
    base = docs.select("doc_id", cg.alias("cg")).where(F.size("cg") > 0)
    hashed = base.select(
        "doc_id",
        F.transform(F.col("cg"), lambda x: _md5_int60(x) % MERSENNE_P).alias(
            "hs"
        ),
    ).persist(StorageLevel.MEMORY_AND_DISK)

    t0 = time.time()
    n_docs = hashed.count()
    t_hash = time.time() - t0
    print(f"docs={n_docs}  gram-hash stage {t_hash:.1f}s")

    # the SAME corpus-relative sub-block cap l7 itself applies
    import math as _math

    cap = max(L7_BUCKET_CAP_MIN, _math.ceil(L7_BUCKET_CAP_FRAC * n_docs))
    print(f"bucket cap = {cap} (drop over-cap buckets)")
    cand = _banded_candidates(
        hashed, UH_PARAMS_L7, N_BANDS_L7, max_bucket=cap
    ).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    t0 = time.time()
    n_cand = cand.count()
    t_cand = time.time() - t0
    print(f"candidates={n_cand}  banding+join stage {t_cand:.1f}s")
    print(f"  cand/doc = {n_cand / max(n_docs, 1):.1f}")

    # replica split (sf0.1 => all replica 0)
    rep = cand.select(
        (F.col("doc_i") / 5000).cast("long").alias("ri"),
        (F.col("doc_j") / 5000).cast("long").alias("rj"),
    )
    cross = rep.where(F.col("ri") != F.col("rj")).count()
    print(f"  cross-replica candidates = {cross} ({100*cross/max(n_cand,1):.1f}%)")

    # verify stage
    hset = F.array_distinct(F.col("hs"))
    si = hashed.select(F.col("doc_id").alias("doc_i"), hset.alias("sh_i"))
    sj = hashed.select(F.col("doc_id").alias("doc_j"), hset.alias("sh_j"))
    jac = F.size(F.array_intersect("sh_i", "sh_j")) / F.size(
        F.array_union("sh_i", "sh_j")
    )
    t0 = time.time()
    ver = (
        cand.join(si, "doc_i")
        .join(sj, "doc_j")
        .withColumn("jaccard", F.round(jac, 4))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_pairs = ver.where(F.col("jaccard") >= 0.5).count()
    t_ver = time.time() - t0
    print(f"verified pairs (j>=0.5) = {n_pairs}  verify stage {t_ver:.1f}s")
    vr = ver.select(
        (F.col("doc_i") / 5000).cast("long").alias("ri"),
        (F.col("doc_j") / 5000).cast("long").alias("rj"),
        "jaccard",
    )
    cross_v = vr.where(
        (F.col("ri") != F.col("rj")) & (F.col("jaccard") >= 0.5)
    ).count()
    print(f"  cross-replica verified = {cross_v}")
    # jaccard distribution of candidates
    dist = (
        ver.select(F.floor(F.col("jaccard") * 10).alias("b"))
        .groupBy("b")
        .count()
        .orderBy("b")
        .collect()
    )
    print("  jaccard histogram (decile):", {r["b"]: r["count"] for r in dist})

    # bucket width distribution
    rows = len(UH_PARAMS_L7) // N_BANDS_L7
    sig = hashed.select(
        "doc_id",
        *[
            F.array_min(F.transform(F.col("hs"), _uh_perm(a, b))).alias(f"mh{s}")
            for s, (a, b) in enumerate(UH_PARAMS_L7)
        ],
    )
    band_structs = [
        F.struct(
            F.lit(bi).alias("band_id"),
            F.md5(
                F.concat_ws(
                    "_", *[F.col(f"mh{rows * bi + j}") for j in range(rows)]
                )
            ).alias("band_key"),
        )
        for bi in range(N_BANDS_L7)
    ]
    bands = sig.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("band")
    ).select("doc_id", "band.band_id", "band.band_key")
    widths = (
        bands.groupBy("band_id", "band_key")
        .count()
        .where(F.col("count") > 1)
        .orderBy(F.col("count").desc())
    )
    top = widths.limit(10).collect()
    print("  top bucket widths:", [r["count"] for r in top])
    tot = widths.select(
        F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("p")
    ).collect()[0]["p"]
    print(f"  sum over buckets of C(w,2) (pre-distinct pair slots) = {tot}")
    ver.unpersist()
    cand.unpersist()
    hashed.unpersist()


def main() -> None:
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.1",
        "/tmp/spark_graft_scale/sf1",
    ]
    spark = build_session(app_name="diag_l7")
    for d in dirs:
        diag(spark, d)


if __name__ == "__main__":
    main()
