"""Generate a 10×-sf0.1 ("sf1") copy of the driver's synthetic tables
for the scale-proof run (VERDICT r06 item 1).

/root/testdata is read-only, so sf1 lands in a scratch dir (default
/tmp/spark_graft_scale/sf1) as ONE parquet file per table — the same
layout the driver uses (parquet files are byte-range splittable, so a
single file still scans in parallel).

Method: union REPLICAS offset copies of sf0.1. Key columns shift by
replica × (table cardinality) so every foreign key keeps pointing at
its replica's parent (customer↔orders↔lineitem, part/supplier,
events.user_id→customer). Content columns are PERTURBED per replica
where identity would manufacture artificial duplicates:

- documents.text: every token gets an `x{k}` suffix in replica k>0
  (cross-replica exact/near/containment dups would otherwise explode
  dedup-lane outputs combinatorially — a data-character change that
  would corrupt the scaling exponents this dataset exists to measure;
  within-replica dup structure is preserved, so dedup output grows
  linearly, which is the honest scale shape).
- embeddings.embedding: small deterministic per-replica, per-dim
  offset (same reasoning for ANN/semantic-dedup lanes).

Fixed dims (region, nation) copy as-is. Determinism: pure column
expressions, no randomness — re-running reproduces byte-identical
values.

Usage:  python tools/gen_scale_data.py [out_dir] [replicas] [tables]

``tables`` (comma-separated, default all) limits generation to a
slice — e.g. ``documents,events`` at 100 replicas builds the sf10
sketch-probe dataset (VERDICT r15 item 7) without paying for a 100×
lineitem nobody reads.
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from etl_wlg_metlink_spark.session import build_session  # noqa: E402
from etl_wlg_metlink_spark.tables import TABLE_NAMES, load  # noqa: E402

SRC = "/root/testdata/sf0.1"

#: per-table key cardinalities at sf0.1 (offsets per replica)
CARD = {
    "customer": 15_000,
    "supplier": 1_000,
    "part": 20_000,
    "orders": 150_000,
    "events": 100_000,
    "documents": 5_000,
    "embeddings": 2_000,
}


def _replica(name: str, df: DataFrame, k: int) -> DataFrame:
    if name in ("region", "nation"):
        return df if k == 0 else None
    if name == "customer":
        return df.withColumn(
            "c_custkey", F.col("c_custkey") + k * CARD["customer"]
        )
    if name == "supplier":
        return df.withColumn(
            "s_suppkey", F.col("s_suppkey") + k * CARD["supplier"]
        )
    if name == "part":
        return df.withColumn("p_partkey", F.col("p_partkey") + k * CARD["part"])
    if name == "orders":
        return df.withColumn(
            "o_orderkey", F.col("o_orderkey") + k * CARD["orders"]
        ).withColumn("o_custkey", F.col("o_custkey") + k * CARD["customer"])
    if name == "lineitem":
        return (
            df.withColumn(
                "l_orderkey", F.col("l_orderkey") + k * CARD["orders"]
            )
            .withColumn("l_partkey", F.col("l_partkey") + k * CARD["part"])
            .withColumn("l_suppkey", F.col("l_suppkey") + k * CARD["supplier"])
        )
    if name == "events":
        return df.withColumn(
            "event_id", F.col("event_id") + k * CARD["events"]
        ).withColumn("user_id", F.col("user_id") + k * CARD["customer"])
    if name == "documents":
        df = df.withColumn("doc_id", F.col("doc_id") + k * CARD["documents"])
        if k > 0:
            df = df.withColumn(
                "text", F.regexp_replace("text", r"(\S+)", f"$1x{k}")
            ).withColumn("n_chars", F.length("text").cast("long"))
        return df
    if name == "embeddings":
        df = df.withColumn("vec_id", F.col("vec_id") + k * CARD["embeddings"])
        if k > 0:
            df = df.withColumn(
                "embedding",
                F.transform(
                    "embedding",
                    lambda x, i: (
                        x
                        + ((F.lit(k * 31) + i * 7) % 13 - 6).cast("float")
                        * F.lit(0.003).cast("float")
                    ).cast("float"),
                ),
            )
        return df
    raise ValueError(name)


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale/sf1"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    names = (
        sys.argv[3].split(",") if len(sys.argv) > 3 else list(TABLE_NAMES)
    )
    unknown = set(names) - set(TABLE_NAMES)
    if unknown:
        raise SystemExit(f"unknown tables: {sorted(unknown)}")
    os.makedirs(out, exist_ok=True)
    spark = build_session(app_name="gen_scale_data")
    for name in names:
        src = load(spark, SRC, name)
        parts = [
            r
            for r in (_replica(name, src, k) for k in range(replicas))
            if r is not None
        ]
        full = parts[0]
        for p in parts[1:]:
            full = full.unionByName(p)
        stage = os.path.join(out, f"_stage_{name}")
        full.coalesce(1).write.mode("overwrite").parquet(stage)
        part_file = next(
            f for f in os.listdir(stage) if f.startswith("part-")
        )
        shutil.move(
            os.path.join(stage, part_file),
            os.path.join(out, f"{name}.parquet"),
        )
        shutil.rmtree(stage)
        print(f"{name}: {spark.read.parquet(out + '/' + name + '.parquet').count()} rows")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
