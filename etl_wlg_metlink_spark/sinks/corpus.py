"""Materialized dedup write path: manifest → deduplicated corpus on
disk (VERDICT r4 stretch item 7).

l29 produces the per-document keep/drop manifest; this sink composes
the final step every production dedup ships — anti-join the drop set
and persist the surviving corpus as a **bucketed** Parquet table keyed
by the canonical content fingerprint.

Why bucket by fingerprint:

- Incremental ingest (the l25 pattern) joins every new batch against
  the corpus on the fingerprint. With the corpus bucketed on ``fp``,
  that join needs NO shuffle of the corpus side — only the (small)
  batch is shuffled into matching buckets. At 100 TB the corpus-side
  shuffle is the whole cost; bucketing amortizes it once at write time
  across every future ingest.
- Bucket pruning: an exact-fp point lookup touches one bucket.

Scale shape of the write itself:

- The drop relation is bounded by the number of CLUSTERED documents
  (near-dups only — tiny vs the corpus), so the anti-join broadcasts
  it; the corpus never shuffles for the join.
- The only corpus shuffle is the explicit ``repartition`` on the
  bucket key, which exists to make each task own whole buckets —
  otherwise every task writes a file per bucket and a 1000-executor
  run emits n_tasks × n_buckets small files. Spark's bucketed-table
  hash (Murmur3 on the column) matches ``repartition``'s hash
  partitioning, so the write lands one file per bucket.
- At 100 TB, ``n_buckets`` is sized so one bucket ≈ one HDFS-block-ish
  file (corpus_bytes / 256 MiB); the default here is test-scale.

Reference lineage: the reference's sink is a one-envelope HTTP submit
(task.ts:335-341); this is the unbounded-scale generalization of
"persist the processed snapshot", composed with the dedup lane the
north star adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_wlg_metlink_spark.tables import load


def dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The surviving corpus: full document rows minus l29's drop set,
    with the canonical content fingerprint (l5's md5-over-sorted-
    distinct-words) attached as the future join/bucket key."""
    from etl_wlg_metlink_spark.operators.llm_pipeline import l29_dedup_manifest

    docs = load(spark, sf_dir, "documents")
    drops = (
        l29_dedup_manifest(spark, sf_dir)
        .where(F.col("verdict") == "drop")
        .select("doc_id")
    )
    fp = F.md5(
        F.array_join(F.array_sort(F.array_distinct(F.split(F.col("text"), " "))), " ")
    )
    return docs.join(F.broadcast(drops), "doc_id", "left_anti").withColumn("fp", fp)


def write_dedup_corpus(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    path: str,
    n_buckets: int = 8,
) -> dict:
    """Anti-join the manifest drop set and write the surviving corpus
    as an external Parquet table bucketed (and sorted within buckets)
    by fingerprint. Returns the A3-style counters the reference logs
    per run (task.ts:176, 332, 340): received / dropped / written."""
    survivors = dedup_survivors(spark, sf_dir).repartition(n_buckets, F.col("fp"))
    (
        survivors.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, "fp")
        .sortBy("fp")
        .saveAsTable(table)
    )
    n_total = load(spark, sf_dir, "documents").count()
    n_written = spark.table(table).count()
    return {
        "received": n_total,
        "dropped": n_total - n_written,
        "written": n_written,
    }


def write_corpus_build(
    spark: SparkSession,
    sf_dir: str,
    path: str,
    table: str = "corpus_build",
    n_buckets: int = 8,
) -> tuple[dict, DataFrame]:
    """The engine's flagship one-command story (VERDICT r5 stretch 7):
    run the FULL l42 corpus build (near-dup dedup → quality gate →
    temperature mixture) and land the kept documents as a bucketed
    Parquet table — l42's audit rollup and this write share the same
    kept-relation plan, so the written corpus is by construction the
    one the audit describes.

    The mixture columns (n_clean, rate) ride along in the written
    schema; the returned audit DataFrame is computed FROM THE WRITTEN
    TABLE, which makes the CLI's printed audit a read-back proof, not
    an in-plan claim. Returns (counters, audit_df)."""
    from etl_wlg_metlink_spark.operators.llm_pipeline import (
        _corpus_audit_rollup,
        _corpus_build_kept,
    )

    kept = _corpus_build_kept(spark, sf_dir)
    fp = F.md5(
        F.array_join(F.array_sort(F.array_distinct(F.split(F.col("text"), " "))), " ")
    )
    out = kept.withColumn("fp", fp).repartition(n_buckets, F.col("fp"))
    (
        out.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, "fp")
        .sortBy("fp")
        .saveAsTable(table)
    )
    written = spark.table(table)
    n_total = load(spark, sf_dir, "documents").count()
    n_written = written.count()
    counters = {
        "received": n_total,
        "dropped": n_total - n_written,
        "written": n_written,
    }
    return counters, _corpus_audit_rollup(written.drop("fp"))
