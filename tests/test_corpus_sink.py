"""Round-trip test for the materialized dedup write path
(sinks/corpus.py): manifest → anti-join → bucketed Parquet table →
read back and match l29's keep set, plus the scale property the
bucketing buys (no corpus-side shuffle for a fingerprint join)."""

from __future__ import annotations

from __spark_entry__ import queries
from etl_wlg_metlink_spark.sinks.corpus import write_dedup_corpus


def test_dedup_corpus_roundtrip(spark, sf_dir, tmp_path):
    table = "dedup_corpus_roundtrip"
    try:
        counters = write_dedup_corpus(
            spark, sf_dir, table, str(tmp_path / "corpus"), n_buckets=4
        )
        manifest = queries()["l29_dedup_manifest"](spark, sf_dir).collect()
        keep = {r["doc_id"] for r in manifest if r["verdict"] == "keep"}
        drop = {r["doc_id"] for r in manifest if r["verdict"] == "drop"}
        assert counters["received"] == len(keep) + len(drop)
        assert counters["written"] == len(keep)
        assert counters["dropped"] == len(drop) > 0

        back = spark.table(table)
        got = {r["doc_id"] for r in back.select("doc_id").collect()}
        assert got == keep
        # full document rows survive, plus the bucket key
        assert {"doc_id", "text", "lang", "source", "n_chars", "fp"} <= set(
            back.columns
        )

        # catalog records the bucket spec
        desc = {
            r["col_name"]: r["data_type"]
            for r in spark.sql(f"DESCRIBE EXTENDED {table}").collect()
        }
        assert desc.get("Num Buckets") == "4"
        assert "fp" in desc.get("Bucket Columns", "")

        # THE point of bucketing: joining the corpus to itself on fp
        # needs zero shuffle — both scan sides already satisfy the
        # join's hash distribution. (Broadcast disabled so the join
        # can't dodge the question.)
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            j = back.alias("a").join(
                spark.table(table).alias("b"), "fp"
            )
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan.replace("ReusedExchange", "")
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_dedup_survivors_never_lose_content(spark, sf_dir):
    """Every dropped doc has a surviving near-dup twin: for each drop,
    its cluster's keeper exists in the written set (content coverage —
    dedup must not orphan a cluster)."""
    from etl_wlg_metlink_spark.sinks.corpus import dedup_survivors

    manifest = {
        r["doc_id"]: (r["cluster_id"], r["verdict"])
        for r in queries()["l29_dedup_manifest"](spark, sf_dir).collect()
    }
    kept = {
        r["doc_id"]
        for r in dedup_survivors(spark, sf_dir).select("doc_id").collect()
    }
    for doc_id, (cluster_id, verdict) in manifest.items():
        if verdict == "drop":
            assert doc_id not in kept
            assert cluster_id in kept, f"cluster {cluster_id} lost its keeper"
        else:
            assert doc_id in kept
