"""M5 parity tests: each streaming pipeline must produce exactly the
batch result of the same expression (Spark's unified-engine contract),
executed one-shot with trigger(availableNow) ≈ one scheduled
invocation of the reference task (task.ts:122).
"""

from __future__ import annotations

import json

from etl_wlg_metlink_spark.pipelines.gtfs_fixture import (
    RAW_JSON,
    oracle_features,
)
from etl_wlg_metlink_spark.streaming import runners, s1_tumbling_window
from etl_wlg_metlink_spark.tables import load


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_tumbling_stream_matches_batch(spark, sf_dir):
    stream = runners.events_stream(spark, sf_dir)
    result = runners.run_available_now(
        runners.tumbling_counts_stream(stream),
        query_name="tumbling_parity",
        output_mode="complete",
    )
    batch = s1_tumbling_window(spark, sf_dir)
    cols = ["window_start", "event_type", "n", "sum_value"]
    assert _rows(result, cols) == _rows(batch, cols)


def test_dedup_within_watermark_stream(spark, sf_dir):
    stream = runners.events_stream(spark, sf_dir)
    result = runners.run_available_now(
        runners.dedup_within_watermark_stream(stream),
        query_name="dedup_parity",
    )
    got = result.collect()
    n_users = load(spark, sf_dir, "events").select("user_id").distinct().count()
    # one file → one micro-batch → horizon covers the whole replay:
    # exactly one row per user survives
    assert len(got) == n_users
    assert len({r["user_id"] for r in got}) == n_users


def test_metlink_envelope_stream(spark, tmp_path):
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    (inbox / "poll1.json").write_text(RAW_JSON)
    captured = []
    q = runners.metlink_envelope_stream(
        spark, str(inbox), captured.append, str(tmp_path / "ckpt")
    )
    q.awaitTermination()
    assert len(captured) == 1
    got_ids = [f["id"] for f in captured[0]["features"]]
    assert got_ids == [f["id"] for f in oracle_features()]

    # a second poll arriving later is its own micro-batch/submission
    second = json.loads(RAW_JSON)
    second["entity"] = second["entity"][:3]
    (inbox / "poll2.json").write_text(json.dumps(second))
    q2 = runners.metlink_envelope_stream(
        spark, str(inbox), captured.append, str(tmp_path / "ckpt")
    )
    q2.awaitTermination()
    assert len(captured) == 2
    assert [f["id"] for f in captured[1]["features"]] == [
        f["id"] for f in oracle_features(second["entity"])
    ]
