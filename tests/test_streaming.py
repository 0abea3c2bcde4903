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
    got = sorted((r["user_id"], r["event_type"]) for r in result.collect())
    expected = sorted(
        (r["user_id"], r["event_type"])
        for r in load(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
        .collect()
    )
    # one file → one micro-batch → horizon covers the whole replay:
    # the streaming dedup is exactly the distinct key set
    assert got == expected


def test_streaming_ingest_dedup_parity_and_batching(spark, sf_dir):
    """s8: the 4-batch streaming ingest must (a) actually replay in
    multiple deterministic micro-batches, (b) drop cross-batch
    duplicates via the ledger anti-join, (c) land exactly on the batch
    min-doc_id-per-fingerprint survivor set, run after run."""
    import os

    from etl_wlg_metlink_spark.streaming import s8_streaming_ingest_dedup
    from etl_wlg_metlink_spark.tables import load
    from pyspark.sql import functions as F

    stage = runners.staged_documents_dir(spark, sf_dir, 4)
    parts = sorted(f for f in os.listdir(stage) if f.startswith("part-"))
    assert len(parts) == 4
    mtimes = [os.path.getmtime(os.path.join(stage, f)) for f in parts]
    assert mtimes == sorted(mtimes) and len(set(mtimes)) == 4

    got = {
        (r["doc_id"], r["source"], r["fp"])
        for r in s8_streaming_ingest_dedup(spark, sf_dir).collect()
    }
    docs = load(spark, sf_dir, "documents")
    fp = F.md5(
        F.array_join(
            F.array_sort(F.array_distinct(F.split(F.col("text"), " "))), " "
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("fp").orderBy("doc_id")
    want = {
        (r["doc_id"], r["source"], r["fp"])
        for r in docs.select("doc_id", "source", fp.alias("fp"))
        .withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .collect()
    }
    assert got == want
    assert len(got) < docs.count()  # duplicates existed and were dropped

    again = {
        (r["doc_id"], r["source"], r["fp"])
        for r in s8_streaming_ingest_dedup(spark, sf_dir).collect()
    }
    assert again == got


def test_rocksdb_state_store_parity(spark, sf_dir):
    """The 100 TB streaming-state path: RocksDB state store (state
    spills to local disk instead of living in the executor heap) must
    be a pure CONFIG swap — same stateful dedup, same results as the
    default HDFS-backed in-memory provider. On a real cluster this is
    the difference between state bounded by heap and state bounded by
    disk; the code does not change."""
    from etl_wlg_metlink_spark.session import conf_override

    stream = runners.events_stream(spark, sf_dir)
    default_rows = set(
        map(
            tuple,
            runners.run_available_now(
                runners.dedup_within_watermark_stream(stream)
            ).collect(),
        )
    )
    with conf_override(
        spark,
        {
            "spark.sql.streaming.stateStore.providerClass":
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider"
        },
    ):
        rocks_rows = set(
            map(
                tuple,
                runners.run_available_now(
                    runners.dedup_within_watermark_stream(
                        runners.events_stream(spark, sf_dir)
                    )
                ).collect(),
            )
        )
    assert rocks_rows == default_rows
    assert len(rocks_rows) > 0


def test_stream_stream_interval_join_parity(spark, sf_dir):
    """The stream-stream interval join must equal the batch self-join
    of the same predicate (inner join, one micro-batch replay)."""
    from pyspark.sql import functions as F

    stream = runners.events_stream(spark, sf_dir)
    result = runners.run_available_now(
        runners.stream_stream_interval_join(stream),
        query_name="ss_join_parity",
    )
    events = load(spark, sf_dir, "events")
    clicks = events.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        "value",
    )
    batch = (
        clicks.join(
            purchases,
            F.expr(
                "user_id = p_user AND purchase_ts >= click_ts "
                "AND purchase_ts <= click_ts + INTERVAL 30 MINUTES"
            ),
        )
        .select(
            "user_id",
            F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
            F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss").alias(
                "purchase_ts"
            ),
            F.round("value", 4).alias("purchase_value"),
        )
    )
    cols = ["user_id", "click_ts", "purchase_ts", "purchase_value"]
    assert _rows(result, cols) == _rows(batch, cols)


def test_stateful_track_state_parity(spark, sf_dir, tmp_path):
    """applyInPandasWithState accumulates across micro-batches: replay
    events as 4 files → 4 batches; the final state per user must equal
    the batch groupBy aggregate."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    # split events into multiple files so state genuinely crosses
    # micro-batch boundaries
    src = load(spark, sf_dir, "events")
    replay = str(tmp_path / "replay")
    src.repartition(4).write.mode("overwrite").parquet(replay)

    schema = spark.read.parquet(replay).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(replay)
    )
    result = runners.run_available_now(
        runners.user_track_state_stream(stream),
        query_name="track_state",
        output_mode="update",
    )
    # last emission per user = final state
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    final = (
        result.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "n_events",
            # runner emits raw sums; round here like the s4 lane does
            F.round("total_value", 4).alias("total_value"),
        )
    )
    expected = src.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum(F.coalesce("value", F.lit(0.0))), 4).alias("total_value"),
    )
    cols = ["user_id", "n_events", "total_value"]
    assert _rows(final, cols) == _rows(expected, cols)


def test_observe_metrics(spark, sf_dir):
    """A3's real form: df.observe() accumulates pipeline counters in
    one pass (reference logs received/valid/submitted,
    task.ts:176, 332, 340)."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    events = load(spark, sf_dir, "events")
    obs = Observation("counters")
    valid = F.col("value").isNotNull() & (F.col("value") != 0)
    observed = events.observe(
        obs,
        F.count(F.lit(1)).alias("received"),
        F.sum(valid.cast("long")).alias("valid"),
    )
    n = observed.where(valid).count()
    assert obs.get["received"] == events.count()
    assert obs.get["valid"] == n


def test_metlink_observe_parity(spark, sf_dir):
    """M5: the .observe() metrics channel must agree with the
    oracle-checked batch aggregation (exact counters; the observed
    `submitted` is approx_count_distinct, so compare with rtol)."""
    from pyspark.sql import Observation

    from etl_wlg_metlink_spark.operators.metlink_queries import (
        _synthetic_entities,
        m5_metlink_observe,
    )
    from etl_wlg_metlink_spark.pipelines.metlink import observe_entities

    exact = m5_metlink_observe(spark, sf_dir).collect()[0].asDict()

    obs = Observation("metlink_pipeline")
    observed_df = observe_entities(_synthetic_entities(spark, sf_dir), obs)
    observed_df.count()  # any action through the observed node
    got = obs.get
    for key in (
        "received",
        "dropped_missing_struct",
        "dropped_zero_island",
        "dropped_falsy_trip",
    ):
        assert got[key] == exact[key], key
    # approx_count_distinct: default rsd 5%
    assert abs(got["submitted"] - exact["submitted"]) <= 0.1 * exact["submitted"]


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


def test_metlink_poll_datasource_two_snapshots(spark, tmp_path):
    """Resident-poller lifecycle (task.ts:122, 150-167) through the
    Spark 4 Python DataSource: two snapshot files → two polls → the
    union of both envelopes' entities, each row tagged with its poll;
    per-snapshot entity sets must match the batch parser exactly."""
    from etl_wlg_metlink_spark.sources import poll_source
    from etl_wlg_metlink_spark.sources.gtfs import entities_from_json

    snap1 = json.loads(RAW_JSON)
    snap2 = json.loads(RAW_JSON)
    # second poll: first entity disappears, ids shift — a fresh snapshot
    snap2["entity"] = snap2["entity"][1:]
    (tmp_path / "s0.json").write_text(json.dumps(snap1))
    (tmp_path / "s1.json").write_text(json.dumps(snap2))

    stream = poll_source.metlink_poll_stream(spark, str(tmp_path))
    result = runners.run_until_idle(stream, query_name="poll_parity")
    got = result.collect()

    def _ent_json(row):
        ent = row["entity"]
        return json.dumps(
            ent.asDict(recursive=True) if ent is not None else None,
            sort_keys=True,
            default=str,
        )

    for poll_id, snap in [(0, snap1), (1, snap2)]:
        stream_ents = sorted(
            _ent_json(r) for r in got if r["poll_id"] == poll_id
        )
        batch_ents = sorted(
            _ent_json(r)
            for r in entities_from_json(spark, json.dumps(snap)).collect()
        )
        assert stream_ents == batch_ents and len(stream_ents) > 0


def test_metlink_resident_stream_two_polls(spark, tmp_path):
    """S5 resident mode end-to-end (VERDICT r15 item 8): two landed
    snapshots + one malformed poll driven through
    metlink_resident_stream on a processingTime trigger — one
    FeatureCollection submission per poll, the malformed poll submits
    an EMPTY collection (task.ts:180-188's error→empty fallback) and
    the query stays alive."""
    import time

    inbox = tmp_path / "inbox"
    inbox.mkdir()
    snap2 = json.loads(RAW_JSON)
    snap2["entity"] = snap2["entity"][:3]
    (inbox / "s0.json").write_text(RAW_JSON)
    (inbox / "s1.json").write_text(json.dumps(snap2))
    (inbox / "s2.json").write_text("{not json")

    captured = []
    q = runners.metlink_resident_stream(
        spark,
        str(inbox),
        captured.append,
        str(tmp_path / "ckpt"),
        interval="0 seconds",
    )
    try:
        deadline = time.time() + 120
        while len(captured) < 3 and time.time() < deadline:
            time.sleep(0.2)
        assert q.isActive  # a bad poll must not kill a resident query
    finally:
        q.stop()
        q.awaitTermination()

    assert len(captured) == 3
    assert [f["id"] for f in captured[0]["features"]] == [
        f["id"] for f in oracle_features()
    ]
    assert [f["id"] for f in captured[1]["features"]] == [
        f["id"] for f in oracle_features(snap2["entity"])
    ]
    assert captured[2] == {"type": "FeatureCollection", "features": []}


def test_cli_resident_flags():
    """--resident/--poll-interval ride the tested CLI surface (the
    deploy-unit test proves the image invokes exactly this parser)."""
    from etl_wlg_metlink_spark.__main__ import build_parser

    args = build_parser().parse_args(
        ["--schedule", "/data/landing", "--resident",
         "--poll-interval", "5 seconds", "--checkpoint", "/ckpt"]
    )
    assert args.resident and args.poll_interval == "5 seconds"
    assert not build_parser().parse_args(["--fixture", "x.json"]).resident


def _write_ttl_fixture(tmp_path):
    """Two-file replay for the TTL tests: user 1 goes quiet after
    batch 1; batch 2 advances the watermark past user 1's deadline
    (last event + 1 h TTL) but not user 2's. Nothing sits at epoch 0 —
    the initial watermark is 0 and rows at/below it are dropped as
    late."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    def _write(name, rows, mtime):
        ts, uid, val = zip(*rows)
        table = pa.table(
            {
                "ts": pa.array(list(ts), pa.timestamp("us")),
                "user_id": pa.array(list(uid), pa.int64()),
                "value": pa.array(list(val), pa.float64()),
            }
        )
        path = str(tmp_path / name)
        pq.write_table(table, path)
        os.utime(path, (mtime, mtime))

    h = 3_600_000_000  # one hour in microseconds
    now = time.time()
    _write("f1.parquet", [(h, 1, 1.0), (h + h // 2, 1, 2.0), (h, 2, 3.0)], now - 60)
    _write("f2.parquet", [(4 * h, 2, 4.0)], now - 30)


def _ttl_stream(spark, tmp_path):
    return (
        spark.readStream.schema("ts timestamp, user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path))
    )


#: the only track the TTL replay must close: user 1, 2 events, hour 1.5
_TTL_EXPECTED = [(1, 2, "1970-01-01T01:30:00")]


def _closed_tracks(result):
    return sorted(
        (r["user_id"], r["n_events"], r["last_ts"].isoformat())
        for r in result.collect()
    )


def test_ttl_state_evicts_quiet_tracks(spark, tmp_path):
    """Event-time TTL lifecycle (the reference's 180 s staleness done
    engine-side): exactly the quiet track is evicted once the
    watermark passes its last event + TTL."""
    _write_ttl_fixture(tmp_path)
    result = runners.run_available_now(
        runners.track_ttl_state_stream(
            _ttl_stream(spark, tmp_path), ttl_seconds=3600
        ),
        query_name="ttl_evict",
        output_mode="append",
    )
    assert _closed_tracks(result) == _TTL_EXPECTED


def test_ttl_transform_with_state_parity(spark, tmp_path):
    """Same TTL semantics on the current API
    (transformWithStateInPandas + event-time timers, RocksDB-backed).
    Its Python worker needs google.protobuf, which this container
    doesn't ship — skips there, runs wherever protobuf exists."""
    import pytest

    pytest.importorskip(
        "google.protobuf",
        reason="transformWithStateInPandas worker requires protobuf",
    )
    from etl_wlg_metlink_spark.session import conf_override

    _write_ttl_fixture(tmp_path)
    with conf_override(
        spark,
        {
            "spark.sql.streaming.stateStore.providerClass":
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider",
        },
    ):
        result = runners.run_available_now(
            runners.track_ttl_transform_with_state(
                _ttl_stream(spark, tmp_path), ttl_seconds=3600
            ),
            query_name="ttl_evict_tws",
            output_mode="append",
        )
        closed = _closed_tracks(result)
    assert closed == _TTL_EXPECTED


def test_metlink_poll_datasource_bad_envelope_keeps_running(spark, tmp_path):
    """A malformed poll must not kill the resident query: it surfaces
    as a NULL-entity row (the caller's drop/observe path), and later
    good polls still arrive."""
    from etl_wlg_metlink_spark.sources import poll_source

    (tmp_path / "a.json").write_text("{not valid json")
    (tmp_path / "b.json").write_text(RAW_JSON)

    stream = poll_source.metlink_poll_stream(spark, str(tmp_path))
    result = runners.run_until_idle(stream, query_name="poll_bad_env")
    got = result.collect()
    bad = [r for r in got if r["poll_id"] == 0]
    good = [r for r in got if r["poll_id"] == 1]
    assert len(bad) == 1 and bad[0]["entity"] is None
    assert len(good) > 0 and all(r["entity"] is not None for r in good)


def test_poll_reader_offsets_stable_under_late_files(tmp_path):
    """Review regression: offsets anchor to the last consumed NAME,
    so a file landing later with an earlier-sorting name can never
    remap already-committed offsets (no double-ingest, no silent
    replay drift)."""
    from etl_wlg_metlink_spark.sources.poll_source import _PollReader

    (tmp_path / "b.json").write_text('{"b": 1}')
    reader = _PollReader({"snapshot_dir": str(tmp_path)})

    start = reader.initialOffset()
    rows, off1 = reader.read(start)
    assert [r[2] for r in rows] == ['{"b": 1}'] and off1["last"] == "b.json"

    # a.json lands AFTER b.json was consumed, sorting before it
    (tmp_path / "a.json").write_text('{"a": 1}')

    # the next poll must not re-serve b.json (monotone-name contract:
    # the out-of-order name is skipped, never double-ingested) — but
    # the permanently-lost file must be observable, not silent
    import pytest

    with pytest.warns(UserWarning, match="NEVER be served"):
        rows2, off2 = reader.read(off1)
    assert list(rows2) == [] and off2 == off1

    # replay of the committed range still returns exactly b.json
    replay = list(reader.readBetweenOffsets(start, off1))
    assert [r[2] for r in replay] == ['{"b": 1}']

    # a genuinely new (later-sorting) file is consumed next
    (tmp_path / "c.json").write_text('{"c": 1}')
    rows3, off3 = reader.read(off1)
    assert [r[2] for r in rows3] == ['{"c": 1}'] and off3["last"] == "c.json"


def test_poll_reader_rejects_incompatible_and_violated_offsets(tmp_path):
    """Checkpoint-recovery paths fail loud, never silently re-ingest:
    an old positional-format offset (no 'last' anchor) is rejected, and
    a replay whose name range no longer matches the consumed sequence
    (out-of-order landing / deleted file) raises instead of replaying
    different rows than were originally emitted."""
    import pytest

    from etl_wlg_metlink_spark.sources.poll_source import _PollReader

    (tmp_path / "b.json").write_text('{"b": 1}')
    reader = _PollReader({"snapshot_dir": str(tmp_path)})

    with pytest.raises(ValueError, match="incompatible"):
        reader.read({"index": 1})
    with pytest.raises(ValueError, match="incompatible"):
        list(reader.readBetweenOffsets({"index": 0, "last": ""}, {"index": 1}))

    # consume b.json, then simulate a restart (per-poll name map gone)
    start = reader.initialOffset()
    _, off1 = reader.read(start)
    restarted = _PollReader({"snapshot_dir": str(tmp_path)})
    # a.json landed out-of-order inside the committed range
    (tmp_path / "a.json").write_text('{"a": 1}')
    with pytest.raises(RuntimeError, match="cannot reconstruct"):
        list(restarted.readBetweenOffsets(start, off1))
    # with the directory matching the contract again, replay is exact
    (tmp_path / "a.json").unlink()
    replay = list(restarted.readBetweenOffsets(start, off1))
    assert [r[2] for r in replay] == ['{"b": 1}']


def test_poll_reader_http_mode_cache_replay_and_eviction(monkeypatch):
    """Live-HTTP mode driven through a monkeypatched fetch: each
    read() is one GET; readBetweenOffsets of uncommitted polls is
    served from the in-process cache (zero extra GETs — replaying a
    network poll must not re-poll); commit() evicts finished polls so
    a resident poller holds O(in-flight) state; and the legacy
    anchor-less offset shape stays accepted here (HTTP replay is
    cache/positional — only snapshot mode fails loud on it)."""
    from etl_wlg_metlink_spark.sources import gtfs
    from etl_wlg_metlink_spark.sources.poll_source import _PollReader

    calls: list[tuple[str, str]] = []

    def fake_fetch(url: str, headers: dict) -> str:
        calls.append((url, headers["x-api-key"]))
        return json.dumps({"poll": len(calls)})

    monkeypatch.setattr(gtfs, "_urllib_fetch", fake_fetch)
    reader = _PollReader({"url": "http://unit.test/api", "api_key": "k1"})

    start = reader.initialOffset()
    rows1, off1 = reader.read(start)
    rows2, off2 = reader.read(off1)
    assert [r[2] for r in rows1] == ['{"poll": 1}']
    assert [r[2] for r in rows2] == ['{"poll": 2}']
    assert calls == [("http://unit.test/api", "k1")] * 2

    # replay before commit: exact same rows, straight from cache
    replay = list(reader.readBetweenOffsets(start, off2))
    assert [r[2] for r in replay] == ['{"poll": 1}', '{"poll": 2}']
    assert len(calls) == 2, "replay of cached polls must not re-fetch"

    # legacy positional offset (index>0, no 'last') is fine in HTTP mode
    _, off_legacy = reader.read({"index": 2})
    assert off_legacy["index"] == 3 and len(calls) == 3

    # commit evicts everything below the committed index
    reader.commit(off2)
    assert set(reader._cache) == {2}, "committed polls must leave the cache"


def test_metlink_poll_live_http_stream(spark):
    """The live-HTTP poll mode end-to-end through the DataSource
    against a real (localhost) HTTP endpoint: N micro-batches = N
    GETs through the genuine urllib fetch path, each envelope
    exploded into its entities with the right poll_id — the resident
    form of task.ts:150-167. A localhost server rather than a
    monkeypatch because the DataSource reader runs in a separate
    Python worker process, out of monkeypatch's reach — which makes
    this the one test that exercises the real fetch stack."""
    import http.server
    import threading
    import time as _time

    from etl_wlg_metlink_spark.sources import poll_source

    snap1 = json.loads(RAW_JSON)
    snap2 = json.loads(RAW_JSON)
    snap2["entity"] = snap2["entity"][1:]
    envelopes = [json.dumps(snap1), json.dumps(snap2)]

    class Handler(http.server.BaseHTTPRequestHandler):
        n_calls = 0
        api_keys: list = []

        def do_GET(self):  # noqa: N802 — BaseHTTPRequestHandler contract
            Handler.api_keys.append(self.headers.get("x-api-key"))
            body = envelopes[
                min(Handler.n_calls, len(envelopes) - 1)
            ].encode("utf-8")
            Handler.n_calls += 1
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):  # silence per-request stderr noise
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    q = None
    try:
        stream = poll_source.metlink_poll_stream(
            spark, url=f"http://127.0.0.1:{port}/api", api_key="k1"
        )
        q = (
            stream.writeStream.format("memory")
            .queryName("poll_live_http")
            .outputMode("append")
            .trigger(processingTime="0 seconds")
            .start()
        )
        deadline = _time.time() + 60
        while _time.time() < deadline:
            polls = {
                r["poll_id"]
                for r in spark.table("poll_live_http").select("poll_id").collect()
            }
            if {0, 1} <= polls:
                break
            _time.sleep(0.25)
    finally:
        if q is not None:
            q.stop()
            q.awaitTermination()
        srv.shutdown()
        srv.server_close()
    got = spark.table("poll_live_http").collect()
    by_poll = {}
    for r in got:
        by_poll.setdefault(r["poll_id"], []).append(r)
    assert {0, 1} <= set(by_poll), f"expected >=2 polls, saw {sorted(by_poll)}"
    assert len(by_poll[0]) == len(snap1["entity"])
    assert len(by_poll[1]) == len(snap2["entity"])
    assert Handler.n_calls >= 2, "each micro-batch must be one real GET"
    assert set(Handler.api_keys) == {"k1"}, "x-api-key header must be sent"


def test_s9_left_outer_emits_expired_nulls_withholds_recent(spark, tmp_path):
    """Planted attribution scenario for the left-outer interval join:
    an old non-converting click must surface as a null-extended row,
    while an unmatched click inside the 30-minute emission horizon of
    the final watermark must be withheld (its match could still arrive
    in a live run)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from etl_wlg_metlink_spark.streaming import runners

    t0 = dt.datetime(2024, 3, 1, 8, 0, 0)

    def ev(eid, minutes, user, etype, value=None):
        return (eid, t0 + dt.timedelta(minutes=minutes), user, etype, value, None)

    rows = [
        ev(1, 0, 1, "click"),            # converts (purchase at +10)
        ev(2, 10, 1, "purchase", 5.0),
        ev(3, 20, 2, "click"),           # never converts, old -> null row
        ev(4, 170, 3, "click"),          # unmatched, inside horizon -> withheld
        # watermark anchors: max click 170, max purchase 180 -> wm 170;
        # click 4 has 170+30 > 170, click 3 has 20+30 < 170
        ev(5, 180, 9, "purchase", 1.0),
    ]
    # single parquet FILE (not a Spark directory): the file-stream
    # source watches a symlink of the path itself, like the testdata
    pdf = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    ).toPandas()
    pdf.to_parquet(str(tmp_path / "events.parquet"))

    out = runners.run_available_now(
        runners.stream_stream_left_outer_join(
            runners.events_stream(spark, str(tmp_path))
        )
    ).collect()
    got = {(r["user_id"], r["purchase_ts"] is None) for r in out}
    assert (1, False) in got, "converting click must emit the matched pair"
    assert (2, True) in got, "expired unmatched click must emit a null row"
    assert all(u != 3 for u, _ in got), "in-horizon unmatched click must be withheld"
    assert len(out) == 2


def test_capped_sessions_cross_batch_and_cap_split(spark, tmp_path):
    """Planted-case semantics for the capped sessionizer: cap overflow
    opens a new session, a 30-min gap opens a new session, state
    carries the OPEN session across a micro-batch boundary, and only
    the trailing session stays open. Batch files are split by time
    (the landing-directory contract), so arrival order is event order."""
    import datetime as dt

    from pyspark.sql import functions as F

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ev(eid, minutes, value):
        return (eid, t0 + dt.timedelta(minutes=minutes), 1, value)

    # batch 0: cap-2 session [e1,e2], overflow opens [e3] (still open
    # at the boundary); batch 1: e4 continues within gap -> closes
    # [e3,e4] at cap when e5 arrives after the 30-min gap -> [e5] open.
    batch0 = [ev(1, 0, 1.0), ev(2, 10, 2.0), ev(3, 12, 3.0)]
    batch1 = [ev(4, 20, 4.0), ev(5, 60, 5.0)]
    cols = ["event_id", "ts", "user_id", "value"]
    replay = str(tmp_path / "replay")
    import os
    import time

    seen: set[str] = set()
    for i, batch in enumerate([batch0, batch1]):
        spark.createDataFrame(batch, cols).coalesce(1).write.mode(
            "append"
        ).parquet(replay)
        # distinct mtimes on each batch's NEW files only => the file
        # source picks them up in written order
        for f in os.listdir(replay):
            if f not in seen:
                seen.add(f)
                t = time.time() + i * 10
                os.utime(os.path.join(replay, f), (t, t))

    schema = spark.read.parquet(replay).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(replay)
    )
    result = runners.run_available_now(
        runners.capped_sessions_stream(stream),
        query_name="capped_sessions",
        output_mode="update",
    )
    # last emission per (user, seq) = final verdict for that session
    from pyspark.sql import Window

    w = Window.partitionBy("user_id", "session_seq").orderBy(
        F.col("n_events").desc(), F.col("closed").desc()
    )
    final = (
        result.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .orderBy("session_seq")
        .collect()
    )
    got = [
        (r["session_seq"], r["n_events"], r["sum_value"], r["closed"])
        for r in final
    ]
    assert got == [
        (0, 2, 3.0, True),   # e1+e2: closed by cap overflow at e3
        (1, 2, 7.0, True),   # e3+e4 across the batch boundary; closed at e5
        (2, 1, 5.0, False),  # e5: trailing session stays open
    ]


def test_poll_source_warns_on_unservable_snapshot(tmp_path):
    """A producer violating the monotone landing-name contract (e.g.
    non-zero-padded sequence numbers: snap_10 sorts BEFORE snap_9) gets
    a loud warning instead of a silent permanent skip (ADVICE r5 /
    VERDICT r6 item 3): a file appearing at/before the consumed anchor
    can never be served by the name-anchored offset scheme."""
    import pytest

    from etl_wlg_metlink_spark.sources.poll_source import _PollReader

    (tmp_path / "snap_9.json").write_text("{}")
    reader = _PollReader({"snapshot_dir": str(tmp_path)})
    rows, off = reader.read(reader.initialOffset())
    assert list(rows)
    assert off == {"index": 1, "last": "snap_9.json"}
    # snap_10 lands late and sorts before the anchor -> unservable
    (tmp_path / "snap_10.json").write_text("{}")
    with pytest.warns(UserWarning, match=r"snap_10\.json.*NEVER"):
        rows2, off2 = reader.read(off)
    assert list(rows2) == []
    assert off2 == off  # offset unchanged; the file is permanently lost
    # steady state: no repeat warning once the file is in the baseline
    import warnings as _w

    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        reader.read(off)
    assert not rec


def test_snapshot_batch_datasource_parity(spark, tmp_path):
    """The batch DataSource (backfill path) must produce exactly the
    union of per-snapshot entity sets the streaming poll source serves
    one-by-one, with one input partition per file (the parallelism
    contract), and tolerate a malformed snapshot as entity-null rows."""
    import json as _json

    from etl_wlg_metlink_spark.pipelines.gtfs_fixture import RAW_JSON
    from etl_wlg_metlink_spark.sources import snapshot_source

    snap1 = _json.loads(RAW_JSON)
    snap2 = {"header": snap1["header"], "entity": snap1["entity"][2:]}
    (tmp_path / "s1.json").write_text(_json.dumps(snap1))
    (tmp_path / "s2.json").write_text(_json.dumps(snap2))
    (tmp_path / "s3.json").write_text("{broken")

    rows = snapshot_source.snapshot_entities(spark, str(tmp_path)).collect()
    by_snap = {}
    for r in rows:
        by_snap.setdefault(r["snapshot"], []).append(r)
    assert set(by_snap) == {"s1.json", "s2.json", "s3.json"}
    assert len(by_snap["s1.json"]) == len(snap1["entity"])
    assert len(by_snap["s2.json"]) == len(snap2["entity"])
    # malformed file: one entity-null row, job still succeeds
    assert [r["entity"] for r in by_snap["s3.json"]] == [None]
    # entity ids round-trip
    got_ids = sorted(
        r["entity"]["id"] for r in by_snap["s1.json"] if r["entity"]
    )
    assert got_ids == sorted(e["id"] for e in snap1["entity"])

    # one input partition per file
    raw = (
        spark.read.format("metlink_snapshots")
        .option("path", str(tmp_path))
        .load()
    )
    assert raw.rdd.getNumPartitions() == 3


def test_stateful_state_survives_restart(spark, sf_dir, tmp_path):
    """The reference's execution model is scheduled RE-INVOCATION
    (task.ts:122): every run must resume exactly where the last ended.
    Engine-side that is checkpointed state: run the stateful per-user
    tracker with trigger(availableNow) over half the data, STOP, land
    more files, run again with the same checkpoint — the final state
    must equal the batch aggregate over everything, proving state-store
    recovery + exactly-once file-source progress across process-style
    restarts (not just within one query)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    src = load(spark, sf_dir, "events")
    half_a = src.where(F.col("event_id") % 2 == 0)
    half_b = src.where(F.col("event_id") % 2 == 1)
    replay = str(tmp_path / "replay")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    half_a.coalesce(2).write.parquet(replay)
    schema = spark.read.parquet(replay).schema

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(replay)
        )
        q = (
            runners.user_track_state_stream(stream)
            .writeStream.foreachBatch(
                lambda df, _bid: df.write.mode("append").parquet(out)
            )
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()  # invocation 1: half the files
    half_b.coalesce(2).write.mode("append").parquet(replay)
    run_once()  # invocation 2: resumes from checkpointed state

    emissions = spark.read.parquet(out)
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    final = (
        emissions.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select(
            "user_id",
            "n_events",
            F.round("total_value", 4).alias("total_value"),
        )
    )
    expected = src.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum(F.coalesce("value", F.lit(0.0))), 4).alias(
            "total_value"
        ),
    )
    cols = ["user_id", "n_events", "total_value"]
    assert _rows(final, cols) == _rows(expected, cols)


def test_s12_trending_invariant_to_batch_split(spark, sf_dir):
    """The serving-table result must be a pure function of the data,
    not of how the stream was chopped into micro-batches: a 1-batch
    replay (everything at once) and the 4-batch replay produce
    identical top-k tables, and ranks are contiguous from 1 per
    window."""
    four = runners.trending_topk_run(spark, sf_dir, n_batches=4)
    one = runners.trending_topk_run(spark, sf_dir, n_batches=1)
    cols = ["window_start", "rnk", "event_type", "n", "sum_value"]
    rows4 = sorted(tuple(r[c] for c in cols) for r in four.collect())
    rows1 = sorted(tuple(r[c] for c in cols) for r in one.collect())
    assert rows4 == rows1
    by_w = {}
    for r in rows4:
        by_w.setdefault(r[0], []).append(r[1])
    for w, rnks in by_w.items():
        assert sorted(rnks) == list(range(1, len(rnks) + 1))
        assert len(rnks) <= 3


def test_s13_streaming_ivf_matches_batch_assignment(spark, sf_dir):
    """VERDICT r06 stretch: the streaming ANN ingest's final serving
    table must equal l17's batch IVF assignment on the same data (cell
    assignment is per-vector — arrival order and batch splits must not
    matter), and a 1-batch replay must agree with the 4-batch one."""
    from etl_wlg_metlink_spark.operators.llm_pipeline import (
        _ivf_assign,
        _ivf_corpus,
        _ivf_index,
    )
    from etl_wlg_metlink_spark.tables import load

    four = runners.ivf_ingest_run(spark, sf_dir, n_batches=4)
    got4 = {r["vec_id"]: r["cell"] for r in four.collect()}

    emb = load(spark, sf_dir, "embeddings")
    sid, cent, cnorm = _ivf_index(emb, cache_key=sf_dir)
    batch = {
        r["vec_id"]: r["cell"]
        for r in _ivf_assign(_ivf_corpus(emb), sid, cent, cnorm)
        .select("vec_id", "cell")
        .collect()
    }
    assert got4 == batch

    one = runners.ivf_ingest_run(spark, sf_dir, n_batches=1)
    got1 = {r["vec_id"]: r["cell"] for r in one.collect()}
    assert got1 == batch


def test_s14_drift_psi_matches_batch_and_is_sound(spark, sf_dir):
    """The streaming drift monitor must equal the batch PSI computed
    directly from the events table (replay admits no late drops), PSI
    must be non-negative everywhere (each (p-q)·ln(p/q) term is), and
    the drift fences must follow the psi value exactly."""
    from pyspark.sql import functions as F

    from etl_wlg_metlink_spark.tables import load

    got = runners.drift_monitor_run(spark, sf_dir).collect()
    assert got, "corpus spans multiple hourly windows"

    events = load(spark, sf_dir, "events")
    counts = (
        events.groupBy(
            F.date_format(
                F.window("ts", "1 hour").start, "yyyy-MM-dd HH:mm:ss"
            ).alias("window_start"),
            "event_type",
        )
        .agg(F.count("*").alias("n"))
        .collect()
    )
    ref: dict = {}
    for r in counts:
        ref[r["event_type"]] = ref.get(r["event_type"], 0) + r["n"]
    ref_total = sum(ref.values())

    import math

    by_window: dict = {}
    for r in counts:
        by_window.setdefault(r["window_start"], []).append(r)
    expected = {}
    for wstart, rows in by_window.items():
        total = sum(r["n"] for r in rows)
        fp = 0
        for r in rows:
            p = r["n"] / total
            q = ref[r["event_type"]] / ref_total
            fp += math.floor((p - q) * math.log(p / q) * 1e6 + 0.5)
        expected[wstart] = (total, fp / 1e6)

    assert len(got) == len(expected)
    for r in got:
        total, psi = expected[r["window_start"]]
        assert r["n_events"] == total
        assert r["psi"] == psi  # exact: int64 fixed-point both sides
        assert r["psi"] >= 0.0
        want_level = (
            "major" if psi >= 0.25 else
            "moderate" if psi >= 0.1 else "stable"
        )
        assert r["drift_level"] == want_level


def test_s15_streaming_cms_matches_pure_python_and_batch(spark, sf_dir):
    """The streamed-and-merged CMS must equal a from-scratch Python
    sketch built from the full events table (mergeability: per-batch
    partial grids summed == one global build), the one-sided guarantee
    must hold, and the report must cover exactly the true top-K keys."""
    import hashlib
    from collections import Counter

    from pyspark.sql import functions as F

    from etl_wlg_metlink_spark.operators.llm_pipeline import (
        CMS_D,
        CMS_W,
        L92_TOP_K,
    )
    from etl_wlg_metlink_spark.tables import load

    got = {
        r["user_key"]: (r["true_count"], r["est_count"], r["overcount"])
        for r in runners.countmin_ingest_run(spark, sf_dir).collect()
    }

    true = Counter()
    for r in (
        load(spark, sf_dir, "events")
        .groupBy(F.col("user_id").cast("string").alias("k"))
        .agg(F.count("*").alias("c"))
        .collect()
    ):
        true[r["k"]] = r["c"]

    def bkt(rr: int, k: str) -> int:
        h = int(hashlib.md5(f"cms{rr}|{k}".encode()).hexdigest()[:15], 16)
        return h % CMS_W

    cells = Counter()
    for k, c in true.items():
        for rr in range(CMS_D):
            cells[(rr, bkt(rr, k))] += c

    top = sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))[:L92_TOP_K]
    expected = {
        k: (c, min(cells[(rr, bkt(rr, k))] for rr in range(CMS_D)))
        for k, c in top
    }
    assert set(got) == set(expected)
    for k, (c, e) in expected.items():
        assert got[k] == (c, e, e - c)
        assert e >= c


def test_s16_hll_stream_equals_batch_for_any_split(spark, sf_dir):
    """The HLL register merge is associative + idempotent, so the
    streamed sketch must equal l95's batch sketch EXACTLY regardless
    of how the replay is split into micro-batches."""
    from etl_wlg_metlink_spark.operators import llm_pipeline as lp
    from etl_wlg_metlink_spark.streaming import runners

    batch = sorted(
        map(tuple, lp.l95_hll_cardinality(spark, sf_dir).collect())
    )
    for nb in (2, 4):
        got = sorted(
            map(
                tuple,
                runners.hll_ingest_run(spark, sf_dir, n_batches=nb).collect(),
            )
        )
        assert got == batch, f"n_batches={nb} diverged from batch"
