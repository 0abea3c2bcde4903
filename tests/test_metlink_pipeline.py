"""M4 golden test: the composed Metlink pipeline vs the pure-Python
mini-oracle (pipelines/gtfs_fixture.py) that independently re-encodes
the reference's control() semantics (/root/reference/task.ts:147-342)
— classification precedence, JS falsy quirks, remarks assembly,
last-wins dedup, Map iteration order.

JSON-boundary convention (documented in sinks/geojson.py): null-valued
fields are omitted from feature JSON (JS omits undefined; our columns
can't distinguish undefined from null, so NaN→null→omitted too).
The oracle strips None recursively to match.
"""

from __future__ import annotations

import json

import pytest

from etl_wlg_metlink_spark.config import MetlinkConfig
from etl_wlg_metlink_spark.pipelines import metlink
from etl_wlg_metlink_spark.pipelines.gtfs_fixture import (
    FIXTURE_ENTITIES,
    RAW_JSON,
    oracle_features,
)
from etl_wlg_metlink_spark.sinks import geojson
from etl_wlg_metlink_spark.sources import gtfs


@pytest.fixture(scope="module")
def fc(spark):
    entities = gtfs.entities_from_json(spark, RAW_JSON)
    features = metlink.run(entities, MetlinkConfig())
    captured = []
    return geojson.submit(features, captured.append)


def test_golden_feature_collection(fc):
    expected = oracle_features(FIXTURE_ENTITIES)
    assert fc["type"] == "FeatureCollection"
    got_by_id = {f["id"]: f for f in fc["features"]}
    exp_by_id = {f["id"]: f for f in expected}
    assert sorted(got_by_id) == sorted(exp_by_id)
    for fid in exp_by_id:
        assert got_by_id[fid] == exp_by_id[fid], f"feature {fid} diverges"
    # Map iteration order: first-insertion order of surviving ids
    assert [f["id"] for f in fc["features"]] == [f["id"] for f in expected]


def test_last_wins_dedup(fc):
    # entity 12 (ts+60, speed 3.5) replaces entity 2 for vehicle V2
    v2 = next(f for f in fc["features"] if f["id"] == "WLG-MetlinkTrain-V2")
    assert v2["properties"]["speed"] == 3.5
    assert v2["properties"]["time"] == "2024-01-01T00:01:00.000Z"


def test_dropped_rows(fc):
    ids = {f["id"] for f in fc["features"]}
    assert len(fc["features"]) == 7  # 8 valid entities, 1 dedup'd away
    for absent in ("B4", "B5", "B6", "B7"):
        assert not any(absent in i for i in ids)


def test_config_filter_hides_types(spark):
    entities = gtfs.entities_from_json(spark, RAW_JSON)
    features = metlink.run(entities, MetlinkConfig(show_buses=False))
    got = {r["feature"]["id"] for r in features.collect()}
    assert got == {
        f["id"]
        for f in oracle_features(FIXTURE_ENTITIES, enabled=("Train", "Ship"))
    }


def test_envelope_validation_raises(spark):
    with pytest.raises(gtfs.InvalidEnvelopeError):
        gtfs.entities_from_json(spark, json.dumps({"header": {}}))
    with pytest.raises(gtfs.InvalidEnvelopeError):
        gtfs.entities_from_json(spark, "{not json")


def test_fetch_error_falls_back_to_empty(spark):
    def failing_fetch(url, headers):
        raise OSError("network down")

    df = gtfs.fetch_entities(spark, "key", fetch_json=failing_fetch)
    features = metlink.run(df, MetlinkConfig())
    captured = []
    fc_empty = geojson.submit(features, captured.append)
    assert fc_empty == {"type": "FeatureCollection", "features": []}
    assert captured == [fc_empty]


def test_write_jsonl(spark, tmp_path):
    entities = gtfs.entities_from_json(spark, RAW_JSON)
    features = metlink.run(entities, MetlinkConfig())
    out = str(tmp_path / "features")
    geojson.write_jsonl(features, out, partitions=2)
    lines = []
    for p in (tmp_path / "features").glob("part-*"):
        lines += [json.loads(x) for x in p.read_text().splitlines()]
    assert len(lines) == 7
    assert all(x["type"] == "Feature" for x in lines)


def test_quirks_direction_and_occupancy(fc):
    # KPL train: direction 0 must stay "0" (?? not ||); occupancy 7 is
    # out-of-range → 'Unknown'
    t3 = next(f for f in fc["features"] if f["id"] == "WLG-MetlinkTrain-V3")
    assert "Direction: 0" in t3["properties"]["remarks"]
    assert "Occupancy: Unknown" in t3["properties"]["remarks"]


def test_config_from_env(monkeypatch):
    monkeypatch.setenv("SHOW_BUSES", "false")
    monkeypatch.setenv("METLINK_API_KEY", "k123")
    cfg = MetlinkConfig.from_env()
    assert cfg.show_buses is False and cfg.metlink_api_key == "k123"
    assert cfg.enabled_types() == ["Train", "Ship"]
    assert MetlinkConfig.from_env(show_buses=True).enabled_types() == [
        "Bus", "Train", "Ship",
    ]


def test_schema_registry_introspection():
    from etl_wlg_metlink_spark import schemas

    js = json.loads(schemas.describe("gtfs_rt_vehicle_positions"))
    assert js["fields"][1]["name"] == "entity"


def test_input_flow_schema_round_trip(monkeypatch):
    """VERDICT r14 item 4: the Input-flow arm of the schema dispatch
    (task.ts:129-130 returning Env) rendered as a form schema must
    carry exactly the reference's field spellings, types, and
    defaults — and an empty environment must resolve, through
    MetlinkConfig.from_env, to exactly those defaults (the UI
    round-trip: render form → user touches nothing → submitted env
    equals the form's defaults)."""
    from etl_wlg_metlink_spark import schemas

    form = schemas.schema("input", "incoming")
    props = form["properties"]
    assert form["type"] == "object"
    assert list(props) == [
        "METLINK_API_KEY", "Show_Buses", "Show_Trains", "Show_Ships", "DEBUG",
    ]
    assert props["METLINK_API_KEY"] == {
        "type": "string",
        "description": "API Key for Metlink OpenData API",
        "default": "",
    }
    for key in ("Show_Buses", "Show_Trains", "Show_Ships"):
        assert props[key]["type"] == "boolean"
        assert props[key]["default"] is True
    assert props["DEBUG"]["type"] == "boolean"
    assert props["DEBUG"]["default"] is False

    for var in ("METLINK_API_KEY", "SHOW_BUSES", "SHOW_TRAINS",
                "SHOW_SHIPS", "DEBUG"):
        monkeypatch.delenv(var, raising=False)
    cfg = MetlinkConfig.from_env()
    assert {
        "METLINK_API_KEY": cfg.metlink_api_key,
        "Show_Buses": cfg.show_buses,
        "Show_Trains": cfg.show_trains,
        "Show_Ships": cfg.show_ships,
        "DEBUG": cfg.debug,
    } == {k: v["default"] for k, v in props.items()}

    # the other two dispatch arms (task.ts:131-135)
    assert schemas.schema("output", "incoming") is (
        schemas.VEHICLE_POSITIONS_RESPONSE
    )
    assert list(schemas.schema("input", "outgoing").fields) == []


def test_urllib_fetch_http_contract():
    """VERDICT r14 item 6: the live HTTP path's contract, recorded
    against a local socket server (no external network) — the default
    fetcher must send exactly the reference's headers (accept +
    x-api-key, task.ts:155-160), return the body decoded as UTF-8,
    and raise on a non-2xx status the way the reference throws on
    !res.ok (task.ts:162-164)."""
    import http.server
    import threading

    import pytest

    from etl_wlg_metlink_spark.sources.gtfs import _urllib_fetch

    seen: list[dict] = []
    body = '{"header": {"timestamp": 1}, "entity": []}'

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 — BaseHTTPRequestHandler API
            seen.append({k.lower(): v for k, v in self.headers.items()})
            if self.path == "/fail":
                self.send_error(503, "upstream sad")
                return
            payload = body.encode("utf-8")
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *args):  # keep pytest output clean
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{srv.server_port}"
    headers = {"accept": "application/json", "x-api-key": "k123"}
    try:
        raw = _urllib_fetch(f"{base}/v1/gtfs-rt/vehiclepositions", headers)
        assert raw == body
        assert seen[-1]["accept"] == "application/json"
        assert seen[-1]["x-api-key"] == "k123"

        # non-2xx must raise (urllib HTTPError ≈ the reference's
        # `throw new Error(...)` on !res.ok), which fetch_entities
        # turns into the S3 empty fallback
        with pytest.raises(Exception, match="503"):
            _urllib_fetch(f"{base}/fail", headers)
    finally:
        srv.shutdown()
        srv.server_close()


def test_urllib_fetch_sets_timeout(monkeypatch):
    """The default fetcher must bound the socket wait (timeout=30) —
    the one deliberate divergence from the reference's unbounded
    fetch, load-bearing for a scheduled job that must not hang a
    whole invocation slot on a dead endpoint."""
    import contextlib
    import io

    from etl_wlg_metlink_spark.sources import gtfs

    captured = {}

    @contextlib.contextmanager
    def fake_urlopen(req, timeout=None):
        captured["timeout"] = timeout
        captured["headers"] = {
            k.lower(): v for k, v in req.header_items()
        }
        yield io.BytesIO(b"{}")

    import urllib.request

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    out = gtfs._urllib_fetch(
        "http://example.invalid/x",
        {"accept": "application/json", "x-api-key": "k"},
    )
    assert out == "{}"
    assert captured["timeout"] == 30
    assert captured["headers"]["accept"] == "application/json"
    assert captured["headers"]["x-api-key"] == "k"
