"""filter_kubernetes: live API client + broadcast metadata join.

The API server is a real local HTTP server (the sandbox has no
cluster); the client speaks the same REST surface kube_meta.c does
(/api/v1/namespaces/{ns}/pods/{pod}, bearer token header)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from fluent_bit_spark.k8s import (
    TAG_REGEX,
    KubeMetaClient,
    kubernetes_filter,
)

DOCKER_ID = "a" * 64
POD_OBJ = {
    "kind": "Pod",
    "metadata": {
        "name": "app-6b4d7f9c8-x2x9z",
        "namespace": "prod",
        "uid": "b9271167-0000-4b6c-b3f6-2f39c3a9d0aa",
        "labels": {"app": "web", "tier": "frontend"},
        "annotations": {"checksum": "deadbeef"},
    },
    "spec": {"nodeName": "node-7"},
    "status": {"podIP": "10.1.2.3"},
}


class _Handler(BaseHTTPRequestHandler):
    hits: list[str] = []
    auth: list[str | None] = []

    def do_GET(self):  # noqa: N802
        _Handler.hits.append(self.path)
        _Handler.auth.append(self.headers.get("Authorization"))
        if self.path == "/api/v1/namespaces/prod/pods/app-6b4d7f9c8-x2x9z":
            body = json.dumps(POD_OBJ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body)
        else:
            self.send_response(404)
            self.end_headers()
            self.wfile.write(b"{}")

    def log_message(self, *a):  # silence
        pass


@pytest.fixture(scope="module")
def api_server():
    _Handler.hits = []
    _Handler.auth = []
    srv = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


@pytest.fixture(scope="module")
def spark():
    from fluent_bit_spark.session import get_spark

    return get_spark("test-k8s", master="local[4]")


def make_tag(pod="app-6b4d7f9c8-x2x9z", ns="prod", container="web"):
    return (
        "kube.var.log.containers."
        f"{pod}_{ns}_{container}-{DOCKER_ID}.log"
    )


class TestClient:
    def test_fetch_pod_with_token(self, api_server):
        c = KubeMetaClient(api_server, token="sekret")
        obj = c.get_pod("prod", "app-6b4d7f9c8-x2x9z")
        assert obj["metadata"]["uid"].startswith("b9271167")
        assert _Handler.auth[-1] == "Bearer sekret"

    def test_cache_no_refetch(self, api_server):
        c = KubeMetaClient(api_server)
        c.get_pod("prod", "app-6b4d7f9c8-x2x9z")
        n = len(_Handler.hits)
        c.get_pod("prod", "app-6b4d7f9c8-x2x9z")
        assert len(_Handler.hits) == n  # served from cache

    def test_missing_pod_returns_none_shape(self, api_server):
        c = KubeMetaClient(api_server)
        # 404 body is "{}" -> parsed but empty; still a dict
        assert c.get_pod("prod", "nope") in (None, {})

    def test_unreachable_server_degrades(self):
        c = KubeMetaClient("http://127.0.0.1:1", timeout=0.2)
        assert c.get_pod("prod", "x") is None


class TestFilter:
    def test_live_enrichment(self, spark, api_server):
        df = spark.createDataFrame(
            [(make_tag(), "hello"), (make_tag(container="side"), "world")],
            "tag string, log string",
        )
        out = kubernetes_filter(df, KubeMetaClient(api_server))
        rows = {r["kubernetes"]["container_name"]: r for r in out.collect()}
        k = rows["web"]["kubernetes"]
        assert k["pod_name"] == "app-6b4d7f9c8-x2x9z"
        assert k["namespace_name"] == "prod"
        assert k["docker_id"] == DOCKER_ID
        assert k["pod_id"].startswith("b9271167")
        assert k["labels"]["app"] == "web"
        assert k["host"] == "node-7" and k["pod_ip"] == "10.1.2.3"
        # one distinct pod -> exactly one API hit for it
        pod_hits = [h for h in _Handler.hits if h.endswith("x2x9z")]
        assert len(pod_hits) >= 1

    def test_offline_tag_only_meta(self, spark):
        df = spark.createDataFrame([(make_tag(), "x")], "tag string, log string")
        out = kubernetes_filter(
            df, KubeMetaClient("http://127.0.0.1:1", timeout=0.2)
        )
        k = out.collect()[0]["kubernetes"]
        # merge_meta_from_tag path: regex fields present, API NULL
        assert k["pod_name"] == "app-6b4d7f9c8-x2x9z"
        assert k["pod_id"] is None and k["host"] is None

    def test_annotations_gated(self, spark, api_server):
        df = spark.createDataFrame([(make_tag(), "x")], "tag string, log string")
        c = KubeMetaClient(api_server)
        no_ann = kubernetes_filter(df, c, annotations=False)
        assert "annotations" not in no_ann.schema["kubernetes"].dataType.names
        with_ann = kubernetes_filter(df, c, annotations=True)
        k = with_ann.collect()[0]["kubernetes"]
        assert k["annotations"]["checksum"] == "deadbeef"

    def test_merge_log(self, spark, api_server):
        df = spark.createDataFrame(
            [(make_tag(), '{"level":"warn","msg":"disk"}'), (make_tag(), "plain")],
            "tag string, log string",
        )
        out = kubernetes_filter(
            df, KubeMetaClient(api_server), merge_log=True, keep_log=False
        )
        rows = out.collect()
        assert "log" not in out.columns
        maps = sorted(
            (r["log_processed"] for r in rows), key=lambda m: m is None
        )
        assert maps[0]["level"] == "warn" and maps[1] is None

    def test_join_is_broadcast(self, spark, api_server):
        df = spark.createDataFrame([(make_tag(), "x")], "tag string, log string")
        out = kubernetes_filter(df, KubeMetaClient(api_server))
        assert "BroadcastHashJoin" in out._jdf.queryExecution().executedPlan().toString()

    def test_classic_conf(self, spark, api_server, tmp_path):
        from fluent_bit_spark.classic import build_classic_pipeline

        tok = tmp_path / "token"
        tok.write_text("sekret-from-file\n")
        conf = f"""
[INPUT]
    Name lib
    Tag  {make_tag()}

[FILTER]
    Name kubernetes
    Match kube.*
    Kube_URL {api_server}
    Kube_Token_File {tok}
    Annotations On

[OUTPUT]
    Name null
    Match *
"""
        lib = spark.createDataFrame(
            [(make_tag(), "hi")], "tag string, log string"
        )
        pipe = build_classic_pipeline(
            spark, conf, lib_inputs={make_tag(): lib}
        )
        k = pipe.records.collect()[0]["kubernetes"]
        assert k["labels"]["tier"] == "frontend"
        assert k["annotations"]["checksum"] == "deadbeef"
        assert "Bearer sekret-from-file" in _Handler.auth


class TestTagRegex:
    def test_matches_reference_shape(self):
        import re

        tag = f"app.x_kube-system_c-1-{DOCKER_ID}.log"
        m = re.match(TAG_REGEX, tag)
        assert m.groups() == ("app.x", "kube-system", "c-1", DOCKER_ID)

    def test_no_match_short_id(self):
        import re

        assert re.match(TAG_REGEX, f"a_b_c-{'a'*32}.log") is None


def test_k8s_events_records(spark):
    """in_kubernetes_events: timestamp precedence, retention filter,
    uid dedup keeping the highest resourceVersion."""
    import json

    from pyspark.sql import functions as F

    from fluent_bit_spark.k8s import k8s_events_records

    def ev(uid, rv, last=None, first=None, created=None):
        item = {"metadata": {"uid": uid, "resourceVersion": str(rv),
                             "creationTimestamp": created},
                "lastTimestamp": last, "firstTimestamp": first,
                "reason": "Scheduled"}
        return (json.dumps(item),)

    rows = [
        ev("u1", 10, last="2023-11-14T22:00:00Z"),
        ev("u1", 12, last="2023-11-14T22:05:00Z"),  # wins (higher rv)
        ev("u2", 5, first="2023-11-14T22:01:00Z"),  # firstTimestamp
        ev("u3", 7, created="2023-11-14T22:02:00Z"),  # creationTs
        ev("u4", 9, last="2023-11-14T10:00:00Z"),  # outside retention
        ev("u5", 1),  # no timestamp at all -> dropped
    ]
    df = spark.createDataFrame(rows, ["item"])
    out = k8s_events_records(
        df, now_ts=F.lit("2023-11-14 23:00:00").cast("timestamp"),
        retention_sec=3600 * 2)
    got = {r["uid"]: r for r in out.collect()}
    assert set(got) == {"u1", "u2", "u3"}
    assert got["u1"]["resource_version"] == 12
    assert str(got["u2"]["event_time"]).startswith("2023-11-14 22:01")
    assert str(got["u3"]["event_time"]).startswith("2023-11-14 22:02")
