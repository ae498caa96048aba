"""in_proc / in_health / in_docker_events / out_cloudwatch_logs."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from fluent_bit_spark.functions.cloudwatch_out import (
    cloudwatch_payloads,
    to_cloudwatch_event,
)
from fluent_bit_spark.sources.procfs import (
    health_record,
    pid_from_procname,
    proc_snapshot,
)


def _mk_proc(tmp_path, pid, name, vmrss_kb=500, fds=3):
    d = tmp_path / str(pid)
    (d / "fd").mkdir(parents=True)
    for i in range(fds):
        (d / "fd" / str(i)).write_text("")
    (d / "cmdline").write_bytes(
        f"/usr/bin/{name}\0--flag\0".encode())
    (d / "status").write_text(
        f"Name:\t{name}\nVmPeak:\t  1024 kB\nVmRSS:\t  {vmrss_kb} kB\n"
        "VmSwap:\t     0 kB\nThreads: 4\n")
    return str(tmp_path)


def test_pid_lookup_by_cmdline_basename(tmp_path):
    root = _mk_proc(tmp_path, 42, "nginx")
    _mk_proc(tmp_path, 50, "redis")
    assert pid_from_procname(root, "nginx") == 42
    assert pid_from_procname(root, "redis") == 50
    assert pid_from_procname(root, "nope") == -1


def test_proc_snapshot_record(tmp_path):
    root = _mk_proc(tmp_path, 42, "nginx", vmrss_kb=777, fds=5)
    rec = proc_snapshot("nginx", proc_path=root)
    assert rec["alive"] is True and rec["pid"] == 42
    # the reference multiplies kB by 1000, not 1024 (in_proc.c:346)
    assert rec["mem.VmRSS"] == 777_000
    assert rec["mem.VmPeak"] == 1_024_000
    assert rec["mem.VmSize"] == 0  # untracked lines stay zero
    assert rec["fd"] == 5
    # dead process: alive false, zeroed counters
    dead = proc_snapshot("gone", proc_path=root)
    assert dead["alive"] is False and dead["pid"] == -1
    assert dead["mem.VmRSS"] == 0 and dead["fd"] == 0
    # alert mode: alive process emits nothing (in_proc.c:189)
    assert proc_snapshot("nginx", proc_path=root, alert=True) is None
    assert proc_snapshot("gone", proc_path=root, alert=True) is not None


def test_health_record():
    assert health_record(True) == {"alive": True}
    r = health_record(False, host="db", port=5432,
                      add_host=True, add_port=True)
    assert r == {"alive": False, "hostname": "db", "port": 5432}
    assert health_record(True, alert=True) is None
    assert health_record(False, alert=True) == {"alive": False}


def test_docker_events_lines(spark):
    from fluent_bit_spark.parsers.builtin import builtin_parsers
    from fluent_bit_spark.sources.docker_metrics import parse_docker_events

    df = spark.createDataFrame(
        [('{"status":"start","id":"abc"}',)], ["line"])
    out = parse_docker_events(df).collect()
    assert out[0]["message"] == '{"status":"start","id":"abc"}'
    # with a parser: parsed fields, failures dropped
    df2 = spark.createDataFrame(
        [('{"status":"die","id":"xyz"}',), ("not json",)], ["line"])
    parsed = parse_docker_events(
        df2, parser_spec=builtin_parsers()["json"]).collect()
    assert len(parsed) == 1
    assert parsed[0]["record_map"]["status"] == "die"


def test_cloudwatch_event(spark):
    df = spark.createDataFrame(
        [("t.a", 'say "hi"', 1)], "tag string, msg string, n long"
    ).withColumn("ts", F.lit("2023-11-14 22:13:20.25").cast("timestamp"))
    ev = df.select(to_cloudwatch_event(df, "ts").alias("e")).first()["e"]
    # ms timestamp + JSON-escaped message of the record JSON
    assert ev.startswith('{"timestamp":1700000000250,"message":"')
    outer = json.loads(ev)
    assert json.loads(outer["message"]) == {"msg": 'say "hi"', "n": 1}
    # log_key: the single value, escaped, no record wrapper
    ev2 = df.select(
        to_cloudwatch_event(df, "ts", log_key="msg").alias("e")
    ).first()["e"]
    assert json.loads(ev2)["message"] == 'say "hi"'
    # empty message discarded -> NULL
    df3 = df.withColumn("msg", F.lit(""))
    assert df3.select(
        to_cloudwatch_event(df3, "ts", log_key="msg").alias("e")
    ).first()["e"] is None


def test_cloudwatch_batching():
    events = [(3, '{"timestamp":3,"message":"c"}'),
              (1, '{"timestamp":1,"message":"a"}'),
              (2, '{"timestamp":2,"message":"b"}')]
    out = cloudwatch_payloads(events)
    assert len(out) == 1
    arr = json.loads(out[0])
    assert [e["timestamp"] for e in arr] == [1, 2, 3]  # sorted
    # event-count cap splits batches
    out = cloudwatch_payloads(events, max_events=2)
    assert len(out) == 2
    # payload-size cap splits batches (72+4 header/footer + 42/event)
    out = cloudwatch_payloads(events, max_payload=76 + 2 * 100)
    assert len(out) == 2
