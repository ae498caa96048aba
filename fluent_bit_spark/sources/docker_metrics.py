"""in_docker: per-container cgroup CPU/memory snapshots.

Reference: /root/reference/plugins/in_docker/docker.c + cgroup_v1.c /
cgroup_v2.c — per interval one record per active container:
``{id (12-char short), name, cpu_used (ns), mem_used (bytes),
mem_limit (bytes)}`` (docker.c:380-399). Active ids come from the
cgroup tree: v1 ``<sysfs>/cpu/docker/<64-char-id>/`` (cgroup_v1.c:44),
v2 ``<sysfs>/system.slice/docker-<id>.scope/`` (cgroup_v2.c:47,
docker.h:44); version detection = presence of ``cgroup.controllers``
(docker.c:282-300). Counters: v1 cpuacct.usage / memory.usage_in_bytes
/ memory.limit_in_bytes; v2 cpu.stat's ``usage_usec`` (converted to ns
like the reference template) / memory.current / memory.max. Container
names come from ``<containers_path>/<id>/config.v2.json``'s "Name"
value with the leading '/' stripped (cgroup_v1.c:246-280). ``include``
/ ``exclude`` lists filter ids (docker.c:206-260 whitelist/blacklist).

Roots are parameters so tests (and non-/sys deployments) inject a
fixture tree; on a real host the defaults read the live cgroup fs.
Like the other host samplers this returns driver-side rows — one tiny
record per container per tick.
"""

from __future__ import annotations

import json
import os

LONG_ID = 64
SHORT_ID = 12

# DDL schema for Spark ingestion — `name` is nullable (a container with
# no config.v2.json has none), so inference can't be relied on.
DOCKER_SCHEMA = (
    "id string, name string, cpu_used long, mem_used long, mem_limit long"
)


def _read_int(path: str) -> int | None:
    try:
        with open(path) as fh:
            txt = fh.read().strip()
        if txt == "max":  # cgroup v2 unlimited memory.max
            return 2**63 - 1
        return int(txt)
    except (OSError, ValueError):
        return None


def _cgroup_version(sysfs_path: str) -> int:
    return 2 if os.path.isfile(
        os.path.join(sysfs_path, "cgroup.controllers")
    ) else 1


def _active_ids(sysfs_path: str, version: int) -> list[str]:
    if version == 1:
        base = os.path.join(sysfs_path, "cpu", "docker")
        if not os.path.isdir(base):
            return []
        return sorted(d for d in os.listdir(base) if len(d) == LONG_ID)
    base = os.path.join(sysfs_path, "system.slice")
    if not os.path.isdir(base):
        return []
    out = []
    for d in os.listdir(base):
        # docker-<64>.scope
        if d.startswith("docker-") and d.endswith(".scope") and len(
            d
        ) == 7 + LONG_ID + 6:
            out.append(d[7 : 7 + LONG_ID])
    return sorted(out)


def container_name(containers_path: str, cid: str) -> str | None:
    """"Name" from config.v2.json, leading '/' stripped."""
    cfg = os.path.join(containers_path, cid, "config.v2.json")
    try:
        with open(cfg) as fh:
            doc = json.load(fh)
    except (OSError, ValueError):
        return None
    name = doc.get("Name")
    return name.lstrip("/") if isinstance(name, str) else None


def docker_snapshots(
    sysfs_path: str = "/sys/fs/cgroup",
    containers_path: str = "/var/lib/docker/containers",
    include: list[str] | None = None,
    exclude: list[str] | None = None,
) -> list[dict]:
    """One record per (filtered) active container."""
    version = _cgroup_version(sysfs_path)
    ids = _active_ids(sysfs_path, version)
    if include:
        keep = {i[:SHORT_ID] for i in include}
        ids = [i for i in ids if i[:SHORT_ID] in keep]
    if exclude:
        drop = {i[:SHORT_ID] for i in exclude}
        ids = [i for i in ids if i[:SHORT_ID] not in drop]

    out = []
    for cid in ids:
        if version == 1:
            cpu = _read_int(
                os.path.join(sysfs_path, "cpu", "docker", cid, "cpuacct.usage")
            )
            mem_used = _read_int(
                os.path.join(
                    sysfs_path, "memory", "docker", cid,
                    "memory.usage_in_bytes",
                )
            )
            mem_limit = _read_int(
                os.path.join(
                    sysfs_path, "memory", "docker", cid,
                    "memory.limit_in_bytes",
                )
            )
        else:
            scope = os.path.join(
                sysfs_path, "system.slice", f"docker-{cid}.scope"
            )
            cpu = None
            try:
                with open(os.path.join(scope, "cpu.stat")) as fh:
                    for line in fh:
                        if line.startswith("usage_usec "):
                            # template "usage_usec %lu"; ns like v1
                            cpu = int(line.split()[1]) * 1000
                            break
            except (OSError, ValueError):
                pass
            mem_used = _read_int(os.path.join(scope, "memory.current"))
            mem_limit = _read_int(os.path.join(scope, "memory.max"))
        if cpu is None or mem_used is None:
            continue  # reference skips snapshot-less containers
        out.append(
            {
                "id": cid[:SHORT_ID],
                "name": container_name(containers_path, cid),
                "cpu_used": cpu,
                "mem_used": mem_used,
                "mem_limit": mem_limit,
            }
        )
    return out


def parse_docker_events(df, line_col: str = "line", key: str = "message",
                        parser_spec=None):
    """in_docker_events: one record per event-socket line.

    Reference: /root/reference/plugins/in_docker_events/
    docker_events.c:239-330 — without a parser each line lands under
    ``key`` (default "message", docker_events.h:30); with one, the
    line is parsed and parse FAILURES ARE DROPPED (the parser-error
    branch :324 skips the record). Columnar over captured lines.
    """
    from pyspark.sql import functions as F

    if parser_spec is None:
        return df.withColumn(key, F.col(line_col)).drop(
            *([line_col] if line_col != key else []))
    from fluent_bit_spark.parsers.compile import apply_parser

    out = apply_parser(df, line_col, parser_spec)
    return out.filter(F.col("_parse_ok")).drop("_parse_ok", line_col)
