"""filter_ecs: enrich records with ECS cluster/task metadata.

Reference: /root/reference/plugins/filter_ecs/ecs.c — init fetches the
static cluster metadata once from the ECS agent introspection endpoint
(``/v1/metadata``, :367 get_ecs_cluster_metadata: ClusterName,
ContainerInstanceArn -> ContainerInstanceID, Version ->
ECSAgentVersion); per incoming tag the 12-char Docker container short
id after ``ecs_tag_prefix`` keys a task lookup
(``/v1/tasks?dockerid=<id>``, :700+): TaskARN -> TaskID,
TaskDefinitionFamily(Family), TaskDefinitionVersion(Version), plus the
container's ContainerID/DockerContainerName/ECSContainerName. ``Add
dest_key template`` entries translate record-accessor templates over
that metadata map (:829-930 key set; ecs.h:128 "12 char container
short ID").

Spark-first shape: the agent endpoint serves a handful of containers
per host — the distinct container-id set is tiny and host-local, so
metadata is fetched driver-side through the injectable ``fetch`` hook
(same seam as aws.ImdsClient / the reference's mock_http_call,
ecs.c:262-280), materialized as a BROADCAST metadata table and joined
on the short id extracted from the tag. The Add templates then fold
into the same projection. Fetch failure leaves records unenriched,
matching the reference's retry-and-pass-through behavior.
"""

from __future__ import annotations

import json
import urllib.request
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ECS_AGENT = "http://127.0.0.1:51678"
CLUSTER_PATH = "/v1/metadata"  # ecs.h:31
TASK_PATH = "/v1/tasks?dockerid={id}"  # ecs.h:32

METADATA_KEYS = [
    "ContainerID", "DockerContainerName", "ECSContainerName",
    "TaskARN", "TaskID", "TaskDefinitionFamily", "TaskDefinitionVersion",
    "ClusterName", "ContainerInstanceArn", "ContainerInstanceID",
    "ECSAgentVersion",
]


class EcsAgentClient:
    """Agent introspection client with an injectable transport."""

    def __init__(
        self,
        base: str = ECS_AGENT,
        fetch: Callable[[str], str] | None = None,
        timeout: float = 2.0,
    ):
        self.base = base
        self.timeout = timeout
        self._fetch = fetch

    def _get(self, path: str) -> dict | None:
        try:
            if self._fetch is not None:
                return json.loads(self._fetch(path))
            with urllib.request.urlopen(
                self.base + path, timeout=self.timeout
            ) as r:
                return json.loads(r.read().decode())
        except Exception:
            return None

    def cluster_meta(self) -> dict[str, str] | None:
        """Static cluster fields (ecs.c:480-489 response shape)."""
        doc = self._get(CLUSTER_PATH)
        if not doc or "Cluster" not in doc:
            return None
        arn = doc.get("ContainerInstanceArn", "")
        return {
            "ClusterName": doc["Cluster"],
            "ContainerInstanceArn": arn,
            "ContainerInstanceID": arn.rsplit("/", 1)[-1] if arn else "",
            "ECSAgentVersion": doc.get("Version", ""),
        }

    def task_meta(self, short_id: str) -> dict[str, str] | None:
        """Per-container task fields (ecs.c:676-694 shape): the first
        Containers[] entry whose DockerId starts with the short id."""
        doc = self._get(TASK_PATH.format(id=short_id))
        if not doc or "Arn" not in doc:
            return None
        arn = doc["Arn"]
        meta = {
            "TaskARN": arn,
            "TaskID": arn.rsplit("/", 1)[-1],
            "TaskDefinitionFamily": doc.get("Family", ""),
            "TaskDefinitionVersion": doc.get("Version", ""),
        }
        for c in doc.get("Containers", []):
            if c.get("DockerId", "").startswith(short_id):
                meta["ContainerID"] = c.get("DockerId", "")
                meta["DockerContainerName"] = c.get("DockerName", "")
                meta["ECSContainerName"] = c.get("Name", "")
                break
        return meta


def container_short_id(tag_col, ecs_tag_prefix: str = ""):
    """12-char Docker short id after the prefix (ecs.c:1300-1320: the
    tag must be at least prefix + 12 chars; shorter tags get no
    metadata)."""
    start = len(ecs_tag_prefix) + 1
    sid = F.substring(tag_col, start, 12)
    return F.when(F.length(tag_col) >= len(ecs_tag_prefix) + 12, sid)


def ecs_metadata_table(
    spark: SparkSession, client: EcsAgentClient, short_ids: list[str]
) -> DataFrame:
    """One broadcastable row per container short id with the full
    metadata key set (missing lookups are omitted, like the
    reference's per-id failed-lookup skip list)."""
    cluster = client.cluster_meta() or {}
    rows = []
    for sid in short_ids:
        task = client.task_meta(sid)
        if task is None and not cluster:
            continue
        rec = {"short_id": sid, **cluster, **(task or {})}
        rows.append(tuple(rec.get(k) for k in ["short_id", *METADATA_KEYS]))
    schema = ", ".join(f"`{k}` string" for k in ["short_id", *METADATA_KEYS])
    return spark.createDataFrame(rows, schema) if rows else spark.createDataFrame(
        [], schema
    )


class _ClusterOnly:
    """Client wrapper for cluster_metadata_only: serves the cluster
    fields, never a task lookup."""

    def __init__(self, cluster: dict[str, str]):
        self._cluster = cluster

    def cluster_meta(self):
        return self._cluster or None

    def task_meta(self, short_id: str):
        return None


def filter_ecs(
    df: DataFrame,
    add: dict[str, str],
    client: EcsAgentClient | None = None,
    metadata: DataFrame | None = None,
    tag_col: str = "tag",
    ecs_tag_prefix: str = "",
    cluster_metadata_only: bool = False,
) -> DataFrame:
    """Apply ``Add dest_key template`` enrichment: broadcast-join the
    metadata table on the tag-derived short id and translate each
    template ($Key record accessors / ${...} interpolation) over the
    metadata columns."""
    from fluent_bit_spark.functions.accessor import ra_translate_col

    spark = df.sparkSession
    sid = container_short_id(F.col(tag_col), ecs_tag_prefix)
    if metadata is None:
        if client is None:
            client = EcsAgentClient()
        if cluster_metadata_only:
            # cluster_metadata_only (ecs.c config map): skip the task
            # lookup entirely, one metadata row serves every tag
            cluster = client.cluster_meta() or {}
            ids = [""]
            sid = F.lit("")
            metadata = ecs_metadata_table(
                spark, _ClusterOnly(cluster), ids
            )
        else:
            ids = [
                r["_sid"]
                for r in df.select(sid.alias("_sid")).distinct().collect()
                if r["_sid"]
            ]
            metadata = ecs_metadata_table(spark, client, sorted(ids))

    joined = df.withColumn("_sid", sid).join(
        F.broadcast(metadata.withColumnRenamed("short_id", "_sid")),
        "_sid",
        "left",
    )
    for dest, template in add.items():
        joined = joined.withColumn(
            dest, ra_translate_col(template, tag_col=tag_col)
        )
    return joined.drop("_sid", *METADATA_KEYS)
