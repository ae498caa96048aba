"""filter_kubernetes: live API-server metadata enrichment.

Reference: plugins/filter_kubernetes/ — kube_meta.c fetches
``/api/v1/namespaces/{ns}/pods/{pod}`` (kube_meta.h:55) from the API
server with a bearer token, caches the result, extracts
uid/labels/annotations/nodeName/podIP, and merges them with the
tag-derived fields (pod_name, namespace_name, container_name,
docker_id — KUBE_TAG_TO_REGEX in kube_regex.h:25) into a
``kubernetes`` map on every record.

Spark-first shape — the fetch topology is the deliberate deviation:
the reference runs one agent per node, each holding a per-node cache.
A 1000-executor Spark job doing per-record (or even per-executor)
API calls would hammer the API server with duplicate lookups, so we
invert it: extract the DISTINCT (namespace, pod) pairs from the tags
(bounded by cluster size — a 15k-pod cluster is a 15k-row driver
list, regardless of whether the fact side is 100 TB), fetch each once
from the driver with a TTL cache, and broadcast-join the metadata
back. The join stays broadcast for the same reason the reference's
cache stays in-memory: the lookup side is tiny.

No API server reachable (init or fetch failure) degrades exactly like
the reference: records still get the tag-derived kubernetes fields
(kube_meta.c merge_meta_from_tag), API-side fields come back NULL.
"""

from __future__ import annotations

import json
import ssl
import time
import urllib.error
import urllib.request

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# KUBE_TAG_TO_REGEX (kube_regex.h:25) uses named groups; Java regex
# rejects underscores in group names, so the same structure is
# expressed positionally: <pod>_<namespace>_<container>-<64hex>.log
TAG_REGEX = r"^(.+?)_([^_]+)_(.+)-([a-z0-9]{64})\.log$"

DEFAULT_KUBE_URL = "https://kubernetes.default.svc:443"
DEFAULT_TAG_PREFIX = "kube.var.log.containers."


class KubeMetaClient:
    """Bearer-token HTTP client for pod/namespace metadata with the
    reference's TTL cache (Kube_Meta_Cache_TTL, default: never
    expire)."""

    def __init__(
        self,
        kube_url: str = DEFAULT_KUBE_URL,
        token: str | None = None,
        token_file: str | None = None,
        ca_file: str | None = None,
        tls_verify: bool = True,
        meta_cache_ttl: float = 0.0,
        timeout: float = 10.0,
    ):
        self.kube_url = kube_url.rstrip("/")
        if token is None and token_file:
            with open(token_file) as fh:
                token = fh.read().strip()
        self.token = token
        self.timeout = timeout
        self.ttl = meta_cache_ttl
        self._cache: dict[str, tuple[float, dict | None]] = {}
        if kube_url.startswith("https"):
            ctx = ssl.create_default_context(cafile=ca_file)
            if not tls_verify:
                ctx.check_hostname = False
                ctx.verify_mode = ssl.CERT_NONE
            self._ssl = ctx
        else:
            self._ssl = None

    def _get(self, path: str) -> dict | None:
        now = time.monotonic()
        hit = self._cache.get(path)
        if hit is not None and (self.ttl <= 0 or now - hit[0] < self.ttl):
            return hit[1]
        req = urllib.request.Request(self.kube_url + path)
        if self.token:
            req.add_header("Authorization", f"Bearer {self.token}")
        try:
            with urllib.request.urlopen(
                req, timeout=self.timeout, context=self._ssl
            ) as resp:
                obj = json.loads(resp.read().decode("utf-8"))
        except (urllib.error.URLError, OSError, ValueError):
            obj = None  # kube_meta.c: fetch failure -> tag-only meta
        self._cache[path] = (now, obj)
        return obj

    def get_pod(self, namespace: str, pod: str) -> dict | None:
        return self._get(f"/api/v1/namespaces/{namespace}/pods/{pod}")

    def get_namespace(self, namespace: str) -> dict | None:
        return self._get(f"/api/v1/namespaces/{namespace}")


def _pod_row(ns: str, pod: str, obj: dict | None) -> dict:
    """Extract the fields merge_pod_meta packs (kube_meta.c:1113+):
    pod_id (metadata.uid), labels, annotations, host (spec.nodeName),
    pod_ip (status.podIP)."""
    meta = (obj or {}).get("metadata") or {}
    spec = (obj or {}).get("spec") or {}
    status = (obj or {}).get("status") or {}

    def smap(d):
        return {str(k): str(v) for k, v in d.items()} if d else None

    return {
        "namespace_name": ns,
        "pod_name": pod,
        "pod_id": meta.get("uid"),
        "labels": smap(meta.get("labels")),
        "annotations": smap(meta.get("annotations")),
        "host": spec.get("nodeName"),
        "pod_ip": status.get("podIP"),
    }


POD_META_SCHEMA = (
    "namespace_name string, pod_name string, pod_id string, "
    "labels map<string,string>, annotations map<string,string>, "
    "host string, pod_ip string"
)


def fetch_pod_metadata(
    spark: SparkSession,
    client: KubeMetaClient,
    pairs: list[tuple[str, str]],
) -> DataFrame:
    """Driver-side fetch of each distinct (namespace, pod) once."""
    rows = [_pod_row(ns, pod, client.get_pod(ns, pod)) for ns, pod in pairs]
    return spark.createDataFrame(rows, POD_META_SCHEMA)


def kubernetes_filter(
    df: DataFrame,
    client: KubeMetaClient | None = None,
    tag_col: str = "tag",
    kube_tag_prefix: str = DEFAULT_TAG_PREFIX,
    labels: bool = True,
    annotations: bool = False,
    merge_log: bool = False,
    merge_log_key: str = "log_processed",
    keep_log: bool = True,
    log_col: str = "log",
    metadata: DataFrame | None = None,
) -> DataFrame:
    """Add the ``kubernetes`` struct column to every record.

    ``metadata`` short-circuits the live fetch with a pre-built pod
    metadata DataFrame (POD_META_SCHEMA) — the path tests and offline
    replays use; ``client`` fetches it live from the API server.
    ``merge_log`` parses the record's ``log`` string as JSON into a
    ``merge_log_key`` map column (Merge_Log; top-level key merging is
    impossible in a fixed schema, so the reference's Merge_Log_Key
    form is the one implemented; Keep_Log=Off drops the raw log).
    """
    spark = df.sparkSession
    # tag -> (pod, namespace, container, docker_id); prefix stripped
    # first (kube_conf.h kube_tag_prefix)
    stem = F.regexp_replace(
        F.col(tag_col), "^" + _re_quote(kube_tag_prefix), ""
    )
    parsed = df.withColumns(
        {
            "_pod": F.regexp_extract(stem, TAG_REGEX, 1),
            "_ns": F.regexp_extract(stem, TAG_REGEX, 2),
            "_container": F.regexp_extract(stem, TAG_REGEX, 3),
            "_docker_id": F.regexp_extract(stem, TAG_REGEX, 4),
        }
    )

    if metadata is None:
        if client is None:
            metadata = spark.createDataFrame([], POD_META_SCHEMA)
        else:
            pairs = [
                (r["_ns"], r["_pod"])
                for r in parsed.select("_ns", "_pod")
                .filter((F.col("_ns") != "") & (F.col("_pod") != ""))
                .distinct()
                .collect()  # bounded by pod count, not record count
            ]
            metadata = fetch_pod_metadata(spark, client, pairs)

    meta = metadata.select(
        F.col("namespace_name").alias("_m_ns"),
        F.col("pod_name").alias("_m_pod"),
        "pod_id",
        *(["labels"] if labels else []),
        *(["annotations"] if annotations else []),
        "host",
        "pod_ip",
    ).dropDuplicates(["_m_ns", "_m_pod"])

    joined = parsed.join(
        F.broadcast(meta),
        on=(parsed["_ns"] == meta["_m_ns"]) & (parsed["_pod"] == meta["_m_pod"]),
        how="left",
    )

    kube_fields = [
        F.col("_pod").alias("pod_name"),
        F.col("_ns").alias("namespace_name"),
        F.col("_container").alias("container_name"),
        F.col("_docker_id").alias("docker_id"),
        F.col("pod_id"),
        *([F.col("labels")] if labels else []),
        *([F.col("annotations")] if annotations else []),
        F.col("host"),
        F.col("pod_ip"),
    ]
    out = joined.withColumn("kubernetes", F.struct(*kube_fields)).drop(
        "_pod", "_ns", "_container", "_docker_id", "_m_ns", "_m_pod",
        "pod_id", "host", "pod_ip",
        *(["labels"] if labels else []),
        *(["annotations"] if annotations else []),
    )

    if merge_log and log_col in df.columns:
        # Merge_Log: only records whose log body IS a JSON object get
        # the parsed map (kube_conf.c merge path); others stay NULL
        out = out.withColumn(
            merge_log_key,
            F.when(
                F.col(log_col).rlike(r"^\s*\{"),
                F.from_json(F.col(log_col), "map<string,string>"),
            ),
        )
        if not keep_log:
            out = out.drop(log_col)
    return out


def _re_quote(s: str) -> str:
    out = []
    for ch in s:
        out.append("\\" + ch if ch in r"\.[]{}()*+?^$|" else ch)
    return "".join(out)


def k8s_events_records(
    df: DataFrame,
    item_col: str = "item",
    now_ts: Column | None = None,
    retention_sec: int = 3600,
):
    """in_kubernetes_events record shaping (reference
    /root/reference/plugins/in_kubernetes_events/kubernetes_events.c):

    - the event time picks lastTimestamp, then firstTimestamp, then
      metadata.creationTimestamp (:268-292 — "some events can have
      lastTimestamp and firstTimestamp set to NULL");
    - events older than ``retention_time`` (default 1h,
      kubernetes_events.h) are filtered (:304-309);
    - re-lists are deduplicated per metadata.uid keeping the HIGHEST
      resourceVersion (:296-380 — the sqlite exists-by-uid check the
      reference keeps across polls, expressed here as a max-per-uid
      aggregation, the shape that holds on a cluster).

    Input: one K8s Event JSON per row; output adds event_time, uid,
    resource_version and keeps only the surviving rows.
    """
    item = F.col(item_col)
    t = F.coalesce(
        F.try_to_timestamp(
            F.get_json_object(item, "$.lastTimestamp"),
            F.lit("yyyy-MM-dd'T'HH:mm:ssX")),
        F.try_to_timestamp(
            F.get_json_object(item, "$.firstTimestamp"),
            F.lit("yyyy-MM-dd'T'HH:mm:ssX")),
        F.try_to_timestamp(
            F.get_json_object(item, "$.metadata.creationTimestamp"),
            F.lit("yyyy-MM-dd'T'HH:mm:ssX")),
    )
    now = now_ts if now_ts is not None else F.current_timestamp()
    out = (
        df.withColumn("event_time", t)
        .withColumn("uid", F.get_json_object(item, "$.metadata.uid"))
        .withColumn(
            "resource_version",
            F.get_json_object(item, "$.metadata.resourceVersion")
            .try_cast("long"),
        )
        .filter(F.col("event_time").isNotNull()
                & F.col("uid").isNotNull()
                & F.col("resource_version").isNotNull())
        .filter(
            F.col("event_time")
            >= now - F.make_dt_interval(secs=F.lit(retention_sec)))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("uid").orderBy(
        F.col("resource_version").desc())
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
