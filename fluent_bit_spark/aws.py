"""filter_aws: enrich records with EC2 instance metadata (IMDS).

Reference: plugins/filter_aws/aws.c + src/aws/flb_aws_imds.c. The
reference queries the link-local Instance Metadata Service
(169.254.169.254) once per key group and injects the values into every
record: az, ec2_instance_id, ec2_instance_type, private_ip, vpc_id
(via the interface MAC), ami_id, account_id (from the instance
identity document), hostname, and optionally the instance tags
(tags_enabled / tags_include / tags_exclude,
aws.c:1203-1264 config map — az and ec2_instance_id default on).

Spark-first shape: the metadata is PER-HOST CONSTANT — the reference
daemon runs on the EC2 node it describes. The analog here is one
driver-side IMDS fetch at plan-build time (mirroring the reference's
init-time `get_ec2_metadata`, aws.c:631-720) and the values attached
as LITERAL columns — constant folding, zero join, zero shuffle; at
10^12 rows the enrichment costs nothing beyond the extra output bytes.
Fetch failure degrades like the reference: the record passes through
without the keys (aws.c returns the record unmodified until metadata
fetch succeeds).

`ImdsClient` follows the runtime tests' mock-generator seam
(tests/include/aws_client_mock.h): the `fetch` hook replaces the HTTP
transport, and the tests replay the exact URI->payload chains from
tests/runtime/filter_aws.c.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# src/aws/flb_aws_imds.c paths
IMDS_HOST = "http://169.254.169.254"
PATH_INSTANCE_ID = "/latest/meta-data/instance-id/"
PATH_AZ = "/latest/meta-data/placement/availability-zone/"
PATH_INSTANCE_TYPE = "/latest/meta-data/instance-type/"
PATH_PRIVATE_IP = "/latest/meta-data/local-ipv4/"
PATH_AMI_ID = "/latest/meta-data/ami-id/"
PATH_ACCOUNT_ID = "/latest/dynamic/instance-identity/document/"
PATH_HOSTNAME = "/latest/meta-data/hostname/"
PATH_MAC = "/latest/meta-data/mac/"
PATH_VPC_PREFIX = "/latest/meta-data/network/interfaces/macs/"
PATH_TAGS = "/latest/meta-data/tags/instance"
PATH_TOKEN = "/latest/api/token"

# aws.h:26-41 record key names
KEY_PATHS = {
    "az": PATH_AZ,
    "ec2_instance_id": PATH_INSTANCE_ID,
    "ec2_instance_type": PATH_INSTANCE_TYPE,
    "private_ip": PATH_PRIVATE_IP,
    "ami_id": PATH_AMI_ID,
    "hostname": PATH_HOSTNAME,
}


class ImdsClient:
    """IMDSv1/v2 client with an injectable transport.

    ``fetch(method, path, headers) -> (status, body)`` replaces the
    HTTP layer — the pure-Python seam the reference's runtime tests
    get from flb_aws_client_mock_configure_generator."""

    def __init__(
        self,
        host: str = IMDS_HOST,
        imds_version: str = "v2",
        timeout: float = 1.0,
        fetch: Callable[[str, str, dict], tuple[int, str]] | None = None,
    ):
        self.host = host.rstrip("/")
        self.version = imds_version.lower()
        self.timeout = timeout
        self._fetch = fetch or self._http
        self._token: str | None = None

    def _http(self, method: str, path: str, headers: dict) -> tuple[int, str]:
        req = urllib.request.Request(
            self.host + path, headers=headers, method=method
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return resp.status, resp.read().decode("utf-8")
        except urllib.error.HTTPError as e:
            return e.code, ""
        except (urllib.error.URLError, OSError):
            return -1, ""

    def get(self, path: str) -> str | None:
        headers: dict = {}
        if self.version == "v2":
            if self._token is None:
                status, body = self._fetch(
                    "PUT", PATH_TOKEN,
                    {"X-aws-ec2-metadata-token-ttl-seconds": "21600"},
                )
                if status != 200:
                    return None
                self._token = body
            headers["X-aws-ec2-metadata-token"] = self._token
        status, body = self._fetch("GET", path, headers)
        if status != 200:
            return None
        return body


def fetch_ec2_metadata(
    client: ImdsClient,
    want: set[str],
    tags_enabled: bool = False,
    tags_include: list[str] | None = None,
    tags_exclude: list[str] | None = None,
) -> dict[str, str]:
    """One fetch per requested key group (aws.c get_ec2_metadata).

    Returns {record_key: value}; keys whose fetch failed are absent
    (the reference leaves records untouched until the group's fetch
    succeeds). Tag keys become ``<tag_name>`` entries filtered by the
    include/exclude lists (tags_include wins if both set,
    aws.c:295-440)."""
    out: dict[str, str] = {}
    for key, path in KEY_PATHS.items():
        if key in want:
            v = client.get(path)
            if v is not None:
                out[key] = v
    if "account_id" in want:
        doc = client.get(PATH_ACCOUNT_ID)
        if doc is not None:
            try:
                out["account_id"] = str(json.loads(doc)["accountId"])
            except (ValueError, KeyError):
                pass
    if "vpc_id" in want:
        mac = client.get(PATH_MAC)
        if mac is not None:
            v = client.get(f"{PATH_VPC_PREFIX}{mac}/vpc-id/")
            if v is not None:
                out["vpc_id"] = v
    if tags_enabled:
        keys = client.get(PATH_TAGS)
        if keys is not None:
            names = [k for k in keys.split("\n") if k]
            if tags_include:
                names = [k for k in names if k in set(tags_include)]
            elif tags_exclude:
                names = [k for k in names if k not in set(tags_exclude)]
            for name in names:
                v = client.get(f"{PATH_TAGS}/{name}")
                if v is not None:
                    out[name] = v
    return out


def aws_filter(df: DataFrame, metadata: dict[str, str]) -> DataFrame:
    """Attach the per-host metadata as literal columns — the columnar
    rendering of aws.c injecting the same kv pairs into every record.
    Constant-folded by Catalyst: no join, no shuffle, no Python."""
    for key, value in metadata.items():
        df = df.withColumn(key, F.lit(value))
    return df
