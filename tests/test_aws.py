"""filter_aws: IMDS metadata enrichment.

Goldens replay the exact URI->payload mock chains from
tests/runtime/filter_aws.c (which drive the reference through
flb_aws_client_mock) against our ImdsClient fetch seam, asserting the
same record keys the C tests grep for.
"""

from __future__ import annotations

import pytest

from fluent_bit_spark.aws import (
    ImdsClient,
    aws_filter,
    fetch_ec2_metadata,
)

IDENTITY_DOC = (
    '{"devpayProductCodes":null,"availabilityZone":"us-east-1a",'
    '"privateIp":"10.158.112.84","version":"2017-09-30",'
    '"instanceId":"i-1234567890abcdef0","instanceType":"t2.micro",'
    '"accountId":"123456789012","imageId":"ami-5fb8c835",'
    '"region":"us-east-1"}'
)


def mock_fetch(chain: dict[str, str], v2: bool = True, log: list | None = None):
    """URI->payload mock, the aws_client_mock.h analog. Always serves
    the IMDSv2 token PUT; unknown URIs 404."""

    def fetch(method: str, path: str, headers: dict) -> tuple[int, str]:
        if log is not None:
            log.append((method, path))
        if path == "/latest/api/token":
            return (200, "MOCK_TOKEN") if v2 else (404, "")
        if v2 and headers.get("X-aws-ec2-metadata-token") != "MOCK_TOKEN":
            return 401, ""
        if path in chain:
            return 200, chain[path]
        return 404, ""

    return fetch


def client(chain: dict[str, str], **kw) -> ImdsClient:
    return ImdsClient(fetch=mock_fetch(chain, **kw))


class TestRuntimeGoldens:
    """One case per tests/runtime/filter_aws.c TEST_LIST entry."""

    def test_aws_instance_id(self):
        c = client({"/latest/meta-data/instance-id/": "i-0e66fc7f9809d7168"})
        meta = fetch_ec2_metadata(c, {"ec2_instance_id"})
        assert meta == {"ec2_instance_id": "i-0e66fc7f9809d7168"}

    def test_aws_instance_type(self):
        c = client({"/latest/meta-data/instance-type/": "t2.micro"})
        assert fetch_ec2_metadata(c, {"ec2_instance_type"}) == {
            "ec2_instance_type": "t2.micro"
        }

    def test_aws_private_ip(self):
        c = client({"/latest/meta-data/local-ipv4/": "10.158.112.84"})
        assert fetch_ec2_metadata(c, {"private_ip"}) == {
            "private_ip": "10.158.112.84"
        }

    def test_aws_vpc_id(self):
        # two-step fetch: mac -> macs/{mac}/vpc-id (flb_aws_imds.c:234)
        c = client({
            "/latest/meta-data/mac/": "00:00:5e:00:53:af",
            "/latest/meta-data/network/interfaces/macs/"
            "00:00:5e:00:53:af/vpc-id/": "vpc-2928ea42",
        })
        assert fetch_ec2_metadata(c, {"vpc_id"}) == {"vpc_id": "vpc-2928ea42"}

    def test_aws_ami_id(self):
        c = client({"/latest/meta-data/ami-id/": "ami-5fb8c835"})
        assert fetch_ec2_metadata(c, {"ami_id"}) == {"ami_id": "ami-5fb8c835"}

    def test_aws_account_id(self):
        # parsed out of the instance identity document
        c = client({"/latest/dynamic/instance-identity/document/": IDENTITY_DOC})
        assert fetch_ec2_metadata(c, {"account_id"}) == {
            "account_id": "123456789012"
        }

    def test_aws_hostname(self):
        c = client({
            "/latest/meta-data/hostname/":
                "ip-10-158-112-84.us-west-2.compute.internal"
        })
        assert fetch_ec2_metadata(c, {"hostname"}) == {
            "hostname": "ip-10-158-112-84.us-west-2.compute.internal"
        }

    def test_aws_az(self):
        c = client({
            "/latest/meta-data/placement/availability-zone/": "us-east-1a"
        })
        assert fetch_ec2_metadata(c, {"az"}) == {"az": "us-east-1a"}

    TAGS = {
        "/latest/meta-data/tags/instance":
            "Name\nCUSTOMER_ID\nthis-would-be-my-very-long-tag-name-does-it-work",
        "/latest/meta-data/tags/instance/Name": "my_ec2_instance",
        "/latest/meta-data/tags/instance/CUSTOMER_ID":
            "70ec5c04-3a6e-11ed-a261-0242ac120002",
        "/latest/meta-data/tags/instance/"
        "this-would-be-my-very-long-tag-name-does-it-work": "yes-it-does",
    }

    def test_aws_instance_tags(self):
        # flb_test_aws_instance_tags_* : every tag becomes a record key
        meta = fetch_ec2_metadata(client(self.TAGS), set(), tags_enabled=True)
        assert meta == {
            "Name": "my_ec2_instance",
            "CUSTOMER_ID": "70ec5c04-3a6e-11ed-a261-0242ac120002",
            "this-would-be-my-very-long-tag-name-does-it-work": "yes-it-does",
        }

    def test_aws_tags_include_exclude(self):
        inc = fetch_ec2_metadata(
            client(self.TAGS), set(), tags_enabled=True, tags_include=["Name"]
        )
        assert inc == {"Name": "my_ec2_instance"}
        exc = fetch_ec2_metadata(
            client(self.TAGS), set(), tags_enabled=True,
            tags_exclude=["Name", "CUSTOMER_ID"],
        )
        assert list(exc) == ["this-would-be-my-very-long-tag-name-does-it-work"]

    def test_fetch_failure_leaves_record_untouched(self):
        # aws.c: records pass through without keys until fetch succeeds
        assert fetch_ec2_metadata(client({}), {"az", "ec2_instance_id"}) == {}

    def test_imds_v2_token_flow(self):
        log: list = []
        c = ImdsClient(fetch=mock_fetch(
            {"/latest/meta-data/instance-id/": "i-1"}, log=log))
        assert c.get("/latest/meta-data/instance-id/") == "i-1"
        assert c.get("/latest/meta-data/instance-id/") == "i-1"
        # token PUT happens exactly once, then cached
        assert log.count(("PUT", "/latest/api/token")) == 1

    def test_imds_v1_no_token(self):
        log: list = []
        c = ImdsClient(imds_version="v1", fetch=mock_fetch(
            {"/latest/meta-data/instance-id/": "i-1"}, v2=False, log=log))
        assert c.get("/latest/meta-data/instance-id/") == "i-1"
        assert ("PUT", "/latest/api/token") not in log


def test_aws_filter_literal_columns(spark):
    df = spark.createDataFrame(
        [("test", "hello, from my ec2 instance")], "tag string, log string"
    )
    out = aws_filter(df, {"ec2_instance_id": "i-0e66fc7f9809d7168",
                          "az": "us-east-1a"})
    r = out.collect()[0]
    assert r.log == "hello, from my ec2 instance"
    assert r.ec2_instance_id == "i-0e66fc7f9809d7168" and r.az == "us-east-1a"
    # constant enrichment must not shuffle or leave Catalyst
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


# ---------------------------------------- cmt_encode_cloudwatch_emf


def test_cmt_emf_events_golden(spark):
    """cmt_encode_cloudwatch_emf.c golden shapes: _aws header with ms
    timestamp + Dimensions over ALL label keys + static keys, Unit
    only on counters, labels then prom_metric_type then the fqname
    value; histogram Min/Max over SORTED bucket counts with Max read
    at index count-1 (the second-largest — reference off-by-one
    kept); summary Min/Max = first/last quantile values."""
    import json

    from fluent_bit_spark.functions.cloudwatch_out import cmt_emf_events

    rows = [
        ("counter", "req_total", [("host", "a")],
         1_700_000_000_123_456_789, 2.5,
         None, None, None, None, None, None, None, None),
        ("histogram", "lat", [("h", "1")], 125_000_000, None,
         [1, 2, 7], [0.5, 2.0], 99.5, 10, None, None, None, None),
        ("summary", "rt", [], 126_000_000, None,
         None, None, None, None, [0.5, 0.99], [0.25, 1.5], 2.0, 4),
    ]
    schema = (
        "mtype string, name string, "
        "tags array<struct<key:string,value:string>>, ts long, "
        "value double, bucket_counts array<long>, explicit_bounds "
        "array<double>, hist_sum double, hist_count long, quantiles "
        "array<double>, quantile_values array<double>, sum_sum double, "
        "sum_count long"
    )
    df = spark.createDataFrame(rows, schema)
    out = [r.event for r in cmt_emf_events(
        df, namespace="fb", static_labels=[("app", "api")])
        .select("event").collect()]
    objs = [json.loads(e) for e in out]
    counter = next(o for o in objs if "req_total" in o)
    assert counter["_aws"]["Timestamp"] == 1_700_000_000_123
    cwm = counter["_aws"]["CloudWatchMetrics"][0]
    assert cwm["Namespace"] == "fb"
    assert cwm["Dimensions"] == [["host", "app"]]
    assert cwm["Metrics"] == [{"Name": "req_total", "Unit": "Counter",
                               "StorageResolution": 60}]
    assert counter["req_total"] == 2.5
    assert counter["prom_metric_type"] == "counter"
    assert counter["host"] == "a" and counter["app"] == "api"
    hist = next(o for o in objs if "lat" in o)
    assert "Unit" not in hist["_aws"]["CloudWatchMetrics"][0]["Metrics"][0]
    assert hist["lat"] == {"Min": 1, "Max": 2, "Sum": 99.5, "Count": 10}
    summ = next(o for o in objs if "rt" in o)
    assert summ["rt"] == {"Min": 0.25, "Max": 1.5, "Sum": 2, "Count": 4}
    assert summ["_aws"]["CloudWatchMetrics"][0]["Dimensions"] == [["app"]]
    # key ORDER is part of the wire format: _aws, labels, type, value
    keys = list(counter.keys())
    assert keys == ["_aws", "host", "app", "prom_metric_type",
                    "req_total"]
