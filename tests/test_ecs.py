"""filter_ecs enrichment (plugins/filter_ecs/ecs.c) using the
reference's own plugin-under-test mock payloads (ecs.c:272,276)."""

from __future__ import annotations

from fluent_bit_spark.ecs import (
    EcsAgentClient,
    container_short_id,
    ecs_metadata_table,
    filter_ecs,
)

CLUSTER_JSON = (
    '{"Cluster": "cluster_name","ContainerInstanceArn": '
    '"arn:aws:ecs:region:aws_account_id:container-instance/cluster_name/'
    'container_instance_id","Version": "Amazon ECS Agent - v1.30.0 '
    '(02ff320c)"}'
)
TASK_JSON = (
    '{"Arn": "arn:aws:ecs:us-west-2:012345678910:task/default/'
    'e01d58a8-151b-40e8-bc01-22647b9ecfec","Containers": [{"DockerId": '
    '"79c796ed2a7f864f485c76f83f3165488097279d296a7c05bd5201a1c69b2920",'
    '"DockerName": "ecs-nginx-efs-2-nginx-9ac0808dd0afa495f001","Name": '
    '"nginx"}],"DesiredStatus": "RUNNING","Family": "nginx-efs",'
    '"KnownStatus": "RUNNING","Version": "2"}'
)


def _client():
    def fetch(path):
        if path == "/v1/metadata":
            return CLUSTER_JSON
        assert path.startswith("/v1/tasks?dockerid=")
        return TASK_JSON

    return EcsAgentClient(fetch=fetch)


def test_agent_client_parsing():
    c = _client()
    cl = c.cluster_meta()
    assert cl["ClusterName"] == "cluster_name"
    assert cl["ContainerInstanceID"] == "container_instance_id"
    assert cl["ECSAgentVersion"].startswith("Amazon ECS Agent")
    t = c.task_meta("79c796ed2a7f")
    assert t["TaskID"] == "e01d58a8-151b-40e8-bc01-22647b9ecfec"
    assert t["TaskDefinitionFamily"] == "nginx-efs"
    assert t["TaskDefinitionVersion"] == "2"
    assert t["ECSContainerName"] == "nginx"


def test_filter_ecs_enrichment(spark):
    df = spark.createDataFrame(
        [("79c796ed2a7f-firelens-xyz", "boot ok"),
         ("short", "no container id")],
        "tag string, message string",
    )
    meta = ecs_metadata_table(spark, _client(), ["79c796ed2a7f"])
    out = filter_ecs(
        df,
        add={
            "cluster": "$ClusterName",
            "task": "$TaskDefinitionFamily-$TaskDefinitionVersion",
            "where": "ecs/$ECSContainerName/$TaskID",
        },
        metadata=meta,
    )
    rows = {r["message"]: r for r in out.collect()}
    ok = rows["boot ok"]
    assert ok["cluster"] == "cluster_name"
    assert ok["task"] == "nginx-efs-2"
    assert ok["where"] == "ecs/nginx/e01d58a8-151b-40e8-bc01-22647b9ecfec"
    # tag too short for a container id -> unresolved accessors render
    # empty (reference passes the record through unenriched)
    assert rows["no container id"]["cluster"] == ""
    # metadata columns themselves are not leaked onto the record
    assert "ClusterName" not in out.columns


def test_short_id_extraction(spark):
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [("pre-79c796ed2a7fxxx",), ("pre-79c796e",)], ["tag"]
    )
    got = df.select(
        container_short_id(F.col("tag"), "pre-").alias("sid")
    ).collect()
    assert got[0]["sid"] == "79c796ed2a7f"
    assert got[1]["sid"] is None


def test_filter_ecs_cluster_metadata_only(spark):
    df = spark.createDataFrame([("any.tag", "m1")], "tag string, message string")
    out = filter_ecs(
        df,
        add={"cluster": "$ClusterName", "agent": "$ECSAgentVersion"},
        client=_client(),
        cluster_metadata_only=True,
    )
    row = out.first()
    assert row["cluster"] == "cluster_name"
    assert row["agent"].startswith("Amazon ECS Agent")


def test_classic_filter_ecs(spark):
    from unittest.mock import patch

    from fluent_bit_spark.classic import build_classic_pipeline

    conf = """
[INPUT]
    Name    dummy
    Tag     79c796ed2a7f-app
    Dummy   {"message":"hi"}
    Samples 1

[FILTER]
    Name  ecs
    Match *
    Add   ecs_cluster $ClusterName
    Add   ecs_task_def $TaskDefinitionFamily:$TaskDefinitionVersion
"""
    with patch(
        "fluent_bit_spark.ecs.EcsAgentClient._get",
        lambda self, path: __import__("json").loads(
            CLUSTER_JSON if path == "/v1/metadata" else TASK_JSON
        ),
    ):
        pipe = build_classic_pipeline(spark, conf)
        row = pipe.records.first()
    assert row["ecs_cluster"] == "cluster_name"
    assert row["ecs_task_def"] == "nginx-efs:2"
