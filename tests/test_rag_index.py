"""The rag_chunk_lsh scale claim, demonstrated: the chunk index is
WRITTEN partitioned by LSH bucket, and a query's probe reads only its
bucket's partition (partition pruning visible in the physical plan)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from fluent_bit_spark.session import get_spark

    return get_spark("test-rag-index", master="local[4]")


def test_chunk_index_partition_pruned_probe(spark, tmp_path):
    from fluent_bit_spark.textprep.simsearch import (
        bucket_udf,
        hash_embed,
        hyperplanes,
    )
    from fluent_bit_spark.textprep.webfilters import chunk_documents

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{(i * 7 + j) % 23}" for j in range(40))) for i in range(60)],
        "doc_id long, text string",
    )
    chunks = chunk_documents(docs, chunk_tokens=16, overlap=4)
    emb = hash_embed(chunks, dim=16, text_col="chunk_text").withColumn(
        "vec_id", (F.col("doc_id") * 1000 + F.col("chunk_id")).cast("bigint")
    )
    b = bucket_udf(hyperplanes(16, 4))
    index = emb.select("vec_id", "embedding", b("embedding").alias("bucket"))

    # the index write: partitioned by bucket, ONCE
    out = str(tmp_path / "chunk_index")
    index.write.mode("overwrite").partitionBy("bucket").parquet(out)

    # a probe reads exactly one bucket's partition
    some_bucket = index.select("bucket").first()["bucket"]
    probe = spark.read.parquet(out).filter(F.col("bucket") == some_bucket)
    plan = probe._sc._jvm.PythonSQLUtils.explainString(
        probe._jdf.queryExecution(), "formatted"
    )
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m is not None and "bucket" in m.group(1), plan[:2000]
    # and the pruned read returns only that bucket's rows
    rows = probe.collect()
    assert rows and all(r["bucket"] == some_bucket for r in rows)
    expected = index.filter(F.col("bucket") == some_bucket).count()
    assert len(rows) == expected


def test_probe_join_uses_dynamic_partition_pruning(spark, tmp_path):
    """The probe path joins the STORED bucket partition column
    (lsh_topk data_bucket_col): the broadcast hash join plants a
    dynamic-pruning subquery in the scan's PartitionFilters, so only
    probed buckets' files are read (ADVICE r3: the pre-fix path
    recomputed buckets with the UDF and rescanned the whole index)."""
    from fluent_bit_spark.textprep.simsearch import (
        bucket_udf,
        hash_embed,
        hyperplanes,
        lsh_topk,
    )
    from fluent_bit_spark.textprep.webfilters import chunk_documents

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{(i * 7 + j) % 23}" for j in range(40))) for i in range(60)],
        "doc_id long, text string",
    )
    chunks = chunk_documents(docs, chunk_tokens=16, overlap=4)
    emb = hash_embed(chunks, dim=16, text_col="chunk_text").withColumn(
        "vec_id", F.shiftleft(F.col("doc_id").cast("bigint"), 32) + F.col("chunk_id")
    )
    b = bucket_udf(hyperplanes(16, 4))
    out = str(tmp_path / "chunk_index")
    (
        emb.select("vec_id", "embedding", b("embedding").alias("bucket"))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(out)
    )
    index = spark.read.parquet(out)
    queries = emb.filter(F.col("doc_id") < 2)
    topk = lsh_topk(index, queries, k=3, n_planes=4, dim=16, data_bucket_col="bucket")
    plan = topk._sc._jvm.PythonSQLUtils.explainString(
        topk._jdf.queryExecution(), "formatted"
    )
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m is not None and "dynamicpruning" in m.group(1), plan[:3000]
    # values identical to the recomputed-bucket path
    base = lsh_topk(index, queries, k=3, n_planes=4, dim=16)
    assert sorted(map(tuple, topk.collect())) == sorted(map(tuple, base.collect()))
