"""Cluster entry point: build (and optionally probe) the chunk-level
retrieval index via spark-submit.

    (cd /root/repo && zip -qr /tmp/fluent_bit_spark.zip fluent_bit_spark)
    spark-submit --py-files /tmp/fluent_bit_spark.zip \
        jobs/run_rag_index.py \
        --input  <docs table dir>    (doc_id, text) \
        --output <index dir>         (parquet partitioned by LSH bucket) \
        [--chunk-tokens 32] [--overlap 8] [--dim 16] [--n-planes 6] \
        [--probe <queries table dir>] [--k 3]

Build: chunk every document (fixed tokens + overlap, map-only),
hash-embed each chunk (numpy over Arrow), compute its hyperplane-LSH
bucket, and WRITE the index partitioned by bucket — the one-time cost
that makes every later probe a single-partition read (partition
pruning; see tests/test_rag_index.py for the plan evidence).

Probe (--probe): chunk+embed the query docs the same way, then for
each query chunk read ONLY its bucket's partition and rank exact
cosine top-k within it. Writes topk/ parquet under --output.

On a real cluster only the spark-submit line changes
(--master/--num-executors): the build is map-only + one partitioned
write; the probe is partition-pruned scans with a broadcast query
side.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--chunk-tokens", type=int, default=32)
    ap.add_argument("--overlap", type=int, default=8)
    ap.add_argument("--dim", type=int, default=16)
    ap.add_argument("--n-planes", type=int, default=6)
    ap.add_argument("--probe", help="queries table dir (doc_id, text)")
    ap.add_argument("--k", type=int, default=3)
    ap.add_argument("--master", help="override master (default: from env)")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from fluent_bit_spark.session import get_spark
    from fluent_bit_spark.textprep.simsearch import (
        bucket_udf,
        hash_embed,
        hyperplanes,
        lsh_topk,
    )
    from fluent_bit_spark.textprep.webfilters import chunk_documents

    spark = get_spark("fbs-rag-index", master=args.master)

    def chunk_embed(df):
        chunks = chunk_documents(
            df, chunk_tokens=args.chunk_tokens, overlap=args.overlap
        )
        # collision-free composite key: chunk_id occupies the low 32
        # bits (a single document can never have 2^32 chunks), so
        # vec_id round-trips to (doc_id, chunk_id) exactly
        return hash_embed(chunks, dim=args.dim, text_col="chunk_text").withColumn(
            "vec_id",
            F.shiftleft(F.col("doc_id").cast("bigint"), 32) + F.col("chunk_id"),
        )

    docs = spark.read.parquet(args.input)
    emb = chunk_embed(docs)
    b = bucket_udf(hyperplanes(args.dim, args.n_planes))
    index_dir = os.path.join(args.output, "index")
    (
        emb.select("vec_id", "doc_id", "chunk_id", "embedding")
        .withColumn("bucket", b("embedding"))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(index_dir)
    )
    index = spark.read.parquet(index_dir)
    metrics = {
        "chunks_indexed": index.count(),
        "buckets": index.select("bucket").distinct().count(),
    }

    if args.probe:
        queries = chunk_embed(spark.read.parquet(args.probe))
        # the written index IS the data side: join on the STORED
        # bucket partition column (data_bucket_col) so dynamic
        # partition pruning skips every unprobed bucket's files —
        # recomputing the bucket here would rescan the whole index
        topk = lsh_topk(
            index,
            queries,
            k=args.k,
            n_planes=args.n_planes,
            dim=args.dim,
            data_bucket_col="bucket",
        )
        topk_dir = os.path.join(args.output, "topk")
        topk.write.mode("overwrite").parquet(topk_dir)
        metrics["topk_rows"] = spark.read.parquet(topk_dir).count()

    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
