"""Cluster entry point: the batch curation pipeline via spark-submit.

    (cd /root/repo && zip -qr /tmp/fluent_bit_spark.zip fluent_bit_spark)
    spark-submit --py-files /tmp/fluent_bit_spark.zip \
        jobs/run_curation.py \
        --input  <pages table dir>   (doc_id, url, text, lang) \
        --output <out dir>           (writes kept/ and card/ parquet) \
        [--blocklist <parquet with reg_domain column>] \
        [--max-dup-frac 0.5] [--min-avg-logprob -3.6] [--max-rare-frac 0.5]

Runs URL gate -> corpus-wide duplicated-span gate -> unigram-LM gate
-> exact dedup -> per-(registrable domain, lang) corpus card, writes
the surviving documents and the card as parquet, and prints one JSON
metrics line (docs in/out per stage). With no --blocklist an empty
one is used (URL path-keyword gating still applies).

On a real cluster only the spark-submit line changes
(--master/--num-executors); every stage is a broadcast join or a
map-side-combinable aggregation — see textprep/curation.py.
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
    ap.add_argument("--blocklist")
    ap.add_argument("--max-dup-frac", type=float, default=0.5)
    ap.add_argument("--min-avg-logprob", type=float, default=-3.6)
    ap.add_argument("--max-rare-frac", type=float, default=0.5)
    ap.add_argument("--master", help="override master (default: from env)")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from fluent_bit_spark.session import get_spark
    from fluent_bit_spark.textprep.curation import curate

    spark = get_spark("fbs-curation", master=args.master)
    pages = spark.read.parquet(args.input)
    if args.blocklist:
        bl = spark.read.parquet(args.blocklist).select("reg_domain")
    else:
        bl = spark.createDataFrame([], "reg_domain string")

    result = curate(
        pages,
        bl,
        max_dup_frac=args.max_dup_frac,
        min_avg_logprob=args.min_avg_logprob,
        max_rare_frac=args.max_rare_frac,
    )
    kept_dir = os.path.join(args.output, "kept")
    card_dir = os.path.join(args.output, "card")
    result.kept.write.mode("overwrite").parquet(kept_dir)
    result.card.write.mode("overwrite").parquet(card_dir)

    # stage metrics from the written outputs (no recompute of the plan)
    kept = spark.read.parquet(kept_dir)
    card = spark.read.parquet(card_dir)
    print(
        json.dumps(
            {
                "docs_in": pages.count(),
                "docs_kept": kept.count(),
                "card_rows": card.count(),
                "total_tokens": (
                    card.agg(F.sum("total_tokens").alias("t")).first()["t"]
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
