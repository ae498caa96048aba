"""Cluster entry point: the streaming corpus pipeline via spark-submit.

    (cd /root/repo && zip -qr /tmp/fluent_bit_spark.zip fluent_bit_spark)
    spark-submit --py-files /tmp/fluent_bit_spark.zip \
        jobs/run_corpus.py \
        --input  <pages table dir>    (url, warc_ts, html, text, lang) \
        --output <card parquet dir> --checkpoint <checkpoint dir> \
        [--gap-watermark "2 hours"] [--window "1 hour"] \
        [--follow]   (keep running; default drains with availableNow)

Runs extract -> watermarked exact dedup -> quality gates -> lang-ID
-> windowed per-domain/language corpus card, appending finalized
windows to --output. Killing and re-submitting resumes from the
checkpoint: processed files are not re-read and dedup/window state
carries over (tests/test_streaming_corpus.py proves both). On a real
cluster only the spark-submit line changes (--master/--num-executors);
state is partitioned by digest / card key across executors.
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
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--gap-watermark", default="2 hours")
    ap.add_argument("--window", default="1 hour")
    ap.add_argument("--follow", action="store_true")
    ap.add_argument("--master", help="override master (default: from env)")
    args = ap.parse_args()

    from fluent_bit_spark.session import get_spark
    from fluent_bit_spark.streaming.corpus import corpus_card_stream
    from fluent_bit_spark.streaming.job import (
        PAGES_SCHEMA,
        run_stream_to_completion,
    )

    spark = get_spark("fbs-corpus", master=args.master)
    reader = spark.readStream.schema(PAGES_SCHEMA).option(
        "recursiveFileLookup", "true"
    )
    card = corpus_card_stream(
        reader.parquet(args.input), args.gap_watermark, args.window
    )
    writer = (
        card.writeStream.outputMode("append")
        .format("parquet")
        .option("path", args.output)
        .option("checkpointLocation", args.checkpoint)
    )
    if args.follow:
        q = writer.start()
        q.awaitTermination()
        return
    q = writer.trigger(availableNow=True).start()
    run_stream_to_completion(q, timeout_sec=3600)
    # windows newer than (max event time - watermark delay) stay open
    # and are appended by a later run once the watermark passes them
    open_rows = 0
    wm = None
    for p in q.recentProgress:
        for so in p.get("stateOperators", []):
            open_rows = max(open_rows, so.get("numRowsTotal", 0))
        wm = p.get("eventTime", {}).get("watermark", wm)
    n = spark.read.parquet(args.output).count()
    print(
        json.dumps(
            {
                "finalized_card_rows": int(n),
                "state_rows_open": int(open_rows),
                "watermark": wm,
                "output": args.output,
            }
        )
    )


if __name__ == "__main__":
    main()
