"""Cluster entry point: replay captured wire traffic through the
decoders via spark-submit.

    (cd /root/repo && zip -qr /tmp/fluent_bit_spark.zip fluent_bit_spark)
    spark-submit --py-files /tmp/fluent_bit_spark.zip \\
        jobs/run_wire_replay.py \\
        --input  <parquet of captured chunks (binary `data` column)> \\
        --output <record sink root> \\
        --protocol forward|syslog|mqtt|collectd [--typesdb <file>]

One job = scan captured chunks -> Arrow-batched protocol decode ->
records parquet partitioned by tag (forward/mqtt carry their own
tags; syslog/collectd land under the configured --tag). The decode
stages are the same operators the gate queries verify
(forward_decode / syslog_parse / mqtt_decode / collectd_decode), so a
100 TB replay inherits their verified semantics; partition count
follows the input splits, no shuffle before the partitioned write.
"""

from __future__ import annotations

import argparse


def decode(spark, df, protocol: str, tag: str = "replay.0",
           typesdb_text: str | None = None):
    """Captured-chunk DataFrame -> (tag, record...) DataFrame."""
    from pyspark.sql import functions as F

    if protocol == "forward":
        from fluent_bit_spark.functions.forward_wire import (
            decode_forward_streams,
        )

        out = decode_forward_streams(df)
        return out.withColumn(
            "event_time",
            F.timestamp_seconds(F.col("sec") + F.col("nsec") / 1e9))
    if protocol == "syslog":
        from fluent_bit_spark.sources.syslog_in import parse_syslog

        return parse_syslog(
            df.select(F.col("data").cast("string").alias("line")),
            mode="tcp").withColumn("tag", F.lit(tag))
    if protocol == "mqtt":
        from fluent_bit_spark.sources.mqtt import decode_mqtt_streams

        out = decode_mqtt_streams(df)
        return out.withColumnRenamed("topic", "tag")
    if protocol == "collectd":
        from fluent_bit_spark.sources.collectd import (
            decode_collectd_packets,
            parse_typesdb,
        )

        tdb = parse_typesdb(typesdb_text or "")
        return decode_collectd_packets(
            df.withColumnRenamed("data", "packet"), tdb
        ).withColumn("tag", F.lit(tag))
    raise ValueError(f"unknown protocol {protocol!r}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--protocol", required=True,
                    choices=["forward", "syslog", "mqtt", "collectd"])
    ap.add_argument("--tag", default="replay.0")
    ap.add_argument("--typesdb")
    args = ap.parse_args()

    from fluent_bit_spark.session import get_spark

    spark = get_spark("wire-replay")
    df = spark.read.parquet(args.input)
    tdb_text = open(args.typesdb).read() if args.typesdb else None
    out = decode(spark, df, args.protocol, tag=args.tag,
                 typesdb_text=tdb_text)
    out.write.mode("overwrite").partitionBy("tag").parquet(args.output)
    print(f"records={spark.read.parquet(args.output).count()}")


if __name__ == "__main__":
    main()
