"""out_kafka: per-record (topic, key, value) encoding.

Reference: /root/reference/plugins/out_kafka/kafka.c produce_message
(:100-330): the body is the record map with ``timestamp_key`` (default
@timestamp) injected first — rendered per ``timestamp_format`` as
epoch double (default), iso8601 (+millis Z, :170-190), or integer
epoch; the Kafka message key comes from ``message_key_field`` (a
record string value) falling back to the static ``message_key``; the
topic comes from the ``topic_key`` record value looked up against the
configured ``topics`` list (first entry is the default,
kafka_topic.c:86), with ``dynamic_topic`` admitting unseen names
unless they contain ',' or exceed 249 chars (:234-246); ``format``
json renders the body as one JSON object (msgpack/gelf/raw are the
other reference formats — gelf composes with functions.gelf, raw
passes ``raw_log_key`` through).

The output shape (topic, key, value) is exactly what Spark's Kafka
sink (``df.write.format("kafka")``) expects, so delivery at scale is
the built-in connector — no custom producer loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOPIC_MAX = 249  # kafka.c:239


def kafka_timestamp(ts: Column, timestamp_format: str = "double") -> Column:
    """timestamp_key rendering (kafka.c:159-190)."""
    fmt = timestamp_format.lower()
    if fmt == "double":
        return ts.cast("double")
    if fmt == "iso8601":
        return F.concat(
            F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss"),
            F.format_string(
                ".%03dZ", ((F.unix_micros(ts) % 1_000_000) / 1000).cast("long")
            ),
        )
    if fmt == "epoch":
        return F.unix_seconds(ts)
    raise ValueError(f"unsupported timestamp_format {timestamp_format!r}")


def to_kafka_records(
    df: DataFrame,
    ts_col: str,
    topics: list[str],
    topic_key: str | None = None,
    dynamic_topic: bool = False,
    message_key: str | None = None,
    message_key_field: str | None = None,
    timestamp_key: str = "@timestamp",
    timestamp_format: str = "double",
    fmt: str = "json",
    raw_log_key: str | None = None,
    value_cols: list[str] | None = None,
    tag_col: str = "tag",
) -> DataFrame:
    """(topic, key, value) per record, Kafka-sink-ready."""
    if not topics:
        raise ValueError("at least one topic required")
    default_topic = topics[0]
    cols = value_cols or [
        c for c in df.columns if c not in (ts_col, tag_col)
    ]

    if topic_key and topic_key in df.columns:
        cand = F.col(topic_key).cast("string")
        known = cand.isin(*topics)
        if dynamic_topic:
            valid = (
                cand.isNotNull()
                & ~cand.contains(",")
                & (F.length(cand) <= TOPIC_MAX)
            )
            topic = F.when(known | valid, cand).otherwise(
                F.lit(default_topic)
            )
        else:
            topic = F.when(known, cand).otherwise(F.lit(default_topic))
    else:
        topic = F.lit(default_topic)

    key = F.lit(message_key) if message_key else F.lit(None).cast("string")
    if message_key_field and message_key_field in df.columns:
        key = F.coalesce(F.col(message_key_field).cast("string"), key)

    if fmt == "raw":
        if not raw_log_key or raw_log_key not in df.columns:
            raise ValueError("format raw needs raw_log_key")
        value = F.col(raw_log_key).cast("string")
    elif fmt == "json":
        fields = [kafka_timestamp(F.col(ts_col), timestamp_format).alias(
            timestamp_key
        )]
        fields += [F.col(c) for c in cols]
        value = F.to_json(F.struct(*fields), {"ignoreNullFields": "false"})
    else:
        raise ValueError(
            f"unsupported format {fmt!r} (json/raw here; gelf composes "
            "with functions.gelf, msgpack has no JVM-side encoder)"
        )

    return df.select(
        topic.alias("topic"), key.alias("key"), value.alias("value")
    )
