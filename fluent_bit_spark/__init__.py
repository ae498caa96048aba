"""fluent_bit_spark — a PySpark-native log/telemetry analytics engine.

A from-scratch reimplementation of the query and data-processing
capabilities of fluent-bit (reference: alecholmes/fluent-bit) as an
idiomatic Spark DataFrame / Structured Streaming engine:

    parse (grok/regex/json/ltsv/logfmt -> typed columns)
    -> enrich (broadcast lookup joins)
    -> route (tag glob match -> multi-sink fan-out)
    -> aggregate (windowed counts/sums, timeseries forecast)
    -> sinks (partitioned parquet tables + metrics/lineage)

Everything is expressed through the DataFrame API so Catalyst gets the
whole plan: filters push to the parquet scan, small lookup sides are
broadcast, aggregations get map-side partials, and AQE handles skew.
Python only runs inside Arrow-vectorized pandas UDFs (never per-row).
"""

__version__ = "0.1.0"
