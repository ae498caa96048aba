"""in_statsd: StatsD datagram line parsing, columnar.

Reference: /root/reference/plugins/in_statsd/statsd.c —
statsd_process_line (:155): ``bucket:value|type|@sample_rate``; type
char dispatch get_statsd_type (:58: g=gauge, s=set, c=counter,
ms=timer, anything else counter); sample_rate via atof after "|@"
with 0/absent -> 1.0; statsd_process_message (:81) shapes the record:
counter/timer carry a double value + sample_rate, gauge a double value
+ ``incremental`` (value starts with '+'/'-', :76), set keeps the raw
string value.

Reference bug kept (opt-out): the TIMER case in
statsd_process_message has no ``break`` and falls through into SET,
appending type/bucket/value AGAIN — with last-key-wins map semantics a
timer record arrives as type='set' with the raw string value (and the
timer's sample_rate still present). ``timer_fallthrough=True``
replicates that; pass False for the obviously-intended record.

Unlike the reference's one-datagram-at-a-time UDP loop this parses a
whole DataFrame of lines in one Catalyst projection — the shape you
want when replaying captured StatsD traffic at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUM_PREFIX = r"^[+-]?([0-9]+\.?[0-9]*|\.[0-9]+)([eE][+-]?[0-9]+)?"


def _strtod(col):
    """C strtod/atof over a leading numeric prefix; no parse -> 0.0."""
    # try_cast: regexp_extract yields '' on no-match, which ANSI cast
    # rejects (Spark 4 default)
    return F.coalesce(
        F.regexp_extract(col, _NUM_PREFIX, 0).try_cast("double"), F.lit(0.0)
    )


def parse_statsd_lines(
    df: DataFrame, line_col: str = "line", timer_fallthrough: bool = True
) -> DataFrame:
    """One parsed metric row per input line (lines without ':' or '|'
    are dropped, as the reference errors them out).

    Output schema: mtype, bucket, value (double; NULL for sets),
    value_str (raw string; sets and fallthrough timers), sample_rate
    (counter/timer; NULL otherwise), incremental (gauge; NULL
    otherwise), plus every input column.
    """
    line = F.col(line_col)
    colon = F.instr(line, ":")
    bucket = F.substring(line, 1, colon - 1)
    rest = F.substr(line, colon + 1, F.length(line))
    bar = F.instr(rest, "|")
    raw_val = F.substring(rest, 1, bar - 1)
    type_str = F.substr(rest, bar + 1, F.length(rest))
    tchar = F.substring(type_str, 1, 1)
    mtype = (
        F.when(tchar == "g", F.lit("gauge"))
        .when(tchar == "s", F.lit("set"))
        .when(tchar == "c", F.lit("counter"))
        .when(F.substring(type_str, 1, 2) == "ms", F.lit("timer"))
        .otherwise(F.lit("counter"))
    )
    # strstr(bar+1, "|@"): sample rate from the remainder; atof==0 -> 1.0
    after_at = F.regexp_extract(type_str, r"\|@(.*)$", 1)
    rate = _strtod(after_at)
    sample_rate = F.when(rate == 0.0, F.lit(1.0)).otherwise(rate)

    out = (
        df.filter((colon > 0) & (bar > 0))
        .withColumn("mtype", mtype)
        .withColumn("bucket", bucket)
        .withColumn("_raw_val", raw_val)
        .withColumn("_rate", sample_rate)
    )
    is_set_shaped = (
        (F.col("mtype") == "set") | (F.col("mtype") == "timer")
        if timer_fallthrough
        else (F.col("mtype") == "set")
    )
    return (
        out.withColumn(
            "value",
            F.when(~is_set_shaped, _strtod(F.col("_raw_val"))),
        )
        .withColumn("value_str", F.when(is_set_shaped, F.col("_raw_val")))
        .withColumn(
            "sample_rate",
            F.when(
                F.col("mtype").isin("counter", "timer"), F.col("_rate")
            ),
        )
        .withColumn(
            "incremental",
            F.when(
                F.col("mtype") == "gauge",
                F.substring("_raw_val", 1, 1).isin("+", "-").cast("long"),
            ),
        )
        .withColumn(
            "mtype",
            F.when(
                F.col("mtype") == "timer",
                F.lit("set") if timer_fallthrough else F.lit("timer"),
            ).otherwise(F.col("mtype")),
        )
        .drop("_raw_val", "_rate")
    )
