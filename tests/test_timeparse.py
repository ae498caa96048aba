"""Time parsing vs flb_parser_time_lookup semantics.

Reference matrix: /root/reference/tests/internal/parser.c time tests
(%z forms, %L fractional, missing-year injection, trailing text).
"""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from fluent_bit_spark.functions.timeparse import (
    strptime_consume_regex,
    strptime_to_java,
    time_parse_col,
)


def _parse(spark, value: str, fmt: str, ref_year=None, offset=0):
    df = spark.createDataFrame([(value,)], ["t"])
    return df.select(
        time_parse_col("t", fmt, ref_year=ref_year, time_offset_sec=offset).alias("ts")
    ).collect()[0]["ts"]


CASES = [
    # apache %z numeric offset
    ("10/Oct/2000:13:55:36 -0700", "%d/%b/%Y:%H:%M:%S %z", datetime(2000, 10, 10, 20, 55, 36)),
    ("10/Oct/2000:13:55:36 +0000", "%d/%b/%Y:%H:%M:%S %z", datetime(2000, 10, 10, 13, 55, 36)),
    # colon form of the offset
    ("10/Oct/2000:13:55:36 +04:30", "%d/%b/%Y:%H:%M:%S %z", datetime(2000, 10, 10, 9, 25, 36)),
    # docker: %L fraction, trailing Z ignored by strptime prefix rule
    ("2019-10-10T13:55:36.123456789Z", "%Y-%m-%dT%H:%M:%S.%L",
     datetime(2019, 10, 10, 13, 55, 36, 123456)),
    ("2019-10-10T13:55:36.5Z", "%Y-%m-%dT%H:%M:%S.%L",
     datetime(2019, 10, 10, 13, 55, 36, 500000)),
    # %L then %z (envoy/cri style)
    ("2019-10-10T13:55:36.123-0700", "%Y-%m-%dT%H:%M:%S.%L%z",
     datetime(2019, 10, 10, 20, 55, 36, 123000)),
    ("2019-10-10T13:55:36.123Z", "%Y-%m-%dT%H:%M:%S.%L%z",
     datetime(2019, 10, 10, 13, 55, 36, 123000)),
    # epoch
    ("1570715736", "%s", datetime(2019, 10, 10, 13, 55, 36)),
]


@pytest.mark.parametrize("value,fmt,expected", CASES)
def test_formats(spark, value, fmt, expected):
    assert _parse(spark, value, fmt) == expected


def test_missing_year_injection(spark):
    # syslog-rfc3164 (flb_parser.c:1185-1218): current year injected
    got = _parse(spark, "Oct 11 22:14:15", "%b %d %H:%M:%S", ref_year=2026)
    assert got == datetime(2026, 10, 11, 22, 14, 15)


def test_time_offset_applied_without_tz(spark):
    # parser Time_Offset subtracts a fixed utc offset
    got = _parse(spark, "2019-10-10 13:55:36", "%Y-%m-%d %H:%M:%S", offset=7200)
    assert got == datetime(2019, 10, 10, 11, 55, 36)


def test_unparseable_returns_null(spark):
    assert _parse(spark, "not a time", "%Y-%m-%d %H:%M:%S") is None
    # strict Spark would throw; reference non-strict path yields no time
    assert _parse(spark, "2019-13-45 99:99:99", "%Y-%m-%d %H:%M:%S") is None


def test_consume_regex_prefix_semantics():
    import re

    rx = strptime_consume_regex("%Y-%m-%dT%H:%M:%S.%L")
    m = re.match(rx, "2019-10-10T13:55:36.123Zjunk")
    assert m and m.group(0) == "2019-10-10T13:55:36.123"


def test_strptime_to_java_quotes_literals():
    prefix, suffix = strptime_to_java("%Y-%m-%dT%H:%M:%S.%L")
    assert prefix == "yyyy-MM-dd'T'HH:mm:ss."
    assert suffix == ""
