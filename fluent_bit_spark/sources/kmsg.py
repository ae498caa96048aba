"""in_kmsg: kernel log (/dev/kmsg) line parsing, columnar.

Reference: /root/reference/plugins/in_kmsg/in_kmsg.c process_line
(:107-210): lines are ``<prival>,<sequence>,<usec-since-boot>,<flags>;
<message>``; priority = prival & 0x07 (FLB_KLOG_PRI, in_kmsg.h:42),
lines above ``prio_level`` are dropped; the event timestamp is
boot_time + usec (sec = usec/1e6 with the microsecond remainder); the
record carries priority/sequence/sec/usec/msg.

The reference derives boot_time from /proc/uptime at init
(in_kmsg_boot_time, :43-103); pass the same epoch-seconds value here.
One Catalyst projection parses a whole DataFrame of captured lines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_kmsg_lines(
    df: DataFrame,
    line_col: str = "line",
    boot_time_sec: int = 0,
    prio_level: int = 8,
) -> DataFrame:
    """(priority, sequence, sec, usec, msg, event_time) per parseable
    line; malformed lines (no comma fields / no ';') and priorities
    above prio_level are dropped, as process_line does."""
    line = F.col(line_col)
    parts = F.split(line, ";", 2)
    header = F.split(F.element_at(parts, 1), ",")
    prival = F.element_at(header, 1).try_cast("long")
    sequence = F.element_at(header, 2).try_cast("long")
    usec_total = F.element_at(header, 3).try_cast("long")
    priority = prival.bitwiseAND(F.lit(7))
    sec = (usec_total - usec_total % 1_000_000) / F.lit(1_000_000)
    sec = sec.cast("long")
    usec = usec_total % 1_000_000

    out = (
        df.withColumn("priority", priority)
        .withColumn("sequence", sequence)
        .withColumn("sec", sec)
        .withColumn("usec", usec)
        .withColumn("msg", F.element_at(parts, 2))
        .filter(
            F.col("priority").isNotNull()
            & F.col("sequence").isNotNull()
            & F.col("sec").isNotNull()
            & F.col("msg").isNotNull()
            & (F.col("priority") <= prio_level)
        )
    )
    # flb_time_set(boot + sec, usec * 1000)
    ev = F.timestamp_micros(
        (F.lit(int(boot_time_sec)) + F.col("sec")) * 1_000_000
        + F.col("usec")
    )
    return out.withColumn("event_time", ev)
