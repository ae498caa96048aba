"""out_syslog message encoding: RFC5424 and RFC3164 line composition.

Reference: /root/reference/plugins/out_syslog/syslog.c —
``syslog_rfc5424`` (:144) and ``syslog_rfc3164`` (:297) compose the
wire line from a per-record syslog_msg populated by
``msgpack_to_syslog`` (:560-720): configurable record keys carry
severity / facility / hostname / appname / procid / msgid / message,
map-valued keys named in ``syslog_sd_key`` become RFC5424
structured-data elements (``msgpack_to_sd`` :383-545), and missing
fields fall back to the *_preset options (:731-760, config map
:1040+).

Spark-first shape: everything is one Catalyst ``concat`` tree over
typed columns — no Python in the hot path, the encoder inlines into
WholeStageCodegen next to the parse/filter stages, and the resulting
``line`` column feeds any text sink (out_file, kafka-style key/value
writer, socket forwarder). Deviations from the C, both documented
inline: field truncation is measured in characters rather than bytes
(identical for ASCII; multi-byte UTF-8 hostnames longer than the cap
may keep a few more bytes), and ``syslog_maxsize`` truncation likewise
counts characters.

Timestamps are rendered in UTC (the reference uses ``gmtime_r``);
sessions built by fluent_bit_spark.session pin
spark.sql.session.timeZone=UTC so ``date_format`` matches.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# syslog.c:57-70
SEVERITY = {
    "emerg": 0, "alert": 1, "crit": 2, "err": 3,
    "warning": 4, "notice": 5, "info": 6, "debug": 7,
}

# syslog.c:73-101
FACILITY = {
    "kern": 0, "user": 1, "mail": 2, "daemon": 3, "auth": 4,
    "syslog": 5, "lpr": 6, "news": 7, "uucp": 8, "cron": 9,
    "authpriv": 10, "ftp": 11, "ntp": 12, "security": 13,
    "console": 14, "local0": 16, "local1": 17, "local2": 18,
    "local3": 19, "local4": 20, "local5": 21, "local6": 22,
    "local7": 23,
}

# PRINTUSASCII except '=', SP, ']', '"' (syslog.c:125 rfc5424_sp_name);
# anything else in an SD-NAME is rewritten to '_'
_SD_NAME_BAD = r'[^!-~]|[=\]"]'
# '"', '\', ']' get a backslash (syslog.c:105 rfc5424_sp_value)
_SD_VALUE_ESC = r'(["\\\]])'


def severity_num(col: Column) -> Column:
    """Record-key severity -> 0-7, or NULL when unrecognized
    (syslog.c:634-654: a single char '0'-'7', else a case-insensitive
    name from the severity table; invalid values warn and keep -1 so
    the preset applies)."""
    low = F.lower(col)
    expr = F.lit(None).cast("int")
    for name, num in SEVERITY.items():
        expr = F.when(low == name, F.lit(num)).otherwise(expr)
    return F.when(col.rlike("^[0-7]$"), col.cast("int")).otherwise(expr)


def facility_num(col: Column) -> Column:
    """Record-key facility -> 0-23 or NULL (syslog.c:655-686: one
    digit, two digits bounded to 23, else a name lookup)."""
    low = F.lower(col)
    expr = F.lit(None).cast("int")
    for name, num in FACILITY.items():
        expr = F.when(low == name, F.lit(num)).otherwise(expr)
    two = F.when(
        col.rlike("^[0-2][0-9]$") & (col.cast("int") <= 23), col.cast("int")
    ).otherwise(F.lit(None).cast("int"))
    return (
        F.when(col.rlike("^[0-9]$"), col.cast("int"))
        .when(col.rlike("^[0-2][0-9]$"), two)
        .otherwise(expr)
    )


def _stringify(df: DataFrame, c: str) -> Column:
    """msgpack_to_syslog value rendering (syslog.c:600-628): bool ->
    true/false, ints bare, floats printf-%f, strings as-is."""
    dt = df.schema[c].dataType.simpleString()
    col = F.col(c)
    if dt == "boolean":
        return F.when(col, F.lit("true")).otherwise(F.lit("false"))
    if dt in ("double", "float"):
        return F.format_string("%f", col.cast("double"))
    return col.cast("string")


def _sd_name(col_or_lit: Column) -> Column:
    """SD-NAME sanitization: truncate to 32, non-PRINTUSASCII or
    '=' ' ' ']' '"' -> '_' (syslog.c:409-427,496-518)."""
    return F.regexp_replace(F.substring(col_or_lit, 1, 32), _SD_NAME_BAD, "_")


def sd_element(sd_id: str, map_col: Column) -> Column:
    """One RFC5424 SD-ELEMENT from a map<string,string> column:
    ``[sd_id k1="v1" k2="v2"]`` with name sanitization and value
    escaping (msgpack_to_sd, syslog.c:383-545). NULL map -> NULL.

    Entry order follows map_entries order, matching the reference's
    msgpack map iteration order for maps built in record order.
    """
    parts = F.transform(
        F.map_entries(map_col),
        lambda e: F.concat(
            F.lit(" "),
            _sd_name(e["key"]),
            F.lit('="'),
            F.regexp_replace(e["value"], _SD_VALUE_ESC, r"\\$1"),
            F.lit('"'),
        ),
    )
    return F.when(
        map_col.isNotNull(),
        F.concat(
            F.lit("["), _sd_name(F.lit(sd_id)), F.array_join(parts, ""), F.lit("]")
        ),
    )


def _nil(col: Column | None, maxlen: int | None = None) -> Column:
    """RFC5424 NILVALUE fallback + per-field length cap
    (syslog_rfc5424 truncates hostname 255 / appname 48 / procid 128 /
    msgid 32; chars here, bytes in C — identical for ASCII)."""
    if col is None:
        return F.lit("-")
    capped = F.substring(col, 1, maxlen) if maxlen else col
    return F.coalesce(capped, F.lit("-"))


def to_syslog(
    df: DataFrame,
    ts_col: str,
    syslog_format: str = "rfc5424",
    mode: str = "udp",
    maxsize: int | None = None,
    severity_col: str | None = None,
    severity_preset: int = 6,
    facility_col: str | None = None,
    facility_preset: int = 1,
    hostname_col: str | None = None,
    appname_col: str | None = None,
    procid_col: str | None = None,
    msgid_col: str | None = None,
    sd_cols: dict[str, str] | None = None,
    message_col: str | None = None,
) -> Column:
    """Compose the syslog wire line for every record, columnar.

    Mirrors syslog_format (syslog.c:723-800): key columns override the
    presets; prival = facility*8 + severity; rfc5424 appends the UTF-8
    BOM before the message and '-' for every NILVALUE; rfc3164 writes
    ``app[procid]: message``; a message already starting with '<' is
    passed through verbatim (pre-formatted syslog, syslog.c:152-160,
    305-313); the line is capped at ``maxsize`` (default 2048 for
    rfc5424, 1024 for rfc3164, syslog_conf.c:146-153) and tcp/tls mode
    appends a trailing newline.
    """
    fmt = syslog_format.lower()
    if fmt not in ("rfc5424", "rfc3164"):
        raise ValueError(f"unknown syslog_format {syslog_format!r}")
    if maxsize is None:
        maxsize = 2048 if fmt == "rfc5424" else 1024

    sev = F.lit(int(severity_preset))
    if severity_col:
        sev = F.coalesce(severity_num(_stringify(df, severity_col)), sev)
    fac = F.lit(int(facility_preset))
    if facility_col:
        fac = F.coalesce(facility_num(_stringify(df, facility_col)), fac)
    prival = (fac * 8 + sev).cast("string")

    message = _stringify(df, message_col) if message_col else None
    ts = F.col(ts_col)

    if fmt == "rfc5424":
        # "<pri>1 %d-%02d-%02dT%02d:%02d:%02d.%06uZ " (syslog.c:168)
        head = F.concat(
            F.lit("<"), prival, F.lit(">1 "),
            F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"),
            F.lit(" "),
            _nil(F.col(hostname_col) if hostname_col else None, 255),
            F.lit(" "),
            _nil(F.col(appname_col) if appname_col else None, 48),
            F.lit(" "),
            _nil(F.col(procid_col) if procid_col else None, 128),
            F.lit(" "),
            _nil(F.col(msgid_col) if msgid_col else None, 32),
            F.lit(" "),
        )
        if sd_cols:
            sd = F.concat(
                *[sd_element(sd_id, F.col(c)) for sd_id, c in sd_cols.items()]
            )
            head = F.concat(head, F.coalesce(sd, F.lit("-")))
        else:
            head = F.concat(head, F.lit("-"))
        if message is not None:
            # " \xef\xbb\xbf" BOM prefix (syslog.c:281)
            line = F.when(
                message.isNotNull(),
                F.concat(head, F.lit(" \ufeff"), message),
            ).otherwise(head)
        else:
            line = head
    else:
        # "<pri>%s %2d %02d:%02d:%02d " (syslog.c:321)
        head = F.concat(
            F.lit("<"), prival, F.lit(">"),
            F.date_format(ts, "MMM"),
            F.format_string(" %2d ", F.dayofmonth(ts)),
            F.date_format(ts, "HH:mm:ss"),
            F.lit(" "),
        )
        if hostname_col:
            host = F.when(
                F.col(hostname_col).isNotNull(),
                F.concat(F.col(hostname_col), F.lit(" ")),
            ).otherwise(F.lit(""))
            head = F.concat(head, host)
        if appname_col:
            proc = (
                F.when(
                    F.col(procid_col).isNotNull(),
                    F.concat(F.lit("["), F.col(procid_col), F.lit("]")),
                ).otherwise(F.lit(""))
                if procid_col
                else F.lit("")
            )
            app = F.when(
                F.col(appname_col).isNotNull(),
                F.concat(F.col(appname_col), proc, F.lit(": ")),
            ).otherwise(F.lit(""))
            head = F.concat(head, app)
        line = F.concat(head, F.coalesce(message, F.lit(""))) if message is not None else head

    # pre-formatted passthrough: message starting with '<'
    if message is not None:
        line = F.when(F.substring(message, 1, 1) == "<", message).otherwise(line)

    line = F.substring(line, 1, int(maxsize))
    if mode.lower() in ("tcp", "tls"):
        line = F.concat(line, F.lit("\n"))
    return line
