"""Multiline line-joining (stacktraces, CRI/docker partial lines).

Reference: /root/reference/src/multiline/flb_ml.c + flb_ml_rule.c —
stateful per-stream state machines; built-in parsers cri, docker,
java, go, python plus user regex rules (start_state regex -> cont
regex); match modes regex/endswith/eq (include/fluent-bit/multiline/
flb_ml.h:35-37).

Spark-first: the event-loop state machine becomes a windowed
running-sum sessionization — entirely Catalyst, one shuffle on the
stream key:

    is_start(line)                   (regex / rule mode)
    record_id = sum(is_start) over (key ORDER BY seq)
    groupBy(key, record_id) -> concat ordered lines

CRI/docker 'partial line' semantics close a record at the FULL line
instead of opening one at a start line — same running-sum trick on a
shifted flag. Requires an explicit order column (at 10^12 rows 'file
order' must be data, exactly like in_tail's (inode, offset))."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _joined(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    line_col: str,
    record_id: Column,
    sep: str = "\n",
) -> DataFrame:
    grouped = (
        df.withColumn("_rec", record_id)
        .groupBy(*key_cols, "_rec")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col(order_col).alias("o"), F.col(line_col).alias("l")))
                    ),
                    lambda s: s["l"],
                ),
                sep,
            ).alias("record"),
            F.min(order_col).alias("first_" + order_col),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
    return grouped.withColumnRenamed("_rec", "record_id")


def multiline_join(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    line_col: str,
    start_pattern: str,
    sep: str = "\n",
) -> DataFrame:
    """Rule mode: a line matching start_pattern opens a new record;
    every following non-start line continues it. Leading continuation
    lines (before any start) group into record_id 0, mirroring the
    reference flushing unmatched content as-is."""
    is_start = F.coalesce(F.col(line_col).rlike(start_pattern), F.lit(False))
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(order_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    record_id = F.sum(is_start.cast("long")).over(w)
    return _joined(df, key_cols, order_col, line_col, record_id, sep)


def partial_join(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    line_col: str,
    is_full: Column,
    sep: str = "",
) -> DataFrame:
    """CRI/docker mode: records END at a full line (is_full true);
    partial lines accumulate until one. record_id = count of full
    lines BEFORE the current row (a full line closes its own record).
    """
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(order_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    record_id = F.coalesce(F.sum(is_full.cast("long")).over(w), F.lit(0))
    return _joined(df, key_cols, order_col, line_col, record_id, sep)


CRI_RX = r"^([^ ]+) (stdout|stderr) ([PF]) (.*)$"


def cri_join(
    df: DataFrame, key_cols: list[str], order_col: str, line_col: str
) -> DataFrame:
    """CRI log lines '<time> <stream> <P|F> <log>': parse the header
    once (multi-group single pass), join partial chunks until an F
    line (flb_ml_parser_cri.c semantics)."""
    parsed = df.withColumn(
        "_cri",
        F.when(
            F.col(line_col).rlike(CRI_RX),
            F.split(
                F.regexp_replace(F.col(line_col), CRI_RX + ".*", "$1\x01$2\x01$3\x01$4"),
                "\x01",
            ),
        ),
    )
    parsed = (
        parsed.withColumn("_log", F.coalesce(F.element_at("_cri", 4), F.col(line_col)))
        .withColumn("_full", F.coalesce(F.element_at("_cri", 3) == "F", F.lit(True)))
        .withColumn("stream", F.element_at("_cri", 2))
    )
    return partial_join(
        parsed.drop("_cri"),
        key_cols + ["stream"],
        order_col,
        "_log",
        F.col("_full"),
    ).withColumnRenamed("record", "log")


def docker_join(
    df: DataFrame, key_cols: list[str], order_col: str, line_col: str
) -> DataFrame:
    """Docker json-log lines {'log': ..., 'stream': ...}: a record is
    partial while 'log' lacks a trailing newline (flb_ml_parser_docker)."""
    parsed = (
        df.withColumn("_j", F.from_json(F.col(line_col), "log string, stream string"))
        .withColumn("_log", F.col("_j.log"))
        .withColumn("stream", F.col("_j.stream"))
        .withColumn("_full", F.coalesce(F.col("_j.log").endswith("\n"), F.lit(True)))
        .drop("_j")
    )
    out = partial_join(parsed, key_cols + ["stream"], order_col, "_log", F.col("_full"))
    return out.withColumn("log", F.regexp_replace("record", "\n$", "")).drop("record")


# ---------------------------------------------------------------------
# Generic rule-table state machine + built-in language parsers.
#
# Reference: src/multiline/flb_ml_rule.c:269-360 (flb_ml_rule_process):
# a line first tries the CONTINUATION rules reachable from the current
# state (rules whose from_states contain it, in registration order,
# SKIPPING rules flagged start_state); if none match it tries the
# start rules (flush pending record, open a new one); if neither
# matches, the pending record is flushed and the line becomes its own
# record. Built-in rule tables: flb_ml_parser_java.c, _go.c,
# _python.c, _ruby.c.
#
# Spark-first split: the regex work (the hot path) runs JVM-side as
# ONE codegen pass building a per-line bitmask over the distinct rule
# patterns; the inherently-sequential DFA walks those ints inside
# applyInPandas (grouped per stream key) — no Python regex, no
# per-line JVM<->Python chatter beyond the Arrow batch.
# ---------------------------------------------------------------------

from dataclasses import dataclass  # noqa: E402


@dataclass(frozen=True)
class MlRule:
    """One state-machine rule (flb_ml_rule_create equivalent)."""

    from_states: tuple[str, ...]
    pattern: str  # Java-regex (search semantics, like flb_regex_match)
    to_state: str

    @property
    def is_start(self) -> bool:
        return "start_state" in self.from_states


def _r(from_states: str, pattern: str, to_state: str) -> MlRule:
    return MlRule(
        tuple(s.strip() for s in from_states.split(",")), pattern, to_state
    )


#: Built-in language rule tables, ported 1:1 from the reference
#: (src/multiline/flb_ml_parser_{java,go,python,ruby}.c).
BUILTIN_ML_RULES: dict[str, list[MlRule]] = {
    "java": [
        _r("start_state, java_start_exception",
           r"(.)(?:Exception|Error|Throwable|V8 errors stack trace)[:\r\n]",
           "java_after_exception"),
        _r("java_after_exception", r"^[\t ]*nested exception is:[\t ]*",
           "java_start_exception"),
        _r("java_after_exception", r"^[\r\n]*$", "java_after_exception"),
        _r("java_after_exception, java", r"^[\t ]+(?:eval )?at ", "java"),
        _r("java_after_exception, java",
           r"^[\t ]+--- End of inner exception stack trace ---$", "java"),
        _r("java_after_exception, java",
           r"^--- End of stack trace from previous (?x:)location where exception was thrown ---$",
           "java"),
        _r("java_after_exception, java", r"^[\t ]*(?:Caused by|Suppressed):",
           "java_after_exception"),
        _r("java_after_exception, java",
           r"^[\t ]*... \d+ (?:more|common frames omitted)", "java"),
    ],
    "go": [
        _r("start_state", r"\bpanic: ", "go_after_panic"),
        _r("start_state", r"http: panic serving", "go_goroutine"),
        _r("go_after_panic", r"^$", "go_goroutine"),
        _r("go_after_panic, go_after_signal, go_frame_1", r"^$",
           "go_goroutine"),
        _r("go_after_panic", r"^\[signal ", "go_after_signal"),
        _r("go_goroutine", r"^goroutine \d+ \[[^\]]+\]:$", "go_frame_1"),
        _r("go_frame_1", r"^(?:[^\s.:]+\.)*[^\s.():]+\(|^created by ",
           "go_frame_2"),
        _r("go_frame_2", r"^\s", "go_frame_1"),
    ],
    "python": [
        _r("start_state", r"^Traceback \(most recent call last\):$", "python"),
        _r("python", r"^[\t ]+File ", "python_code"),
        _r("python_code", r"[^\t ]", "python"),
        _r("python", r"^(?:[^\s.():]+\.)*[^\s.():]+:", "start_state"),
    ],
    "ruby": [
        _r("start_state, ruby_start_exception", r"^.+:\d+:in\s+.*",
           "ruby_after_exception"),
        _r("ruby_after_exception, ruby", r"^\s+from\s+.*:\d+:in\s+.*", "ruby"),
    ],
}


def ml_rules_join(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    line_col: str,
    rules: list[MlRule] | str,
    sep: str = "\n",
) -> DataFrame:
    """State-machine multiline join (flb_ml_rule_process semantics).

    ``rules`` is a rule list or a built-in name ('java', 'go',
    'python', 'ruby'). Output: one row per joined record —
    (key_cols..., record_id, record, first_<order>, n_lines).
    """
    if isinstance(rules, str):
        rules = BUILTIN_ML_RULES[rules]
    pats = list(dict.fromkeys(r.pattern for r in rules))
    if len(pats) > 62:
        raise ValueError("at most 62 distinct rule patterns supported")
    pat_idx = {p: i for i, p in enumerate(pats)}

    # one JVM pass: bit i set iff line matches pattern i
    mask = None
    for p, i in pat_idx.items():
        bit = F.when(F.col(line_col).rlike(p), F.lit(1 << i)).otherwise(0)
        mask = bit if mask is None else (mask + bit)
    flagged = df.select(
        *key_cols, F.col(order_col), F.col(line_col), mask.alias("_flags")
    )

    # driver-side transition tables (state -> ordered (bit, next_state))
    start_rules = [(pat_idx[r.pattern], r.to_state) for r in rules if r.is_start]
    cont: dict[str, list[tuple[int, str]]] = {}
    for r in rules:
        if r.is_start:
            continue  # skipped as continuation candidates (flb_ml_rule.c:305)
        for s in r.from_states:
            cont.setdefault(s, []).append((pat_idx[r.pattern], r.to_state))
    # preserve registration order per state (dict insertion order does)

    import pandas as _pd  # noqa: PLC0415

    key_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name in key_cols
    )
    order_type = df.schema[order_col].dataType.simpleString()
    out_schema = (
        f"{key_fields}, record_id long, record string, "
        f"first_{order_col} {order_type}, n_lines long"
    )

    def run_group(pdf: _pd.DataFrame) -> _pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        lines = pdf[line_col].tolist()
        orders = pdf[order_col].tolist()
        flags = pdf["_flags"].tolist()
        keys = {k: pdf[k].iloc[0] for k in key_cols}
        recs: list[tuple[int, str, object, int]] = []
        buf: list[str] = []
        first_o = None
        state: str | None = None

        def flush() -> None:
            nonlocal buf, first_o
            if buf:
                recs.append((len(recs), sep.join(buf), first_o, len(buf)))
            buf, first_o = [], None

        for line, o, fl in zip(lines, orders, flags):
            line = line if line is not None else ""
            matched = False
            if state is not None:
                for bit, nxt in cont.get(state, ()):
                    if fl & (1 << bit):
                        buf.append(line)
                        state = nxt
                        matched = True
                        break
            if not matched:
                for bit, nxt in start_rules:
                    if fl & (1 << bit):
                        flush()
                        buf, first_o, state = [line], o, nxt
                        matched = True
                        break
            if not matched:
                flush()
                recs.append((len(recs), line, o, 1))
                state = None
        flush()
        return _pd.DataFrame(
            [
                {**keys, "record_id": rid, "record": rec,
                 f"first_{order_col}": fo, "n_lines": nl}
                for rid, rec, fo, nl in recs
            ]
        )

    return flagged.groupBy(*key_cols).applyInPandas(run_group, out_schema)


# --------------------------------------------------- partial_message mode


def partial_message_concat(
    df: DataFrame,
    key_content: str = "log",
    key_cols: list[str] | None = None,
    order_col: str = "_seq",
    flush_pending: bool = True,
) -> DataFrame:
    """filter_multiline ``mode partial_message``: concatenate Docker
    partial messages split by the 16 KB log-driver limit.

    Reference plugins/filter_multiline/ml.c:600-733 + ml_concat.c:
    a record whose ``partial_message`` value starts with "true"
    (case-insensitive, strncasecmp ml_concat.c:89) joins the packer
    keyed by (tag, input, ``partial_id``); its ``key_content`` value is
    appended IN ARRIVAL ORDER (``partial_ordinal`` is carried but never
    used for ordering — ml_split_message_packer_write just appends);
    ``partial_last`` "true" completes and emits the record. The output
    keeps the FIRST record's timestamp and every first-record key
    except the ``partial_``-prefixed metadata (ml_create_packer
    ml_concat.c:266-320 skips the split key + the partial_ prefix);
    records without ``partial_message`` — or partial ones missing
    ``partial_id`` (ml.c:676-681 warn path) — pass through untouched.

    Spark-first: arrival order is the explicit ``order_col`` (at scale
    ordering must be data); a reused partial_id after completion opens
    a new group via an epoch column (running count of prior completed
    rows — the batch rendering of "packer deleted on emit"). Groups
    never completed by a ``partial_last`` row are the pending buffers
    the reference flushes on a timer (ml.c partial_timer_cb);
    ``flush_pending`` emits them at end-of-input (batch = one flush
    window). Dropped partial_ keys read as null, the columnar
    rendering of a removed map key. All-Catalyst: one shuffle on
    (key, partial_id), partial-agg combinable."""
    key_cols = key_cols if key_cols is not None else ["tag"]

    def _truthy(name: str) -> Column:
        if name not in df.columns:
            return F.lit(False)
        return F.coalesce(
            F.lower(F.col(name).cast("string")).startswith("true"), F.lit(False)
        )

    has_id = (
        F.col("partial_id").isNotNull()
        if "partial_id" in df.columns
        else F.lit(False)
    )
    is_partial = _truthy("partial_message") & has_id
    is_last = _truthy("partial_last")

    passthru = df.filter(~is_partial)
    part = df.filter(is_partial)

    w_prev = (
        Window.partitionBy(*key_cols, "partial_id")
        .orderBy(F.col(order_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    epoch = F.coalesce(F.sum(is_last.cast("long")).over(w_prev), F.lit(0))

    other_cols = [c for c in df.columns if c != key_content]
    grouped = (
        part.withColumn("_epoch", epoch)
        .groupBy(*key_cols, "partial_id", "_epoch")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col(order_col).alias("o"),
                                F.col(key_content).alias("c"),
                            )
                        )
                    ),
                    lambda s: s["c"],
                ),
                "",
            ).alias("_joined"),
            F.min_by(F.struct(*[F.col(c) for c in other_cols]), F.col(order_col)).alias(
                "_first"
            ),
            F.max(is_last.cast("boolean")).alias("_complete"),
        )
    )
    if not flush_pending:
        grouped = grouped.filter(F.col("_complete"))

    sel = []
    for c in df.columns:
        if c == key_content:
            sel.append(F.col("_joined").alias(c))
        elif c.startswith("partial_"):
            sel.append(
                F.lit(None).cast(df.schema[c].dataType).alias(c)
            )
        elif c in key_cols:
            sel.append(F.col(c))
        else:
            sel.append(F.col("_first")[c].alias(c))
    return passthru.unionByName(grouped.select(*sel))
