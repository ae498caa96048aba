"""Stream-processor snapshots: CREATE SNAPSHOT / FLUSH SNAPSHOT.

Reference: /root/reference/src/stream_processor/flb_sp_snapshot.c
:25-160 (ring buffer of raw records bounded by LIMIT n records and/or
WITH(seconds=s) time span), :162-277 (flush: when a record matches the
FLUSH task's WHERE condition, re-emit the buffered records). LIMIT is
only enforced for snapshots (flb_sp.c:403-432,417).

Batch translation (event-time, deterministic): for every *trigger* row
(rows satisfying the flush condition), emit the window of buffered
rows preceding it — at most ``limit`` rows and/or within ``seconds``
of event time. That is exactly a range/rows window join:

- rows mode:    Window.orderBy(ts).rowsBetween(-limit+1, 0)
- seconds mode: range join  buffered.ts in (trigger.ts - s, trigger.ts]

The implementation keys the window by an optional partition column
(the tag) so state never exceeds one partition's rows — the streaming
equivalent would be applyInPandasWithState with the same bounded
buffer per key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def snapshot_flush(
    df: DataFrame,
    flush_condition: Column,
    ts_col: str = "event_time",
    limit: int | None = None,
    seconds: float | None = None,
    partition_cols: list[str] | None = None,
    id_col: str | None = None,
) -> DataFrame:
    """Rows re-emitted by FLUSH events.

    Output: the buffered rows, each annotated with trigger_id (the
    flush row's id_col or timestamp) — one output row per (trigger,
    buffered record) pair, like the reference's re-emission of the
    whole ring buffer on each flush match.
    """
    if limit is None and seconds is None:
        raise ValueError("snapshot needs limit (records) and/or seconds (span)")

    order = F.col(id_col) if id_col else F.col(ts_col)
    trig_mark = df.withColumn("_is_trigger", flush_condition)

    parts = [F.col(c) for c in (partition_cols or [])]
    triggers = trig_mark.filter(F.col("_is_trigger")).select(
        *(partition_cols or []),
        order.alias("_trig_order"),
        F.col(ts_col).alias("_trig_ts"),
    )
    buffered = trig_mark.drop("_is_trigger")

    join_cond = F.lit(True)
    for c in partition_cols or []:
        join_cond = join_cond & (buffered[c] == triggers[c])
    # buffer precedes (or is) the trigger in order
    b_order = F.col(id_col) if id_col else F.col(ts_col)
    join_cond = join_cond & (buffered[id_col or ts_col] <= triggers["_trig_order"])
    if seconds is not None:
        join_cond = join_cond & (
            buffered[ts_col] > triggers["_trig_ts"] - F.expr(f"INTERVAL {seconds} SECONDS")
        )

    out = buffered.join(triggers, join_cond)
    for c in partition_cols or []:
        out = out.drop(triggers[c])
    if limit is not None:
        w = Window.partitionBy(
            *(parts + [F.col("_trig_order")])
        ).orderBy(b_order.desc())
        out = (
            out.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= limit)
            .drop("_rn")
        )
    return out.withColumnRenamed("_trig_order", "trigger_id").drop("_trig_ts")
