"""Bug-compatible hopping-window MIN/MAX parity mode.

The reference's hopping window subtracts expiring panes for SUM/AVG
(aggregate_func_remove_sum) but uses remove_nop for MIN/MAX
(src/stream_processor/flb_sp_aggregate_func.c:348-355), so a group's
MIN/MAX never forget values from panes that slid out of the window.
The aggregate node only resets when the expiring slot held ALL of the
node's remaining records (flb_sp_window.c:66-90: node destroyed when
aggr_node_hs->records == aggr_node->records, else records subtracted
and MIN/MAX left untouched).

The default engine (sp/translate) computes EXACT windowed MIN/MAX —
strictly better. This module exists for byte-equality with reference
fixtures: it reproduces the node-lifecycle semantics above.

Spark shape (scale-safe): one shuffle pre-aggregates per (key, pane)
— min/max/count, tiny rows — then a per-key applyInPandas walks the
pane sequence simulating the node lifecycle. Post-aggregation state is
bounded by (#keys x #panes), not by input rows.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hopping_minmax_bug_compat(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    size_sec: int,
    advance_sec: int,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Per emitted hopping window: reference-compatible MIN/MAX plus
    exact count/sum (those ARE subtractable in the reference too).

    Output: group_cols..., window_start timestamp, records long,
    sum_value double, min_bugcompat double, max_bugcompat double,
    min_exact double, max_exact double (the exact pair included so the
    divergence is observable).
    """
    if size_sec % advance_sec != 0:
        raise ValueError("size must be a multiple of advance (pane count)")
    panes_per_window = size_sec // advance_sec
    group_cols = group_cols or []

    pane = F.floor(F.unix_timestamp(F.col(ts_col)) / advance_sec).cast("long")
    per_pane = (
        df.withColumn("_pane", pane)
        .groupBy(*group_cols, "_pane")
        .agg(
            F.count(F.lit(1)).alias("_cnt"),
            F.sum(F.col(value_col).cast("double")).alias("_sum"),
            F.min(F.col(value_col).cast("double")).alias("_min"),
            F.max(F.col(value_col).cast("double")).alias("_max"),
        )
    )

    key_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name in group_cols
    )
    prefix = f"{key_fields}, " if key_fields else ""
    out_schema = (
        f"{prefix}window_start timestamp, records long, sum_value double, "
        "min_bugcompat double, max_bugcompat double, "
        "min_exact double, max_exact double"
    )
    P = panes_per_window
    adv = advance_sec

    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_pane")
        keys = {k: pdf[k].iloc[0] for k in group_cols}
        stats = {
            int(p): (int(c), float(s), float(mn), float(mx))
            for p, c, s, mn, mx in zip(
                pdf["_pane"], pdf["_cnt"], pdf["_sum"], pdf["_min"], pdf["_max"]
            )
        }
        lo, hi = min(stats), max(stats)
        alive = False
        acc_min = acc_max = None
        tot = 0
        rows = []
        # emission at pane p covers panes (p-P+1 .. p); afterwards the
        # oldest pane expires (flb_sp_window_prune pops the first slot)
        for p in range(lo, hi + P):
            cnt, s, mn, mx = stats.get(p, (0, 0.0, None, None))
            if cnt:
                if not alive:
                    alive, acc_min, acc_max, tot = True, mn, mx, cnt
                else:
                    acc_min = min(acc_min, mn)
                    acc_max = max(acc_max, mx)
                    tot += cnt
            win = [stats.get(q) for q in range(p - P + 1, p + 1)]
            win = [w for w in win if w]
            if win:  # reference emits only when window.records > 0
                rows.append(
                    {
                        **keys,
                        "window_start": pd.Timestamp((p - P + 1) * adv, unit="s"),
                        "records": sum(w[0] for w in win),
                        "sum_value": sum(w[1] for w in win),
                        "min_bugcompat": acc_min,
                        "max_bugcompat": acc_max,
                        "min_exact": min(w[2] for w in win),
                        "max_exact": max(w[3] for w in win),
                    }
                )
            # prune the expiring pane (p-P+1): node dies only when the
            # expiring slot held every remaining record (remove_nop
            # otherwise — MIN/MAX untouched)
            exp = stats.get(p - P + 1)
            if alive and exp:
                if exp[0] == tot:
                    alive, acc_min, acc_max, tot = False, None, None, 0
                else:
                    tot -= exp[0]
        return pd.DataFrame(rows)

    if group_cols:
        return per_pane.groupBy(*group_cols).applyInPandas(walk, out_schema)
    return per_pane.groupBy(F.lit(1).alias("_g")).applyInPandas(
        lambda pdf: walk(pdf), out_schema
    )
