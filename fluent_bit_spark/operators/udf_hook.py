"""filter_lua-shaped user hook: arbitrary per-record transform.

Reference contract (plugins/filter_lua/lua.c:250-400): the user
function receives (tag, timestamp, record) and returns
(code, timestamp, record):
    code -1 -> drop the record
    code  0 -> keep unchanged
    code  1 -> replaced (new timestamp + record); the record may be a
               LIST of maps => 1->N emission (UDTF, lua.c:340-390)
    code  2 -> replaced record, keep original timestamp

Spark-first: the hook runs as an Arrow-batched ``mapInPandas`` over
(tag, ts, record-as-json) — the only place arbitrary Python is
allowed, and it is batch-vectorized transfer, never py4j-per-row.
State is per-batch only (like the reference's per-call Lua stack).
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HookFn = Callable[[str, float, dict[str, Any]], tuple[int, float, Any]]

OUT_SCHEMA = "tag string, ts double, record string"


def apply_hook(
    df: DataFrame,
    fn: HookFn,
    tag_col: str = "tag",
    ts_col: str = "event_time",
    record_cols: list[str] | None = None,
) -> DataFrame:
    """Run the hook over every record; returns (tag, ts, record-json)
    rows with drop/modify/expand semantics per the reference codes."""
    cols = record_cols or [
        c for c in df.columns if c not in (tag_col, ts_col)
    ]
    src = df.select(
        F.col(tag_col).alias("tag"),
        F.col(ts_col).cast("double").alias("ts"),
        F.to_json(F.struct(*[F.col(c) for c in cols])).alias("record"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_tag, out_ts, out_rec = [], [], []
            for tag, ts, rec in zip(pdf["tag"], pdf["ts"], pdf["record"]):
                code, new_ts, new_rec = fn(tag, float(ts), json.loads(rec))
                if code == -1:
                    continue
                if code == 0:
                    out_tag.append(tag); out_ts.append(ts); out_rec.append(rec)
                    continue
                ts_out = float(ts) if code == 2 else float(new_ts)
                records = new_rec if isinstance(new_rec, list) else [new_rec]
                for r in records:  # 1->N emission
                    out_tag.append(tag)
                    out_ts.append(ts_out)
                    out_rec.append(json.dumps(r, sort_keys=True))
            yield pd.DataFrame({"tag": out_tag, "ts": out_ts, "record": out_rec})

    return src.mapInPandas(run, OUT_SCHEMA)
