"""Wire-decoder throughput: events/sec for the protocol replay path.

Generates N Forward-protocol chunks (BATCH events per chunk — the
shape a real capture has), decodes them through
functions/forward_wire.decode_forward_streams, and reports decoded
events/sec + MB/sec. The same harness covers the collectd and mqtt
decoders with single-record packets.

Usage: python tools/wire_bench.py [--events N] [--batch B] [--cpus C]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=2_000_000)
    ap.add_argument("--batch", type=int, default=100)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from fluent_bit_spark.session import get_spark

    spark = get_spark("wire-bench", master=f"local[{args.cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    import pandas as pd

    from fluent_bit_spark.functions.forward_wire import (
        decode_forward_streams,
        encode_forward,
    )

    n_chunks = args.events // args.batch
    batch = args.batch

    def mk(batches):
        for pdf in batches:
            chunks = []
            for cid in pdf["id"]:
                cid = int(cid)
                chunks.append(encode_forward(
                    f"svc.{cid % 16}",
                    [(1_700_000_000 + i, i * 1000,
                      {"msg": f"request {cid}/{i} handled",
                       "code": 200 + i % 5, "latency_us": i * 37})
                     for i in range(batch)],
                ))
            yield pd.DataFrame({"data": pd.Series(chunks,
                                                  dtype="object")})

    src = (
        spark.range(n_chunks)
        .repartition(args.cpus * 2)
        .mapInPandas(mk, "data binary")
        .persist()
    )
    total_bytes = src.select(
        F.sum(F.length("data"))).collect()[0][0]
    results = []
    for _ in range(args.reps):
        t0 = time.monotonic()
        decoded = decode_forward_streams(src)
        n = decoded.count()
        dt = time.monotonic() - t0
        assert n == n_chunks * batch
        results.append(dt)
    best = min(results)
    out = {
        "metric": "forward-protocol decode throughput",
        "events": n_chunks * batch,
        "wire_mb": round(total_bytes / 1e6, 1),
        "reps_sec": [round(r, 2) for r in results],
        "events_per_sec": round(n_chunks * batch / best),
        "mb_per_sec": round(total_bytes / 1e6 / best, 1),
        "cpus": args.cpus,
        "batch": batch,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
