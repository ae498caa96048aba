"""Self-check harness mimicking the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its
oracle_sql() on DuckDB at the given sf dir, compares row count,
column names, and an order-insensitive value multiset (values
normalized to strings, columns sorted by name). Usage:

    python tools/check_oracles.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_val(v):
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    return str(v)


def to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = {}
    for r in rows:
        key = tuple(norm_val(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def pandas_multiset(pdf):
    """Driver-style canonicalization: the driver routes both result
    sets through pandas before hashing, so DuckDB HUGEINT/DECIMAL
    columns degrade to float64 ("5e+15") and array columns crash its
    sort. Emulating that here makes local green predict driver green.
    Raises TypeError on unhashable (list/ndarray) cells, mirroring the
    driver's pandas sort_values crash. Floats compare by full repr —
    no rounding — because the driver hashes exact stringifications."""
    import math

    def strict(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return "NULL" if math.isnan(v) else repr(float(v))
        return str(v)

    cols = sorted(pdf.columns)
    out = {}
    for row in pdf[cols].itertuples(index=False):
        key = []
        for v in row:
            if isinstance(v, (list, tuple, dict)) or type(v).__name__ == "ndarray":
                raise TypeError(
                    "unhashable type in result column (driver _canon would crash)"
                )
            key.append(strict(v))
        key = tuple(key)
        out[key] = out.get(key, 0) + 1
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from fluent_bit_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            scols = df.columns
            srows = [tuple(r) for r in df.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        finally:
            # operators register persisted intermediates; drop them
            # after each query's final action (mirrors bench.py)
            from fluent_bit_spark.cache import release_all

            release_all()
        if name not in oracles:
            print(f"OK?  {name}: rows={len(srows)} (no oracle, rows-only)")
            continue
        try:
            cur = con.sql(oracles[name])
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        if sorted(scols) != sorted(dcols):
            failures.append(name)
            print(f"FAIL {name}: cols spark={sorted(scols)} duck={sorted(dcols)}")
            continue
        if len(srows) != len(drows):
            failures.append(name)
            print(f"FAIL {name}: rows spark={len(srows)} duck={len(drows)}")
            continue
        ms, md = to_multiset(scols, srows), to_multiset(dcols, drows)
        if ms != md:
            failures.append(name)
            diff = [k for k in ms if ms[k] != md.get(k, 0)][:3]
            diffd = [k for k in md if md[k] != ms.get(k, 0)][:3]
            print(f"FAIL {name}: value mismatch; spark-only={diff} duck-only={diffd}")
            continue
        # driver-predictor pass: pandas canonicalization on both sides
        try:
            import pandas as pd

            spdf = pd.DataFrame(srows, columns=scols)
            ddf = cur.df()
            ps, pdd = pandas_multiset(spdf), pandas_multiset(ddf)
        except TypeError as e:
            failures.append(name)
            print(f"FAIL {name}: driver-canon crash: {e}")
            continue
        if ps != pdd:
            failures.append(name)
            diff = [k for k in ps if ps[k] != pdd.get(k, 0)][:2]
            diffd = [k for k in pdd if pdd[k] != ps.get(k, 0)][:2]
            print(
                f"FAIL {name}: driver-canon mismatch (pandas dtypes); "
                f"spark-only={diff} duck-only={diffd}"
            )
            continue
        print(f"OK   {name}: rows={len(srows)}")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
