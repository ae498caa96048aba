"""Audit the registry for driver-canonicalization hazards.

The driver's correctness gate canonicalizes both result sets through
pandas (duckdb ``.df()`` / Spark ``.toPandas()``-equivalent) before
value-hashing. Two result shapes pass the repo's own fetchall-based
check_oracles but break or mismatch in the driver:

1. DuckDB HUGEINT / DECIMAL output columns (e.g. ``sum(BIGINT)``)
   become float64 / object in pandas and stringify differently from
   Spark's integral columns -> hash_match false.
2. Spark array/map/struct output columns are unhashable in pandas
   ``sort_values`` -> the driver's _canon raises TypeError.

This script flags both WITHOUT running any Spark job: oracle column
types come from a DuckDB LIMIT-0 prepare; Spark column types come
from the query's analyzed schema at sf0.001.

Usage: python tools/audit_driver_hazards.py [sf_dir]
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

HAZARD_DUCK = ("HUGEINT", "DECIMAL", "UHUGEINT")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    import __spark_entry__ as entry
    from fluent_bit_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    bad = []
    for name, fn in qs.items():
        has_oracle = name in oracles
        # oracle-side type hazards
        if has_oracle:
            try:
                rel = con.sql(f"SELECT * FROM ({oracles[name]}) LIMIT 0")
                dtypes = {c: str(t) for c, t in zip(rel.columns, rel.types)}
            except Exception as e:  # noqa: BLE001
                bad.append((name, f"oracle error: {e}"))
                dtypes = {}
            for c, t in dtypes.items():
                if any(h in t.upper() for h in HAZARD_DUCK):
                    bad.append((name, f"oracle col {c} is {t} (pandas-lossy)"))
                if t.upper().endswith("[]") or t.upper().startswith(
                    ("STRUCT", "MAP", "LIST")
                ):
                    bad.append((name, f"oracle col {c} is {t} (unsortable)"))
        # spark-side complex-type hazards (only matter when an oracle
        # forces the driver to canonicalize values)
        try:
            from fluent_bit_spark.cache import release_all

            df = fn(spark, sf_dir)
            for f in df.schema.fields:
                kind = f.dataType.typeName()
                if has_oracle and kind in ("array", "map", "struct"):
                    bad.append((name, f"spark col {f.name} is {kind} (unsortable)"))
            release_all()
        except Exception as e:  # noqa: BLE001
            bad.append((name, f"spark build error: {e}"))

    for name, why in bad:
        print(f"HAZARD {name}: {why}")
    print(f"\n{len(bad)} hazards" if bad else "\nCLEAN")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
