"""Registry integrity: every queries() entry must ANALYZE against the
sf0.001 tables (schema resolution, not execution — execution is the
oracle harness's job at sf0.01), every oracle key must have a query,
and the driver-gate ordering invariant must hold."""

from __future__ import annotations

import json
import os

import pytest


def test_every_query_analyzes(spark, sf_dir):
    import __spark_entry__ as entry

    qs = entry.queries()
    failures = {}
    for name, fn in qs.items():
        try:
            df = fn(spark, sf_dir)
            assert df.columns, "no columns"
            df.schema  # forces analysis
        except Exception as e:  # noqa: BLE001
            failures[name] = f"{type(e).__name__}: {e}"
        finally:
            from fluent_bit_spark.cache import release_all

            release_all()
    assert not failures, json.dumps(failures, indent=2)[:4000]


def test_every_oracle_has_a_query():
    import __spark_entry__ as entry

    qs, os_ = entry.queries(), entry.oracle_sql()
    assert not set(os_) - set(qs)
    # rows-only entries (no oracle) are the documented exceptions
    rows_only = set(qs) - set(os_)
    assert rows_only <= {"bpe_tokenize"}, rows_only


@pytest.mark.skipif(
    not os.path.exists("CORRECTNESS_r02.json"), reason="no driver artifact"
)
def test_driver_gate_ordering_never_checked_first():
    """Entries without a green driver CORRECTNESS row in ANY past round
    must occupy the first positions of queries() — the driver's gate
    records ~50 rows per round in dict order, so the never-verified (and
    previously-failed) entries are the ones that need a row next."""
    import glob

    import __spark_entry__ as entry

    verified: set[str] = set()
    for path in glob.glob("CORRECTNESS_r*.json"):
        art = json.load(open(path))
        for name, row in art.items():
            if isinstance(row, dict) and row.get("hash_match"):
                verified.add(name)
    names = list(entry.queries())
    unchecked = [n for n in names if n not in verified]
    assert names[: len(unchecked)] == sorted(
        unchecked, key=names.index
    ) and set(names[: len(unchecked)]) == set(unchecked)
