"""flb_pack_json duplicate-key semantics, columnar.

Reference: /root/reference/src/flb_pack.c (flb_pack_json →
pack_json_to_msgpack with the dedup pass added for duplicated map
keys; fixture tests/internal/data/pack/dup_keys_in.json →
dup_keys_out.json, tests/internal/pack.c:254 test_json_dup_keys):
when a JSON map carries the same key more than once, the packed
record keeps ONLY the last occurrence of each key, and the surviving
entries appear in the order of their LAST occurrence — e.g.
``{date, map, key1, key2, date, key1}`` becomes
``{map, key2, date, key1}``.  The rule applies at every nesting
level.

Spark's ``from_json`` into a map type does NOT dedup — the parsed
MapData physically retains duplicate keys (and ``to_json`` re-emits
them), so this twin is required for parity: a higher-order-function
pass that keeps an entry iff no later entry has the same key.
O(n²) in the per-record key count (maps are small), all Catalyst.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dedup_map_keys(m: Column) -> Column:
    """Keep-last dedup of a map column's entries, surviving entries
    ordered by last occurrence (the flb_pack_json rule)."""
    entries = F.map_entries(m)

    def keep(kv, i):
        later_same = F.filter(
            entries,
            lambda kv2, j: (kv2["key"] == kv["key"]) & (j > i),
        )
        return F.size(later_same) == 0

    return F.map_from_entries(F.filter(entries, keep))
