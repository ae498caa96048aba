"""Portable deterministic text primitives (Spark SQL + DuckDB dialects).

Every primitive here is a *pure function of its input string* with an
exactly-equivalent rendering in both Spark SQL and DuckDB SQL, so the
driver's DuckDB oracle can replicate Spark results bit-for-bit:

- h32: first 8 hex chars of md5 as int64 (both engines share md5).
- char n-gram shingles, whitespace tokens.
- MinHash signature: k universal-hash mins over shingle hashes.
- SimHash (32-bit) over token hashes.
- Rolling polynomial fingerprint over token hashes (mod prime < 2^53
  so `acc*31 + h` never overflows int64 in either engine).

Scale notes (100 TB): everything is a Catalyst expression — no Python,
no UDF, whole-stage-codegen throughout; per-row cost is O(len(text))
with a constant number of md5 calls per shingle/token (the md5 per
shingle is computed once and reused by all k MinHash functions).
"""

from __future__ import annotations

# prime just under 2^53: acc < P, acc*31 < 2^58, + h32 < 2^58 -- no
# int64 overflow in Spark (wraps) or DuckDB (errors), identical math.
P53 = 9007199254740881

# MinHash universal-hash coefficients: a odd < 2^28, b < 2^28,
# deterministic (seeded linear congruence, spelled out as literals so
# both dialects embed identical constants).
N_HASHES = 32
BAND_ROWS = 4
N_BANDS = N_HASHES // BAND_ROWS


def _coef(i: int, salt: int) -> int:
    x = (i * 2654435761 + salt * 40503 + 12345) % (1 << 28)
    return x | 1  # odd


MINHASH_A = [_coef(i, 1) for i in range(N_HASHES)]
MINHASH_B = [_coef(i, 2) for i in range(N_HASHES)]

SHINGLE_N = 5


# ------------------------------------------------------------ Spark SQL

def spark_h32(e: str) -> str:
    return f"cast(conv(substring(md5({e}),1,8),16,10) as bigint)"


def spark_shingles(e: str, n: int = SHINGLE_N) -> str:
    return (
        f"array_distinct(transform(sequence(1, greatest(1, length({e})-{n - 1})),"
        f" i -> substring({e}, i, {n})))"
    )


def spark_tokens(e: str) -> str:
    return f"filter(split({e}, '\\\\s+'), t -> t <> '')"


def spark_hash_array(arr: str) -> str:
    """Hash each element of a string array once (reused downstream)."""
    return f"transform({arr}, _s -> {spark_h32('_s')})"


def spark_minhash_sig(hs: str) -> str:
    """MinHash signature array over a pre-hashed shingle array column."""
    mins = ",".join(
        f"array_min(transform({hs}, h -> ({a}*h+{b}) % {P53}))"
        for a, b in zip(MINHASH_A, MINHASH_B)
    )
    return f"array({mins})"


def spark_band_keys(sig: str, rows: int = BAND_ROWS, bands: int = N_BANDS) -> str:
    """LSH band keys: md5 of each r-row slice of the signature."""
    return (
        f"transform(sequence(0, {bands - 1}), bi -> "
        f"md5(concat_ws(',', transform(slice({sig}, bi*{rows}+1, {rows}),"
        f" x -> cast(x as string)))))"
    )


def spark_simhash(th: str) -> str:
    """32-bit SimHash over a token-hash array column."""
    return (
        "aggregate(sequence(0,31), cast(0 as bigint), (acc, bb) -> acc + "
        f"CASE WHEN aggregate({th}, cast(0 as bigint), (s, h) -> s + "
        "(CASE WHEN cast(floor(h / power(2, bb)) as bigint) % 2 = 1 "
        "THEN 1 ELSE -1 END)) >= 0 "
        "THEN cast(power(2, bb) as bigint) ELSE cast(0 as bigint) END)"
    )


def spark_fingerprint(th: str) -> str:
    """Rolling polynomial hash over token hashes (doc fingerprint)."""
    return f"aggregate({th}, cast(0 as bigint), (acc, h) -> (acc*31+h) % {P53})"


# -------------------------------------------------------------- DuckDB

def duck_h32(e: str) -> str:
    return f"('0x'||substr(md5({e}),1,8))::bigint"


def duck_shingles(e: str, n: int = SHINGLE_N) -> str:
    return (
        f"list_distinct([substr({e},i,{n}) for i in "
        f"generate_series(1, greatest(1, len({e})-{n - 1}))])"
    )


def duck_tokens(e: str) -> str:
    return f"list_filter(regexp_split_to_array({e}, '\\s+'), t -> t <> '')"


def duck_hash_array(arr: str) -> str:
    return f"list_transform({arr}, _s -> {duck_h32('_s')})"


def duck_minhash_sig(hs: str) -> str:
    mins = ",".join(
        f"list_min(list_transform({hs}, h -> ({a}*h+{b}) % {P53}))"
        for a, b in zip(MINHASH_A, MINHASH_B)
    )
    return f"[{mins}]"


def duck_band_keys(sig: str, rows: int = BAND_ROWS, bands: int = N_BANDS) -> str:
    return (
        f"list_transform([bi for bi in generate_series(0, {bands - 1})], bi -> "
        f"md5(array_to_string({sig}[bi*{rows}+1 : bi*{rows}+{rows}], ',')))"
    )


def duck_simhash(th: str) -> str:
    return (
        "list_reduce(list_prepend(0::bigint, [bb for bb in generate_series(0,31)]),"
        " (acc, bb) -> acc + CASE WHEN "
        f"list_reduce(list_prepend(0::bigint, {th}), (s,h) -> s + "
        "CASE WHEN (h >> bb) & 1 = 1 THEN 1 ELSE -1 END) >= 0 "
        "THEN (1::bigint << bb) ELSE 0::bigint END)"
    )


def duck_fingerprint(th: str) -> str:
    return f"list_reduce(list_prepend(0::bigint, {th}), (acc, h) -> (acc*31+h) % {P53})"
