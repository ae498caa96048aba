"""filter_type_converter: append type-converted copies of fields.

Reference: plugins/filter_type_converter/type_converter.c — rules
``(int_key|uint_key|float_key|str_key) FROM TO TYPE`` read the FROM
key, convert via flb_typecast (src/flb_typecast.c types: int, uint,
float, hex, str/string) and append the result under TO; the original
key is kept, untouched. Unconvertible values yield no TO value for
that record (the reference logs and skips the append — null here).

String-input semantics follow flb_typecast.c:99-137 exactly:
int/uint/hex parse the LEADING numeric prefix (strtoimax /
strtoumax — "123.456" -> 123, "0xff" -> 255) and a parsed value of 0
is treated as a conversion ERROR (the reference's explicit 0-check,
quirk included); float is atof (prefix parse, no error path — a
non-numeric string converts to 0.0). Non-string inputs convert by
plain value cast, as the typed msgpack branches do. The FROM key may
be a record-accessor path ($nest['key']).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fluent_bit_spark.functions.accessor import ra_col_safe
from fluent_bit_spark.parsers.compile import typecast_col

_TYPES = {"int", "uint", "float", "hex", "str", "string"}

_INT_PREFIX = r"^\s*([+-]?[0-9]+)"
_HEX_PREFIX = r"^\s*(?:0[xX])?([0-9a-fA-F]+)"
_FLOAT_PREFIX = r"^\s*([+-]?(?:[0-9]+\.?[0-9]*|\.[0-9]+)(?:[eE][+-]?[0-9]+)?)"


def _conv_str(col: Column, to_type: str) -> Column:
    """flb_typecast string-input branches (flb_typecast.c:99-137)."""
    if to_type in ("int", "uint"):
        n = F.regexp_extract(col, _INT_PREFIX, 1)
        v = F.when(n != "", n).try_cast("long")
        if to_type == "uint":
            # strtoumax on a negative wraps modulo 2^64; a wrapped
            # value is never what a pipeline wants — reject instead
            v = F.when(v >= 0, v)
        return F.when(v != 0, v)  # the reference's 0 == error check
    if to_type == "hex":
        h = F.regexp_extract(col, _HEX_PREFIX, 1)
        v = F.when(h != "", F.conv(h, 16, 10)).try_cast("long")
        return F.when(v != 0, v)
    if to_type == "float":
        f = F.regexp_extract(col, _FLOAT_PREFIX, 1)
        # atof has no error path: unparseable -> 0.0 (packed anyway)
        return F.coalesce(
            F.when(f != "", f).try_cast("double"),
            F.when(col.isNotNull(), F.lit(0.0)),
        )
    return col.cast("string")


@dataclass
class ConvertRule:
    from_key: str
    to_key: str
    to_type: str  # int | uint | float | hex | str | string


def type_converter(
    df: DataFrame, rules: list[ConvertRule], gate: Column | None = None
) -> DataFrame:
    for r in rules:
        t = r.to_type.lower()
        if t not in _TYPES:
            raise ValueError(f"unknown conversion type {r.to_type!r}")
        if r.from_key.startswith("$"):
            src = ra_col_safe(df, r.from_key)
        elif r.from_key in df.columns:
            src = F.col(r.from_key)
        else:
            continue  # missing key: nothing to convert (NOTOUCH)
        src_type = df.select(src.alias("_s")).schema["_s"].dataType
        if isinstance(src_type, T.StringType):
            conv = _conv_str(src, t)
        else:
            # typed msgpack input branches: plain value casts
            conv = typecast_col(
                src.cast("string"),
                {"int": "integer", "uint": "integer", "float": "float",
                 "hex": "hex", "str": "string", "string": "string"}[t],
            )
            if t == "uint":
                conv = F.when(conv >= 0, conv)
        if gate is not None:
            old = F.col(r.to_key) if r.to_key in df.columns else F.lit(None)
            conv = F.when(gate, conv).otherwise(old)
        df = df.withColumn(r.to_key, conv)
    return df
