"""filter_type_converter: append type-converted copies of fields.

Reference: plugins/filter_type_converter/type_converter.c — rules
``(int_key|uint_key|float_key|str_key) FROM TO TYPE`` read the FROM
key, convert via flb_typecast (src/flb_typecast.c types: int, uint,
float, hex, string) and append the result under TO; the original key
is kept, untouched. Unconvertible values yield no TO value for that
record (the reference logs and skips the append — null here).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fluent_bit_spark.parsers.compile import typecast_col

_TYPE_MAP = {
    "int": "integer",
    "uint": "integer",  # msgpack uint; long covers the practical range
    "float": "float",
    "hex": "hex",
    "string": "string",
}


@dataclass
class ConvertRule:
    from_key: str
    to_key: str
    to_type: str  # int | uint | float | hex | string


def type_converter(
    df: DataFrame, rules: list[ConvertRule], gate: Column | None = None
) -> DataFrame:
    for r in rules:
        t = _TYPE_MAP.get(r.to_type.lower())
        if t is None:
            raise ValueError(f"unknown conversion type {r.to_type!r}")
        if r.from_key not in df.columns:
            continue  # missing key: nothing to convert (NOTOUCH)
        conv = typecast_col(F.col(r.from_key).cast("string"), t)
        if r.to_type.lower() == "uint":
            conv = F.when(conv >= 0, conv)  # uints reject negatives
        if gate is not None:
            old = F.col(r.to_key) if r.to_key in df.columns else F.lit(None)
            conv = F.when(gate, conv).otherwise(old)
        df = df.withColumn(r.to_key, conv)
    return df
