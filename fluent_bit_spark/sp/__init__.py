from fluent_bit_spark.sp.engine import SpEngine, SpStream
from fluent_bit_spark.sp.parser import parse_sql, SpCommand
from fluent_bit_spark.sp.translate import translate, run_query

__all__ = [
    "parse_sql",
    "SpCommand",
    "translate",
    "run_query",
    "SpEngine",
    "SpStream",
]
