from fluent_bit_spark.parsers.config import ParserSpec, parse_parsers_conf
from fluent_bit_spark.parsers.compile import compile_parser, apply_parser

__all__ = ["ParserSpec", "parse_parsers_conf", "compile_parser", "apply_parser"]
