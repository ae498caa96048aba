from fluent_bit_spark.functions.globmatch import (
    glob_to_regex,
    tag_glob_match,
    tag_match_col,
)
from fluent_bit_spark.functions.accessor import ra_col, ra_translate_col

__all__ = [
    "glob_to_regex",
    "tag_glob_match",
    "tag_match_col",
    "ra_col",
    "ra_translate_col",
]
