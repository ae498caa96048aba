"""Tag glob matching vs the reference router semantics.

Cases mirror /root/reference/tests/internal/router.c and the
router_match algorithm (src/flb_router.c:38-103).
"""

import pytest

from fluent_bit_spark.functions.globmatch import glob_to_regex, tag_glob_match, tag_match_col

CASES = [
    # (tag, match, expected)
    ("web.en.com", "*", True),
    ("web.en.com", "web.en.*", True),
    ("web.en.com", "*.com", True),
    ("web.en.com", "web.en.com", True),
    ("web.en.com", "nomatch.*", False),
    ("web.en.com", "web.*.com", True),
    ("web.en.com", "web.*.org", False),
    # '*' matches empty
    ("abc", "abc*", True),
    ("abc", "*abc", True),
    ("abc", "a*bc", True),
    ("ac", "a*c", True),
    # successive '*' collapse
    ("abc", "**c", True),
    ("abc", "a**", True),
    # mid-string recursion: '*' must scan multiple candidate positions
    ("aXbXc", "a*c", True),
    ("aXbXb", "a*c", False),
    ("a.b.b.c", "*.b.c", True),
    # prefix of match longer than tag
    ("ab", "abc", False),
    ("abc", "ab", False),
    # regression: dot is literal, not regex any-char
    ("axb", "a.b", False),
    ("a.b", "a.b", True),
    ("", "*", True),
]


@pytest.mark.parametrize("tag,match,expected", CASES)
def test_python_oracle(tag, match, expected):
    assert tag_glob_match(tag, match) is expected


def test_spark_predicate_matches_oracle(spark):
    tags = sorted({t for t, _, _ in CASES})
    df = spark.createDataFrame([(t,) for t in tags], ["tag"])
    for match in sorted({m for _, m, _ in CASES}):
        got = {
            r["tag"]
            for r in df.filter(tag_match_col("tag", match)).collect()
        }
        want = {t for t in tags if tag_glob_match(t, match)}
        assert got == want, f"match rule {match!r}"


def test_glob_to_regex_escapes_specials():
    assert glob_to_regex("a+b*") == r"^a\+b.*$"
