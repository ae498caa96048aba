"""Property-based parity: the JVM fast paths must agree with the
reference-exact Arrow implementations on arbitrary inputs.

The Arrow UDFs (`logfmt_map_col`, compile.py) are line-by-line ports of
the C tokenizers (flb_parser_logfmt.c) kept as the semantic reference;
the Catalyst fast paths are the 100 TB hot path. Hypothesis hammers the
pair with adversarial strings (quotes, backslash escapes, bare keys,
dangling '=', unterminated quotes, duplicate keys) over the printable
alphabet the parity contract covers (control-char idents are the
documented divergence where only the Arrow path is reference-exact).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from fluent_bit_spark.parsers.compile import (
    logfmt_map_col,
    logfmt_map_fast_col,
    ltsv_map_col,
)

# alphabet chosen to collide tokens: ident chars, '=', quotes,
# backslash, escape letters, whitespace
LOGFMT_ALPHABET = 'abk123 ="\\ntr\t'
lines_strategy = st.lists(
    st.text(alphabet=LOGFMT_ALPHABET, min_size=0, max_size=40),
    min_size=1,
    max_size=25,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lines=lines_strategy)
def test_logfmt_fast_path_matches_reference(spark, lines):
    df = spark.createDataFrame([(l,) for l in lines], "text string")
    rows = df.select(
        logfmt_map_fast_col("text").alias("fast"),
        logfmt_map_col(F.col("text")).alias("ref"),
        "text",
    ).collect()
    for r in rows:
        assert r["fast"] == r["ref"], repr(r["text"])


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lines=st.lists(
        st.text(alphabet="abc:\t .=1", min_size=0, max_size=30),
        min_size=1,
        max_size=25,
    )
)
def test_ltsv_total_on_arbitrary_input(spark, lines):
    """ltsv parse never throws and drops label-less fields, like the
    reference's strtok walk (flb_parser_ltsv.c)."""
    df = spark.createDataFrame([(l,) for l in lines], "text string")
    rows = df.select(ltsv_map_col("text").alias("m"), "text").collect()
    for r in rows:
        m = r["m"] or {}
        assert all(":" not in k for k in m)


@pytest.mark.parametrize(
    "line",
    [
        'k="unterminated',
        "k=",
        "=v",
        "k==v",
        'a=1 a=2 a="3"',
        'k="a\\\\b\\nc"',
        "   ",
        '"just a quote"',
        "k\\=v",
    ],
)
def test_logfmt_known_edges(spark, line):
    df = spark.createDataFrame([(line,)], "text string")
    r = df.select(
        logfmt_map_fast_col("text").alias("fast"),
        logfmt_map_col(F.col("text")).alias("ref"),
    ).first()
    assert r["fast"] == r["ref"], repr(line)
