"""filter_grep: keep/drop records by field regex.

Reference: /root/reference/plugins/filter_grep/grep.c —
legacy mode first-rule-match (grep.c:167-194), logical_op AND/OR
modes over all rules (grep.c:250-284). A ``regex`` rule keeps
matching records, an ``exclude`` rule drops them. Missing/null field:
regex rule fails (drop), exclude rule passes (keep) — the reference's
record accessor returning no result leaves ret == no-match.

Spark: pure Column predicates -> Catalyst pushes them into the scan.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fluent_bit_spark.functions.accessor import ra_col_safe


@dataclass
class GrepRule:
    action: str  # "regex" (keep) | "exclude" (drop)
    field: str  # record-accessor path
    pattern: str  # regex


def _matches(df: DataFrame, rule: GrepRule) -> Column:
    # missing field -> no match (the reference's RA finds nothing)
    value = ra_col_safe(df, rule.field).cast("string")
    return F.coalesce(value.rlike(rule.pattern), F.lit(False))


def grep_predicate(df: DataFrame, rules: list[GrepRule], logical_op: str = "legacy") -> Column:
    """Keep-predicate for the rule list, faithful to the C evaluation.

    legacy (grep_filter_data, grep.c:167-194): rules run in order; a
    'regex' rule always decides on the spot (match->KEEP, else
    EXCLUDE); an 'exclude' rule decides EXCLUDE on match, else falls
    through; falling off the end -> KEEP.

    and/or (grep_filter_data_and_or, grep.c:250-284): OR exits at the
    first match, AND at the first non-match; the verdict is taken from
    the rule where evaluation stopped (match+regex->KEEP,
    match+exclude->EXCLUDE, nomatch+regex->EXCLUDE,
    nomatch+exclude->KEEP).
    """
    if not rules:
        return F.lit(True)
    if logical_op == "legacy":
        keep: Column = F.lit(True)
        for r in reversed(rules):
            m = _matches(df, r)
            if r.action == "regex":
                keep = m  # terminal: decides either way
            else:
                keep = ~m & keep
        return keep
    if logical_op in ("or", "and"):
        exit_on = logical_op == "or"  # OR exits on found, AND on not-found
        last = rules[-1]
        m_last = _matches(df, last)
        # verdict at the final rule from its own found value
        keep = (m_last if last.action == "regex" else ~m_last)
        for r in reversed(rules[:-1]):
            m = _matches(df, r)
            verdict_here = F.lit(r.action == "regex") if exit_on else F.lit(r.action == "exclude")
            exits = m if exit_on else ~m
            keep = F.when(exits, verdict_here).otherwise(keep)
        return keep
    raise ValueError(f"unknown logical_op {logical_op!r}")


def grep(df: DataFrame, rules: list[GrepRule], logical_op: str = "legacy") -> DataFrame:
    return df.filter(grep_predicate(df, rules, logical_op))
