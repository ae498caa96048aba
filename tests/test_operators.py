"""Operator-library semantics tests, mirroring the reference runtime
tests (tests/runtime/filter_grep.c, filter_modify.c, filter_nest.c,
filter_record_modifier.c re-expressed as DataFrame goldens)."""

import pytest
from pyspark.sql import functions as F

from fluent_bit_spark.operators import (
    ConditionRule,
    GrepRule,
    ModifyCondition,
    ModifyRule,
    content_modifier,
    grep,
    lift,
    modify,
    nest,
    record_modifier,
    sample_probabilistic,
    throttle,
)
from fluent_bit_spark.operators.conditions import where
from fluent_bit_spark.operators.expect import ExpectRule, expect


@pytest.fixture(scope="module")
def logs(spark):
    return spark.createDataFrame(
        [
            (1, "aa", "bbb", 200),
            (2, "azz", "xxx", 404),
            (3, None, "yyy", 500),
            (4, "zz", None, 200),
        ],
        "id long, k1 string, k2 string, code long",
    )


# ------------------------------------------------------------------ grep
def test_grep_keep(logs):
    got = {r["id"] for r in grep(logs, [GrepRule("regex", "k1", "^a")]).collect()}
    assert got == {1, 2}


def test_grep_exclude(logs):
    got = {r["id"] for r in grep(logs, [GrepRule("exclude", "k1", "^a")]).collect()}
    assert got == {3, 4}  # null field: exclude keeps (no match)


def test_grep_legacy_first_regex_decides(logs):
    # regex rule is terminal: the exclude rule after it never runs
    rules = [GrepRule("regex", "k1", "^a"), GrepRule("exclude", "k2", "xxx")]
    got = {r["id"] for r in grep(logs, rules, "legacy").collect()}
    assert got == {1, 2}


def test_grep_legacy_exclude_falls_through(logs):
    rules = [GrepRule("exclude", "k2", "xxx"), GrepRule("regex", "k1", "^a")]
    got = {r["id"] for r in grep(logs, rules, "legacy").collect()}
    assert got == {1}  # id2 excluded by rule1; id3,4 fail regex rule


def test_grep_and_or(logs):
    rules = [GrepRule("regex", "k1", "a"), GrepRule("regex", "k2", "x")]
    got_and = {r["id"] for r in grep(logs, rules, "and").collect()}
    got_or = {r["id"] for r in grep(logs, rules, "or").collect()}
    assert got_and == {2}  # only id2 matches both
    assert got_or == {1, 2}  # id1 via k1, id2 via both; id3/4 match neither


# ---------------------------------------------------------------- modify
def test_modify_rename_respects_conflict(spark):
    df = spark.createDataFrame(
        [("v1", None), ("v1", "occupied")], "a string, b string"
    )
    out = modify(df, [ModifyRule("rename", "a", "b")])
    rows = out.orderBy(F.col("b")).collect()
    # row1: a->b applied; row2: b occupied -> NOTOUCH
    vals = {(r["a"] if "a" in out.columns else None, r["b"]) for r in rows}
    assert ("occupied") in {r["b"] for r in rows}
    assert ("v1") in {r["b"] for r in rows}


def test_modify_hard_rename_overwrites(spark):
    df = spark.createDataFrame([("v1", "old")], "a string, b string")
    out = modify(df, [ModifyRule("hard_rename", "a", "b")])
    r = out.collect()[0]
    assert r["b"] == "v1"


def test_modify_add_set(spark):
    df = spark.createDataFrame([("x",), (None,)], "a string")
    out = modify(df, [ModifyRule("add", "a", "filled"), ModifyRule("set", "s", "v")])
    rows = out.orderBy("a").collect()
    assert {r["a"] for r in rows} == {"filled", "x"}  # add only fills absent
    assert all(r["s"] == "v" for r in rows)


def test_modify_remove_wildcard_regex(spark):
    df = spark.createDataFrame([(1, 2, 3, 4)], "aa long, ab long, ba long, zz long")
    out = modify(df, [ModifyRule("remove_wildcard", "a")])
    assert out.columns == ["ba", "zz"]
    out2 = modify(df, [ModifyRule("remove_regex", "^.b$")])
    assert out2.columns == ["aa", "ba", "zz"]


def test_modify_copy_and_moves(spark):
    df = spark.createDataFrame([("v", None, "w")], "a string, t string, z string")
    out = modify(df, [ModifyRule("copy", "a", "t"), ModifyRule("move_to_start", "z")])
    assert out.columns[0] == "z"
    assert out.collect()[0]["t"] == "v"


def test_modify_conditions_gate(spark):
    df = spark.createDataFrame([("on", "x"), (None, "y")], "flag string, v string")
    out = modify(
        df,
        [ModifyRule("set", "v", "CHANGED")],
        [ModifyCondition("key_exists", "flag")],
    )
    rows = {r["flag"]: r["v"] for r in out.collect()}
    assert rows == {"on": "CHANGED", None: "y"}


def test_modify_condition_does_not_equal_requires_presence(spark):
    df = spark.createDataFrame([("a",), (None,)], "k string")
    out = modify(
        df,
        [ModifyRule("set", "hit", "1")],
        [ModifyCondition("key_value_does_not_equal", "k", "zzz")],
    )
    rows = {r["k"]: r["hit"] for r in out.collect()}
    assert rows["a"] == "1"
    assert rows[None] is None  # absent key -> condition false


def test_modify_matching_keys_have_matching_values(spark):
    df = spark.createDataFrame([("10", "20"), ("10", "xx")], "na string, nb string")
    out = modify(
        df,
        [ModifyRule("set", "ok", "y")],
        [ModifyCondition("matching_keys_have_matching_values", "^n", r"^\d+$")],
    )
    rows = {(r["na"], r["nb"]): r["ok"] for r in out.collect()}
    assert rows[("10", "20")] == "y"
    assert rows[("10", "xx")] is None


# ------------------------------------------------------- record_modifier
def test_record_modifier(spark):
    df = spark.createDataFrame([(1, 2, 3)], "a long, b long, c long")
    out = record_modifier(df, remove_keys=["b"], records={"env": "prod"})
    assert out.columns == ["a", "c", "env"]
    out2 = record_modifier(df, allowlist_keys=["a"], uuid_key="uid")
    assert out2.columns == ["a", "uid"]
    assert len(out2.collect()[0]["uid"]) == 36


# ------------------------------------------------------------- nest/lift
def test_nest_and_lift_roundtrip(spark):
    df = spark.createDataFrame([(1, "x", "y")], "id long, p_a string, p_b string")
    nested = nest(df, ["p_*"], "payload", remove_prefix="p_")
    assert set(nested.columns) == {"id", "payload"}
    r = nested.collect()[0]
    assert r["payload"]["a"] == "x" and r["payload"]["b"] == "y"
    back = lift(nested, "payload", add_prefix="p_")
    assert set(back.columns) == {"id", "p_a", "p_b"}
    assert back.collect()[0]["p_a"] == "x"


# ------------------------------------------------------------ conditions
def test_conditions_engine(logs):
    got = {r["id"] for r in where(logs, [ConditionRule("code", "gte", 400)]).collect()}
    assert got == {2, 3}
    got = {
        r["id"]
        for r in where(
            logs,
            [ConditionRule("code", "in", [200, 500]), ConditionRule("k1", "regex", "^a")],
            combine="and",
        ).collect()
    }
    assert got == {1}
    # mismatched type comparison is false, not an error (flb_sp.c:885-887)
    got = {r["id"] for r in where(logs, [ConditionRule("k1", "gt", 5)]).collect()}
    assert got == set()


# ------------------------------------------------------ content_modifier
def test_content_modifier_actions(spark):
    df = spark.createDataFrame([("secret", "10")], "token string, n string")
    out = content_modifier(df, "hash", "token")
    assert len(out.collect()[0]["token"]) == 64  # sha256 hex
    out = content_modifier(df, "convert", "n", converted_type="int")
    assert out.collect()[0]["n"] == 10
    out = content_modifier(df, "extract", "token", pattern=r"^(?<head>se)(?<tail>cret)$")
    r = out.collect()[0]
    assert r["head"] == "se" and r["tail"] == "cret"
    out = content_modifier(df, "upsert", "n", value="99")
    assert out.collect()[0]["n"] == "99"
    out = content_modifier(df, "insert", "n", value="99")
    assert out.collect()[0]["n"] == "10"  # insert only when absent


# --------------------------------------------------- sampling / throttle
def test_sampling_deterministic(spark):
    df = spark.range(1000)
    a = sample_probabilistic(df, 25, key_cols=["id"]).count()
    b = sample_probabilistic(df, 25, key_cols=["id"]).count()
    assert a == b  # hash sampling: identical across runs
    assert 180 < a < 320  # ~25%


def test_throttle_caps_per_window(spark):
    rows = [(f"2026-01-01 00:00:{s:02d}", i) for s in range(3) for i in range(5)]
    df = spark.createDataFrame(rows, "ts string, i long").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = throttle(df, "ts", limit=2, window_duration="1 second", order_col="i")
    assert out.count() == 6  # 2 per each of 3 windows


# ----------------------------------------------------------------- expect
def test_expect(spark):
    df = spark.createDataFrame([("a",), ("b",)], "k string")
    assert expect(df, [ExpectRule("key_exists", "k")], action="exit") is df
    with pytest.raises(AssertionError):
        expect(df, [ExpectRule("key_val_eq", "k", "a")], action="exit")
    counts = expect(df, [ExpectRule("key_val_eq", "k", "a")], action="warn")
    assert counts["rule_0"] == 1
    out = expect(df, [ExpectRule("key_val_eq", "k", "a")], action="result_key")
    assert {r["k"]: r["matched"] for r in out.collect()} == {"a": True, "b": False}


def test_type_converter(spark):
    """filter_type_converter: converted copy appended under to_key,
    original untouched; unconvertible -> null (type_converter.c)."""
    from fluent_bit_spark.operators.type_converter import (
        ConvertRule,
        type_converter,
    )

    df = spark.createDataFrame(
        [("42", 7, "0x1A"), ("oops", -3, "zz")],
        "s string, i long, h string",
    )
    out = type_converter(
        df,
        [
            ConvertRule("s", "s_int", "int"),
            ConvertRule("i", "i_str", "string"),
            ConvertRule("i", "i_uint", "uint"),
            ConvertRule("h", "h_int", "hex"),
        ],
    ).collect()
    a = [r for r in out if r["s"] == "42"][0]
    assert a["s_int"] == 42 and a["i_str"] == "7"
    b = [r for r in out if r["s"] == "oops"][0]
    assert b["s_int"] is None  # unconvertible
    assert b["i_uint"] is None  # uint rejects negatives
    assert a["i_uint"] == 7


def test_alter_size_add_remove(spark):
    """filter_alter_size: Add appends {'key': 'alter_size i'} records
    per chunk; Remove drops the LAST n per chunk (alter_size.c)."""
    from fluent_bit_spark.operators.alter_size import alter_size

    df = spark.createDataFrame(
        [("a", i, f"m{i}") for i in range(5)] + [("b", 0, "x")],
        "tag string, seq long, msg string",
    )
    added = alter_size(df, add=2).collect()
    assert len(added) == 6 + 2 * 2  # 2 extra per chunk (tags a, b)
    keys = sorted(r["key"] for r in added if r["key"] is not None)
    assert keys == ["alter_size 0", "alter_size 0", "alter_size 1", "alter_size 1"]

    removed = alter_size(df, remove=2, order_col="seq").collect()
    a_seqs = sorted(r["seq"] for r in removed if r["tag"] == "a")
    assert a_seqs == [0, 1, 2]  # last 2 dropped
    assert [r["seq"] for r in removed if r["tag"] == "b"] == []  # <=0 left

    import pytest as _pytest

    with _pytest.raises(ValueError):
        alter_size(df, add=1, remove=1, order_col="seq")
