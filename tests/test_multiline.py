"""Multiline join tests: regex rule mode (java stacktrace), CRI and
docker partial-line modes."""

from __future__ import annotations

import pytest

from fluent_bit_spark.operators.multiline import cri_join, docker_join, multiline_join

JAVA_START = r"^\d{4}-\d\d-\d\d|^[A-Z][a-z]+Exception|^Exception"


@pytest.fixture(scope="module")
def javalog(spark):
    lines = [
        "2026-01-01 10:00:00 INFO starting",
        "2026-01-01 10:00:01 ERROR failure",
        "ExceptionInInitializerError: boom",
        "    at com.example.Main.run(Main.java:12)",
        "    at com.example.Main.main(Main.java:5)",
        "2026-01-01 10:00:02 INFO recovered",
    ]
    return spark.createDataFrame(
        [("f1", i, l) for i, l in enumerate(lines)], "file string, seq long, line string"
    )


def test_multiline_regex_rule(javalog):
    out = {
        r["first_seq"]: (r["record"], r["n_lines"])
        for r in multiline_join(javalog, ["file"], "seq", "line", JAVA_START).collect()
    }
    assert out[0] == ("2026-01-01 10:00:00 INFO starting", 1)
    assert out[1][1] == 1
    rec = out[2][0]
    assert rec.startswith("ExceptionInInitializerError")
    assert rec.count("\n") == 2  # 3 joined lines
    assert out[5] == ("2026-01-01 10:00:02 INFO recovered", 1)


def test_cri_partial_lines(spark):
    lines = [
        "2026-01-01T00:00:00.0Z stdout P part-one-",
        "2026-01-01T00:00:00.1Z stdout P part-two-",
        "2026-01-01T00:00:00.2Z stdout F end",
        "2026-01-01T00:00:00.3Z stderr F whole-line",
    ]
    df = spark.createDataFrame(
        [("c1", i, l) for i, l in enumerate(lines)], "pod string, seq long, line string"
    )
    out = {r["log"]: r for r in cri_join(df, ["pod"], "seq", "line").collect()}
    assert "part-one-part-two-end" in out
    assert out["part-one-part-two-end"]["n_lines"] == 3
    assert out["part-one-part-two-end"]["stream"] == "stdout"
    assert out["whole-line"]["stream"] == "stderr"


def test_docker_partial_lines(spark):
    lines = [
        '{"log": "hello ", "stream": "stdout"}',
        '{"log": "world\\n", "stream": "stdout"}',
        '{"log": "single\\n", "stream": "stdout"}',
    ]
    df = spark.createDataFrame(
        [("c1", i, l) for i, l in enumerate(lines)], "pod string, seq long, line string"
    )
    out = {r["log"] for r in docker_join(df, ["pod"], "seq", "line").collect()}
    assert out == {"hello world", "single"}


# ---- built-in language state machines (flb_ml_parser_{java,go,python,
# ruby}.c), goldens ported from tests/internal/multiline.c ------------

from fluent_bit_spark.operators.multiline import MlRule, ml_rules_join


def _run_ml(spark, lines, rules):
    rows = [("s", i, ln) for i, ln in enumerate(lines)]
    df = spark.createDataFrame(rows, "stream string, seq long, line string")
    out = ml_rules_join(df, ["stream"], "seq", "line", rules)
    return [r["record"] for r in out.orderBy("first_seq").collect()]


JAVA_INPUT = [
    'Exception in thread "main" java.lang.IllegalStateException: ..null property',
    "     at com.example.myproject.Author.getBookIds(xx.java:38)",
    "     at com.example.myproject.Bootstrap.main(Bootstrap.java:14)",
    "Caused by: java.lang.NullPointerException",
    "     at com.example.myproject.Book.getId(Book.java:22)",
    "     at com.example.myproject.Author.getBookIds(Author.java:35)",
    "     ... 1 more",
    "single line",
]


def test_ml_java_golden(spark):
    recs = _run_ml(spark, JAVA_INPUT, "java")
    assert recs == ["\n".join(JAVA_INPUT[:7]), "single line"]


GO_INPUT = [
    "panic: my panic",
    "",
    "goroutine 4 [running]:",
    "panic(0x45cb40, 0x47ad70)",
    "\t/usr/local/go/src/runtime/panic.go:542 +0x46c fp=0xc42003f7b8 sp=0xc42003f710 pc=0x422f7c",
    "main.main.func1(0xc420024120)",
    "\tfoo.go:6 +0x39 fp=0xc42003f7d8 sp=0xc42003f7b8 pc=0x451339",
    "runtime.goexit()",
    "\t/usr/local/go/src/runtime/asm_amd64.s:2337 +0x1 fp=0xc42003f7e0 sp=0xc42003f7d8 pc=0x44b4d1",
    "created by main.main",
    "\tfoo.go:5 +0x58",
    "",
    "goroutine 1 [chan receive]:",
    "runtime.gopark(0x4739b8, 0xc420024178, 0x46fcd7, 0xc, 0xc420028e17, 0x3)",
    "\t/usr/local/go/src/runtime/proc.go:280 +0x12c fp=0xc420053e30 sp=0xc420053e00 pc=0x42503c",
    "main.main()",
    "\tfoo.go:9 +0x6f fp=0xc420053f80 sp=0xc420053f50 pc=0x4512ef",
    "one more line, no multiline",
]


def test_ml_go_golden(spark):
    recs = _run_ml(spark, GO_INPUT, "go")
    assert recs == ["\n".join(GO_INPUT[:17]), "one more line, no multiline"]


PY_INPUT = [
    "Traceback (most recent call last):",
    '  File "/base/data/home/runtimes/python27/python27_lib/versions/third_party/webapp2-2.5.2/webapp2.py", line 1535, in __call__',
    "    rv = self.handle_exception(request, response, e)",
    '  File "/base/data/home/apps/s~nearfieldspy/1.378705245900539993/nearfieldspy.py", line 17, in start',
    "    return get()",
    '  File "/base/data/home/apps/s~nearfieldspy/1.378705245900539993/nearfieldspy.py", line 5, in get',
    "    raise Exception('spam', 'eggs')",
    "Exception: ('spam', 'eggs')",
    "hello world, not multiline",
]


def test_ml_python_golden(spark):
    recs = _run_ml(spark, PY_INPUT, "python")
    assert recs == ["\n".join(PY_INPUT[:8]), "hello world, not multiline"]


RUBY_INPUT = [
    "/app/config/routes.rb:6:in `/': divided by 0 (ZeroDivisionError)",
    "\tfrom /app/config/routes.rb:6:in `block in <main>'",
    "\tfrom /var/lib/gems/3.0.0/gems/actionpack-7.0.4/lib/action_dispatch/routing/route_set.rb:428:in `instance_exec'",
    "\tfrom /var/lib/gems/3.0.0/gems/actionpack-7.0.4/lib/action_dispatch/routing/route_set.rb:428:in `eval_block'",
    "\tfrom /var/lib/gems/3.0.0/gems/actionpack-7.0.4/lib/action_dispatch/routing/route_set.rb:410:in `draw'",
    "\tfrom /app/config/routes.rb:1:in `<main>'",
    "hello world, not multiline",
]


def test_ml_ruby_golden(spark):
    recs = _run_ml(spark, RUBY_INPUT, "ruby")
    assert recs == ["\n".join(RUBY_INPUT[:6]), "hello world, not multiline"]


def test_ml_custom_rules_elastic(spark):
    # custom user rule table through the same engine (test_parser_elastic)
    rules = [
        MlRule(("start_state",), r"^\[", "elastic_cont"),
        MlRule(("elastic_cont",), r"^\s+", "elastic_cont"),
    ]
    lines = [
        "[some weird test] IndexNotFoundException[no such index]",
        "    at org.elasticsearch.cluster.metadata.IndexNameExpressionResolver....",
        "    at org.elasticsearch.cluster.metadata.IndexNameExpressionResolver.java:133)",
        "    at org.elasticsearch.action.admin.indices.delete.java:75)",
        "another separate log line",
    ]
    recs = _run_ml(spark, lines, rules)
    assert recs == ["\n".join(lines[:4]), "another separate log line"]


def test_ml_two_streams_independent_state(spark):
    # interleaved streams must not share DFA state
    rows = []
    for i, ln in enumerate(JAVA_INPUT):
        rows.append(("a", i, ln))
        rows.append(("b", i, ln))
    df = spark.createDataFrame(rows, "stream string, seq long, line string")
    out = ml_rules_join(df, ["stream"], "seq", "line", "java")
    got = {(r["stream"], r["record_id"]): r["record"] for r in out.collect()}
    assert len(got) == 4  # 2 records per stream
    assert got[("a", 0)] == got[("b", 0)] == "\n".join(JAVA_INPUT[:7])


class TestPartialMessageMode:
    """tests/runtime/filter_multiline.c partial_message cases."""

    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows,
            "tag string, _seq long, log string, partial_message string, "
            "partial_id string, partial_ordinal string, partial_last string",
        )

    def test_partial_message_concat_golden(self, spark):
        # flb_test_multiline_partial_message_concat: two partials, no
        # last -> ONE record "one..two.." via the pending-buffer flush
        from fluent_bit_spark.operators.multiline import partial_message_concat

        df = self._df(spark, [
            ("test", 0, "one..", "true", "1", "1", "false"),
            ("test", 1, "two..", "true", "1", "2", "false"),
        ])
        out = partial_message_concat(df, key_content="log",
                                     key_cols=["tag"], order_col="_seq")
        rows = out.collect()
        assert len(rows) == 1
        r = rows[0]
        assert "one..two" in r.log and r.log == "one..two.."
        # partial metadata is stripped (ml_concat.c partial_ prefix skip)
        assert r.partial_message is None and r.partial_id is None

    def test_partial_message_two_ids_golden(self, spark):
        # flb_test_multiline_partial_message_concat_two_ids: interlaced
        # ids -> 2 records, both containing "one..two" / "three..two"
        from fluent_bit_spark.operators.multiline import partial_message_concat

        df = self._df(spark, [
            ("test", 0, "one..", "true", "1", "1", "false"),
            ("test", 1, "three..", "true", "2", "1", "false"),
            ("test", 2, "two..", "true", "1", "2", "true"),
            ("test", 3, "two..", "true", "2", "2", "true"),
        ])
        out = partial_message_concat(df, key_content="log",
                                     key_cols=["tag"], order_col="_seq")
        logs = sorted(r.log for r in out.collect())
        assert logs == ["one..two..", "three..two.."]

    def test_non_partial_passthrough_and_missing_id(self, spark):
        # ml.c:676-681: partial_message true but NO partial_id ->
        # treated as non-partial, passed through as-is
        from fluent_bit_spark.operators.multiline import partial_message_concat

        df = self._df(spark, [
            ("test", 0, "plain", None, None, None, None),
            ("test", 1, "orphan", "true", None, "1", "false"),
            ("test", 2, "a", "true", "9", "1", "true"),
        ])
        out = partial_message_concat(df, key_content="log",
                                     key_cols=["tag"], order_col="_seq")
        logs = sorted((r.log, r.partial_message) for r in out.collect())
        assert logs == [("a", None), ("orphan", "true"), ("plain", None)]

    def test_reused_partial_id_opens_new_record(self, spark):
        # packer is destroyed on emit (ml.c:713-716): a later record
        # with the same id starts a fresh concat
        from fluent_bit_spark.operators.multiline import partial_message_concat

        df = self._df(spark, [
            ("test", 0, "a1", "true", "1", "1", "false"),
            ("test", 1, "a2", "true", "1", "2", "true"),
            ("test", 2, "b1", "true", "1", "1", "false"),
            ("test", 3, "b2", "true", "1", "2", "true"),
        ])
        out = partial_message_concat(df, key_content="log",
                                     key_cols=["tag"], order_col="_seq")
        assert sorted(r.log for r in out.collect()) == ["a1a2", "b1b2"]

    def test_flush_pending_off_drops_incomplete(self, spark):
        from fluent_bit_spark.operators.multiline import partial_message_concat

        df = self._df(spark, [
            ("test", 0, "x", "true", "1", "1", "false"),
            ("test", 1, "y", "true", "2", "1", "true"),
        ])
        out = partial_message_concat(df, key_content="log",
                                     key_cols=["tag"], order_col="_seq",
                                     flush_pending=False)
        assert [r.log for r in out.collect()] == ["y"]

    def test_arrival_order_not_ordinal(self, spark):
        # partial_ordinal is carried but NEVER used for ordering —
        # ml_split_message_packer_write appends in arrival order
        from fluent_bit_spark.operators.multiline import partial_message_concat

        df = self._df(spark, [
            ("test", 0, "B", "true", "1", "2", "false"),
            ("test", 1, "A", "true", "1", "1", "true"),
        ])
        out = partial_message_concat(df, key_content="log",
                                     key_cols=["tag"], order_col="_seq")
        assert [r.log for r in out.collect()] == ["BA"]
