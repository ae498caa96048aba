"""HTML -> text extraction (north-rule byte-identity invariant)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fluent_bit_spark.textprep.html import (
    decode_entities_col,
    escape_html_col,
    html_to_text_col,
    html_to_text_arrow,
)

PAGE = (
    '<html><!-- note --><head><title>T</title>'
    '<style>p{color:red}</style>'
    '<script>if(1<2){var x="</div>";}</script></head>'
    '<body><p a="b">Hello &amp; &lt;world&gt;</p></body></html>'
)


def _extract(spark, page, **kw):
    df = spark.createDataFrame([(page,)], "html string")
    return df.select(html_to_text_col(F.col("html"), **kw).alias("t")).first().t


def test_jvm_extract_body(spark):
    assert _extract(spark, PAGE) == "Hello & <world>"


def test_jvm_extract_all_includes_title(spark):
    assert _extract(spark, PAGE, keep="all") == "THello & <world>"


def test_no_body_fallback(spark):
    assert _extract(spark, "<p>just a fragment</p>") == "just a fragment"


def test_collapse_ws(spark):
    got = _extract(spark, "<body> a \n\n b   c </body>", collapse_ws=True)
    assert got == "a b c"


def test_amp_decodes_last(spark):
    # '&amp;lt;' is the ESCAPED text '&lt;' — must not double-decode to '<'
    assert _extract(spark, "<body>&amp;lt;</body>") == "&lt;"


def test_escape_roundtrip(spark):
    df = spark.createDataFrame([('a < b & c > "d"',)], "t string")
    out = df.select(
        decode_entities_col(escape_html_col(F.col("t"))).alias("r")
    ).first()
    assert out.r == 'a < b & c > "d"'


def test_arrow_numeric_charrefs(spark):
    page = "<body>caf&#233; &#x41;&frac12;</body>"
    df = spark.createDataFrame([(page.encode(),)], "html binary")
    got = df.select(html_to_text_arrow(F.col("html")).alias("t")).first().t
    assert got == "café A½"


def test_jvm_path_stays_jvm(spark):
    df = spark.createDataFrame([(PAGE,)], "html string")
    out = df.select(html_to_text_col(F.col("html")).alias("t"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan and "ArrowEval" not in plan


def test_empty_body_yields_empty_not_head_leak(spark):
    """<body></body> present-but-empty must extract '', not fall back
    to the whole document (which would leak head/title text); the JVM
    and Arrow variants must agree."""
    page = "<html><head><title>Chrome</title></head><body></body></html>"
    assert _extract(spark, page) == ""
    df = spark.createDataFrame([(page.encode(),)], "html binary")
    got = df.select(html_to_text_arrow(F.col("html")).alias("t")).first().t
    assert got == ""
