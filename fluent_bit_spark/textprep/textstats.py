"""Text analysis for training-data curation: language-ID, quality
scoring, token counting, fingerprinting.

All pure Catalyst expressions (no Python), each with an exact DuckDB
oracle rendering via textprep.portable / the matching SQL in
__spark_entry__.oracle_sql. At 100 TB these are narrow map-only
stages — no shuffle at all until a downstream aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fluent_bit_spark.textprep import portable as P

# Marker-word profiles for the n-gram/stopword language heuristic.
# Deterministic argmax with first-index tie-break; the fixture corpus
# has no real cross-language signal, so the heuristic's *procedure*
# (not its accuracy) is what the oracle verifies.
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "is"],
    "de": ["der", "die", "und", "das", "ist"],
    "es": ["el", "la", "de", "y", "es"],
    "fr": ["le", "la", "et", "les", "est"],
    "ja": ["no", "wa", "ni", "ga", "desu"],
}

# BPE-ish token regex: words / numbers / single punctuation marks.
# (double-escaped: this string is embedded in a Spark SQL literal,
# which itself unescapes backslashes once)
TOKEN_RX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]"

STOPWORDS = ["the", "a", "of", "and", "is", "to", "in", "that", "it", "for"]


def token_count_cols(df: DataFrame, text_col: str = "text") -> DataFrame:
    """ws_tokens (whitespace count) + bpe_tokens (regex token count)."""
    return df.withColumn(
        "ws_tokens", F.expr(f"size({P.spark_tokens(text_col)})")
    ).withColumn(
        "bpe_tokens",
        F.size(F.expr(f"regexp_extract_all({text_col}, '{TOKEN_RX}', 0)")),
    )


# Latin-1 accent folding table (the deterministic subset both engines
# share; full NFKC needs ICU, which neither engine exposes portably)
_ACCENTS_FROM = "àáâãäåçèéêëìíîïñòóôõöùúûüýÿ"
_ACCENTS_TO = "aaaaaaceeeeiiiinooooouuuuyy"


def normalize_text_col(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Canonical text for dedup/shingling (the normalize-before-hash
    stage every dedup pipeline runs): lowercase, fold Latin-1 accents,
    strip control chars, collapse all whitespace runs to single
    spaces, trim. Emits ``norm_text``. Pure codegen projection — zero
    shuffles; full NFKC is out of scope (needs ICU; this table is the
    deterministic cross-engine subset)."""
    e = f"lower({text_col})"
    e = f"translate({e}, '{_ACCENTS_FROM}', '{_ACCENTS_TO}')"
    # keep \t \n \r for the whitespace collapse to fold into spaces;
    # strip the rest of C0 + DEL
    e = f"regexp_replace({e}, '[\\\\x00-\\\\x08\\\\x0b\\\\x0c\\\\x0e-\\\\x1f\\\\x7f]', '')"
    e = f"trim(regexp_replace({e}, '\\\\s+', ' '))"
    return df.withColumn("norm_text", F.expr(e))


def duck_normalize_text(text_col: str = "text") -> str:
    e = f"lower({text_col})"
    e = f"translate({e}, '{_ACCENTS_FROM}', '{_ACCENTS_TO}')"
    e = f"regexp_replace({e}, '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]', '', 'g')"
    e = f"trim(regexp_replace({e}, '\\s+', ' ', 'g'))"
    return e


def length_quantile_card(
    df: DataFrame,
    key_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Per-key corpus length card: doc count + EXACT p50/p90/p99 of the
    whitespace token count (Spark ``percentile``, linear interpolation —
    semantics identical to DuckDB ``quantile_cont``).

    Scale note: exact percentile keeps a value→count map per group, so
    it is safe exactly when the measure has bounded cardinality (token
    counts: tens of thousands of distinct values at any corpus size).
    For unbounded measures use ``approx_percentile`` (t-digest sketch,
    mergeable map-side) and accept the documented error bound — the
    approximate result is not oracle-comparable, which is why the card
    ships the exact form.
    """
    toks = F.expr(f"size({P.spark_tokens(text_col)})")
    grp = df.select(F.col(key_col), toks.alias("_t")).groupBy(key_col)
    return grp.agg(
        F.count(F.lit(1)).alias("docs"),
        F.expr("percentile(_t, 0.5)").alias("p50_tokens"),
        F.expr("percentile(_t, 0.9)").alias("p90_tokens"),
        F.expr("percentile(_t, 0.99)").alias("p99_tokens"),
    )


def quality_cols(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword quality signals, rounded 6.

    n_chars, n_tokens, avg_token_len, stopword_ratio, alpha_ratio —
    the standard cheap web-text quality filters (C4/Gopher-style).
    """
    tk = P.spark_tokens(text_col)
    df = df.withColumn("_tk", F.expr(tk))
    sw = ",".join(f"'{w}'" for w in STOPWORDS)
    return (
        df.withColumn("n_chars", F.length(text_col).cast("bigint"))
        .withColumn("n_tokens", F.expr("size(_tk)").cast("bigint"))
        .withColumn(
            "avg_token_len",
            F.expr(
                "round(aggregate(_tk, cast(0 as double), (acc, t) -> acc + length(t))"
                " / greatest(size(_tk), 1), 6)"
            ),
        )
        .withColumn(
            "stopword_ratio",
            F.expr(
                f"round(cast(size(filter(_tk, t -> t in ({sw}))) as double)"
                " / greatest(size(_tk), 1), 6)"
            ),
        )
        .withColumn(
            "alpha_ratio",
            F.expr(
                f"round(cast(length(regexp_replace({text_col}, '[^A-Za-z]', '')) as double)"
                f" / greatest(length({text_col}), 1), 6)"
            ),
        )
        .drop("_tk")
    )


def lang_id_col(
    df: DataFrame, text_col: str = "text", out_col: str = "pred_lang"
) -> DataFrame:
    """Marker-word language heuristic: argmax of per-language marker
    counts over whitespace tokens, ties broken by profile order."""
    tk = P.spark_tokens(text_col)
    langs = list(LANG_PROFILES)
    scores = ",".join(
        "size(filter(_tk, t -> t in ({})))".format(
            ",".join(f"'{w}'" for w in LANG_PROFILES[lang])
        )
        for lang in langs
    )
    arr = ",".join(f"'{lang}'" for lang in langs)
    return (
        df.withColumn("_tk", F.expr(tk))
        .withColumn(
            out_col,
            F.expr(
                f"element_at(array({arr}), cast("
                f"array_position(array({scores}), array_max(array({scores}))) as int))"
            ),
        )
        .drop("_tk")
    )


def fingerprint_col(
    df: DataFrame, text_col: str = "text", out_col: str = "fingerprint"
) -> DataFrame:
    """Rolling polynomial hash over token hashes (portable)."""
    th = P.spark_hash_array(P.spark_tokens(text_col))
    return df.withColumn("_th", F.expr(th)).withColumn(
        out_col, F.expr(P.spark_fingerprint("_th"))
    ).drop("_th")
