"""Unigram language-model quality scoring (perplexity-proxy filter).

The CCNet / Gopher / RedPajama pipelines score documents with a small
language model and drop the high-perplexity tail. Without a KenLM in
the sandbox, the distributed shape is identical with a corpus-trained
unigram model: pass 1 aggregates token counts (one map-side-combined
shuffle), pass 2 joins per-token log-probabilities back and averages
per document. Documents whose tokens are rare corpus-wide (gibberish,
boilerplate-free noise) score low exactly like high-perplexity docs
under a real LM; swap the vocab table for externally-trained counts
and nothing else changes.

Determinism: log-probabilities are fixed-pointed to nanos
(``cast(round(ln(p) * 1e9) as bigint)``) so the per-document mean is
an exact int64 sum / count — no float summation-order dependence
between Spark and the DuckDB oracle (or between cluster sizes).

Scale notes (100 TB): the vocab table is Zipf-small relative to the
corpus (and can be capped with ``min_count``); pass it
``broadcast_vocab=True`` to keep pass 2 a broadcast join — otherwise
it is a hash equi-join on the token. The corpus-level scalars (N
tokens, V vocab size) ride along via a 1-row crossJoin, not a
driver-side collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fluent_bit_spark.textprep import portable as P
from fluent_bit_spark.textprep.dedup import ensure_parallelism


def lm_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Per-document add-one-smoothed unigram log-likelihood.

    Output: ``(doc_id, n_tokens, avg_logprob, rare_frac)`` —
    ``avg_logprob`` is the mean ln P(token) under the corpus unigram
    model with add-1 smoothing (higher = more typical text),
    ``rare_frac`` the fraction of tokens occurring exactly once
    corpus-wide (hapax ratio, a cheap gibberish signal). Empty docs
    return n_tokens=0 with null scores.
    """
    toks = ensure_parallelism(docs).select(
        F.col(id_col).alias("id"), F.expr(P.spark_tokens(text_col)).alias("tk")
    )
    flat = toks.select("id", F.explode("tk").alias("token"))
    vocab = flat.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    totals = vocab.agg(
        F.sum("cnt").alias("n_total"), F.count(F.lit(1)).alias("v_size")
    )
    vocab = vocab.crossJoin(F.broadcast(totals)).select(
        "token",
        F.expr(
            "cast(round(ln(cast(cnt + 1 as double) / (n_total + v_size)) * 1e9)"
            " as bigint)"
        ).alias("lp_nanos"),
        (F.col("cnt") == 1).alias("is_rare"),
    )
    if broadcast_vocab:
        vocab = F.broadcast(vocab)
    scored = (
        flat.join(vocab, "token")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("lp_nanos").alias("lp_sum"),
            F.sum(F.col("is_rare").cast("long")).alias("n_rare"),
        )
    )
    return (
        toks.select("id")
        .join(scored, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
            F.round(
                F.col("lp_sum").cast("double") / 1e9 / F.col("n_tokens"), 6
            ).alias("avg_logprob"),
            F.round(
                F.col("n_rare").cast("double") / F.col("n_tokens"), 6
            ).alias("rare_frac"),
        )
    )


def duck_lm_score(source: str = "documents") -> str:
    """DuckDB rendering of lm_score; ``source`` may be any
    relation/subquery exposing (doc_id, text)."""
    tokens = P.duck_tokens("text")
    return f"""
        WITH t AS (SELECT doc_id AS id, {tokens} AS tk FROM {source}),
        flat AS (SELECT id, u.token FROM t, unnest(tk) AS u(token)),
        vocab0 AS (SELECT token, count(*)::bigint AS cnt FROM flat GROUP BY token),
        tot AS (SELECT sum(cnt)::bigint AS n_total, count(*)::bigint AS v_size
                FROM vocab0),
        vocab AS (
          SELECT token,
                 cast(round(ln((cnt + 1)::double / (n_total + v_size)) * 1e9)
                      as bigint) AS lp_nanos,
                 cnt = 1 AS is_rare
          FROM vocab0 CROSS JOIN tot
        ),
        scored AS (
          SELECT id, count(*)::bigint AS n_tokens,
                 sum(lp_nanos)::bigint AS lp_sum,
                 sum(CASE WHEN is_rare THEN 1 ELSE 0 END)::bigint AS n_rare
          FROM flat JOIN vocab USING (token) GROUP BY id
        )
        SELECT t.id AS doc_id,
               coalesce(s.n_tokens, 0)::bigint AS n_tokens,
               round(s.lp_sum::double / 1e9 / s.n_tokens, 6) AS avg_logprob,
               round(s.n_rare::double / s.n_tokens, 6) AS rare_frac
        FROM t LEFT JOIN scored s ON t.id = s.id
    """
