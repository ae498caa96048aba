"""Exact duplicated-substring span detection and removal.

Corpus-level *span* dedup (Lee et al., "Deduplicating Training Data
Makes Language Models Better", ACL'22): a token n-gram that occurs
more than ``min_count`` times corpus-wide marks every position it
covers as duplicated; overlapping marks merge into spans, and the
cleaned document drops the covered tokens. Unlike document-level
dedup this removes boilerplate (headers, license blocks, navigation
chrome) embedded inside otherwise-unique pages.

This is the hashed-n-gram approximation of the paper's suffix-array
method — the industry-standard distributed form (a suffix array is
inherently sequential to build; hashed fixed-length n-grams
parallelize to a count + join and catch the same spans for any
duplicate of length >= n, which is the paper's own match floor of
50 tokens at n=50).

Scale notes (100 TB):
- pass 1 is posexplode(n-gram hash) -> partial-aggregated count — one
  shuffle on the hash, map-side combined, then a filter to the (tiny,
  Zipf-tail) duplicated set;
- pass 2 re-explodes and equi-joins the duplicated hashes back — at
  scale the dup-hash table is typically small enough to broadcast
  (pass ``broadcast_dups=True``); otherwise it is a shuffle equi-join
  on the hash, never anything quadratic;
- the per-document span merge is pure Catalyst array logic over the
  (bounded, per-doc) sorted start list — no Python, no extra shuffle
  beyond the groupBy(doc).

All primitives are portable (textprep.portable md5-h32 shapes are not
needed here: the n-gram key is the md5 of the space-joined token
slice, identical in both dialects).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fluent_bit_spark.textprep import portable as P
from fluent_bit_spark.textprep.dedup import ensure_parallelism

SPAN_N = 8  # tokens per n-gram (the paper uses 50; fixtures are short)


def _tokens_col(text_col: str) -> str:
    return P.spark_tokens(text_col)


def duplicated_spans(
    docs: DataFrame,
    n: int = SPAN_N,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_dups: bool = False,
) -> DataFrame:
    """Per-document duplicated-span summary + cleaned text digest.

    Output: ``(doc_id, n_tokens, dup_token_count, dup_token_frac,
    n_spans, clean_digest)`` where positions covered by any corpus-wide
    duplicated n-gram (total occurrences >= min_count) count as
    duplicated, maximal runs of covered positions form spans, and
    ``clean_digest`` is md5 of the kept tokens re-joined with single
    spaces. Documents shorter than ``n`` tokens pass through unchanged
    (no n-gram, no span).
    """
    toks = ensure_parallelism(docs).select(
        F.col(id_col).alias("id"), F.expr(_tokens_col(text_col)).alias("tk")
    )
    # n-gram hash at each 1-based token start position; the CASE guard
    # matters: Spark's sequence(1, 0) yields a DESCENDING [1, 0], so
    # short docs must short-circuit to an empty gram list
    grams_expr = (
        f"CASE WHEN size(tk) < {n} THEN array()"
        f" ELSE transform(sequence(1, size(tk) - {n - 1}),"
        f" i -> md5(concat_ws(' ', slice(tk, i, {n})))) END"
    )
    grams = toks.select(
        "id", F.posexplode(F.expr(grams_expr)).alias("pos0", "h")
    ).select("id", (F.col("pos0") + 1).alias("start"), "h")
    dups = (
        grams.groupBy("h")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
        .select("h")
    )
    if broadcast_dups:
        dups = F.broadcast(dups)
    starts = (
        grams.join(dups, "h")
        .groupBy("id")
        .agg(F.sort_array(F.collect_set("start")).alias("starts"))
    )
    out = toks.join(starts, "id", "left").withColumn(
        "starts", F.coalesce(F.col("starts"), F.expr("cast(array() as array<int>)"))
    )
    covered = (
        f"array_sort(array_distinct(flatten(transform(starts,"
        f" p -> sequence(p, p + {n - 1})))))"
    )
    out = out.withColumn("cov", F.expr(covered))
    # span starts = covered positions not preceded by covered pos-1;
    # indexed filter over cov itself so empty cov cleanly yields 0
    n_spans = (
        "size(filter(cov, (x, i) -> i = 0 OR x != element_at(cov, i) + 1))"
    )
    clean = "filter(tk, (t, i) -> NOT array_contains(cov, i + 1))"
    return out.select(
        F.col("id").alias(id_col),
        F.size("tk").cast("long").alias("n_tokens"),
        F.size("cov").cast("long").alias("dup_token_count"),
        F.round(
            F.size("cov").cast("double") / F.greatest(F.size("tk"), F.lit(1)), 6
        ).alias("dup_token_frac"),
        F.expr(n_spans).cast("long").alias("n_spans"),
        F.md5(F.expr(f"concat_ws(' ', {clean})")).alias("clean_digest"),
    )


def duck_duplicated_spans(
    n: int = SPAN_N, min_count: int = 2, source: str = "documents"
) -> str:
    """DuckDB rendering of duplicated_spans; ``source`` may be any
    relation/subquery exposing (doc_id, text)."""
    tokens = P.duck_tokens("text")
    return f"""
        WITH t AS (SELECT doc_id AS id, {tokens} AS tk FROM {source}),
        ng AS (
          SELECT id, i AS start,
                 md5(array_to_string(tk[i : i + {n - 1}], ' ')) AS h
          FROM t, unnest(generate_series(1, greatest(0, len(tk) - {n - 1}))) AS u(i)
        ),
        dups AS (SELECT h FROM ng GROUP BY h HAVING count(*) >= {min_count}),
        st AS (
          SELECT id, list_sort(list(DISTINCT start)) AS starts
          FROM ng JOIN dups USING (h) GROUP BY id
        ),
        c AS (
          SELECT t.id, t.tk,
                 list_sort(list_distinct(flatten(list_transform(
                   coalesce(st.starts, []),
                   p -> list_transform(generate_series(0, {n - 1}), j -> p + j)
                 )))) AS cov
          FROM t LEFT JOIN st ON t.id = st.id
        )
        SELECT id AS doc_id,
               len(tk)::bigint AS n_tokens,
               len(cov)::bigint AS dup_token_count,
               round(len(cov)::double / greatest(len(tk), 1), 6) AS dup_token_frac,
               len(list_filter(cov,
                   (x, i) -> i = 1 OR x != cov[i - 1] + 1))::bigint AS n_spans,
               md5(coalesce(array_to_string(
                   list_filter(tk, (x, i) -> NOT list_contains(cov, i)), ' '),
                   '')) AS clean_digest
        FROM c
    """
