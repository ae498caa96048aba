"""The chained web-corpus curation pipeline as a library function.

Stage order (each stage's corpus is the previous stage's survivors —
the order matters because the duplicated-span counts and the unigram
LM are corpus-trained):

    URL gate (blocklist + path keywords)
 -> corpus-wide duplicated-span gate (boilerplate share <= max_dup_frac)
 -> unigram-LM quality gate (avg logprob + hapax-ratio thresholds)
 -> exact dedup (min-id survivor per digest)
 -> per-(registrable domain, lang) corpus card

Used by __spark_entry__.q_curation_pipeline (oracle-checked against a
chained-CTE DuckDB rendering) and jobs/run_curation.py (spark-submit
delivery form).

Scale notes: gates are map-only over one scan plus three broadcast
joins (blocklist, duplicated-gram set, vocab); the shuffles are the
corpus aggregations (gram count, vocab count, dedup groupBy, card),
all map-side combinable. At 100 TB pass ``broadcast_dups=False`` if
the duplicated-gram tail outgrows the broadcast threshold — the join
degrades to a hash equi-join on the gram hash, nothing else changes.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fluent_bit_spark.textprep.dedup import exact_dedup
from fluent_bit_spark.textprep.lmscore import lm_score
from fluent_bit_spark.textprep.spans import duplicated_spans
from fluent_bit_spark.textprep.urltools import url_filter


@dataclass
class CurationResult:
    kept: DataFrame  # surviving docs with gate columns
    card: DataFrame  # per-(reg_domain, lang) integer corpus card


def curate(
    pages: DataFrame,
    blocklist: DataFrame,
    id_col: str = "doc_id",
    span_n: int = 8,
    span_min_count: int = 2,
    max_dup_frac: float = 0.5,
    min_avg_logprob: float = -3.6,
    max_rare_frac: float = 0.5,
    broadcast_dups: bool = True,
) -> CurationResult:
    """``pages``: (id_col, url, text, lang). ``blocklist``: (reg_domain)."""
    g1 = (
        url_filter(pages, blocklist)
        .filter("url_allow")
        .select(id_col, "text", "lang", "reg_domain")
    )
    spans = duplicated_spans(
        g1, n=span_n, min_count=span_min_count, id_col=id_col,
        broadcast_dups=broadcast_dups,
    )
    g2 = g1.join(
        spans.select(id_col, "n_tokens", "dup_token_count", "dup_token_frac"),
        id_col,
    ).filter(F.col("dup_token_frac") <= max_dup_frac)
    lm = lm_score(g2, id_col=id_col)
    g3 = g2.join(lm.select(id_col, "avg_logprob", "rare_frac"), id_col).filter(
        (F.col("avg_logprob") >= min_avg_logprob)
        & (F.col("rare_frac") <= max_rare_frac)
    )
    groups = exact_dedup(g3, text_col="text", id_col=id_col)
    kept = g3.join(groups.select(F.col("keep_id").alias(id_col)), id_col)
    card = kept.groupBy("reg_domain", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.sum("dup_token_count").cast("bigint").alias("total_dup_tokens"),
    )
    return CurationResult(kept=kept, card=card)
