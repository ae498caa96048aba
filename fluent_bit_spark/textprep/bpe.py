"""Byte-pair-encoding tokenizer: distributed training reduction +
Arrow-batched apply.

The scale split follows how BPE is actually trained on web corpora
(Sennrich et al. 2016; GPT-2's byte-level variant): the learner never
needs the corpus, only the WORD-FREQUENCY TABLE — distinct
whitespace words with counts. At 100 TB that table is the output of
one map-side-combinable groupBy (billions of rows in, ~10^6 distinct
words out after the frequency cap), so Spark does the single pass
over the data and the merge loop runs driver-side over the tiny
table, exactly like the reference single-node trainers but fed by a
cluster-scale reduction.

Apply is the hot path: a Pandas UDF over Arrow batches with a
per-distinct-word cache (web text repeats words heavily, so the
cache hit rate dominates; the greedy lowest-rank merge walk only
runs once per distinct word per batch). Python-side by necessity —
the within-word merge loop is data-dependent and sequential, the
documented UDF-is-the-slow-path exception (SURVEY §2.10 class).

Determinism: merges tie-break on (count DESC, pair lexicographic),
and the word table is capped by (count DESC, word) — identical
results at any parallelism, any cluster.

No fluent-bit analog (the reference has no tokenizer surface); this
sits on the LLM-pipeline axis beside textstats.token_count_cols,
upgrading the "BPE-ish regex" count to a real learned subword
tokenization.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from fluent_bit_spark.textprep import portable as P

END = "</w>"


def word_counts(
    docs: DataFrame,
    text_col: str = "text",
    top_k: int = 65536,
) -> DataFrame:
    """Corpus word-frequency table: the ONLY pass over the big side.
    One shuffle (partial-aggregated map-side), capped to the top_k
    most frequent words with a deterministic (cnt DESC, word) order —
    rare tail words below the cap contribute nothing to merge counts
    that the head doesn't already decide."""
    tk = P.spark_tokens(text_col)
    return (
        docs.select(F.explode(F.expr(tk)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "word")
        .limit(top_k)
    )


def bpe_train(
    wc: DataFrame | list[tuple[str, int]],
    n_merges: int = 200,
) -> list[tuple[str, str]]:
    """Learn the merge list from a word-frequency table (DataFrame
    from ``word_counts`` or an in-memory list). Driver-side by
    design: the table is small (see module docstring), the loop is
    pure Python over symbol tuples."""
    if isinstance(wc, DataFrame):
        rows = [(r["word"], r["cnt"]) for r in wc.collect()]
    else:
        rows = list(wc)
    vocab: dict[tuple[str, ...], int] = {}
    for word, cnt in rows:
        sym = tuple(word) + (END,)
        vocab[sym] = vocab.get(sym, 0) + int(cnt)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, cnt in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + cnt
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        joined = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, cnt in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == best[0] and sym[i + 1] == best[1]:
                    out.append(joined)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + cnt
        vocab = new_vocab
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank merging of one word (the classic apply)."""
    return _encode_fast(word, ranks, {i: p for p, i in ranks.items()})


def bpe_apply(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize with a learned merge list. Arrow-batched with a
    per-distinct-word cache (the batch's repeated words pay once)."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    rank_to_pair = {i: p for p, i in ranks.items()}

    def enc_batch(s: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def enc_word(w: str) -> list[str]:
            got = cache.get(w)
            if got is None:
                got = cache[w] = _encode_fast(w, ranks, rank_to_pair)
            return got

        return s.map(
            lambda t: [tok for w in (t or "").split() for tok in enc_word(w)]
        )

    udf = F.pandas_udf(enc_batch, ArrayType(StringType()))
    return docs.withColumn(out_col, udf(F.col(text_col))).withColumn(
        f"n_{out_col}", F.size(F.col(out_col)).cast("bigint")
    )


def _encode_fast(
    word: str,
    ranks: dict[tuple[str, str], int],
    rank_to_pair: dict[int, tuple[str, str]],
) -> list[str]:
    """encode_word without the linear rank->pair scan per round."""
    sym = list(word) + [END]
    while len(sym) > 1:
        best = None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best is None or r < best):
                best = r
        if best is None:
            break
        a, b = rank_to_pair[best]
        out: list[str] = []
        i = 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym
