"""Web-corpus curation filters: Gopher-style quality gates, line
repetition signals, top n-gram coverage, per-domain frequency caps,
PII scrubbing, and C4-style line cleaning.

These are the standard published heuristics for LLM training-data
curation over web text (Gopher: Rae et al. 2021 §A1.1; C4: Raffel et
al. 2020 §2.2) re-expressed as Catalyst expressions with exact DuckDB
oracle renderings (portable.py discipline: every metric is a pure
function of the input string computed identically in both dialects).

Scale shape (100 TB):
- gopher signals / line repetition / PII scrub / C4 clean: map-only,
  whole-stage-codegen, zero shuffles until a downstream aggregate.
  The line-duplication char fraction uses an array_sort + adjacent-
  equality scan, O(L log L) per row — NOT the naive O(L^2)
  count-each-line-in-list.
- top n-gram coverage: explode -> (doc, gram) count -> per-doc argmax
  via a single min(struct(-cnt, gram)) aggregate — two map-side-
  combinable shuffles, no window, no skew (grams are per-doc keys).
- domain cap: one shuffle on the domain key; rank cutoff via
  row_number. Skewed domains are bounded by the cutoff itself (state
  per domain is the cap, not the domain size) but the sort within a
  huge domain still pays — AQE skew-split applies (session default).

There is no fluent-bit analog (the reference has no corpus surface);
this is the LLM-pipeline axis of the task brief, sitting beside
textstats.py in the corpus_prep path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fluent_bit_spark.textprep import portable as P

# ------------------------------------------------------- lines array

WORDS_PER_LINE = 8


def spark_chunk_lines(text_col: str, wpl: int = WORDS_PER_LINE) -> str:
    """Pseudo-line array: whitespace tokens joined in chunks of
    ``wpl``. Harness for line-based ops over corpora with no
    newlines; real web text uses :func:`spark_newline_lines`."""
    tk = P.spark_tokens(text_col)
    return (
        f"transform(sequence(0, greatest(cast(ceil(size({tk})/{wpl}.0) as int)-1, 0)),"
        f" i -> array_join(slice({tk}, i*{wpl}+1, {wpl}), ' '))"
    )


def duck_chunk_lines(text_col: str, wpl: int = WORDS_PER_LINE) -> str:
    tk = P.duck_tokens(text_col)
    return (
        f"[array_to_string(list_slice({tk}, i*{wpl}+1, i*{wpl}+{wpl}), ' ') for i in "
        f"generate_series(0, greatest(cast(ceil(len({tk})/{wpl}.0) as int)-1, 0))]"
    )


def spark_newline_lines(text_col: str) -> str:
    return f"split({text_col}, '\\n')"


# --------------------------------------------- line repetition stats

def line_repetition_cols(df: DataFrame, lines_col: str = "lines") -> DataFrame:
    """Gopher-style line-duplication signals over a lines array:

    - n_lines
    - dup_line_frac: excess copies / total (1 - distinct/total)
    - dup_line_char_frac: chars in ANY line whose content occurs more
      than once, / total line chars.

    The char fraction sorts the array once and scans adjacent
    equality (O(L log L)), map-only.
    """
    sl = f"array_sort({lines_col})"
    dup_chars = (
        f"aggregate(sequence(1, size(_sl)), cast(0 as bigint), (acc, i) -> acc + "
        f"IF((i > 1 AND element_at(_sl, i) = element_at(_sl, i-1)) OR "
        f"(i < size(_sl) AND element_at(_sl, i) = element_at(_sl, i+1)), "
        f"length(element_at(_sl, i)), cast(0 as bigint)))"
    )
    tot_chars = (
        "aggregate(_sl, cast(0 as bigint), (acc, l) -> acc + length(l))"
    )
    return (
        df.withColumn("_sl", F.expr(sl))
        .withColumn("n_lines", F.expr(f"size({lines_col})").cast("bigint"))
        .withColumn(
            "dup_line_frac",
            F.expr(
                f"round(1.0 - cast(size(array_distinct({lines_col})) as double)"
                f" / greatest(size({lines_col}), 1), 6)"
            ),
        )
        .withColumn(
            "dup_line_char_frac",
            F.expr(
                f"round(cast({dup_chars} as double) / greatest({tot_chars}, 1), 6)"
            ),
        )
        .drop("_sl")
    )


def duck_line_repetition(lines: str) -> dict[str, str]:
    """DuckDB renderings of the three line_repetition_cols outputs,
    parameterized by a lines-array expression."""
    dup_chars = (
        "list_reduce(list_prepend(0::bigint, "
        "[i for i in generate_series(1, len(_sl))]), (acc, i) -> acc + "
        "CASE WHEN (i > 1 AND _sl[i] = _sl[i-1]) OR "
        "(i < len(_sl) AND _sl[i] = _sl[i+1]) "
        "THEN len(_sl[i])::bigint ELSE 0::bigint END)"
    )
    tot_chars = (
        "list_reduce(list_prepend(0::bigint, "
        "list_transform(_sl, l -> len(l)::bigint)), (acc, x) -> acc + x)"
    )
    return {
        "prelude": f"list_sort({lines}) AS _sl",
        "n_lines": f"len({lines})::bigint",
        "dup_line_frac": (
            f"round(1.0 - len(list_distinct({lines}))::double"
            f" / greatest(len({lines}), 1), 6)"
        ),
        "dup_line_char_frac": (
            f"round(({dup_chars})::double / greatest({tot_chars}, 1), 6)"
        ),
    }


# ------------------------------------------- in-doc line dedup (clean)

def dedup_lines_cols(df: DataFrame, lines_col: str = "lines") -> DataFrame:
    """Remove repeated lines WITHIN a document, keeping the first
    occurrence in order (the cleaning transform behind the
    line_repetition signals — Gopher-style paragraph dedup).

    Map-only; per-row cost is bounded by array_position's first-match
    scan (worst-case O(L^2) on pathological all-distinct docs, but
    the scan short-circuits at the first hit which for the common
    duplicate-heavy case is far below that).
    """
    kept = (
        f"filter({lines_col}, (l, i) -> "
        f"array_position({lines_col}, l) = i + 1)"
    )
    return (
        df.withColumn("_kept", F.expr(kept))
        .withColumn("n_lines_in", F.expr(f"size({lines_col})").cast("bigint"))
        .withColumn("n_lines_out", F.expr("size(_kept)").cast("bigint"))
        .withColumn("clean_text", F.expr("array_join(_kept, '\\n')"))
        .drop("_kept")
    )


def duck_dedup_lines(lines: str) -> dict[str, str]:
    # duck lambda index i is 1-based; Spark's is 0-based (hence i+1
    # above) — list_position/array_position are both first-match
    kept = f"list_filter({lines}, (l, i) -> list_position({lines}, l) = i)"
    return {
        "prelude": f"{kept} AS _kept",
        "n_lines_in": f"len({lines})::bigint",
        "n_lines_out": "len(_kept)::bigint",
        "clean_text": "coalesce(array_to_string(_kept, chr(10)), '')",
    }


# ------------------------------------------------ gopher word signals

GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_LEN = 3.0
GOPHER_MAX_MEAN_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_ALPHA_RATIO = 0.8


def gopher_quality_cols(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Word-level Gopher quality signals + the combined pass gate
    (word count / mean word length / symbol-word ratio / alpha-word
    ratio thresholds from the published rules). Map-only."""
    df = df.withColumn("_tk", F.expr(P.spark_tokens(text_col)))
    return (
        df.withColumn("n_words", F.expr("size(_tk)").cast("bigint"))
        .withColumn(
            "mean_word_len",
            F.expr(
                "round(aggregate(_tk, cast(0 as double), (a, t) -> a + length(t))"
                " / greatest(size(_tk), 1), 6)"
            ),
        )
        .withColumn(
            "symbol_word_ratio",
            F.expr(
                "round(cast(size(filter(_tk, t -> t like '%#%' OR t like '%...%'))"
                " as double) / greatest(size(_tk), 1), 6)"
            ),
        )
        .withColumn(
            "alpha_word_ratio",
            F.expr(
                "round(cast(size(filter(_tk, t -> t rlike '[A-Za-z]')) as double)"
                " / greatest(size(_tk), 1), 6)"
            ),
        )
        .withColumn(
            "gopher_pass",
            (F.col("n_words") >= GOPHER_MIN_WORDS)
            & (F.col("n_words") <= GOPHER_MAX_WORDS)
            & (F.col("mean_word_len") >= GOPHER_MIN_MEAN_LEN)
            & (F.col("mean_word_len") <= GOPHER_MAX_MEAN_LEN)
            & (F.col("symbol_word_ratio") <= GOPHER_MAX_SYMBOL_RATIO)
            & (F.col("alpha_word_ratio") >= GOPHER_MIN_ALPHA_RATIO),
        )
        .drop("_tk")
    )


def duck_gopher_quality(text_col: str) -> dict[str, str]:
    tk = P.duck_tokens(text_col)
    return {
        "prelude": f"{tk} AS _tk",
        "n_words": "len(_tk)::bigint",
        "mean_word_len": (
            "round(list_reduce(list_prepend(0.0, list_transform(_tk, "
            "t -> len(t)::double)), (a, x) -> a + x) / greatest(len(_tk), 1), 6)"
        ),
        "symbol_word_ratio": (
            "round(len(list_filter(_tk, t -> contains(t, '#') OR "
            "contains(t, '...')))::double / greatest(len(_tk), 1), 6)"
        ),
        "alpha_word_ratio": (
            "round(len(list_filter(_tk, t -> regexp_matches(t, '[A-Za-z]')))"
            "::double / greatest(len(_tk), 1), 6)"
        ),
        # the pass gate is composed over these (rounded) columns by the
        # caller's outer SELECT, mirroring gopher_quality_cols exactly
    }


# --------------------------------------------- top n-gram coverage

def top_ngram_coverage(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
) -> DataFrame:
    """Most frequent word n-gram per doc and the fraction of the
    document's characters it covers (occurrences * gram length /
    text length) — the Gopher top-n-gram repetition signal.

    Distributed shape: explode grams -> partial-agg count on
    (doc, gram) -> per-doc argmax via min(struct(-cnt, gram)) (count
    desc, gram asc tie-break). Two map-side-combinable shuffles; no
    window, no per-doc quadratic work.
    """
    tk = P.spark_tokens(text_col)
    grams = (
        f"transform(sequence(1, greatest(size(_tk)-{n - 1}, 1)),"
        f" i -> array_join(slice(_tk, i, {n}), ' '))"
    )
    exploded = (
        df.select(
            F.col(id_col),
            F.length(text_col).cast("bigint").alias("_len"),
            F.expr(tk).alias("_tk"),
        )
        .withColumn("gram", F.explode(F.expr(grams)))
        .drop("_tk")
    )
    counted = exploded.groupBy(id_col, "_len", "gram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    top = counted.groupBy(id_col, "_len").agg(
        F.min(F.struct((-F.col("cnt")).alias("neg"), F.col("gram"))).alias("_t")
    )
    return top.select(
        id_col,
        F.col("_t.gram").alias("top_gram"),
        (-F.col("_t.neg")).cast("bigint").alias("top_gram_count"),
        F.expr(
            "round(cast((0 - _t.neg) * length(_t.gram) as double)"
            " / greatest(_len, 1), 6)"
        ).alias("top_gram_char_frac"),
    )


# ------------------------------------------------------- domain cap

def domain_cap(
    df: DataFrame,
    domain_col: str = "source",
    id_col: str = "doc_id",
    max_per_domain: int = 10,
) -> DataFrame:
    """Keep at most N documents per domain (deterministic: lowest ids
    win). The standard crawl-balance step before training-corpus
    assembly. One shuffle on the domain key; output keeps the rank so
    downstream can re-cut cheaper."""
    w = Window.partitionBy(domain_col).orderBy(F.col(id_col))
    return (
        df.select(id_col, domain_col)
        .withColumn("domain_rank", F.row_number().over(w))
        .filter(F.col("domain_rank") <= max_per_domain)
    )


# ---------------------------------------------- corpus assembly ops

def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    n_per_stratum: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic pseudo-random N-per-stratum sample: rank rows
    within each stratum by h32(id) (hash order = stable shuffle; task
    retries and cluster size never change the sample) and keep the
    first N. One shuffle on the strata key."""
    h = f"{P.spark_h32(f'cast({id_col} as string)')}"
    w = Window.partitionBy(*strata_cols).orderBy(
        F.expr(h), F.col(id_col)
    )
    return (
        df.select(id_col, *strata_cols)
        .withColumn("sample_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("sample_rank") <= n_per_stratum)
    )


def token_budget_pack(
    df: DataFrame,
    budget: int,
    key_cols: list[str],
    token_col: str = "ws_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assemble a training mix under a per-key token budget: walk
    each key's documents in deterministic hash order, accumulate
    token counts, keep documents while the running total stays
    within budget. The standard dataset-assembly cut. One shuffle on
    the key; the cumulative sum is a running window frame (no
    per-key collect)."""
    h = f"{P.spark_h32(f'cast({id_col} as string)')}"
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.expr(h), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.select(id_col, *key_cols, token_col).withColumn(
        "cum_tokens", F.sum(token_col).over(w).cast("bigint")
    )
    return out.filter(F.col("cum_tokens") <= budget)


def sequence_pack(
    df: DataFrame,
    seq_len: int,
    key_cols: list[str],
    token_col: str = "ws_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy-concat packing of documents into fixed-length training
    sequences: walk each key's documents in deterministic hash order,
    concatenate token counts, and assign each document the sequence it
    STARTS in plus its offset there. ``straddles`` marks documents
    crossing a sequence boundary (a packer either splits them or pads —
    the flag is the decision input). One shuffle on the key; the
    cumulative sum is a running window frame."""
    h = f"{P.spark_h32(f'cast({id_col} as string)')}"
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.expr(h), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.select(id_col, *key_cols, token_col).withColumn(
        "cum_tokens", F.sum(token_col).over(w).cast("bigint")
    )
    start = F.col("cum_tokens") - F.col(token_col)
    # straddles <=> the doc's last token falls past its sequence's end;
    # phrased multiplicatively so no engine-specific negative-division
    # semantics are involved (empty docs have cum == start)
    return (
        out.withColumn("seq_id", F.floor(start / seq_len).cast("bigint"))
        .withColumn("seq_offset", (start % seq_len).cast("bigint"))
        .withColumn(
            "straddles",
            F.col("cum_tokens") > (F.col("seq_id") + 1) * seq_len,
        )
    )


def duck_sequence_pack(
    seq_len: int, key_cols: list[str], token_col: str = "ws_tokens",
    source: str = "documents",
) -> str:
    """DuckDB rendering of sequence_pack; ``source`` must expose
    (doc_id, key_cols, token_col)."""
    h = P.duck_h32("cast(doc_id as varchar)")
    keys = ", ".join(key_cols)
    return f"""
        WITH c AS (
          SELECT doc_id, {keys}, {token_col},
                 sum({token_col}) OVER (PARTITION BY {keys}
                     ORDER BY {h}, doc_id
                     ROWS UNBOUNDED PRECEDING)::bigint AS cum_tokens
          FROM {source}
        )
        SELECT doc_id, {keys}, {token_col}, cum_tokens,
               ((cum_tokens - {token_col}) // {seq_len})::bigint AS seq_id,
               ((cum_tokens - {token_col}) % {seq_len})::bigint AS seq_offset,
               cum_tokens > (((cum_tokens - {token_col}) // {seq_len}) + 1)
                 * {seq_len} AS straddles
        FROM c
    """


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fixed-token chunking with overlap (the RAG/embedding prep op):
    split each document's whitespace tokens into windows of
    ``chunk_tokens`` starting every ``chunk_tokens - overlap`` tokens.
    Emits (id, chunk_id, start_token, chunk_len, chunk_text); empty
    documents yield no chunks. Map-only — one generate + slice per
    row, zero shuffles, embarrassingly parallel at any corpus size."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    tk = P.spark_tokens(text_col)
    starts = f"sequence(1, greatest(size(_tk), 1), {step})"
    return (
        df.withColumn("_tk", F.expr(tk))
        .filter(F.expr("size(_tk) > 0"))
        .select(
            F.col(id_col),
            F.col("_tk"),
            F.posexplode(F.expr(starts)).alias("chunk_id", "start_token"),
        )
        .select(
            id_col,
            "chunk_id",
            F.col("start_token").cast("bigint").alias("start_token"),
            F.expr(f"size(slice(_tk, start_token, {chunk_tokens}))")
            .cast("bigint")
            .alias("chunk_len"),
            F.expr(
                f"array_join(slice(_tk, start_token, {chunk_tokens}), ' ')"
            ).alias("chunk_text"),
        )
    )


def duck_chunk_documents(
    chunk_tokens: int, overlap: int = 0, source: str = "documents"
) -> str:
    step = chunk_tokens - overlap
    tokens = P.duck_tokens("text")
    return f"""
        WITH t AS (SELECT doc_id, {tokens} AS _tk FROM {source}),
             s AS (
               SELECT doc_id, _tk,
                      unnest(generate_series(1, greatest(len(_tk), 1), {step}))
                        AS start_token
               FROM t WHERE len(_tk) > 0
             )
        SELECT doc_id,
               ((start_token - 1) // {step})::int AS chunk_id,
               start_token::bigint AS start_token,
               len(list_slice(_tk, start_token,
                   start_token + {chunk_tokens} - 1))::bigint AS chunk_len,
               array_to_string(list_slice(_tk, start_token,
                   start_token + {chunk_tokens} - 1), ' ') AS chunk_text
        FROM s
    """


def corpus_shuffle(
    df: DataFrame,
    n_shards: int = 16,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic training-order shuffle: every epoch-0 data loader
    wants the corpus in a pseudo-random but REPRODUCIBLE order, sharded
    for parallel readers. shuffle_key = h32(salt || id) gives the
    global order, shard = key mod n_shards routes the row, and
    shard_pos is its read position within the shard.

    Scale shape: ONE exchange on the shard key + a per-shard sort —
    exactly the plan of a range/hash-partitioned training-shard write
    (partitionBy(shard), sortWithinPartitions(shuffle_key)). Changing
    ``salt`` reshuffles between epochs without touching the data;
    cluster size never changes the order (pure hash of the id)."""
    h = P.spark_h32(f"concat('{salt}', cast({id_col} as string))")
    w = Window.partitionBy("shard").orderBy("shuffle_key", id_col)
    return (
        df.select(id_col)
        .withColumn("shuffle_key", F.expr(h))
        .withColumn("shard", F.pmod(F.col("shuffle_key"), F.lit(n_shards)).cast("bigint"))
        .withColumn("shard_pos", F.row_number().over(w).cast("bigint"))
    )


def duck_corpus_shuffle(
    n_shards: int = 16, salt: str = "", source: str = "documents"
) -> str:
    h = P.duck_h32(f"concat('{salt}', cast(doc_id as varchar))")
    return f"""
        WITH k AS (
          SELECT doc_id, {h} AS shuffle_key FROM {source}
        )
        SELECT doc_id, shuffle_key,
               (shuffle_key % {n_shards})::bigint AS shard,
               row_number() OVER (PARTITION BY shuffle_key % {n_shards}
                   ORDER BY shuffle_key, doc_id)::bigint AS shard_pos
        FROM k
    """


def corpus_split_cols(
    df: DataFrame,
    domain_col: str = "source",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Leakage-aware deterministic split assignment: the bucket is a
    hash of the DOMAIN, not the document, so near-duplicates within a
    domain can never straddle train/test (cross-domain near-dups are
    measured by split_leakage). Pure projection — no shuffle."""
    h = F.expr(P.spark_h32(domain_col)) % 100
    return df.withColumn(
        "split",
        F.when(h < train_pct, "train")
        .when(h < train_pct + val_pct, "val")
        .otherwise("test"),
    )


# -------------------------------------------------------- PII scrub

PII_PATTERNS: list[tuple[str, str, str]] = [
    # (name, regex, replacement) — RE2-safe (no lookaround), identical
    # semantics in Java regex and DuckDB RE2
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+[0-9][0-9()\- ]{6,14}[0-9]", "<PHONE>"),
]


def pii_scrub_cols(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace emails / IPv4s / intl phone numbers with typed tokens;
    emit per-kind match counts and the scrubbed text. Map-only, pure
    regexp (patterns applied in list order, so an email's host part
    is consumed before the IP rule can see it)."""
    out = df
    scrubbed = F.col(text_col)
    for name, rx, rep in PII_PATTERNS:
        out = out.withColumn(
            f"n_{name}",
            F.size(F.expr(f"regexp_extract_all({text_col}, r'{rx}', 0)")).cast(
                "bigint"
            ),
        )
        scrubbed = F.regexp_replace(scrubbed, rx, rep)
    return out.withColumn("scrubbed", scrubbed)


def duck_pii_scrub(text_col: str) -> dict[str, str]:
    exprs: dict[str, str] = {}
    scrubbed = text_col
    for name, rx, rep in PII_PATTERNS:
        exprs[f"n_{name}"] = (
            f"len(regexp_extract_all({text_col}, '{rx}'))::bigint"
        )
        scrubbed = f"regexp_replace({scrubbed}, '{rx}', '{rep}', 'g')"
    exprs["scrubbed"] = scrubbed
    return exprs


# -------------------------------------------- benchmark decontamination

def benchmark_ngram_overlap(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Training-set decontamination: flag documents sharing any word
    n-gram with a benchmark/eval corpus (the published PaLM/GPT-3
    13-gram-overlap method, parameterized n).

    Distributed shape: both sides hash their distinct n-grams to
    int64 (h32, portable) — the doc side explodes to (doc, hash) and
    inner-joins the BROADCAST benchmark hash set, so the 100 TB side
    never shuffles until the final per-doc count (which only carries
    matching rows, normally a tiny fraction). Emits (doc_id, n_hits =
    distinct contaminated grams); clean docs are absent (inner join).
    """
    tk = P.spark_tokens(text_col)
    gram = f"array_join(slice(_tk, i, {n}), ' ')"
    gexpr = (
        f"array_distinct(transform(sequence(1, greatest(size(_tk)-{n - 1}, 1)),"
        f" i -> {P.spark_h32(gram)}))"
    )
    doc_g = (
        docs.withColumn("_tk", F.expr(tk))
        .select(F.col(id_col), F.explode(F.expr(gexpr)).alias("gh"))
    )
    bench_g = (
        bench.withColumn("_tk", F.expr(tk))
        .select(F.explode(F.expr(gexpr)).alias("gh"))
        .distinct()
    )
    return (
        doc_g.join(F.broadcast(bench_g), "gh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def _bloom_bitset(bench_g: DataFrame, n_bits: int, n_hashes: int) -> list[int]:
    """Build a Bloom bitset over the benchmark gram hashes with public
    DataFrame ops (Spark registers no SQL-level ``bloom_filter_agg``):
    explode k double-hashed bit positions per gram, OR them into 64-bit
    words distributedly, and collect only the bitset — n_bits/64 longs
    (16 KB at the default 2^17 bits), never the gram set itself."""
    if n_bits % 64:
        # a ragged final word would map tail positions past the array
        # (probe element_at -> NULL -> silently-false membership)
        raise ValueError("n_bits must be a multiple of 64")
    m = n_bits
    pos = (
        bench_g.select(
            F.pmod(F.xxhash64("gh"), F.lit(m)).alias("h1"),
            F.pmod(F.xxhash64("gh", F.lit(7)), F.lit(m)).alias("h2"),
        )
        .select(
            F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("j"),
            "h1",
            "h2",
        )
        .select(
            F.pmod(F.col("h1") + F.col("j") * F.col("h2"), F.lit(m)).alias("pos")
        )
    )
    rows = (
        pos.select(
            (F.col("pos") / 64).cast("int").alias("w"),
            F.expr("shiftleft(1L, cast(pos % 64 as int))").alias("b"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(b)").alias("bits"))
        .collect()
    )
    words = [0] * (m // 64)
    for r in rows:
        words[r["w"]] = r["bits"]
    return words


def benchmark_ngram_overlap_bloom(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bits: int = 1 << 17,
    n_hashes: int = 5,
) -> DataFrame:
    """``benchmark_ngram_overlap`` with a Bloom prefilter — the shape
    Spark's own runtime-bloom-filter join uses, built here from public
    ops so the 100 TB side short-circuits before any join.

    The bitset (n_bits/64 longs; 16 KB default) rides into every task
    as a plan literal; the gram stream drops clean rows with k
    pure-codegen bit probes, and only Bloom candidates (true hits +
    ~(1-e^(-kn/m))^k false positives, ~0.3% at the defaults for a
    10k-gram eval set) reach the exact broadcast confirm, so the
    RESULT is exactly ``benchmark_ngram_overlap`` — false positives
    never survive, and the same DuckDB oracle applies verbatim.

    When it pays (measured at sf0.1, 236k gram rows): the probe
    filter and a broadcast-hash probe cost the same per row (0.76s vs
    0.83s for the bare stages), and the bitset build adds two fixed
    jobs — so at toy scale this is parity-to-slower than the exact
    path. The win is FOOTPRINT and reach: every task carries 16 KB
    regardless of eval-set size (the exact path builds the full gram
    hash relation in every task), so the prefilter is what keeps the
    shape viable when the eval set outgrows a comfortable broadcast —
    and the confirm join it feeds only sees the ~0.3% candidate
    stream, which can then afford a shuffle join if broadcast is off
    the table entirely.
    """
    tk = P.spark_tokens(text_col)
    gram = f"array_join(slice(_tk, i, {n}), ' ')"
    gexpr = (
        f"array_distinct(transform(sequence(1, greatest(size(_tk)-{n - 1}, 1)),"
        f" i -> {P.spark_h32(gram)}))"
    )
    bench_g = (
        bench.withColumn("_tk", F.expr(tk))
        .select(F.explode(F.expr(gexpr)).alias("gh"))
        .distinct()
    )
    words = _bloom_bitset(bench_g, n_bits, n_hashes)
    arr = "array({})".format(",".join(f"{w}L" for w in words))
    # k UNROLLED codegen probes (Catalyst higher-order lambdas are
    # interpreted per element — the repo's measured ~150ns/eval trap;
    # plain AND terms stay inside whole-stage codegen). h1/h2 are
    # bound columns, computed once; the array literals constant-fold.
    probe = " AND ".join(
        f"((shiftright(element_at({arr}, "
        f"cast(pmod(_h1 + {j} * _h2, {n_bits}) / 64 as int) + 1), "
        f"cast(pmod(_h1 + {j} * _h2, {n_bits}) % 64 as int)) & 1L) = 1L)"
        for j in range(n_hashes)
    )
    doc_g = (
        docs.withColumn("_tk", F.expr(tk))
        .select(F.col(id_col), F.explode(F.expr(gexpr)).alias("gh"))
        .withColumn("_h1", F.pmod(F.xxhash64("gh"), F.lit(n_bits)))
        .withColumn("_h2", F.pmod(F.xxhash64("gh", F.lit(7)), F.lit(n_bits)))
        .filter(F.expr(probe))
        .drop("_h1", "_h2")
    )
    return (
        doc_g.join(F.broadcast(bench_g), "gh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def duck_ngram_hash_list(n: int = 8) -> str:
    """Distinct word-n-gram h32 hashes over a bound ``_tk`` token
    array, identical to the Spark side's gexpr."""
    gram = f"array_to_string(list_slice(_tk, i, i+{n - 1}), ' ')"
    return (
        f"list_distinct([{P.duck_h32(gram)} for i in "
        f"generate_series(1, greatest(len(_tk)-{n - 1}, 1))])"
    )


# ------------------------------------------------- C4 line cleaning

C4_MIN_WORDS_PER_LINE = 3
C4_MIN_KEPT_LINES = 3
C4_BANNED_SUBSTRINGS = ["lorem ipsum", "{", "javascript"]


def c4_clean_cols(df: DataFrame, lines_col: str = "lines") -> DataFrame:
    """C4-style cleaning over a lines array: keep lines that end in
    terminal punctuation and have >= 3 words; a doc survives if >= 3
    lines remain and no banned substring appears anywhere. Emits the
    cleaned text, kept-line count, and the keep flag. Map-only."""
    kept = (
        f"filter({lines_col}, l -> "
        f"l rlike '[.!?\"]$' AND size(split(l, ' ')) >= {C4_MIN_WORDS_PER_LINE}"
        f" AND NOT contains(lower(l), 'javascript'))"
    )
    banned = " OR ".join(
        f"contains(lower(array_join({lines_col}, '\\n')), '{s}')"
        for s in C4_BANNED_SUBSTRINGS
    )
    return (
        df.withColumn("_kept", F.expr(kept))
        .withColumn("n_kept_lines", F.expr("size(_kept)").cast("bigint"))
        .withColumn("clean_text", F.expr("array_join(_kept, '\\n')"))
        .withColumn(
            "c4_keep",
            F.expr(
                f"size(_kept) >= {C4_MIN_KEPT_LINES} AND NOT ({banned})"
            ),
        )
        .drop("_kept")
    )


def duck_c4_clean(lines: str) -> dict[str, str]:
    kept = (
        f"list_filter({lines}, l -> regexp_matches(l, '[.!?\"]$') AND "
        f"len(string_split(l, ' ')) >= {C4_MIN_WORDS_PER_LINE} AND "
        f"NOT contains(lower(l), 'javascript'))"
    )
    banned = " OR ".join(
        f"contains(lower(array_to_string({lines}, chr(10))), '{s}')"
        for s in C4_BANNED_SUBSTRINGS
    )
    return {
        "prelude": f"{kept} AS _kept",
        "n_kept_lines": "len(_kept)::bigint",
        # duck array_to_string([]) is NULL; Spark array_join([]) is ''
        "clean_text": "coalesce(array_to_string(_kept, chr(10)), '')",
        "c4_keep": f"len(_kept) >= {C4_MIN_KEPT_LINES} AND NOT ({banned})",
    }
