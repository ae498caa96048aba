"""Deduplication operators for web-scale training-data pipelines.

Five families, all DataFrame->DataFrame and shuffle-minimal:

- exact_dedup: hash-groupBy on md5(text). One shuffle on the digest;
  map-side partial aggregation means the shuffle carries one row per
  distinct digest per partition, not per input row.
- ngram_jaccard_pairs: *exact* all-pairs n-gram Jaccard within a
  blocking column (e.g. lang). Quadratic within block -- the
  correctness oracle for the approximate paths; at 100 TB use
  minhash_lsh_pairs instead.
- minhash_lsh_pairs: shingle -> minhash signature -> banded LSH
  buckets -> candidate pairs -> exact-Jaccard verify. The self-join
  runs on (band_idx, band_key) buckets, so work is proportional to
  colliding candidates only; hot buckets are bounded by
  ``max_bucket`` (drop pathological buckets, standard at CC scale).
- simhash_col: 32-bit SimHash column; near-dups = small Hamming
  distance, found by exact-prefix buckets or pair join downstream.
- embedding_neardup_pairs: cosine >= threshold over an embedding
  column, LSH/blocked by sign-bits if needed (see simsearch.py).

All primitives come from textprep.portable so the DuckDB oracle can
replicate results exactly. No Python UDFs anywhere — pure Catalyst.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fluent_bit_spark import cache
from fluent_bit_spark.textprep import portable as P

# ---- Arrow-vectorized inner loops -----------------------------------
# The shingle/token hashing stays JVM-side (one codegen pass, md5 per
# element); the K-way minhash / 32-bit simhash inner products run as
# numpy over Arrow batches. Catalyst higher-order-function lambdas are
# interpreted per element, so the S*K minhash loop costs ~150ns/eval
# there; numpy does the identical int64 math ~100x faster. Results are
# bit-identical to the portable SQL forms (same constants, same
# overflow-free ranges), so the DuckDB oracles still match.

_MH_A = np.array(P.MINHASH_A, dtype=np.int64)[:, None]
_MH_B = np.array(P.MINHASH_B, dtype=np.int64)[:, None]
_EMPTY_I64 = np.empty(0, dtype=np.int64)


def _clean_hashes(hs: object) -> np.ndarray:
    if hs is None:
        return _EMPTY_I64
    a = np.asarray(hs)
    if a.dtype.kind == "f":  # nulls inside the list promote to float/NaN
        a = a[~np.isnan(a)]
        return a.astype(np.int64)
    return a.astype(np.int64, copy=False)


@F.pandas_udf(T.ArrayType(T.LongType()))
def _minhash_arrow(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
    K = len(P.MINHASH_A)
    null_sig = [None] * K  # matches the SQL path: array_min(null/[]) -> null
    for s in it:
        # whole-batch vectorization: flatten all rows' hash arrays,
        # one (K, total) universal-hash pass, segment-min per row —
        # no per-row numpy-call overhead. Null/empty shingle rows get a
        # null signature up front: np.asarray(None) raises, and a
        # zero-length segment makes reduceat read the NEXT segment's
        # value (silently wrong) or IndexError on a trailing empty.
        # a null TEXT row arrives as hs=[None] (Arrow: float array with
        # NaN) — drop null elements like Spark's array_min does; all-null
        # -> zero-length -> null signature. Shingle hashes are < 2^32 so
        # the float64 round-trip is exact.
        arrs = [_clean_hashes(hs) for hs in s]
        lens = np.fromiter((a.size for a in arrs), dtype=np.int64, count=len(arrs))
        if len(arrs) == 0 or lens.sum() == 0:
            yield pd.Series([null_sig for _ in arrs])
            continue
        flat = np.concatenate(arrs)
        # a*h < 2^60: no int64 overflow, matches SQL semantics
        vals = (_MH_A * flat[None, :] + _MH_B) % P.P53
        ne_lens = lens[lens > 0]
        starts = np.zeros(len(ne_lens), dtype=np.int64)
        np.cumsum(ne_lens[:-1], out=starts[1:])
        mins = np.minimum.reduceat(vals, starts, axis=1)  # (K, n_nonempty)
        out: list[list[int] | list[None]] = []
        j = 0
        for n in lens:
            if n:
                out.append(mins[:, j].tolist())
                j += 1
            else:
                out.append(null_sig)
        yield pd.Series(out)


_BITS = np.arange(32, dtype=np.int64)[None, :]
_POW2 = (1 << np.arange(32, dtype=np.int64))


@F.pandas_udf(T.LongType())
def _simhash_arrow(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
    for s in it:
        out = []
        for th in s:
            h = np.asarray(th, dtype=np.int64)
            if h.size == 0:
                # zero tokens: every bit-sum is 0 -> all bits set
                # (>= 0 tie rule), same as the SQL form
                out.append(int(_POW2.sum()))
                continue
            bits = (h[:, None] >> _BITS) & 1
            sums = np.where(bits == 1, 1, -1).sum(axis=0)
            out.append(int(_POW2[sums >= 0].sum()))
        yield pd.Series(out)


def ensure_parallelism(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition iff the input is under-parallel (e.g. one small
    parquet file -> one task would serialize the whole operator). At
    scale inputs are already wide and this is a no-op — the check is
    metadata-only, no job runs."""
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One surviving row (min id) per distinct text, with dup count.

    Output: (keep_id, n_dups, digest) — survivor selection is
    deterministic so retries/cluster size don't change the sample.
    """
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("digest"))
        .groupBy("digest")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
        .select("keep_id", "n_dups", "digest")
    )


def shingle_hashes(
    df: DataFrame, text_col: str = "text", n: int = P.SHINGLE_N
) -> DataFrame:
    """Adds ``hs``: distinct hashed char n-gram shingles of text."""
    return df.withColumn(
        "hs", F.expr(P.spark_hash_array(P.spark_shingles(text_col, n)))
    )


def guard_quadratic(
    df: DataFrame, what: str, scale_sibling: str, max_rows: int, force: bool
) -> None:
    """Refuse to build an exact-quadratic baseline plan over a large
    input (a 10^9-row DataFrame passed by accident would be a ~10^18
    pair job). The probe is ``limit(max_rows+1).count()`` — early-out,
    never a full scan — and runs once at operator construction, the
    same bounded-job budget as the Bloom bitset guard in
    webfilters.benchmark_ngram_overlap_bloom. ``force=True`` skips it
    (the caller is asserting the input is a verification-scale
    sample)."""
    if force:
        return
    n = df.limit(max_rows + 1).count()
    if n > max_rows:
        raise ValueError(
            f"{what}: input exceeds {max_rows} rows; this is the exact "
            f"quadratic verification baseline — use {scale_sibling} at "
            "scale, or pass force=True for a deliberate exact run"
        )


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str | None = "lang",
    n: int = P.SHINGLE_N,
    max_rows: int = 100_000,
    force: bool = False,
) -> DataFrame:
    """Exact n-gram Jaccard similar pairs (id_a < id_b, jacc rounded 6).

    Quadratic within each block — the exact baseline (guarded by
    ``max_rows``/``force``; minhash_lsh_pairs is the scale path).
    Blocks shuffle once on block_col; within a block Spark
    broadcast/SMJ handles the self-join.
    """
    guard_quadratic(
        df, "ngram_jaccard_pairs", "minhash_lsh_pairs", max_rows, force
    )
    cols = [F.col(id_col).alias("id"), F.col("hs")]
    if block_col:
        cols.append(F.col(block_col).alias("blk"))
    else:
        cols.append(F.lit(0).alias("blk"))
    s = cache.track(
        shingle_hashes(ensure_parallelism(df), text_col, n).select(*cols)
    )
    id_type = s.schema["id"].dataType.simpleString()

    # phase 1: per-block EXACT intersection counts in numpy. Each
    # block builds a dictionary of its distinct gram hashes and a 0/1
    # doc x gram bit matrix, chunked along the gram axis so memory is
    # bounded; one float32 matmul per chunk accumulates pairwise
    # intersection counts (integers <= shingles/doc, exact in
    # float32). Catalyst's array_intersect/array_union are set-
    # semantic, so unique-hash counts replicate them exactly:
    # U = |set(a)| + |set(b)| - I. Pairs are pre-filtered at
    # threshold - 1e-6 (round(.,6) can lift a value by at most 5e-7;
    # the exact-integer division is correctly rounded to ~1e-16), so
    # no pair the naive plan would emit can be dropped.
    _CHUNK_COLS = 16384

    def screen(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["id"].values
        nrows = len(ids)
        empty = pd.DataFrame(
            {
                "id_a": ids[:0],
                "id_b": ids[:0],
                "inter": np.zeros(0, np.int64),
                "sa": np.zeros(0, np.int64),
                "sb": np.zeros(0, np.int64),
            }
        )
        if nrows < 2:
            return empty
        uniq = [np.unique(np.asarray(hs, dtype=np.int64)) for hs in pdf["hs"].values]
        sizes = np.array([len(u) for u in uniq], dtype=np.int64)
        vocab = np.unique(np.concatenate(uniq)) if len(uniq) else np.zeros(0, np.int64)
        rows = np.repeat(np.arange(nrows), sizes)
        cols = np.searchsorted(vocab, np.concatenate(uniq))
        inter = np.zeros((nrows, nrows), dtype=np.float32)
        for lo in range(0, len(vocab), _CHUNK_COLS):
            hi = min(lo + _CHUNK_COLS, len(vocab))
            m = (cols >= lo) & (cols < hi)
            bits = np.zeros((nrows, hi - lo), dtype=np.float32)
            bits[rows[m], cols[m] - lo] = 1.0
            inter += bits @ bits.T
        inter_i = inter.astype(np.int64)
        union = sizes[:, None] + sizes[None, :] - inter_i
        jacc = inter_i / union  # union >= 1: every doc has >= 1 shingle
        keep = (jacc >= threshold - 1e-6) & (ids[:, None] < ids[None, :])
        ai, bi = np.nonzero(keep)
        if not len(ai):
            return empty
        return pd.DataFrame(
            {
                "id_a": ids[ai],
                "id_b": ids[bi],
                "inter": inter_i[ai, bi],
                "sa": sizes[ai],
                "sb": sizes[bi],
            }
        )

    cand = s.groupBy("blk").applyInPandas(
        screen,
        schema=f"id_a {id_type}, id_b {id_type}, inter long, sa long, sb long",
    )

    # phase 2: the rounded value itself comes from Catalyst (scalar
    # codegen round/divide — same HALF_UP semantics as the naive
    # array_intersect/array_union expression, which these exact
    # integer counts reproduce by construction)
    pairs = cand.select(
        "id_a",
        "id_b",
        F.expr(
            "round(cast(inter as double) / (sa + sb - inter), 6)"
        ).alias("jacc"),
    )
    return pairs.filter(F.col("jacc") >= threshold)


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    engine: str = "arrow",
) -> DataFrame:
    """(id, hs, sig): MinHash signature per document.

    engine='arrow' (default): numpy inner loop over Arrow batches —
    the 100 TB path. engine='sql': pure-Catalyst portable form (same
    values, used to cross-check the oracle rendering).
    """
    s = shingle_hashes(ensure_parallelism(df), text_col).select(
        F.col(id_col).alias("id"), "hs"
    )
    if engine == "arrow":
        return s.withColumn("sig", _minhash_arrow(F.col("hs")))
    return s.withColumn("sig", F.expr(P.spark_minhash_sig("hs")))


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int = 1000,
    est_margin: float | None = None,
) -> DataFrame:
    """MinHash+LSH near-dup pairs, exact-Jaccard verified.

    Plan shape (the 100 TB path):
      1. signature per doc (narrow, codegen) — persisted: bands, the
         bucket-size guard, and both sides of the verify join all
         reuse it, and recomputing would re-shingle the raw text 4x
         (at scale: persist/write the signature table once, ~1% the
         size of the corpus, and run LSH off it)
      2. explode band keys -> shuffle on (band, key) buckets
      3. pairs within buckets (skew-guarded by max_bucket)
      4. distinct candidate pairs -> join back shingles -> exact jacc

    ``est_margin``: signature-estimate fast path. The fraction of
    agreeing MinHash components is an unbiased Jaccard estimate
    (E[est] = J, the MinHash property); with it set, pairs with
    est >= threshold + margin are accepted and pairs with est <=
    threshold - margin rejected on the 32-long signatures alone —
    only the borderline band joins back the (much wider) shingle
    arrays for the exact intersection. Deterministic (same sigs ->
    same decisions); the documented trade is that far-band decisions
    carry MinHash estimation error (sd ~ sqrt(J(1-J)/32)) instead of
    exact Jaccard. ``jacc`` holds the estimate for fast-accepted
    pairs and the exact value for borderline-verified ones.
    """
    sigs = cache.track(minhash_signatures(df, text_col, id_col))
    bands = sigs.select(
        "id",
        F.posexplode(F.expr(P.spark_band_keys("sig"))).alias("band", "bkey"),
    )
    # ONE shuffle: group each bucket, expand pairs from the collected
    # id list (a self-join would shuffle bands twice and re-shuffle
    # for the join); the size guard doubles as the skew guard —
    # pathological buckets (empty-text clusters) are dropped, everything
    # else expands at most max_bucket^2/2 pairs inside its own task
    buckets = (
        bands.groupBy("band", "bkey")
        .agg(F.sort_array(F.collect_set("id")).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= max_bucket))
    )
    cand = (
        buckets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) -> "
                    "transform(slice(ids, i + 2, size(ids) - i - 1), "
                    "y -> struct(x as id_a, y as id_b))))"
                )
            ).alias("p")
        )
        .select("p.id_a", "p.id_b")
        .distinct()
    )
    # candidate rows are tiny in bytes but expensive to verify (set
    # intersection over ~hundreds of shingles each); AQE would coalesce
    # the 1-MB shuffle onto one task — spread the compute explicitly
    cand = cand.repartition(
        df.sparkSession.sparkContext.defaultParallelism, "id_a", "id_b"
    )
    sh = sigs.select("id", "hs")

    def exact_verify(pairs: DataFrame) -> DataFrame:
        return (
            pairs.join(sh.alias("sa"), F.col("id_a") == F.col("sa.id"))
            .join(sh.alias("sb"), F.col("id_b") == F.col("sb.id"))
            .select(
                "id_a",
                "id_b",
                F.expr(
                    "round(cast(size(array_intersect(sa.hs, sb.hs)) as double)"
                    " / size(array_union(sa.hs, sb.hs)), 6)"
                ).alias("jacc"),
            )
            .filter(F.col("jacc") >= threshold)
        )

    if est_margin is None:
        return exact_verify(cand)

    # signature-estimate triage: sigs are 32 longs vs hundreds of
    # shingle hashes, so the far bands never touch the wide arrays
    sg = sigs.select("id", "sig")
    scored = (
        cand.join(sg.alias("qa"), F.col("id_a") == F.col("qa.id"))
        .join(sg.alias("qb"), F.col("id_b") == F.col("qb.id"))
        .select(
            "id_a",
            "id_b",
            # UNROLLED component-agreement count: zip_with/filter is an
            # interpreted higher-order lambda evaluated per candidate
            # pair (measured 4.1s vs 1.8s for the whole query at sf0.1);
            # 32 element_at equality terms stay in whole-stage codegen.
            # Same arithmetic -> same est -> same oracle decisions.
            F.expr(
                "("
                + " + ".join(
                    f"(CASE WHEN element_at(qa.sig, {i + 1}) = "
                    f"element_at(qb.sig, {i + 1}) THEN 1 ELSE 0 END)"
                    for i in range(P.N_HASHES)
                )
                + f") / {P.N_HASHES}.0"
            ).alias("est"),
        )
    )
    # both triage branches read this; without persist the whole
    # bucket->candidate pipeline would run twice (24B/row — cheap)
    scored = cache.track(scored)
    hi = threshold + est_margin
    lo = threshold - est_margin
    fast = scored.filter(F.col("est") >= hi).select(
        "id_a", "id_b", F.round("est", 6).alias("jacc")
    )
    border = scored.filter((F.col("est") > lo) & (F.col("est") < hi)).select(
        "id_a", "id_b"
    )
    return fast.unionByName(exact_verify(border))


def simhash_col(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "simhash",
    engine: str = "arrow",
) -> DataFrame:
    """32-bit SimHash of whitespace tokens (portable.spark_simhash
    semantics; engine='arrow' runs the bit-count inner loop in numpy)."""
    th = P.spark_hash_array(P.spark_tokens(text_col))
    df = ensure_parallelism(df).withColumn("_th", F.expr(th))
    if engine == "arrow":
        return df.withColumn(out_col, _simhash_arrow(F.col("_th"))).drop("_th")
    return df.withColumn(out_col, F.expr(P.spark_simhash("_th"))).drop("_th")


def embedding_neardup_lsh(
    df: DataFrame,
    threshold: float,
    n_planes: int = 12,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
    n_tables: int = 1,
    max_bucket: int = 1000,
) -> DataFrame:
    """LSH-bucketed cosine near-dup pairs — the 100 TB path for
    embedding dedup: random-hyperplane sign buckets (deterministic
    planes), pairs only within a bucket, exact-cosine verified.

    Plan shape mirrors minhash_lsh_pairs: (id, vector) persisted once;
    one shuffle on (table, bucket) carrying ids only (the aggregation
    row holds at most ``max_bucket`` longs, never vectors); distinct
    candidate pairs joined back to the vector table for the exact
    verify. ``max_bucket`` is the skew/OOM guard — a degenerate bucket
    (e.g. all-zero embeddings) is dropped instead of expanding
    quadratically inside one task. Pass ``dim`` at scale to avoid the
    driver-side first() probe.

    Recall note: same-bucket requires agreeing on ALL n_planes signs;
    P(agree) = (1 - theta/pi)^n_planes per table. ``n_tables``
    independent plane sets (disjoint via hyperplanes offset) are
    OR-combined — recall = 1 - (1 - p)^n_tables — the standard
    recall/cost dial; the exact brute-force form
    (embedding_neardup_pairs) is the recall oracle.
    """
    from fluent_bit_spark.textprep.simsearch import (
        _infer_dim,
        bucket_udf,
        hyperplanes,
    )

    dim = _infer_dim(df, vec_col, dim)
    s = cache.track(df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")))
    table_buckets = F.array(
        *[
            bucket_udf(hyperplanes(dim, n_planes, offset=t * n_planes))(F.col("v"))
            for t in range(n_tables)
        ]
    )
    bucketed = s.select(
        "id", F.posexplode(table_buckets).alias("tbl", "bucket")
    )
    buckets = (
        bucketed.groupBy("tbl", "bucket")
        .agg(F.sort_array(F.collect_set("id")).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= max_bucket))
    )
    cand = (
        buckets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) -> "
                    "transform(slice(ids, i + 2, size(ids) - i - 1), "
                    "y -> struct(x as id_a, y as id_b))))"
                )
            ).alias("p")
        )
        .select("p.id_a", "p.id_b")
        .distinct()
    )
    # tiny-bytes / heavy-compute stage: spread the exact-cosine verify
    # explicitly so AQE doesn't coalesce it onto one task
    cand = cand.repartition(
        df.sparkSession.sparkContext.defaultParallelism, "id_a", "id_b"
    )
    id_type = s.schema["id"].dataType.simpleString()
    joined = (
        cand.join(s.alias("sa"), F.col("id_a") == F.col("sa.id"))
        .join(s.alias("sb"), F.col("id_b") == F.col("sb.id"))
        .select(
            "id_a", "id_b", F.col("sa.v").alias("va"), F.col("sb.v").alias("vb")
        )
    )

    # exact verify, numpy over Arrow: per-pair dot and norms use the
    # SAME sequential left-fold IEEE order as the interpreted
    # cosine_expr (cumsum prefix — see simsearch._seq_dots), and the
    # zero-norm CASE maps to cos := 0, so the unrounded values are
    # bit-identical; only round(.,6) (HALF_UP) stays in Catalyst.
    # Fully distributed — no broadcast, no driver collect: this is
    # the 100 TB verify.
    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from fluent_bit_spark.textprep.simsearch import _vec_mat

        for pdf in batches:
            A, _ = _vec_mat(pdf["va"], dim)
            B, _ = _vec_mat(pdf["vb"], dim)
            dot = np.cumsum(A * B, axis=1)[:, -1]
            na = np.cumsum(A * A, axis=1)[:, -1]
            nb = np.cumsum(B * B, axis=1)[:, -1]
            denom = na * nb
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = np.where(denom == 0, 0.0, dot / np.sqrt(denom))
            yield pd.DataFrame(
                {"id_a": pdf["id_a"], "id_b": pdf["id_b"], "cos": cos}
            )

    verified = joined.mapInPandas(
        verify, schema=f"id_a {id_type}, id_b {id_type}, cos double"
    ).select("id_a", "id_b", F.expr("round(cos, 6)").alias("cos"))
    return verified.filter(F.col("cos") >= threshold)


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_rows: int = 100_000,
    force: bool = False,
    screen_margin: float = 1e-4,
) -> DataFrame:
    """Exact cosine near-dup pairs over an embedding column.

    All-pairs recall — correctness baseline (guarded by
    ``max_rows``/``force``); the LSH-bucketed scale path lives in
    simsearch.lsh_buckets (block by hyperplane sign bits, then pair
    within buckets).

    Two-phase plan: a numpy matmul over Arrow batches screens the
    N x N cosine matrix against ``threshold - screen_margin`` (the
    full vector table, bounded by the quadratic guard, rides along as
    a broadcast variable — <= max_rows * dim * 8 bytes), and only the
    surviving candidate pairs pay the exact interpreted-expression
    verify. The reported ``cos`` values come from the SAME sequential
    left-fold Catalyst expression as the naive all-pairs join, so the
    oracle contract is untouched: float64 matmul error on unit-scale
    vectors is ~dim * 2^-53, ~9 orders of magnitude inside the screen
    margin, so no true pair can be screened out. Cuts the per-pair
    zip_with/aggregate interpretation (the old plan's entire cost)
    down to the few pairs that actually pass.
    """
    guard_quadratic(
        df, "embedding_neardup_pairs", "embedding_neardup_lsh", max_rows, force
    )
    from fluent_bit_spark.textprep.simsearch import _infer_dim, _vec_mat

    dim = _infer_dim(df, vec_col, None)
    s = cache.track(
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    )
    id_type = s.schema["id"].dataType.simpleString()

    # phase 1: candidate screen. Bounded driver collect (same budget
    # as the guard probe above); broadcast the matrix once, stream the
    # row side through Arrow so each task screens its slab vs all.
    all_rows = s.collect()
    all_ids = np.asarray([r["id"] for r in all_rows])
    mat_all, valid_all = _vec_mat(pd.Series([r["v"] for r in all_rows]), dim)
    norms_all = np.sqrt(np.einsum("ij,ij->i", mat_all, mat_all))
    bc = df.sparkSession.sparkContext.broadcast(
        (all_ids, mat_all, norms_all, valid_all)
    )
    cut = threshold - screen_margin

    def screen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_b, mat_b, norms_b, valid_b = bc.value
        denom_b = np.where(norms_b == 0, 1.0, norms_b)
        for pdf in batches:
            mat_a, valid_a = _vec_mat(pdf["v"], dim)
            norms_a = np.sqrt(np.einsum("ij,ij->i", mat_a, mat_a))
            denom_a = np.where(norms_a == 0, 1.0, norms_a)
            cos = (mat_a @ mat_b.T) / denom_a[:, None] / denom_b[None, :]
            ids_a = pdf["id"].values
            # id_a < id_b halves the matrix; invalid/zero-norm rows
            # never become candidates (the naive plan would NULL or
            # divide-by-zero them out of the >= filter anyway)
            keep = (
                (cos >= cut)
                & (ids_a[:, None] < ids_b[None, :])
                & valid_a[:, None]
                & valid_b[None, :]
                & (norms_a[:, None] > 0)
                & (norms_b[None, :] > 0)
            )
            ai, bi = np.nonzero(keep)
            yield pd.DataFrame({"id_a": ids_a[ai], "id_b": ids_b[bi]})

    cand = s.mapInPandas(screen, schema=f"id_a {id_type}, id_b {id_type}")

    # phase 2: exact verify — byte-identical expression to the naive
    # all-pairs form, evaluated only on screened candidates
    dot = (
        "aggregate(zip_with(a.v, b.v, (x, y) -> cast(x as double)*cast(y as double)),"
        " cast(0 as double), (acc, z) -> acc + z)"
    )
    na = "aggregate(a.v, cast(0 as double), (acc, x) -> acc + cast(x as double)*cast(x as double))"
    nb = "aggregate(b.v, cast(0 as double), (acc, x) -> acc + cast(x as double)*cast(x as double))"
    pairs = (
        cand.join(s.alias("a"), F.col("id_a") == F.col("a.id"))
        .join(s.alias("b"), F.col("id_b") == F.col("b.id"))
        .select(
            "id_a",
            "id_b",
            F.expr(f"round(({dot}) / sqrt(({na}) * ({nb})), 6)").alias("cos"),
        )
    )
    return pairs.filter(F.col("cos") >= threshold)
