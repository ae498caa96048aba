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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fluent_bit_spark.textprep import portable as P


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


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str | None = "lang",
    n: int = P.SHINGLE_N,
) -> DataFrame:
    """Exact n-gram Jaccard similar pairs (id_a < id_b, jacc rounded 6).

    Quadratic within each block — the exact baseline. Blocks shuffle
    once on block_col; within a block Spark broadcast/SMJ handles the
    self-join.
    """
    cols = [F.col(id_col).alias("id"), F.col("hs")]
    if block_col:
        cols.append(F.col(block_col).alias("blk"))
    s = shingle_hashes(df, text_col, n).select(*cols)
    a = s.alias("a")
    b = s.alias("b")
    cond = F.col("a.id") < F.col("b.id")
    if block_col:
        cond = cond & (F.col("a.blk") == F.col("b.blk"))
    pairs = a.join(b, cond).select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        F.expr(
            "round(cast(size(array_intersect(a.hs, b.hs)) as double)"
            " / size(array_union(a.hs, b.hs)), 6)"
        ).alias("jacc"),
    )
    return pairs.filter(F.col("jacc") >= threshold)


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, hs, sig): MinHash signature per document."""
    s = shingle_hashes(df, text_col).select(
        F.col(id_col).alias("id"), "hs"
    )
    return s.withColumn("sig", F.expr(P.spark_minhash_sig("hs")))


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int = 1000,
) -> DataFrame:
    """MinHash+LSH near-dup pairs, exact-Jaccard verified.

    Plan shape (the 100 TB path):
      1. signature per doc (narrow, codegen)
      2. explode band keys -> shuffle on (band, key) buckets
      3. pairs within buckets (skew-guarded by max_bucket)
      4. distinct candidate pairs -> join back shingles -> exact jacc
    """
    sigs = minhash_signatures(df, text_col, id_col)
    bands = sigs.select(
        "id",
        F.posexplode(F.expr(P.spark_band_keys("sig"))).alias("band", "bkey"),
    )
    # skew guard: drop pathological buckets (e.g. empty-text clusters)
    bucket_sizes = bands.groupBy("band", "bkey").count()
    bands = (
        bands.join(
            F.broadcast(bucket_sizes.filter(F.col("count") > max_bucket)),
            ["band", "bkey"],
            "left_anti",
        )
    )
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sh = sigs.select("id", "hs")
    verified = (
        cand.join(sh.alias("sa"), F.col("id_a") == F.col("sa.id"))
        .join(sh.alias("sb"), F.col("id_b") == F.col("sb.id"))
        .select(
            "id_a",
            "id_b",
            F.expr(
                "round(cast(size(array_intersect(sa.hs, sb.hs)) as double)"
                " / size(array_union(sa.hs, sb.hs)), 6)"
            ).alias("jacc"),
        )
    )
    return verified.filter(F.col("jacc") >= threshold)


def simhash_col(
    df: DataFrame, text_col: str = "text", out_col: str = "simhash"
) -> DataFrame:
    """32-bit SimHash of whitespace tokens (portable.spark_simhash)."""
    th = P.spark_hash_array(P.spark_tokens(text_col))
    return df.withColumn("_th", F.expr(th)).withColumn(
        out_col, F.expr(P.spark_simhash("_th"))
    ).drop("_th")


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine near-dup pairs over an embedding column.

    Brute-force all-pairs — correctness baseline; the LSH-bucketed
    scale path lives in simsearch.lsh_buckets (block by hyperplane
    sign bits, then pair within buckets).
    """
    s = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    a, b = s.alias("a"), s.alias("b")
    dot = (
        "aggregate(zip_with(a.v, b.v, (x, y) -> cast(x as double)*cast(y as double)),"
        " cast(0 as double), (acc, z) -> acc + z)"
    )
    na = "aggregate(a.v, cast(0 as double), (acc, x) -> acc + cast(x as double)*cast(x as double))"
    nb = "aggregate(b.v, cast(0 as double), (acc, x) -> acc + cast(x as double)*cast(x as double))"
    pairs = a.join(b, F.col("a.id") < F.col("b.id")).select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        F.expr(f"round(({dot}) / sqrt(({na}) * ({nb})), 6)").alias("cos"),
    )
    return pairs.filter(F.col("cos") >= threshold)
