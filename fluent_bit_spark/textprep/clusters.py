"""Duplicate-cluster resolution and incremental corpus dedup.

Near-dup *pairs* (textprep.dedup) are only half of a dedup decision:
a training-data pipeline must turn the pair graph into disjoint
clusters and keep exactly one canonical document per cluster, and it
must dedup each *new* crawl batch against the already-accepted corpus
without re-clustering everything. Both live here.

Scale notes (100 TB):

- ``connected_components`` is min-label propagation over the edge
  list: O(graph diameter) rounds, each round one join + one
  partial-aggregated ``min`` groupBy, both hash-partitioned on the
  vertex id so successive rounds reuse the same partitioning. Near-dup
  graphs have tiny diameters (dup clusters are dense blobs, not long
  chains), so this converges in a handful of rounds; for adversarial
  chain-shaped graphs the same primitive slots into the
  large-star/small-star rounds of Kiveris et al., "Connected
  Components in MapReduce and Beyond" (SOCC'14). Every round persists
  only the current label table (the previous round is unpersisted as
  soon as the new one is materialized), so state is O(V) no matter how
  many rounds run.

- ``incremental_dedup`` never touches accepted-corpus *text*: the
  index side is the digest + MinHash signature table (~1% the width of
  the corpus, the same table minhash_lsh_pairs persists), so a daily
  batch joins against a compact index, not 100 TB of history. Exact
  dedup is one left-anti join on the text digest; near-dup is the
  standard LSH band equi-join restricted to batch x index (never
  index x index — history was already deduped).

The reference has no corpus-wide dedup (fluent-bit filters see one
record at a time); these extend the SURVEY.md training-data set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fluent_bit_spark import cache
from fluent_bit_spark.textprep import portable as P
from fluent_bit_spark.textprep.dedup import ensure_parallelism, minhash_signatures


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    loop_partitions: int | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Connected components of an undirected pair graph.

    ``edges`` holds one row per pair; ``vertices`` (one ``id`` column)
    optionally supplies the full vertex set so isolated documents come
    back as singleton components (edge endpoints outside the supplied
    set are unioned in — they are graph vertices either way, and
    leaving them label-less would let the convergence check pass
    before their labels propagate). Returns ``(id, component)`` where
    ``component`` is the minimum vertex id reachable from ``id`` —
    deterministic regardless of executor count or round count.

    Implementation notes (the two classic iterative-Spark traps are
    both handled):

    - every round ends in a plan-truncating checkpoint, because
      persist() does NOT truncate the *logical* plan — without the
      checkpoint each round re-analyzes a strictly deeper tree and
      round time grows super-linearly. Default is
      ``localCheckpoint`` (executor-local blocks: zero extra I/O, the
      right choice on local mode / short loops). Pass
      ``checkpoint_dir`` to use reliable ``DataFrame.checkpoint()``
      instead: blocks go to the shared filesystem, so on a real
      cluster a lost executor late in the loop costs a re-read, not
      the whole job. Finished rounds' checkpoint files are deleted as
      soon as the next round materializes, so disk state stays O(V).

    - propagation is hash-min WITH pointer jumping: each round a
      vertex takes the min over its own label, its neighbors' labels,
      and *its label's label* (lab joined to itself). The self-join
      doubles label-path lengths, so convergence is O(log diameter)
      rounds, not O(diameter) — a 2^25-long chain converges inside
      the default max_iter.

    Checkpoint blocks of finished rounds are freed as soon as the next
    round materializes; the final one is registered with
    cache.track_releaser for the caller's cache.release_all().

    ``loop_partitions`` bounds the partition width of the edge and
    label tables inside the loop. The loop runs O(log diameter) small
    jobs, so per-task scheduling overhead — not data volume — is the
    cost driver when the graph is far smaller than the cluster's
    default parallelism; size it to the graph (None inherits the
    session width, the right choice when V is genuinely large).

    Raises ``RuntimeError`` if not converged after ``max_iter`` rounds.
    """
    spark = edges.sparkSession
    jsc = spark.sparkContext._jsc

    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    def _ckpt_fs_paths() -> set[str]:
        """rdd-* checkpoint directories currently on the reliable
        checkpoint filesystem (Hadoop FS — works for hdfs:///s3a://
        the same as for a local path)."""
        jvm = spark.sparkContext._jvm
        dir_ = jsc.sc().getCheckpointDir()
        if dir_.isEmpty():
            return set()
        root = jvm.org.apache.hadoop.fs.Path(dir_.get())
        fs = root.getFileSystem(jsc.hadoopConfiguration())
        if not fs.exists(root):
            return set()
        out: set[str] = set()
        for st in fs.listStatus(root):
            if st.isDirectory():
                out.add(str(st.getPath().toString()))
        return out

    def _snapshot() -> set:
        if checkpoint_dir is not None:
            return _ckpt_fs_paths()
        # getPersistentRDDs returns a fresh snapshot each call
        return {int(k) for k in jsc.getPersistentRDDs().keySet().toArray()}

    def _free(ids: set) -> None:
        if checkpoint_dir is not None:
            jvm = spark.sparkContext._jvm
            for p in ids:
                path = jvm.org.apache.hadoop.fs.Path(p)
                fs = path.getFileSystem(jsc.hadoopConfiguration())
                fs.delete(path, True)
            return
        m = jsc.getPersistentRDDs()
        for k in list(m.keySet().toArray()):
            if int(k) in ids:
                m.get(k).unpersist(False)

    def _ckpt(df: DataFrame, eager: bool) -> DataFrame:
        if checkpoint_dir is not None:
            return df.checkpoint(eager=eager)
        return df.localCheckpoint(eager=eager)

    sym = edges.select(
        F.col(id_a).cast("long").alias("src"), F.col(id_b).cast("long").alias("dst")
    )
    sym = sym.union(sym.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    endpoints = sym.select(F.col("src").alias("id"))
    if vertices is None:
        vertices = endpoints.distinct()
    else:
        # edge endpoints outside the vertex set still need label rows
        # from round 0 — see docstring
        vertices = vertices.select(F.col("id").cast("long")).union(endpoints)
    pre_ids = _snapshot()
    if loop_partitions:
        sym = sym.repartition(loop_partitions, "src")
    else:
        sym = ensure_parallelism(sym)
    sym = _ckpt(sym, eager=True)
    sym_ids = _snapshot() - pre_ids
    lab = vertices.select(F.col("id").cast("long")).distinct()
    if loop_partitions:
        lab = lab.repartition(loop_partitions, "id")
    lab = _ckpt(lab.withColumn("comp", F.col("id")), eager=True)
    lab_ids = _snapshot() - pre_ids - sym_ids
    converged = False
    for _ in range(max_iter):
        # neighbor labels flow along edges; min with own label keeps
        # the per-vertex label monotonically non-increasing
        msgs = sym.join(lab, sym["src"] == lab["id"]).select(
            F.col("dst").alias("id"), "comp", F.lit(False).alias("own")
        )
        # pointer jump: label of my label (path doubling)
        jump = (
            lab.alias("x")
            .join(lab.alias("y"), F.col("x.comp") == F.col("y.id"))
            .select(
                F.col("x.id").alias("id"),
                F.col("y.comp").alias("comp"),
                F.lit(False).alias("own"),
            )
        )
        before = _snapshot()
        # the old label rides along (max over the `own` branch), so the
        # convergence check is a flat scan; the checkpoint is LAZY and
        # materializes inside that same count — ONE job per round
        agg = (
            lab.select("id", "comp", F.lit(True).alias("own"))
            .unionByName(msgs)
            .unionByName(jump)
            .groupBy("id")
            .agg(
                F.min("comp").alias("comp"),
                F.max(F.when(F.col("own"), F.col("comp"))).alias("old_comp"),
            )
        )
        if loop_partitions:
            agg = agg.repartition(loop_partitions, "id")
        new = _ckpt(agg, eager=False)
        # null-safe: a label row whose old_comp is somehow NULL must
        # count as changed, never silently converge
        changed = (
            new.filter(~F.col("comp").eqNullSafe(F.col("old_comp")))
            .limit(1)
            .count()
        )
        new_ids = _snapshot() - before
        # previous round's label checkpoint is no longer referenced —
        # free it now so loop state stays O(V + E)
        _free(lab_ids)
        lab_ids = new_ids
        lab = new.select("id", "comp")
        if changed == 0:
            converged = True
            break

    def _release_final(ids=sym_ids | lab_ids):
        _free(ids)

    if not converged:
        _release_final()
        raise RuntimeError(f"connected_components: no convergence in {max_iter} rounds")
    cache.track_releaser(_release_final)
    return lab


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 30,
    loop_partitions: int | None = None,
) -> DataFrame:
    """Canonical-document selection over a near-dup pair graph.

    Output per document: ``(doc_id, cluster_id, cluster_size, keep)``
    — ``cluster_id`` is the min doc id in the component, ``keep`` is
    true for exactly that document (the deterministic survivor), and
    singleton documents form their own cluster with keep=true.
    """
    comp = connected_components(
        pairs,
        vertices=docs.select(F.col(id_col).alias("id")),
        max_iter=max_iter,
        loop_partitions=loop_partitions,
    )
    w = Window.partitionBy("cluster_id")
    return (
        comp.select(F.col("id").alias(id_col), F.col("comp").alias("cluster_id"))
        .withColumn("cluster_size", F.count(F.lit(1)).over(w))
        .withColumn("keep", F.col(id_col) == F.col("cluster_id"))
    )


def incremental_dedup(
    index_docs: DataFrame,
    batch_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sim_threshold: float = 0.25,
    max_bucket: int = 1000,
) -> DataFrame:
    """Dedup a new batch against an already-accepted corpus index.

    Per batch document: ``(doc_id, is_new_exact, near_dup_of, kept)``.
    ``is_new_exact`` is false when the exact text digest already exists
    in the index; ``near_dup_of`` is the smallest index doc id whose
    MinHash-estimated Jaccard >= sim_threshold (null if none);
    ``kept`` = new exact AND no near-dup.

    The near-dup join is batch-bands x index-bands on (band, bkey) —
    an equi-join LSH probe, with the same ``max_bucket`` skew guard as
    minhash_lsh_pairs applied to the *index* side (degenerate buckets,
    e.g. empty-text clusters, would otherwise fan every batch doc out
    against them). Similarity here is the signature estimate (unbiased,
    sd ~ sqrt(J(1-J)/32)); callers wanting exact-Jaccard confirmation
    can join text back for the accepted pairs, as minhash_lsh_pairs
    does with est_margin.
    """
    idx_sigs = cache.track(
        minhash_signatures(index_docs, text_col, id_col).withColumnRenamed("id", "iid")
    )
    new_sigs = cache.track(
        minhash_signatures(batch_docs, text_col, id_col).withColumnRenamed("id", "nid")
    )

    def _bands(sigs: DataFrame, idc: str) -> DataFrame:
        return sigs.select(
            idc, F.posexplode(F.expr(P.spark_band_keys("sig"))).alias("band", "bkey")
        )

    idx_bands = _bands(idx_sigs, "iid")
    big = (
        idx_bands.groupBy("band", "bkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > max_bucket)
        .select("band", "bkey")
    )
    idx_bands = idx_bands.join(big, ["band", "bkey"], "left_anti")
    cand = (
        _bands(new_sigs, "nid")
        .join(idx_bands, ["band", "bkey"])
        .select("nid", "iid")
        .distinct()
    )
    est = (
        "cast(size(filter(sequence(1, {n}), i -> element_at(a.sig, i) ="
        " element_at(b.sig, i))) as double) / {n}"
    ).format(n=P.N_HASHES)
    near = (
        cand.join(new_sigs.alias("a"), "nid")
        .join(idx_sigs.alias("b"), "iid")
        .withColumn("est", F.expr(est))
        .filter(F.col("est") >= sim_threshold)
        .groupBy("nid")
        .agg(F.min("iid").alias("near_dup_of"))
    )

    idx_digests = index_docs.select(F.md5(F.col(text_col)).alias("digest")).distinct()
    out = (
        batch_docs.select(
            F.col(id_col), F.md5(F.col(text_col)).alias("digest")
        )
        .join(idx_digests.withColumn("in_index", F.lit(True)), "digest", "left")
        .withColumn("is_new_exact", F.col("in_index").isNull())
        .join(near, F.col(id_col) == F.col("nid"), "left")
        .select(
            id_col,
            "is_new_exact",
            "near_dup_of",
            (F.col("is_new_exact") & F.col("near_dup_of").isNull()).alias("kept"),
        )
    )
    return out
