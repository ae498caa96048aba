"""Similarity search over embedding columns (array<float>).

- cosine_topk: brute-force exact top-k for a (small, broadcast) query
  set. The query side crosses every data row once — one scan, no
  shuffle except the final per-query top-k (a tiny groupBy on
  query_id). This is the correctness baseline.
- lsh_buckets / lsh_topk: random-hyperplane LSH — the 100 TB path.
  Each vector gets a sign-bit bucket; candidates are only same-bucket
  rows (optionally multi-probe over neighboring buckets), so the scan
  fans in by ~2^n_planes. Hyperplanes are deterministic (seeded
  literals) so results are reproducible and oracle-checkable.

Dot products are Catalyst ``zip_with``/``aggregate`` expressions —
JVM-side, codegen, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fluent_bit_spark.textprep.portable import P53

_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double)*cast(y as double)),"
    " cast(0 as double), (acc, z) -> acc + z)"
)
_NORM2 = (
    "aggregate({v}, cast(0 as double), (acc, x) ->"
    " acc + cast(x as double)*cast(x as double))"
)


def cosine_expr(a: str, b: str) -> str:
    dot = _DOT.format(a=a, b=b)
    na = _NORM2.format(v=a)
    nb = _NORM2.format(v=b)
    return f"({dot}) / sqrt(({na}) * ({nb}))"


def cosine_topk(
    data: DataFrame,
    queries: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k neighbors per query: (query_id, rank, neighbor_id, cos).

    ``queries`` must be small (it is broadcast). Deterministic
    tie-break on neighbor id.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    d = data.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("dv"))
    scored = d.crossJoin(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        F.expr(f"round({cosine_expr('qv', 'dv')}, 6)").alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos")
    )


def hyperplanes(dim: int, n_planes: int, offset: int = 0) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (no RNG state: pure
    function of indices, identical on any cluster / in the oracle).
    ``offset`` shifts the plane index so independent LSH tables get
    disjoint plane sets (table t -> offset=t*n_planes)."""
    planes = []
    for p in range(offset, offset + n_planes):
        row = []
        for i in range(dim):
            x = (p * 7919 + i * 104729 + 12345) % P53
            row.append(((x % 2000003) / 1000001.5) - 1.0)  # in [-1, 1)
        planes.append(row)
    return planes


def bucket_expr(vec_col: str, planes: list[list[float]]) -> str:
    """Sign-bit bucket id from dot products with the hyperplanes."""
    bits = []
    for bi, plane in enumerate(planes):
        arr = "array({})".format(",".join(f"cast({x!r} as double)" for x in plane))
        dot = _DOT.format(a=vec_col, b=arr)
        bits.append(f"(CASE WHEN ({dot}) >= 0 THEN {1 << bi} ELSE 0 END)")
    return "(" + " + ".join(bits) + ")"


def _infer_dim(df: DataFrame, vec_col: str, dim: int | None) -> int:
    """Vector dimensionality. Pass ``dim`` explicitly at scale — the
    fallback runs a driver-side first() job per call."""
    if dim is not None:
        return dim
    return len(df.select(vec_col).first()[0])


def lsh_buckets(
    df: DataFrame,
    n_planes: int = 8,
    vec_col: str = "embedding",
    out_col: str = "bucket",
    dim: int | None = None,
) -> DataFrame:
    dim = _infer_dim(df, vec_col, dim)
    return df.withColumn(out_col, F.expr(bucket_expr(vec_col, hyperplanes(dim, n_planes))))


def ivf_assign_expr(vec_col: str, centroids: list[list[float]]) -> str:
    """Nearest-centroid cell id (argmax of dot with unit centroids;
    first index wins ties — list_position semantics in both engines)."""
    dots = []
    for c in centroids:
        arr = "array({})".format(",".join(f"cast({x!r} as double)" for x in c))
        dots.append("(" + _DOT.format(a=vec_col, b=arr) + ")")
    arr_all = "array({})".format(",".join(dots))
    return f"array_position({arr_all}, array_max({arr_all})) - 1"


def ivf_centroids(
    data: DataFrame,
    n_cells: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Deterministic seed centroids: the n_cells lowest-id vectors,
    L2-normalized. A production index would run a few k-means rounds
    over a sample; the partition/probe structure — which is what the
    scale path is about — is identical, and seeded selection keeps the
    index reproducible and oracle-checkable."""
    import math

    rows = (
        data.select(id_col, vec_col).orderBy(id_col).limit(n_cells).collect()
    )
    cents = []
    for r in rows:
        v = [float(x) for x in r[vec_col]]
        # math.sqrt (correctly-rounded IEEE sqrt) — bit-identical to
        # the oracle's SQL sqrt over the same sequential sum
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        cents.append([x / n for x in v])
    return cents


def ivf_topk(
    data: DataFrame,
    queries: DataFrame,
    k: int,
    n_cells: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF approximate top-k: vectors partition into nearest-centroid
    cells; each query probes its ``n_probe`` closest cells only.

    The 100 TB shape: build the centroid set once (tiny, broadcast as
    literals), write the data table partitioned by cell, and each
    query reads ~n_probe/n_cells of the corpus. Candidate fan-in is
    an equi-join on cell — no crossJoin.
    """
    cents = centroids or ivf_centroids(data, n_cells, vec_col, id_col)
    assign = ivf_assign_expr(vec_col, cents)

    d = data.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("dv"),
        F.expr(assign).alias("cell"),
    )
    # query probes: the n_probe best cells by centroid dot product
    dots = []
    for c in cents:
        arr = "array({})".format(",".join(f"cast({x!r} as double)" for x in c))
        dots.append("(" + _DOT.format(a=vec_col, b=arr) + ")")
    arr_all = "array({})".format(",".join(dots))
    probes = (
        f"slice(transform(array_sort(zip_with({arr_all}, "
        f"sequence(0, {len(cents) - 1}), (d, i) -> struct(-d as nd, i as i))),"
        f" s -> s.i), 1, {n_probe})"
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.explode(F.expr(probes)).alias("cell"),
    )
    scored = d.join(F.broadcast(q), "cell").select(
        "query_id",
        "neighbor_id",
        F.expr(f"round({cosine_expr('qv', 'dv')}, 6)").alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos")
    )


def lsh_topk(
    data: DataFrame,
    queries: DataFrame,
    k: int,
    n_planes: int = 6,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's bucket.

    At scale, bucket the data table ONCE (write partitioned/bucketed
    by the LSH bucket), then each query probes a single partition —
    the scan is pruned by ~2^n_planes.
    """
    dim = _infer_dim(data, vec_col, dim)
    planes = hyperplanes(dim, n_planes)
    b = bucket_expr(vec_col, planes)
    d = data.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("dv"),
        F.expr(b).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.expr(b).alias("bucket"),
    )
    scored = d.join(F.broadcast(q), "bucket").select(
        "query_id",
        "neighbor_id",
        F.expr(f"round({cosine_expr('qv', 'dv')}, 6)").alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos")
    )
