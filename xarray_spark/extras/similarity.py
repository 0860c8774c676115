"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: broadcast the (small) query set, dot product
  via zip_with/aggregate (JVM-side higher-order functions), window top-k.
- LSH (random hyperplane) bucketed variant: the 100 TB path — sign-bit
  signature → candidate bucket equi-join → exact re-rank within bucket.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine(a, b):
    den = _norm(a) * _norm(b)
    # zero-norm guard: ANSI mode (Spark 4 default) raises on div-by-zero
    return F.when(den != 0, _dot(a, b) / den)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "qid",
) -> DataFrame:
    """Exact top-k neighbors for each query vector.

    The query side is broadcast (queries ≪ corpus); the corpus streams
    through once — O(|corpus|·|queries|·d) JVM flops, no shuffle except
    the final per-query top-k (tiny).  Ties broken by neighbor id for
    determinism.
    """
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).cast("array<double>").alias("__cv"),
    )
    scored = c.crossJoin(F.broadcast(q)).where(F.col("nid") != F.col(query_id_col)).select(
        query_id_col,
        "nid",
        cosine(F.col("__qv"), F.col("__cv")).alias("cos"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos").desc(), F.col("nid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "nid", "cos", "rank")
    )


def hyperplane_signature(vec, planes: list[list[float]]):
    """Sign-bit LSH signature: bit i = (vec · plane_i) > 0."""
    bits = []
    for i, p in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in p])
        bits.append(F.when(_dot(vec, arr) > 0, F.lit(1 << i)).otherwise(0))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return sig


def _deterministic_planes(n_planes: int, dim: int, seed: int = 7) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG; no RNG state)."""
    planes = []
    state = seed
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            row.append(((state >> 33) / float(1 << 31)) - 1.0)
        planes.append(row)
    return planes


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "qid",
    n_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: candidates = same LSH bucket, exact re-rank.

    At 100 TB the bucket join replaces the full cross product — recall
    traded via n_planes (8 planes ⇒ 256 buckets).  Multi-probe (flip one
    bit) would raise recall; single-probe keeps the demo exact-join only.
    """
    planes = _deterministic_planes(n_planes, dim)
    sig_c = corpus.select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).cast("array<double>").alias("__cv"),
    ).withColumn("__bucket", hyperplane_signature(F.col("__cv"), planes))
    sig_q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    ).withColumn("__bucket", hyperplane_signature(F.col("__qv"), planes))
    cand = sig_c.join(F.broadcast(sig_q), on="__bucket", how="inner").where(
        F.col("nid") != F.col(query_id_col)
    )
    scored = cand.select(
        query_id_col, "nid", cosine(F.col("__qv"), F.col("__cv")).alias("cos")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos").desc(), F.col("nid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "nid", "cos", "rank")
    )


def _cosine_batch_udf():
    """Arrow-batched cosine over paired vector columns.

    Spark's higher-order-function lambdas (zip_with/aggregate) are
    interpreted per element — fine for one score per row, hot for
    millions of candidate pairs.  numpy over Arrow batches does the
    same math vectorized (~10× on the LSH candidate stream)."""

    @F.pandas_udf("double")
    def cos(a: pd.Series, b: pd.Series) -> pd.Series:
        va = np.stack(a.to_numpy())
        vb = np.stack(b.to_numpy())
        num = (va * vb).sum(axis=1)
        den = np.sqrt((va * va).sum(axis=1)) * np.sqrt((vb * vb).sum(axis=1))
        with np.errstate(divide="ignore", invalid="ignore"):
            out = num / den
        return pd.Series(out)

    return cos


def lsh_topk_multiprobe(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "qid",
    n_planes: int = 8,
    dim: int = 64,
    n_probes: int = 1,
) -> DataFrame:
    """Multi-probe LSH top-k: each query also probes the buckets that
    differ from its signature by one bit (the classic multi-probe LSH
    recall boost — candidates from ``1 + n_probes·n_planes`` buckets per
    query instead of 1, at the same plane count).

    The probe expansion happens on the (small) query side only; the
    corpus keeps exactly one bucket per vector, so corpus storage and
    shuffle are unchanged.
    """
    planes = _deterministic_planes(n_planes, dim)
    cos = _cosine_batch_udf()
    sig_c = corpus.select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).cast("array<double>").alias("__cv"),
    ).withColumn("__bucket", hyperplane_signature(F.col("__cv"), planes))
    sig_q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    ).withColumn("__sig", hyperplane_signature(F.col("__qv"), planes))
    probes = [F.col("__sig")]
    if n_probes >= 1:
        probes += [F.col("__sig").bitwiseXOR(F.lit(1 << b)) for b in range(n_planes)]
    sig_q = sig_q.withColumn("__bucket", F.explode(F.array(*probes)))
    cand = sig_c.join(F.broadcast(sig_q), on="__bucket", how="inner").where(
        F.col("nid") != F.col(query_id_col)
    ).dropDuplicates([query_id_col, "nid"])
    scored = cand.select(
        query_id_col, "nid", cos(F.col("__qv"), F.col("__cv")).alias("cos")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos").desc(), F.col("nid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "nid", "cos", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "qid",
    n_cells: int = 16,
    n_probe: int = 2,
    seed: int = 7,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: k-means coarse quantizer,
    probe the ``n_probe`` nearest cells per query, exact re-rank inside.

    The 100 TB shape: corpus partitioned by cell id (one assignment
    pass), each query touches n_probe/n_cells of the data.  Uses Spark
    ML's distributed KMeans for the codebook; centroids are
    driver-small by construction.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    cos = _cosine_batch_udf()
    c = corpus.select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).cast("array<double>").alias("__cv"),
    ).withColumn("__vec", array_to_vector("__cv"))
    km = KMeans(k=n_cells, seed=seed, featuresCol="__vec", predictionCol="__cell")
    model = km.fit(c)
    assigned = model.transform(c).select("nid", "__cv", "__cell")
    centroids = [list(v) for v in model.clusterCenters()]

    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    )
    # nearest n_probe centroids per query — centroid list is tiny, so
    # the ranking is a literal-expression sort, no join
    def l2(center):
        arr = F.array(*[F.lit(float(x)) for x in center])
        diff = F.zip_with(F.col("__qv"), arr, lambda a, b: (a - b) * (a - b))
        return F.aggregate(diff, F.lit(0.0), lambda acc, v: acc + v)

    dists = F.array(*[
        F.struct(l2(center).alias("d"), F.lit(i).alias("cell"))
        for i, center in enumerate(centroids)
    ])
    probed = q.withColumn(
        "__cell", F.explode(F.slice(F.array_sort(dists), 1, n_probe).getField("cell"))
    )
    cand = assigned.join(F.broadcast(probed), on="__cell", how="inner").where(
        F.col("nid") != F.col(query_id_col)
    )
    scored = cand.select(
        query_id_col, "nid", cos(F.col("__qv"), F.col("__cv")).alias("cos")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos").desc(), F.col("nid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "nid", "cos", "rank")
    )


def embedding_near_dups(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Near-duplicate pairs by cosine ≥ threshold, LSH-bucketed
    (sign-LSH collision probability 1−θ/π per plane).  The candidate
    stream is scored with the Arrow-batched numpy cosine."""
    planes = _deterministic_planes(n_planes, dim)
    cos = _cosine_batch_udf()
    sig = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
    ).withColumn("__bucket", hyperplane_signature(F.col("__v"), planes))
    a, b = sig.alias("a"), sig.alias("b")
    cand = (
        a.join(b, on="__bucket", how="inner")
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            cos(F.col("a.__v"), F.col("b.__v")).alias("cos"),
        )
    )
    return cand.where(F.col("cos") >= threshold)
