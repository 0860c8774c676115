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

from pyspark.sql import Column, DataFrame, Window
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


def _signature_fn(n_planes: int, dim: int, hash_mode: str):
    """Bucket-signature builder: float LCG planes (fast) or md5-derived
    integer planes with exact integer dots (portable — bucket membership
    is reproducible bit-for-bit in DuckDB SQL, see extras.portable).

    The portable path runs as ONE Arrow matmul (same trick as
    embedding_near_dups): floor-quantize to int64, integer matrix
    product against the plane matrix, sign bits packed to the bucket id.
    Bit-identical to the expression form (portable.int_signature —
    float→double is exact, np.floor == Spark floor, int64 matmul is
    exact integer arithmetic) but vectorized instead of n_planes×dim
    interpreted higher-order-function steps per row."""
    if hash_mode == "portable":
        from xarray_spark.extras.portable import plane_coeffs
        P = np.array(plane_coeffs(n_planes, dim), dtype=np.int64)  # (planes, dim)
        shifts = (np.int64(1) << np.arange(n_planes, dtype=np.int64))

        @F.pandas_udf("long")
        def sig(v: pd.Series) -> pd.Series:
            M = np.stack(v.to_numpy()).astype(np.float64)
            Q = np.floor(M * 1e6).astype(np.int64)
            bits = (Q @ P.T > 0)
            return pd.Series((bits * shifts).sum(axis=1))

        return sig
    planes = _deterministic_planes(n_planes, dim)
    return lambda v: hyperplane_signature(v, planes)


def _round6(c):
    """Cross-engine-stable 6-decimal rounding (the repo-wide epsilon
    convention: move values off exact .5 boundaries before rounding)."""
    return F.round(c + F.lit(1e-9), 6)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "qid",
    n_planes: int = 8,
    dim: int = 64,
    hash_mode: str = "fast",
) -> DataFrame:
    """Approximate top-k: candidates = same LSH bucket, exact re-rank.

    At 100 TB the bucket join replaces the full cross product — recall
    traded via n_planes (8 planes ⇒ 256 buckets).  Multi-probe (flip one
    bit) would raise recall; single-probe keeps the demo exact-join only.

    ``hash_mode="portable"`` makes bucketing and ranking deterministic
    across engines: integer-plane signatures and rank order on the
    ROUNDED cosine (float ties at 1e-16 would otherwise reorder rows
    between Spark and the SQL oracle).
    """
    sig = _signature_fn(n_planes, dim, hash_mode)
    sig_c = corpus.select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).cast("array<double>").alias("__cv"),
    ).withColumn("__bucket", sig(F.col("__cv")))
    sig_q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    ).withColumn("__bucket", sig(F.col("__qv")))
    cand = sig_c.join(F.broadcast(sig_q), on="__bucket", how="inner").where(
        F.col("nid") != F.col(query_id_col)
    )
    score = cosine(F.col("__qv"), F.col("__cv"))
    if hash_mode == "portable":
        score = _round6(score)
    scored = cand.select(query_id_col, "nid", score.alias("cos"))
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
    hash_mode: str = "fast",
) -> DataFrame:
    """Multi-probe LSH top-k: each query also probes the buckets that
    differ from its signature by one bit (the classic multi-probe LSH
    recall boost — candidates from ``1 + n_probes·n_planes`` buckets per
    query instead of 1, at the same plane count).

    The probe expansion happens on the (small) query side only; the
    corpus keeps exactly one bucket per vector, so corpus storage and
    shuffle are unchanged.
    """
    sig = _signature_fn(n_planes, dim, hash_mode)
    cos = _cosine_batch_udf()
    sig_c = corpus.select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).cast("array<double>").alias("__cv"),
    ).withColumn("__bucket", sig(F.col("__cv")))
    sig_q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    ).withColumn("__sig", sig(F.col("__qv")))
    probes = [F.col("__sig")]
    if n_probes >= 1:
        probes += [F.col("__sig").bitwiseXOR(F.lit(1 << b)) for b in range(n_planes)]
    sig_q = sig_q.withColumn("__bucket", F.explode(F.array(*probes)))
    cand = sig_c.join(F.broadcast(sig_q), on="__bucket", how="inner").where(
        F.col("nid") != F.col(query_id_col)
    ).dropDuplicates([query_id_col, "nid"])
    score = cos(F.col("__qv"), F.col("__cv"))
    if hash_mode == "portable":
        score = _round6(score)
    scored = cand.select(query_id_col, "nid", score.alias("cos"))
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos").desc(), F.col("nid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "nid", "cos", "rank")
    )


def ivf_fit(
    corpus: DataFrame,
    n_cells: int = 16,
    vec_col: str = "embedding",
    seed: int = 7,
    train_sample: int = 4096,
) -> list:
    """Fit the IVF coarse quantizer ONCE on a bounded training sample,
    returning the (driver-small) centroid list.

    Codebook lifecycle (the 100 TB discipline, the FAISS training
    convention): the quantizer trains on a SAMPLE whose size depends on
    n_cells, not on the corpus — one deterministic hash-ordered top-N
    scan (TakeOrdered: O(sample) per partition, no shuffle of the
    corpus) pulls ``train_sample`` vectors to the driver, then Lloyd
    iterations run in numpy (sample × d — milliseconds).  Persist the
    centroids (a few KB — sidecar JSON or literal list) and hand them
    to every ``ivf_topk`` call: the query path then contains NO
    iterative ML jobs — assignment and cell probing are pure literal
    expressions.
    """
    import numpy as np

    rows = (
        corpus.select(F.col(vec_col).cast("array<double>").alias("__cv"))
        .where(F.col("__cv").isNotNull())
        .orderBy(F.xxhash64(F.col("__cv"), F.lit(seed)))
        .limit(train_sample)
        .collect()
    )
    x = np.asarray([r["__cv"] for r in rows], dtype="float64")
    rng = np.random.RandomState(seed)
    # kmeans++ seeding, then Lloyd to convergence (the sample is tiny)
    cents = x[rng.randint(len(x))][None, :]
    for _ in range(1, min(n_cells, len(x))):
        d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(-1).min(1)
        p = d2 / d2.sum() if d2.sum() > 0 else None
        cents = np.vstack([cents, x[rng.choice(len(x), p=p)]])
    for _ in range(25):
        assign = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(-1).argmin(1)
        new = np.vstack([
            x[assign == i].mean(0) if (assign == i).any() else cents[i]
            for i in range(len(cents))
        ])
        if np.allclose(new, cents):
            break
        cents = new
    return [list(map(float, c)) for c in cents]


def _nearest_cells(vec: Column, centroids: list, n: int) -> Column:
    """Array of the ``n`` nearest centroid ids — ONE Arrow batch per
    partition (numpy matmul against the literal codebook), no join and
    no ML jobs in the plan.  Ties break on the ascending cell id
    (stable argsort).  Distances use the direct sum((a-b)^2) form — the
    same float64 rounding as the expression plan this replaced, so
    near-tie cell assignments are bit-stable versus existing oracles
    (the ||a||^2-2ab+||b||^2 expansion rounds differently)."""
    C = np.array([list(map(float, c)) for c in centroids], dtype=np.float64)

    @F.pandas_udf("array<int>")
    def cells(v: pd.Series) -> pd.Series:
        M = np.stack(v.to_numpy()).astype(np.float64)
        d = ((M[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        order = np.argsort(d, axis=1, kind="stable")[:, :n].astype(np.int32)
        return pd.Series(list(order))

    return cells(vec)


def ivf_assign(
    corpus: DataFrame,
    centroids: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each corpus vector to its nearest cell — one expression
    pass; the result is what you would bucket/partition by ``__cell``
    and persist for repeated querying."""
    return corpus.select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).cast("array<double>").alias("__cv"),
    ).withColumn("__cell", _nearest_cells(F.col("__cv"), centroids, 1)[0])


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
    centroids: list | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: k-means coarse quantizer,
    probe the ``n_probe`` nearest cells per query, exact re-rank inside.

    The 100 TB shape: corpus partitioned by cell id (one assignment
    pass), each query touches n_probe/n_cells of the data.  Pass
    ``centroids`` from a prior ``ivf_fit`` so the query plan holds no
    KMeans jobs; omitting it fits in place (exploratory use only).
    """
    cos = _cosine_batch_udf()
    if centroids is None:
        centroids = ivf_fit(corpus, n_cells, vec_col, seed)
    assigned = ivf_assign(corpus, centroids, id_col, vec_col)

    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    )
    probed = q.withColumn(
        "__cell", F.explode(_nearest_cells(F.col("__qv"), centroids, n_probe))
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
    n_planes: int = 16,
    n_bands: int = 8,
    dim: int = 64,
    hash_mode: str = "fast",
) -> DataFrame:
    """Near-duplicate pairs by cosine ≥ threshold: BANDED sign-LSH
    (n_bands independent tables of n_planes hyperplanes each — the same
    OR-of-ANDs construction the minhash path uses), exact Arrow-batched
    cosine re-rank, dedup across bands.

    Scale shape: 2^n_planes buckets PER BAND bounds the quadratic
    within-bucket self-join (16 planes ≈ 65k buckets/band); recall is
    recovered across bands, 1−(1−p^n)^L with p = 1−θ/π — at the
    defaults ≈ 0.8 for pairs AT cosine 0.95 and > 0.999 for true
    near-dups (cosine ≥ 0.999), where one 8-plane table (256 buckets,
    quadratic blow-up) or one 20-plane table (12 % recall) both fail.
    Grow ``n_planes`` with corpus size, ``n_bands`` with the recall
    target.
    """
    cos = _cosine_batch_udf()
    base = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
    )
    # all n_bands × n_planes sign bits in ONE Arrow-batched matmul —
    # the literal-expression form would be an (n_bands·n_planes·dim)-term
    # Catalyst tree (128 planes × 64 dims = 8k terms: codegen blow-up),
    # and per-row numpy is exactly what sign-LSH is at 100 TB anyway:
    # a (batch × dim) @ (dim × planes) product per scan partition.
    from pyspark.sql.functions import pandas_udf

    nb, npl = n_bands, n_planes
    portable = hash_mode == "portable"
    if portable:
        from xarray_spark.extras.portable import plane_coeffs
        P = plane_coeffs(n_planes * n_bands, dim)
    else:
        P = [list(p) for p in _deterministic_planes(n_planes * n_bands, dim)]

    @pandas_udf("array<long>")
    def _band_buckets(v: pd.Series) -> pd.Series:
        M = np.stack(v.to_numpy())
        if portable:
            # exact int64 matmul of floor-quantized vectors against the
            # md5-derived integer planes — the bucket id a SQL oracle
            # recomputes bit-for-bit (float dots near 0 flip across
            # engines; integer sums cannot).
            Mq = np.floor(M * 1e6).astype(np.int64)
            bits = (Mq @ np.asarray(P, dtype=np.int64).T) > 0
        else:
            bits = (M @ np.asarray(P).T) > 0
        w = 1 << np.arange(npl, dtype=np.int64)
        buckets = bits.reshape(len(M), nb, npl) @ w
        return pd.Series(list(buckets))

    sig = (
        base.withColumn("__bk", _band_buckets("__v"))
        .select(id_col, "__v", F.posexplode("__bk").alias("__band", "__bucket"))
    )
    # candidate rows carry ONLY ids through the band join and the
    # cross-band dedup shuffle — vectors (128 doubles/pair) re-join on
    # the far smaller deduped pair set, as the minhash path does.
    # Materialize the (id, band, bucket) table: both join sides read it,
    # and without a checkpoint each side re-runs the signature matmul.
    lite = sig.select(id_col, "__band", "__bucket").localCheckpoint(eager=False)
    a, b = lite.alias("a"), lite.alias("b")
    cand = (
        a.join(b, on=["__band", "__bucket"], how="inner")
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .join(base.select(F.col(id_col).alias("id_a"), F.col("__v").alias("__va")), "id_a")
        .join(base.select(F.col(id_col).alias("id_b"), F.col("__v").alias("__vb")), "id_b")
        .select("id_a", "id_b",
                (_round6(cos(F.col("__va"), F.col("__vb"))) if portable
                 else cos(F.col("__va"), F.col("__vb"))).alias("cos"))
    )
    # portable: threshold the ROUNDED cosine so the pair set cannot
    # disagree with the oracle at a float boundary.
    return cand.where(F.col("cos") >= threshold)


def _nearest_cells_int(vec: Column, centroids_q: list[list[int]], n: int) -> Column:
    """Integer-exact twin of _nearest_cells: L2 distances between the
    floor-quantized vector and integer centroids are exact int64 sums
    (≤ dim·(2e6)² ≈ 2.6e14), so the argmin — stable-sorted, ties to the
    ascending cell id — is deterministic across engines.  Runs as one
    Arrow int64 matmul per batch (expansion ||q||²-2q·c+||c||² is exact
    in int64, no float rounding anywhere), replacing n_cells
    interpreted zip_with/aggregate passes per row."""
    C = np.array(centroids_q, dtype=np.int64)
    c2 = (C * C).sum(axis=1)

    @F.pandas_udf("array<int>")
    def cells(v: pd.Series) -> pd.Series:
        M = np.stack(v.to_numpy()).astype(np.float64)
        Q = np.floor(M * 1e6).astype(np.int64)
        d = (Q * Q).sum(axis=1)[:, None] - 2 * (Q @ C.T) + c2[None, :]
        order = np.argsort(d, axis=1, kind="stable")[:, :n].astype(np.int32)
        return pd.Series(list(order))

    return cells(vec)


def ivf_topk_fixed(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "qid",
    n_cells: int = 8,
    n_probe: int = 2,
    dim: int = 64,
    centroids_q: list | None = None,
) -> DataFrame:
    """IVF top-k over an INTEGER codebook — the oracle-checkable
    variant of the IVF query path: integer-exact cell assignment,
    query-side probe expansion, rounded-cosine re-rank.  Same plan
    shape as ivf_topk (cell equi-join replaces the cross product).

    ``centroids_q=None`` uses the fixed md5-derived codebook
    (extras.portable.centroid_coeffs); pass the output of
    :func:`train_centroids_int` for the TRAINED production codebook —
    still bit-replayable in SQL because the Lloyd iterations are
    integer-exact (gate q134)."""
    from xarray_spark.extras.portable import centroid_coeffs

    cents = (centroid_coeffs(n_cells, dim) if centroids_q is None
             else centroids_q)
    base_c = corpus.select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).cast("array<double>").alias("__cv"),
    ).withColumn("__cell", _nearest_cells_int(F.col("__cv"), cents, 1)[0])
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    ).withColumn("__cell",
                 F.explode(_nearest_cells_int(F.col("__qv"), cents, n_probe)))
    cand = base_c.join(F.broadcast(q), on="__cell", how="inner").where(
        F.col("nid") != F.col(query_id_col)
    )
    scored = cand.select(
        query_id_col, "nid",
        _round6(cosine(F.col("__qv"), F.col("__cv"))).alias("cos"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos").desc(), F.col("nid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "nid", "cos", "rank")
    )


# --------------------------------------------------------------------- #
# product quantization (FAISS IndexPQ query path, fixed codebook)
# --------------------------------------------------------------------- #

def pq_encode_fixed(df: DataFrame, m: int = 8, k: int = 16,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    dim: int = 64) -> DataFrame:
    """PQ-encode vectors against the fixed integer codebook
    (extras.portable.pq_codebook): split each floor-quantized vector
    into ``m`` subvectors, store the id of the nearest codebook entry
    per subquantizer — ``m`` small ints instead of ``dim`` floats
    (the 32× compression that makes billion-vector search RAM-feasible;
    Jégou et al. 2011, FAISS IndexPQ).

    Integer-exact (int64 expansion distances, stable tie to the lowest
    code id) so a SQL oracle replays the codes bit-for-bit.  One Arrow
    einsum per batch; map-only, no shuffle."""
    from xarray_spark.extras.portable import pq_codebook
    d_sub = dim // m
    C = np.array(pq_codebook(m, k, d_sub), dtype=np.int64)      # (m, k, d_sub)
    c2 = (C * C).sum(axis=2)                                    # (m, k)

    @F.pandas_udf("array<int>")
    def enc(v: pd.Series) -> pd.Series:
        M = np.stack(v.to_numpy()).astype(np.float64)
        Q = np.floor(M * 1e6).astype(np.int64).reshape(len(M), m, d_sub)
        # (n, m, k) int64: ||q||² - 2 q·c + ||c||², exact
        cross = np.einsum("nmd,mkd->nmk", Q, C)
        d = (Q * Q).sum(axis=2)[:, :, None] - 2 * cross + c2[None, :, :]
        codes = np.argsort(d, axis=2, kind="stable")[:, :, 0].astype(np.int32)
        return pd.Series(list(codes))

    return df.select(F.col(id_col), enc(F.col(vec_col).cast("array<double>")).alias("pq_codes"))


def pq_topk_fixed(corpus: DataFrame, queries: DataFrame, kk: int = 10,
                  m: int = 8, k: int = 16,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  query_id_col: str = "qid", dim: int = 64) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: the query stays
    exact, each corpus vector is its ``m`` codebook ids, and the
    distance is Σ_s ||q_sub − C[s][code_s]||² — the FAISS IndexPQ scan.

    Scale shape: the corpus side carries ONLY (id, m codes) — the point
    of PQ is that this fits in memory where raw vectors don't; the scan
    is embarrassingly parallel, and at 100 TB you compose with the IVF
    cell join (ivf_topk_fixed) to prune it (IVF-PQ).  Integer-exact end
    to end → the SQL oracle reproduces every distance and the exact
    ranking (ties to the ascending corpus id)."""
    from xarray_spark.extras.portable import pq_codebook
    d_sub = dim // m
    C = np.array(pq_codebook(m, k, d_sub), dtype=np.int64)

    codes = pq_encode_fixed(corpus, m, k, id_col, vec_col, dim).select(
        F.col(id_col).alias("nid"), "pq_codes")
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).cast("array<double>").alias("__qv"))
    cand = codes.crossJoin(F.broadcast(q)).where(
        F.col("nid") != F.col(query_id_col))

    @F.pandas_udf("long")
    def adc(qv: pd.Series, cd: pd.Series) -> pd.Series:
        Qm = np.stack(qv.to_numpy()).astype(np.float64)
        Q = np.floor(Qm * 1e6).astype(np.int64).reshape(len(Qm), m, d_sub)
        codes_arr = np.stack(cd.to_numpy()).astype(np.int64)     # (n, m)
        sel = C[np.arange(m)[None, :], codes_arr]                # (n, m, d_sub)
        return pd.Series(((Q - sel) ** 2).sum(axis=(1, 2)))

    scored = cand.select(query_id_col, "nid",
                         adc(F.col("__qv"), F.col("pq_codes")).alias("dist"))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("dist").asc(), F.col("nid").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= kk)
            .select(query_id_col, "nid", "dist", "rank"))


def ivfpq_topk_fixed(corpus: DataFrame, queries: DataFrame, kk: int = 10,
                     n_cells: int = 8, n_probe: int = 2,
                     m: int = 8, k: int = 16,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     query_id_col: str = "qid", dim: int = 64) -> DataFrame:
    """IVF-PQ: the FAISS IndexIVFPQ composition and the engine's
    100 TB ANN path — candidates pruned by the coarse-cell equi-join
    (only ``n_probe``/``n_cells`` of the corpus is touched per query),
    then ranked by the exact-integer PQ asymmetric distance over the
    compressed code stream.  Both stages run against fixed md5-derived
    codebooks, so the full pipeline — assignment, probing, codes, every
    distance — replays bit-for-bit in SQL."""
    from xarray_spark.extras.portable import centroid_coeffs, pq_codebook
    d_sub = dim // m
    cents = centroid_coeffs(n_cells, dim)
    C = np.array(pq_codebook(m, k, d_sub), dtype=np.int64)

    base_c = corpus.select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).cast("array<double>").alias("__cv"),
    ).withColumn("__cell", _nearest_cells_int(F.col("__cv"), cents, 1)[0])
    codes = pq_encode_fixed(
        base_c.select(F.col("nid").alias(id_col), F.col("__cv").alias(vec_col)),
        m, k, id_col, vec_col, dim,
    ).select(F.col(id_col).alias("nid"), "pq_codes")
    corpus_side = base_c.select("nid", "__cell").join(codes, on="nid")

    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    ).withColumn("__cell",
                 F.explode(_nearest_cells_int(F.col("__qv"), cents, n_probe)))
    cand = corpus_side.join(F.broadcast(q), on="__cell", how="inner").where(
        F.col("nid") != F.col(query_id_col))

    @F.pandas_udf("long")
    def adc(qv: pd.Series, cd: pd.Series) -> pd.Series:
        Qm = np.stack(qv.to_numpy()).astype(np.float64)
        Q = np.floor(Qm * 1e6).astype(np.int64).reshape(len(Qm), m, d_sub)
        codes_arr = np.stack(cd.to_numpy()).astype(np.int64)
        sel = C[np.arange(m)[None, :], codes_arr]
        return pd.Series(((Q - sel) ** 2).sum(axis=(1, 2)))

    scored = cand.select(query_id_col, "nid",
                         adc(F.col("__qv"), F.col("pq_codes")).alias("dist"))
    scored = scored.dropDuplicates([query_id_col, "nid"])
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("dist").asc(), F.col("nid").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= kk)
            .select(query_id_col, "nid", "dist", "rank"))


def semdedup_train_centroids(
    corpus: DataFrame,
    n_cells: int = 8,
    dim: int = 64,
    iters: int = 2,
    sample_max_id: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[int]]:
    """Deterministic, SQL-replayable Lloyd training for the semdedup
    PRODUCTION path (trained codebook) — the bit-exact twin of ivf_fit
    for gate verification.  Every step is integer arithmetic both
    engines reproduce:

    - training sample = vectors with ``id < sample_max_id`` (no hash
      order, no RNG), floor-quantized to the 1e6 integer space the
      portable oracles already use;
    - init = the md5 integer codebook (portable.centroid_coeffs);
    - each Lloyd iteration: integer-exact L2 assignment (ties → lowest
      cell id), then per-dim centroid update
      ``floor((2*sum + n) / (2*n))`` — round-half-up expressed as a
      mathematical floor, identical under Python integer floor division
      and DuckDB's float ``FLOOR`` (quotient denominators ≤ 2n keep the
      float division exact around integers); an empty cell keeps its
      previous centroid.

    The bounded sample (≤ sample_max_id rows × dim ints) trains on the
    driver in one collect — the ivf_fit lifecycle: codebooks are
    driver-small artifacts, queries stay free of ML jobs.

    Also exported as :data:`train_centroids_int` — the same trained
    integer codebook drives the IVF query path (ivf_topk_fixed
    ``centroids_q=``, gate q134), not just semdedup."""
    from xarray_spark.extras.portable import centroid_coeffs
    rows = (
        corpus.where(F.col(id_col) < sample_max_id)
        .select(F.col(vec_col).cast("array<double>").alias("v"))
        .collect()
    )
    X = np.floor(
        np.array([r["v"] for r in rows], dtype=np.float64) * 1e6
    ).astype(np.int64)
    cents = [list(c) for c in centroid_coeffs(n_cells, dim)]
    for _ in range(iters):
        C = np.array(cents, dtype=np.int64)
        d = ((X * X).sum(1)[:, None] - 2 * (X @ C.T) + (C * C).sum(1)[None, :])
        assign = d.argmin(axis=1)  # first occurrence = lowest cell id
        new = []
        for c in range(n_cells):
            m = assign == c
            if m.any():
                s = X[m].sum(axis=0)
                n = int(m.sum())
                new.append([(2 * int(sj) + n) // (2 * n) for sj in s])
            else:
                new.append(cents[c])
        cents = new
    return cents


#: the integer Lloyd trainer is codebook-purpose-agnostic — the IVF
#: query path (gate q134) trains with the same function
train_centroids_int = semdedup_train_centroids


def semdedup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 8,
    dim: int = 64,
    centroids: list | None = None,
    centroids_q: list | None = None,
) -> DataFrame:
    """Semantic-dedup candidate pairs — the SemDeDup recipe (Abbas et
    al. 2023, "SemDeDup: Data-efficient learning at web-scale through
    semantic deduplication"): k-means-cluster the embeddings, then
    call two documents semantic duplicates when their cosine
    similarity WITHIN a cluster exceeds ``threshold``.

    This variant uses the fixed md5-derived integer codebook
    (extras.portable.centroid_coeffs, the same one q97/q113 pin), so
    cell assignment is integer-exact and a SQL oracle replays every
    pair.  Production swaps in ivf_fit's trained centroids — the plan
    is identical.

    Scale shape: one Arrow-matmul cell assignment (no ML jobs), then
    ONE shuffle on the cell id into a per-cell applyInPandas that
    computes the cell's cosine matrix as a blocked BLAS matmul and
    emits only the pairs above threshold.  Each vector crosses Arrow
    ONCE — the previous self-join + per-pair UDF shipped both vectors
    for every candidate pair (28 GB of Arrow traffic at sf0.1 vs
    ~30 MB; rewritten round 10 after the driver bench showed 2→13 s
    run-to-run variance from exactly that churn).  The within-cell
    pair count is still (n/n_cells)²·n_cells, so SIZE n_cells TO THE
    CORPUS — SemDeDup itself uses ~sqrt-scale cluster counts (11k
    clusters for LAION) — but only the QUALIFYING pairs are ever
    materialized now; the matrix lives in bounded ~64 MB blocks
    inside the kernel.  Returns (id_a, id_b, cos) with id_a < id_b.
    """
    from xarray_spark.extras.dedup import _spread
    base = _spread(corpus, id_col).select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).cast("array<double>").alias("__cv"),
    )
    if centroids_q is not None:
        # TRAINED integer codebook (semdedup_train_centroids): the
        # production trained path with the fixed codebook's
        # bit-replayability — integer-exact assignment, SQL oracle
        # replays training AND assignment (gate q126).
        base = base.withColumn(
            "__cell", _nearest_cells_int(F.col("__cv"), centroids_q, 1)[0])
    elif centroids is not None:
        # TRAINED codebook (ivf_fit) — the production path: k-means
        # centroids track the data's cluster structure, so cell sizes
        # actually shrink as n_cells grows.  The fixed md5 codebook
        # (default) is the oracle-replayable path, but on clustered
        # data its random centroids leave most vectors in a few cells
        # and the within-cell pair count stays quadratic in the
        # cluster size — measured round 5: 20k clustered vectors,
        # 512 random cells: 62 s; 64 TRAINED cells: see SCALE.md.
        base = base.withColumn(
            "__cell", _nearest_cells(F.col("__cv"), centroids, 1)[0])
    else:
        from xarray_spark.extras.portable import centroid_coeffs
        cents = centroid_coeffs(n_cells, dim)
        base = base.withColumn(
            "__cell", _nearest_cells_int(F.col("__cv"), cents, 1)[0])
    thr = float(threshold)

    def cell_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        m = len(pdf)
        empty = pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                              "id_b": pd.Series(dtype="int64"),
                              "cos": pd.Series(dtype="float64")})
        if m < 2:
            return empty
        ids = pdf["nid"].to_numpy()
        vecs = np.stack(pdf["__cv"].to_numpy()).astype("float64")
        nrm = np.sqrt((vecs * vecs).sum(axis=1))
        cols = np.arange(m)
        out_a, out_b, out_c = [], [], []
        blk = max(16, 8_000_000 // max(m, 1))  # ≈64 MB cosine blocks
        for s in range(0, m, blk):
            e = min(s + blk, m)
            num = vecs[s:e] @ vecs.T
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = num / (nrm[s:e, None] * nrm[None, :])
            # the repo-wide epsilon rounding (see _round6) applied
            # in-kernel so the threshold compares the ROUNDED value,
            # exactly like the previous plan's filter
            cosr = np.round(cos + 1e-9, 6)
            keep = (cols[None, :] > np.arange(s, e)[:, None]) \
                & (cosr >= thr)
            ri, ci = np.nonzero(keep)
            if not len(ri):
                continue
            ia, ib = ids[ri + s], ids[ci]
            # strict id_a < id_b (the previous join's predicate):
            # duplicate ids never pair with themselves
            ne = ia != ib
            ia, ib, ri, ci = ia[ne], ib[ne], ri[ne], ci[ne]
            if not len(ia):
                continue
            swap = ia > ib
            out_a.append(np.where(swap, ib, ia))
            out_b.append(np.where(swap, ia, ib))
            out_c.append(cosr[ri, ci])
        if not out_a:
            return empty
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b),
                             "cos": np.concatenate(out_c)})

    id_t = base.schema["nid"].dataType.simpleString()
    return base.groupBy("__cell").applyInPandas(
        cell_pairs, f"id_a {id_t}, id_b {id_t}, cos double")


def semdedup_keep(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Ids surviving SemDeDup: connected components over the
    semantic-duplicate pairs, keep the minimum id per component (the
    same canonical-keep convention as extras.dedup).  Components are
    cell-local by construction, so the label propagation converges in
    O(log cluster-diameter) keyed joins."""
    from xarray_spark.extras.dedup import connected_components
    pairs = semdedup_pairs(corpus, threshold, id_col, vec_col,
                           n_cells, dim)
    comp = connected_components(pairs, "id_a", "id_b")
    drop = comp.where(F.col("id") != F.col("cluster")) \
               .select(F.col("id").alias(id_col))
    return corpus.select(id_col).distinct().join(
        drop, on=id_col, how="left_anti")
