"""Deduplication operators for document corpora at scale.

- exact: hash-groupBy on a 64-bit fingerprint (one shuffle keyed by the
  hash, never by the full text).
- MinHash + LSH: shingles → k minhashes → b bands → self-join on band
  signature → candidate pairs → exact Jaccard verify.  The classic
  Broder/LSH pipeline (public: Mining of Massive Datasets ch.3),
  expressed entirely in DataFrame ops — the band join is an equi-join
  Catalyst can shuffle-hash; no Python in the loop.
- SimHash: per-token 64-bit hashes, bit-vote aggregate, hamming buckets.
- n-gram Jaccard: explode shingles, equi-join on shingle, |A∩B|/|A∪B|.
- embedding near-dup: cosine ≥ threshold via the similarity module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from xarray_spark.extras.text import fingerprint, ngrams


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                keep: str = "first") -> DataFrame:
    """Exact dedup: keep the min (first) / max (last) id per normalized
    text fingerprint.  Shuffle key = 64-bit hash, not the document."""
    fp = fingerprint(F.col(text_col))
    order = F.col(id_col).asc() if keep == "first" else F.col(id_col).desc()
    w = Window.partitionBy(fp).orderBy(order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def _spread(df: DataFrame, id_col: str) -> DataFrame:
    """Repartition before a heavy explode ONLY when the scan is
    under-parallel (single/few-file inputs — the local-test shape).
    A 100 TB input already arrives in thousands of splits; re-keying
    it by id would be a full-table shuffle for nothing.  Partition
    count read from the plan, no job."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        have = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - plan->RDD edge cases
        have = 0
    if have >= max(2, target // 2):
        return df
    return df.repartition(target, id_col)


def minhash_signatures(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                       num_hashes: int = 64, n: int = 3,
                       shard_cols: list | None = None,
                       hash_mode: str = "fast") -> DataFrame:
    """(id, minhash[num_hashes]) per document.

    Shape matters for scale: explode shingles → ONE xxhash64 per
    (shingle, seed) → num_hashes partial-aggregated MINs → assemble the
    signature array.  The naive per-row form (array of k
    array_min(transform(...))) makes Catalyst inline the shingle
    expression k times — k× the work, on however few partitions the
    scan produced.  The explode form hashes each shingle once and the
    min aggregate is map-side partial, so the shuffle carries only
    (id, k longs) per document.

    ``hash_mode="portable"`` swaps xxhash64 for the md5-derived
    universal hashes of extras.portable — bit-identical in DuckDB SQL,
    so the LSH pipeline becomes oracle-verifiable (one md5 + 64
    multiply-mods per shingle instead of 65 JVM xxhashes: the fast mode
    stays the production default).
    """
    shard_cols = list(shard_cols or [])
    ex = (
        _spread(df, id_col)
        .select(F.col(id_col), *shard_cols,
                F.explode(F.array_distinct(ngrams(F.col(text_col), n))).alias("__sh"))
    )
    if hash_mode == "portable":
        from xarray_spark.extras.portable import PRIME31, md5_long, perm_coeffs
        ex = ex.withColumn("__h", md5_long(F.col("__sh")) % F.lit(PRIME31))
        coeffs = perm_coeffs(num_hashes)
        aggs = [
            F.min((F.lit(a) * F.col("__h") + F.lit(b)) % F.lit(PRIME31)).alias(f"__m{i}")
            for i, (a, b) in enumerate(coeffs)
        ]
    else:
        ex = ex.withColumn("__h", F.xxhash64("__sh"))
        aggs = [F.min(F.xxhash64("__h", F.lit(i))).alias(f"__m{i}") for i in range(num_hashes)]
    sig = ex.groupBy(id_col, *shard_cols).agg(*aggs)
    return sig.select(
        id_col, *shard_cols,
        F.array(*[F.col(f"__m{i}") for i in range(num_hashes)]).alias("minhash")
    )


def minhash_lsh_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                      n: int = 3, num_hashes: int = 64, bands: int = 16,
                      threshold: float = 0.5,
                      shard_cols: list | None = None,
                      hash_mode: str = "fast") -> DataFrame:
    """Candidate near-dup pairs via banded LSH, verified with the
    signature-estimated Jaccard.

    bands=16 × rows=4 over 64 hashes → s-curve threshold ≈ (1/16)^(1/4)
    ≈ 0.5.  Scale path: the band self-join shuffles on (band_id,
    band_hash) — uniformly distributed keys, no skew; dedup of pairs by
    (a < b).
    """
    rows_per_band = num_hashes // bands
    shard_cols = list(shard_cols or [])
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, n, shard_cols,
                              hash_mode=hash_mode)
    # The signature table is read THREE times (band explode + the two
    # candidate-pair re-joins); without materialization Spark re-runs
    # the whole shingle→hash→min pipeline per read.  Materialize once —
    # (id, 64 longs) per doc is the compact artifact you would persist
    # as a table at corpus scale anyway (lineage truncated, storage
    # reclaimed by the context cleaner when the frame is collected).
    sigs = sigs.localCheckpoint(eager=False)

    def band_key(b):
        joined = F.concat_ws(",", *[
            F.col("minhash")[b * rows_per_band + r].cast("string")
            for r in range(rows_per_band)
        ])
        # Both modes collapse the band tuple to ONE long join key (a
        # string key costs ~30% on the band self-join shuffle); portable
        # uses the md5-derived hash the oracle can recompute.
        if hash_mode == "portable":
            from xarray_spark.extras.portable import md5_long
            return md5_long(F.concat(joined, F.lit(f"|{b}")))
        return F.xxhash64(joined, F.lit(b))

    band_arr = F.array(*[band_key(b) for b in range(bands)])
    # band rows carry ONLY (id, band_id, band_hash) — not the 64-long
    # signature, which would ride the ×bands explode through the shuffle.
    # Signatures re-join on the (deduped, far smaller) candidate pair set.
    banded = sigs.withColumn("__bands", band_arr).select(
        id_col, *shard_cols,
        F.posexplode("__bands").alias("band_id", "band_hash")
    )
    left = banded.alias("a")
    right = banded.alias("b")
    cand = (
        left.join(right, on=["band_id", "band_hash", *shard_cols], how="inner")
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .join(sigs.select(F.col(id_col).alias("id_a"), F.col("minhash").alias("sig_a")), "id_a")
        .join(sigs.select(F.col(id_col).alias("id_b"), F.col("minhash").alias("sig_b")), "id_b")
    )
    est = F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m)) / F.lit(float(len(range(num_hashes))))
    return (
        cand.withColumn("jaccard_est", est)
        .where(F.col("jaccard_est") >= threshold)
        .select("id_a", "id_b", "jaccard_est")
    )


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = 64, shard_cols: list | None = None,
            hash_mode: str = "fast") -> DataFrame:
    """(id, simhash) per document: per-token xxhash64, majority vote per
    bit.

    Same scale shape as minhash_signatures: explode tokens → hash once →
    ``bits`` partial-aggregated vote SUMs → assemble the fingerprint.
    The per-row form (k nested F.aggregate over a transform) makes
    Catalyst duplicate the token-hash expression k times.

    ``hash_mode="portable"`` uses the md5-derived 60-bit token hash of
    extras.portable (use with ``bits <= 60``) so a DuckDB oracle can
    recompute the identical fingerprint."""
    shard_cols = list(shard_cols or [])
    toks = F.array_distinct(F.split(F.lower(F.trim(F.col(text_col))), "\\s+"))
    ex = (
        _spread(df, id_col)
        .select(F.col(id_col), *shard_cols, F.explode(toks).alias("__t"))
    )
    if hash_mode == "portable":
        from xarray_spark.extras.portable import md5_long
        if bits > 60:
            raise ValueError("portable simhash carries 60 hash bits (md5 prefix)")
        ex = ex.withColumn("__h", md5_long(F.col("__t")))
    else:
        ex = ex.withColumn("__h", F.xxhash64("__t"))

    # Per-bit one-counts S_b, packed 3 per aggregation column in 21-bit
    # lanes (lane capacity 2^21 ≈ 2M distinct tokens per doc — far above
    # any real document): ceil(bits/3) sum() columns instead of ``bits``
    # conditional aggregates, which cuts whole-stage-codegen compile and
    # buffer width ~3×.  Majority vote falls out as 2*S_b > n.
    LANE = 21
    n_packs = -(-bits // 3)

    def pack(j: int):
        h = F.col("__h")
        lanes = []
        for k in range(3):
            b = 3 * j + k
            if b >= bits:
                break
            bit = F.shiftrightunsigned(h, b).bitwiseAND(F.lit(1))
            lanes.append(F.shiftleft(bit, LANE * k))
        e = lanes[0]
        for x in lanes[1:]:
            e = e + x
        return F.sum(e).alias(f"__p{j}")

    votes = ex.groupBy(id_col, *shard_cols).agg(
        F.count(F.lit(1)).alias("__n"), *[pack(j) for j in range(n_packs)]
    )
    mask21 = (1 << LANE) - 1
    sim = None
    for b in range(bits):
        j, k = divmod(b, 3)
        s_b = F.shiftrightunsigned(F.col(f"__p{j}"), LANE * k).bitwiseAND(F.lit(mask21))
        bit_set = (s_b * 2) > F.col("__n")
        term = F.when(bit_set, F.expr(f"shiftleft(CAST(1 AS BIGINT), {b})")) \
                .otherwise(F.lit(0).cast("long"))
        sim = term if sim is None else sim.bitwiseOR(term)
    return votes.select(id_col, *shard_cols, sim.alias("simhash"))


def simhash_near_dups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                      max_hamming: int = 3, bits: int = 64,
                      shard_cols: list | None = None,
                      hash_mode: str = "fast") -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ k.

    Pigeonhole bucketing with **k+1 blocks** (Manku et al., WWW'07): k
    differing bits can touch at most k blocks, so at least one of the
    k+1 blocks matches exactly — recall is guaranteed for the requested
    ``max_hamming``, whatever it is (a fixed 4-block split silently
    drops pairs beyond hamming 3).  Trade-off: larger k ⇒ narrower
    blocks ⇒ coarser buckets (2^(64/(k+1)) of them) ⇒ a bigger candidate
    set to verify; at corpus scale keep k small or pre-shard by a
    cheap key (e.g. language) before calling this.
    """
    shard_cols = list(shard_cols or [])
    sh = simhash(df, text_col, id_col, bits=bits, shard_cols=shard_cols,
                 hash_mode=hash_mode)
    # fingerprints feed both sides of the block self-join — materialize
    # the (id, 1 long) table instead of re-running the token vote twice
    sh = sh.localCheckpoint(eager=False)
    n_blocks = min(max(max_hamming + 1, 1), bits)
    base, rem = divmod(bits, n_blocks)
    widths = [base + 1] * rem + [base] * (n_blocks - rem)
    starts = [sum(widths[:i]) for i in range(n_blocks)]
    if n_blocks == 1:
        keys = [F.struct(F.lit(0).alias("blk"), F.col("simhash").alias("key"))]
    else:
        keys = [
            F.struct(
                F.lit(i).alias("blk"),
                F.shiftrightunsigned("simhash", starts[i])
                .bitwiseAND(F.lit((1 << widths[i]) - 1)).alias("key"),
            )
            for i in range(n_blocks)
        ]
    blocks = sh.select(
        id_col, *shard_cols, "simhash",
        F.explode(F.array(*keys)).alias("b"),
    ).select(id_col, *shard_cols, "simhash",
             F.col("b.blk").alias("blk"), F.col("b.key").alias("key"))
    a, b = blocks.alias("a"), blocks.alias("b")
    # hamming filter BEFORE the cross-block dedup: the xor+bit_count is
    # a per-row expression inside the join stage, so the dropDuplicates
    # shuffle only carries true pairs (≤ n_blocks× the result) instead
    # of the whole pigeonhole candidate set (measured ~4.0 → ~3.0 s
    # warm at sf0.1 on q35's k=10 shape, whose coarse 5-6-bit blocks
    # inflate the candidate set well past the result) — and the
    # shuffled rows shrink to (id_a, id_b, hamming)
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(b, on=["blk", "key", *shard_cols], how="inner")
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
                ham.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                        n: int = 3, threshold: float = 0.5,
                        max_df: int | None = 1000,
                        shard_cols: list | None = None) -> DataFrame:
    """n-gram Jaccard similarity for pairs sharing ≥1 (non-ubiquitous)
    shingle.

    explode(shingles) → self-equi-join on shingle → count intersections →
    |A∩B| / (|A|+|B|−|A∩B|).  ``max_df`` drops shingles appearing in more
    than that many documents BEFORE the self-join (stop-shingle removal):
    a shingle shared by k docs contributes k² join rows, so the hottest
    keys dominate quadratically — at 100 TB this filter is the difference
    between a bounded join and a blow-up.  Jaccard is computed over the
    surviving shingle sets (exact when max_df=None).
    """
    shard_cols = list(shard_cols or [])
    sh = (
        _spread(df, id_col)
        .select(
            F.col(id_col), *shard_cols,
            F.explode(F.array_distinct(ngrams(F.col(text_col), n))).alias("sh"),
        )
        .withColumn("sh", F.xxhash64("sh"))
    )
    # stop-shingle removal: hash-aggregate the document frequency and
    # semi-join it back (partial+final agg, no sort — measurably cheaper
    # than a count-over-window, whose per-group window exec dominates)
    if max_df is not None:
        docfreq = sh.groupBy("sh").agg(F.count("*").alias("__df"))
        keep = docfreq.where(F.col("__df") <= max_df).select("sh")
        sh = sh.join(keep, on="sh", how="left_semi")
    # per-doc set size rides WITH each shingle row (window keyed by doc
    # id).  Broadcasting a one-row-per-document size table instead would
    # be an O(corpus) broadcast — a non-starter at 100 TB.
    w_sz = Window.partitionBy(id_col)
    sh = sh.withColumn("sz", F.count(F.lit(1)).over(w_sz))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, on=["sh", *shard_cols], how="inner")
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        # size filter (the length-filter bound of the set-similarity-join
        # literature, e.g. PPJoin): J(A,B) <= min/max of the set sizes,
        # so pairs failing min >= t*max can never reach the threshold.
        # Dropping them BEFORE the pair aggregation shrinks the hash
        # table the groupBy must hold — exactness is unaffected.
        .where(F.least(F.col("a.sz"), F.col("b.sz"))
               >= F.lit(threshold) * F.greatest(F.col("a.sz"), F.col("b.sz")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(
            F.count("*").alias("inter"),
            F.min("a.sz").alias("sz_a"),
            F.min("b.sz").alias("sz_b"),
        )
    )
    out = (
        inter
        .withColumn("jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def connected_components(edges: DataFrame, src: str = "id_a", dst: str = "id_b",
                         max_iter: int = 25) -> DataFrame:
    """Duplicate-cluster assignment from a near-dup pair list: min-label
    connected components, the stage that turns pairwise LSH/Jaccard
    output into deletable groups.  Returns ``(id, cluster)`` where
    ``cluster`` is the smallest id in the component — deterministic
    regardless of iteration order.

    Algorithm (the hash-to-min / pointer-jumping family of MapReduce CC
    — Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14): each round first relaxes every node's label to the min of
    its neighbors' labels (one shuffle keyed by node id), then pointer-
    jumps ``l(v) <- l(l(v))`` (a second keyed shuffle), which halves
    chain depth — so rounds = O(log diameter), not O(diameter).  Dedup
    graphs are shallow (near-clique clusters); typical convergence is
    2-3 rounds.

    Scale shape: every shuffle is keyed by node/label id; nothing but a
    one-row changed-count ever reaches the driver; ``localCheckpoint``
    truncates lineage each round so the plan doesn't grow with the
    iteration count.  The driver-paced loop is the algorithm's iteration
    structure (as in GraphX/GraphFrames), not a per-row collect.
    """
    # both edge directions from ONE scan of the (possibly expensive,
    # uncached) upstream pair pipeline — a union of two selects would
    # execute that pipeline twice, once per branch
    und = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("u"), F.col(dst).alias("v")),
                    F.struct(F.col(dst).alias("u"), F.col(src).alias("v")),
                )
            ).alias("e")
        )
        .select("e.u", "e.v")
    )
    und = und.persist()
    labels = (
        und.select(F.col("u").alias("id")).distinct()
        .withColumn("lbl", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for it in range(max_iter):
        nbr = (
            und.join(labels.withColumnRenamed("id", "v"), on="v")
            .groupBy("u").agg(F.min("lbl").alias("nl"))
        )
        relaxed = (
            labels.join(nbr.withColumnRenamed("u", "id"), on="id", how="left")
            .select("id", F.col("lbl").alias("__old"),
                    F.least("lbl", F.coalesce("nl", "lbl")).alias("lbl"))
        )
        # carry the pre-round label through the checkpoint so convergence
        # is a scan of the materialized partitions, not an extra
        # shuffle-join job against the previous labels frame
        if it == 0:
            # every label still equals its own id, so the pointer jump
            # l(v) <- l(l(v)) is an identity — skip its join+checkpoint
            jumped = (relaxed.select("id", "__old", "lbl")
                      .localCheckpoint(eager=True))
        else:
            jumped = (
                relaxed.alias("a")
                .join(labels.select(F.col("id").alias("lbl"),
                                    F.col("lbl").alias("ll")).alias("b"),
                      on="lbl", how="left")
                .select(F.col("a.id").alias("id"),
                        F.col("a.__old").alias("__old"),
                        F.least("lbl", F.coalesce("ll", "lbl")).alias("lbl"))
                .localCheckpoint(eager=True)
            )
        labels = jumped.select("id", "lbl")
        if it == 0 or it % 2 == 0:
            # round 1 always lowers labels when any edge exists, and
            # dedup graphs are shallow (near-clique clusters, depth
            # halved per round by the pointer jump) — scanning for
            # convergence EVERY round spends a ~1 s driver job per
            # round to learn what the next round's checkpoint would
            # compute anyway; check on odd rounds only (a converged
            # graph pays one extra cheap (id,lbl) round at most)
            continue
        changed = jumped.where(F.col("lbl") != F.col("__old")).limit(1).count()
        if changed == 0:
            break
    und.unpersist()
    return labels.select(F.col("id"), F.col("lbl").alias("cluster"))


def dedup_keep_canonical(df: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
                         src: str = "id_a", dst: str = "id_b") -> DataFrame:
    """End-to-end near-dup removal: cluster the pair list and keep one
    canonical row (the min id) per duplicate cluster; rows in no pair
    survive untouched.  Anti-join keyed by id — no row data moves
    through the CC iterations, only (id, label) pairs."""
    cc = connected_components(pairs, src, dst)
    drop = cc.where(F.col("id") != F.col("cluster")).select(F.col("id").alias(id_col))
    return df.join(drop, on=id_col, how="left_anti")
