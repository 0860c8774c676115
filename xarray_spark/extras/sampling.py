"""Deterministic, reproducible sampling for 100 TB training pipelines.

``df.sample()`` is seed-dependent per partitioning: the same call over
the same data re-partitioned returns a DIFFERENT sample, which breaks
resumable pipelines and train/test hygiene.  The operators here key
every decision on a content hash of a stable id column instead:

- **map-only**: a filter expression per row, no shuffle, no state —
  Catalyst pushes it into the scan like any other predicate;
- **reproducible**: the same row lands in the same split on any
  cluster, any partitioning, any engine (the hash is the md5-derived
  portable one, so a SQL engine reproduces the exact sample);
- **stable under growth**: appending new rows never reassigns old ones
  (the property that makes hash-split the standard train/test design
  for continuously-ingested corpora).

Public precedent: Spark's own ``hash``-mod bucketing idiom and the
train/test-split-by-hash pattern from large-scale ML data pipelines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from xarray_spark.extras.portable import md5_long

#: hash-space resolution: rates are quantized to 1e-6 (one in a million)
_DENOM = 1_000_000


def _bucket(key: Column, salt: str) -> Column:
    """Stable bucket in [0, 1e6): md5 of (salt + key-as-string).  The
    salt decorrelates independent sampling decisions on the same key."""
    return md5_long(F.concat(F.lit(salt), key.cast("string"))) % F.lit(_DENOM)


def hash_sample(df: DataFrame, rate: float, key_col: str,
                salt: str = "sample") -> DataFrame:
    """Keep a deterministic ``rate`` fraction of rows by key hash.

    Unlike ``df.sample(rate)`` this is exactly reproducible and
    partitioning-independent; unlike LIMIT it is unbiased.  Map-only:
    survives any scale-up as a pushed filter."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return df.where(_bucket(F.col(key_col), salt) < int(round(rate * _DENOM)))


def hash_split(df: DataFrame, weights: dict[str, float], key_col: str,
               salt: str = "split", split_col: str = "split") -> DataFrame:
    """Partition rows into named splits by key hash (train/val/test).

    ``weights`` maps split name → fraction (must sum to ≤ 1; any
    remainder is dropped, which expresses e.g. a 1 % eval carve-out of
    a huge corpus without a full pass).  Rows keep their split when new
    data is appended — the hygiene property random splits lack."""
    edges = []
    acc = 0.0
    for name, wfrac in weights.items():
        acc += wfrac
        edges.append((name, int(round(acc * _DENOM))))
    if edges and edges[-1][1] > _DENOM:
        raise ValueError(f"weights sum to {acc} > 1")
    b = _bucket(F.col(key_col), salt)
    expr = None
    prev = 0
    for name, hi in edges:
        cond = (b >= F.lit(prev)) & (b < F.lit(hi))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
        prev = hi
    # rows past the last edge (weights summing below 1) are DROPPED, as
    # documented — a NULL split would silently leak them into whichever
    # side forgets to filter
    return df.withColumn(split_col, expr).where(F.col(split_col).isNotNull())


def stratified_hash_sample(df: DataFrame, rates: dict[str, float],
                           stratum_col: str, key_col: str,
                           salt: str = "stratum") -> DataFrame:
    """Per-stratum deterministic sampling rates (e.g. downsample the
    dominant language, keep all of a rare one).  The rate lookup is a
    literal CASE expression — no join, no shuffle; strata not listed in
    ``rates`` are dropped."""
    b = _bucket(F.col(key_col), salt)
    expr = None
    for stratum, r in rates.items():
        cond = (F.col(stratum_col) == F.lit(stratum)) & (b < int(round(r * _DENOM)))
        expr = cond if expr is None else expr | cond
    if expr is None:
        raise ValueError("rates must be non-empty")
    return df.where(expr)


def shuffle_deterministic(df: DataFrame, key_col: str,
                          salt: str = "shuffle",
                          out_col: str = "shuffle_rank") -> DataFrame:
    """Reproducible global shuffle order for training: rank rows by the
    md5 bucket of their key (ties broken by the key itself).

    A training pipeline must SHUFFLE the corpus but also re-produce the
    same order on resume — ORDER BY rand() cannot.  The hash rank is
    that order: uniformly scrambled w.r.t. any natural ordering, yet a
    pure function of the data.

    Scale shape: the rank is the repo's two-phase form (range partition
    on the hash → local row_number → broadcast offset join,
    _utils.two_phase_rank) — NOT a partition-less global window, which
    would funnel the corpus through one task.  At write time you'd
    `repartitionByRange(hash).sortWithinPartitions` and skip the
    explicit rank entirely: the files' lexicographic order IS the
    shuffle."""
    from xarray_spark._utils import two_phase_rank

    h = md5_long(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    # rank on (hash, key): the key tie-break keeps the order total even
    # under a (astronomically rare) 60-bit hash collision
    tagged = df.withColumn("__shk", F.struct(h.alias("h"),
                                             F.col(key_col).alias("k")))
    ranked = two_phase_rank(tagged, "__shk")
    return (
        ranked.withColumn(out_col, (F.col("__rnk") + 1).cast("long"))
        .drop("__shk", "__rnk", "__n")
    )


def blend_epochs(df: DataFrame, weights: dict[str, float], source_col: str,
                 key_col: str, salt: str = "blend",
                 epoch_col: str = "epoch") -> DataFrame:
    """Weighted dataset blending with FRACTIONAL epochs — the mixture
    stage of a training pipeline ("2.3 epochs of source A, 0.25 of B").

    Weight w emits floor(w) whole copies of every row plus one more
    deterministic copy for a hash-selected w-floor(w) fraction; w < 1
    degenerates to plain stratified sampling.  The ``epoch_col`` output
    (0-based copy index) lets the downstream shuffle interleave copies
    instead of replaying the corpus epoch-by-epoch.

    Scale shape: a literal CASE expression per source (no join) feeding
    one ``posexplode`` of a ``sequence`` — map-only, no shuffle, and the
    fan-out factor is exactly the blend weight.  Deterministic: the
    fractional-copy decision hashes (salt, source, key), so the same row
    blends identically on any engine — the oracle replays it in SQL.

    Sources absent from ``weights`` are dropped (explicit > implicit)."""
    n_full_expr = None
    frac_expr = None
    for src, w in weights.items():
        if w < 0:
            raise ValueError(f"negative weight for {src!r}")
        n_full, frac = int(w), int(round((w - int(w)) * _DENOM))
        cond = F.col(source_col) == F.lit(src)
        n_full_expr = (F.when(cond, n_full) if n_full_expr is None
                       else n_full_expr.when(cond, n_full))
        frac_expr = (F.when(cond, frac) if frac_expr is None
                     else frac_expr.when(cond, frac))
    if n_full_expr is None:
        raise ValueError("weights must be non-empty")
    b = md5_long(F.concat(F.lit(salt), F.col(source_col).cast("string"),
                          F.lit("|"), F.col(key_col).cast("string"))) % F.lit(_DENOM)
    n_copies = n_full_expr.otherwise(F.lit(None)) + (b < frac_expr.otherwise(0)).cast("int")
    return (
        df.withColumn("__nc", n_copies)
        .where(F.col("__nc") > 0)
        .select("*", F.posexplode(F.sequence(F.lit(1), F.col("__nc")))
                .alias(epoch_col, "__dummy"))
        .drop("__nc", "__dummy")
    )


def _dsir_grams(src: DataFrame, text_col: str, id_col: str):
    """(id, gram) word unigrams + bigrams over normalized text.

    Normalization: lowercase, non-alphanumeric runs collapsed to one
    space, trimmed.  Bigrams join adjacent words with a single space.
    Every step is expressible identically in SQL (the oracle replays
    it), and it is all JVM expressions — no Python in the loop."""
    norm = F.trim(F.regexp_replace(
        F.lower(F.coalesce(F.col(text_col), F.lit(""))),
        r"[^a-z0-9]+", " "))
    words = F.when(F.length(norm) > 0, F.split(norm, " ")) \
             .otherwise(F.array().cast("array<string>"))
    base = src.select(F.col(id_col), words.alias("__w"))
    bi = F.when(
        F.size("__w") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("__w") - 1),
            lambda i: F.concat(F.element_at("__w", i), F.lit(" "),
                               F.element_at("__w", i + 1))),
    ).otherwise(F.array().cast("array<string>"))
    return base.select(
        id_col, F.explode(F.concat(F.col("__w"), bi)).alias("__g"))


def dsir_weights(df: DataFrame, target: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", buckets: int = 4096,
                 quant: int = 10_000, salt: str = "dsir") -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling" — public paper,
    reimplemented from the published method): estimate how much each
    raw document looks like the TARGET distribution using hashed
    n-gram features, so a web-scale corpus can be filtered toward a
    high-quality target (e.g. Wikipedia) without any model in the loop.

    Features are word unigrams + bigrams hashed into ``buckets`` slots;
    the target and raw corpora each induce a smoothed bag-of-buckets
    distribution ``p(b) = (cnt_b + 1) / (N + buckets)``, and a
    document's log importance weight is the sum over its features of
    ``ln p_target(b) - ln p_raw(b)``.  Per-bucket log-ratios are
    QUANTIZED to integers (``floor(quant * ln(num/den))`` of the exact
    integer rational ``num/den = (ct+1)(Nr+B) / (cr+1)(Nt+B)``, with
    ``num == den`` pinned to exactly 0) before summing, so per-document
    totals are exact integer sums — order-independent across
    partitions, runs, and engines (the q129/semdedup trick).

    Returns ``(id, n_feats, logw_q)`` for EVERY input document
    (``n_feats`` = feature count, 0-feature docs get ``logw_q = 0``).

    Scale shape: the ratio table is materialized DENSE over all
    ``buckets`` rows (bounded, a few KB — it broadcasts, and the dense
    form means the scoring join never needs a fallback branch); fitting
    is explode → bucket groupBy (partial-agged, bucket-bounded output);
    scoring is explode → broadcast-join → one doc-level partial-agg
    shuffle.  No all-pairs, no driver collect, no Python."""
    from pyspark.sql import Window

    from xarray_spark.extras.dedup import _spread
    from xarray_spark.extras.portable import md5_long

    if buckets < 2:
        raise ValueError(f"buckets must be >= 2, got {buckets}")
    spark = df.sparkSession
    tg = _dsir_grams(_spread(target, id_col), text_col, id_col)
    rg = _dsir_grams(_spread(df, id_col), text_col, id_col)
    bucket = lambda g: md5_long(  # noqa: E731
        F.concat(F.lit(salt + "|"), g)) % F.lit(buckets)

    tb = tg.select(bucket(F.col("__g")).alias("__b")) \
           .groupBy("__b").agg(F.count(F.lit(1)).alias("__ct"))
    rb = rg.select(bucket(F.col("__g")).alias("__b")) \
           .groupBy("__b").agg(F.count(F.lit(1)).alias("__cr"))
    dense = spark.range(buckets).select(F.col("id").cast("long").alias("__b"))
    w_all = Window.partitionBy()
    joined = (
        dense.join(tb, "__b", "left").join(rb, "__b", "left")
        .select("__b",
                F.coalesce("__ct", F.lit(0)).cast("long").alias("__ct"),
                F.coalesce("__cr", F.lit(0)).cast("long").alias("__cr"))
    )
    # ONE ln of the exact integer rational num/den instead of four
    # separate lns: num = (ct+1)*(Nr+B) and den = (cr+1)*(Nt+B) are
    # exact BIGINT products (safe below ~3e18 — fine to multi-billion-
    # gram corpora), the structural equal-distribution case num == den
    # quantizes to EXACTLY 0 in every engine (a four-term double sum
    # can land at ±1e-16 and floor to -1 under one libm and 0 under
    # another — the only systematic quantization-boundary hazard, since
    # for num != den the true quant*ln(num/den) is irrational and a
    # boundary hit is measure-zero), and the remaining cross-engine
    # surface is a single faithful-rounding ln of one IEEE division.
    nt = F.sum("__ct").over(w_all)
    nr = F.sum("__cr").over(w_all)
    num = ((F.col("__ct") + 1) * (nr + F.lit(buckets))).cast("long")
    den = ((F.col("__cr") + 1) * (nt + F.lit(buckets))).cast("long")
    lrq = F.when(num == den, F.lit(0).cast("long")).otherwise(
        F.floor(F.log(num.cast("double") / den.cast("double"))
                * F.lit(float(quant))).cast("long"))
    ratio = joined.select("__b", lrq.alias("__lrq"))

    per = (
        rg.select(id_col, bucket(F.col("__g")).alias("__b"))
        .join(F.broadcast(ratio), "__b")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_feats"),
             F.sum("__lrq").cast("long").alias("logw_q"))
    )
    return (
        df.select(id_col).join(per, id_col, "left")
        .select(id_col,
                F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
                F.coalesce("logw_q", F.lit(0)).cast("long").alias("logw_q"))
    )


def dsir_sample(df: DataFrame, target: DataFrame, k: int,
                text_col: str = "text", id_col: str = "doc_id",
                buckets: int = 4096, quant: int = 10_000,
                gumbel: bool = True, salt: str = "dsir",
                mode: str = "drop") -> DataFrame:
    """DSIR selection: resample ``k`` documents toward the target
    distribution by Gumbel top-k over the importance weights (the
    published method's sample-without-replacement trick: pick the k
    largest ``log w(x) + Gumbel noise``; with ``gumbel=False`` it
    degrades to deterministic top-k by weight).

    The Gumbel noise is DERIVED, not drawn: ``u`` comes from the md5
    bucket of (salt, id) and ``g = -ln(-ln(u))``, quantized to the same
    integer grid as the weights — so the selected set is a pure
    function of the data, reproducible on any cluster, any
    partitioning, and replayable in SQL by the oracle.

    ``mode='drop'`` returns only the selected ids; ``mode='flag'``
    returns every document with its score and a ``selected`` flag.

    Scale shape: scoring as in :func:`dsir_weights`; the top-k rank is
    the two-phase form (range partition on the score → local
    row_number → broadcast offset join) — never a partition-less
    global window.  At corpus scale you would instead pass the score
    threshold from a sampled quantile and keep selection map-only;
    the flag output exposes ``score_q`` for exactly that."""
    from xarray_spark._utils import two_phase_rank

    if mode not in ("drop", "flag"):
        raise ValueError(f"mode must be 'drop' or 'flag', got {mode!r}")
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    w = dsir_weights(df, target, text_col=text_col, id_col=id_col,
                     buckets=buckets, quant=quant, salt=salt)
    if gumbel:
        ub = _bucket(F.col(id_col), salt + "#g")
        u = (ub.cast("double") + F.lit(0.5)) / F.lit(float(_DENOM))
        gq = F.floor(-F.log(-F.log(u)) * F.lit(float(quant))).cast("long")
    else:
        gq = F.lit(0).cast("long")
    scored = w.withColumn("score_q", (F.col("logw_q") + gq).cast("long"))
    # materialize the DOC-LEVEL score table before ranking:
    # two_phase_rank's range partitioning runs a sampling pass, which
    # would otherwise re-execute the whole gram-explode pipeline 2-3x
    # (the q34 signature-table lesson).  Doc-level rows are the scored
    # corpus' "score table" — exactly what a production run persists
    # between scoring and selection.
    try:
        # lazy: the rank's range-sampling pass (first consumer job)
        # materializes it; the EAGER form paid an extra blocking
        # driver-paced job at operator-build time
        scored = scored.localCheckpoint(eager=False)
    except Exception:
        pass  # keep lineage when checkpointing is unavailable
    # unique ids make (-score, id) a total order, so two_phase_rank's
    # arbitrary tie placement never applies
    keyed = scored.withColumn(
        "__sk", F.struct((-F.col("score_q")).alias("s"),
                         F.col(id_col).alias("i")))
    ranked = two_phase_rank(keyed, "__sk")
    out = ranked.withColumn("selected", F.col("__rnk") < F.lit(k)) \
                .drop("__sk", "__rnk", "__n")
    if mode == "drop":
        return out.where("selected").drop("selected", "score_q")
    return out


def temperature_sample(df: DataFrame, source_col: str, key_col: str,
                       alpha: float = 0.5,
                       salt: str = "temp") -> DataFrame:
    """Temperature-scaled source rebalancing — the multilingual-corpus
    sampling rule (exponential smoothing q_s ∝ p_s^alpha used by
    mBERT/XLM-R style pipelines): a source holding share p_s of the
    corpus is downsampled with per-row keep rate
    ``r_s = (n_min / n_s)^(1 - alpha)``, so the sampled distribution
    follows p_s^alpha (alpha=1 keeps everything, alpha=0 equalizes all
    sources to the smallest).  Downsample-only by construction (the
    smallest source keeps rate 1); compose with :func:`blend_epochs`
    to upsample instead.

    Scale shape: one tiny per-source count aggregate (partial-agged),
    rates derived ON the count table (a window over #sources rows —
    never the data), broadcast-joined back, then the same
    deterministic md5-bucket filter every sampler here uses: map-only
    over the fact table, reproducible on any partitioning and in SQL.
    With ``alpha=0.5`` the rate arithmetic is sqrt+divide (both
    IEEE-correctly-rounded), so an external engine reproduces the
    exact row set bit-for-bit; other alphas go through pow(), where
    engines may differ in the last ulp on rate boundaries."""
    from pyspark.sql import Window
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__n"))
    w_all = Window.partitionBy()
    n_min = F.min("__n").over(w_all)
    if alpha == 0.5:
        rate = F.sqrt(n_min.cast("double") / F.col("__n").cast("double"))
    else:
        rate = F.pow(n_min.cast("double") / F.col("__n").cast("double"),
                     F.lit(1.0 - float(alpha)))
    rates = counts.withColumn(
        "__thresh", F.floor(rate * F.lit(float(_DENOM))).cast("long"))
    b = _bucket(F.concat(F.col(source_col).cast("string"), F.lit("|"),
                         F.col(key_col).cast("string")), salt)
    return (
        df.join(F.broadcast(rates.select(source_col, "__thresh")),
                on=source_col)
        .where(b < F.col("__thresh"))
        .drop("__thresh")
    )
