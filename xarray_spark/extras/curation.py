"""Corpus-curation operators: decontamination and sequence packing.

The two pipeline stages between "deduped corpus" and "training batches":

- **decontamination**: remove training documents whose content also
  appears in an evaluation set (train/test leakage).  The scalable form
  is an anti-join on a 64-bit content fingerprint — the eval side is
  tiny (benchmarks are thousands of rows, the corpus is billions), so
  the fingerprint set broadcasts and the scan streams once.
- **sequence packing**: lay variable-length documents end-to-end and
  cut fixed-token-budget training sequences (the concat-and-chunk
  packing GPT-style pipelines use — documents may straddle a boundary;
  the attention mask handles the joint).  Bin-packing variants that
  forbid straddling are a sequential recurrence (next-fit carries
  wasted space forward), but concat-and-chunk has a closed form over a
  prefix sum: bin = floor(tokens_before / budget) — a window sum
  Catalyst evaluates with no Python and no driver loop.  Packing runs
  WITHIN deterministic hash buckets so the prefix sums parallelize;
  re-runs produce identical layouts (resumable pipelines).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from xarray_spark.extras.dedup import _spread
from xarray_spark.extras.text import fingerprint, token_count


def decontaminate(corpus: DataFrame, eval_set: DataFrame,
                  text_col: str = "text", eval_text_col: str | None = None,
                  normalize: bool = True) -> DataFrame:
    """Drop corpus rows whose normalized text fingerprint appears in
    ``eval_set`` — exact-match train/test decontamination.

    Shape: the eval fingerprint set is DISTINCT'd then broadcast
    (benchmarks are small by construction); the corpus side is one scan
    plus a broadcast-hash anti-join — no shuffle of corpus rows at all.
    For fuzzy decontamination compose with the MinHash pair list
    (extras.dedup.minhash_lsh_pairs) over corpus ∪ eval instead."""
    eval_text_col = eval_text_col or text_col
    fps = (
        eval_set.select(
            fingerprint(F.col(eval_text_col), normalize).alias("__fp"))
        .distinct()
    )
    tagged = corpus.withColumn("__fp", fingerprint(F.col(text_col), normalize))
    return (
        tagged.join(F.broadcast(fps), on="__fp", how="left_anti")
        .drop("__fp")
    )


def pack_sequences(df: DataFrame, budget: int,
                   text_col: str = "text", id_col: str = "doc_id",
                   n_buckets: int = 1024,
                   count_col: str | None = None) -> DataFrame:
    """Concat-and-chunk packing layout: documents are laid end-to-end
    per hash bucket (deterministic order by id) and each is labeled
    with the ``budget``-token chunk its first token falls in.

    Returns the input plus ``n_tokens``, ``tokens_before`` (start
    offset inside the bucket's token stream), ``bucket`` and ``bin``
    (= floor(tokens_before / budget)) — everything a writer needs to
    ``repartition("bucket").sortWithinPartitions("tokens_before")`` and
    emit dense training sequences.

    Scale shape: one shuffle keyed by the deterministic bucket, one
    window prefix-sum per bucket — bucket count scales the parallelism;
    identical layout on every re-run."""
    from xarray_spark.extras.portable import md5_long

    nt = (F.col(count_col) if count_col
          else token_count(F.col(text_col))).cast("long")
    # portable bucket hash (one md5 per document — not a hot path): the
    # layout is reproducible on ANY engine, which is what you want for
    # a packing manifest other systems must be able to recompute.
    b = F.pmod(md5_long(F.col(id_col).cast("string")), F.lit(n_buckets))
    base = df.withColumn("n_tokens", nt).withColumn("bucket", b)
    w = (Window.partitionBy("bucket").orderBy(F.col(id_col))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    pre = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("tokens_before")
    return (
        base.withColumn("tokens_before", pre)
        .withColumn("bin", F.floor(F.col("tokens_before") / F.lit(budget)))
    )


def chunk_documents(df: DataFrame, chunk_chars: int, overlap: int = 0,
                    text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Split documents into fixed-width character chunks with optional
    overlap — the chunking stage of a retrieval/embedding pipeline.

    Returns one row per chunk: (id, chunk_idx, chunk_start, chunk) with
    stride ``chunk_chars - overlap``.  Pure JVM expressions: the offset
    list is a ``sequence`` and the slicing a ``substring`` inside a
    ``transform`` + ``posexplode`` — no Python, and the explode happens
    after the scan so Spark shuffles chunk rows only if a downstream op
    asks it to.  Empty documents yield one empty chunk (so no document
    silently disappears from the index)."""
    if overlap >= chunk_chars:
        raise ValueError(f"overlap {overlap} must be < chunk_chars {chunk_chars}")
    stride = chunk_chars - overlap
    # NULL text behaves like empty text (one empty chunk) instead of
    # collapsing the floor(NULL) start list to a single NULL chunk.
    t = F.coalesce(F.col(text_col), F.lit(""))
    n = F.length(t)
    # starts: 0, stride, 2*stride, ... covering [0, len); len==0 -> [0]
    starts = F.sequence(
        F.lit(0),
        F.greatest(
            F.floor((n - F.lit(1)).cast("double") / F.lit(stride)).cast("long"),
            F.lit(0).cast("long"),
        ) * F.lit(stride),
        F.lit(stride),
    )
    chunks = F.transform(
        starts, lambda s: F.substring(t, (s + 1).cast("int"), chunk_chars)
    )
    return (
        df.select(F.col(id_col),
                  F.posexplode(chunks).alias("chunk_idx", "chunk"))
        .withColumn("chunk_start", (F.col("chunk_idx") * F.lit(stride)).cast("long"))
    )


def dedup_lines(df: DataFrame, min_df: int = 2, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Corpus-wide boilerplate line removal (the C4/CCNet paragraph-
    dedup step: drop every line that occurs in ≥ ``min_df`` distinct
    documents — navigation chrome, cookie banners, license footers —
    then reassemble each document from its surviving lines in order).

    Returns (id, text, n_kept, n_dropped) with ``text`` rebuilt from the
    kept lines joined by newlines.

    Scale shape: one ``posexplode`` (line order rides along as the
    position), one partial-aggregated distinct-count per line to find
    the boilerplate set, one anti-join of the line stream against it
    (broadcast when the boilerplate set is small — it is, by Zipf), and
    one groupBy(id) reassembly via ``array_sort`` of (pos, line)
    structs.  At 100 TB you would key the count and the anti-join on
    ``xxhash64(line)`` so the shuffle carries 8-byte keys; the gate
    keeps the exact string key so the SQL oracle replays it verbatim."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    lines = _spread(df, id_col).select(
        F.col(id_col),
        F.posexplode(F.split(t, "\n")).alias("__pos", "__ln"),
    )
    boiler = (
        lines.where(F.length("__ln") > 0)
        .groupBy("__ln")
        .agg(F.countDistinct(id_col).alias("__df"))
        .where(F.col("__df") >= min_df)
        .select("__ln")
    )
    tagged = lines.join(F.broadcast(boiler.withColumn("__b", F.lit(1))),
                        on="__ln", how="left")
    kept = tagged.groupBy(id_col).agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(
                    F.when(F.col("__b").isNull(), F.struct(
                        F.col("__pos").alias("p"), F.col("__ln").alias("l"))))),
                lambda s: s["l"],
            ),
        ).alias(text_col),
        F.sum(F.when(F.col("__b").isNull(), 1).otherwise(0)).cast("long").alias("n_kept"),
        F.sum(F.when(F.col("__b").isNotNull(), 1).otherwise(0)).cast("long").alias("n_dropped"),
    )
    return kept


def dedup_substrings(df: DataFrame, k: int = 5, min_docs: int = 2,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Cross-document EXACT-substring dedup — the k-token-window form
    of "Deduplicating Training Data Makes Language Models Better"
    (Lee et al., ACL 2022, ExactSubstr): any run of ``k`` consecutive
    tokens appearing in ≥ ``min_docs`` distinct documents is a
    duplicated span; every document EXCEPT the canonical one (smallest
    id containing the span) drops the span's tokens, and the text is
    reassembled from the survivors in order.

    Returns (id, text, n_tokens, n_dropped).

    Scale shape — the suffix-array of the paper is a single-machine
    construction; the distributed equivalent is window hashing:
    one token posexplode; k-gram windows via ``slice`` inside a
    transform over the token array (linear in tokens × k); one
    partial-aggregated (n_docs, min_doc) per window key; a semi-join
    of window occurrences against the duplicated keys (broadcast under
    Zipf); span→token-position expansion with ``sequence`` ONLY for
    duplicated windows; one anti-join + ordered reassembly, the
    :func:`dedup_lines` pattern.  At corpus scale key the window
    shuffle on ``xxhash64(window)`` (8-byte keys); the exact string
    key here is what lets the SQL oracle replay it verbatim."""
    toks_arr = F.split(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+")
    base = _spread(df, id_col).select(F.col(id_col), toks_arr.alias("__ts"))
    # one row per token (for reassembly) …
    toks = base.select(
        id_col, F.posexplode("__ts").alias("__pos", "__tok"))
    # … and one row per k-token window start
    nwin = F.greatest(F.size("__ts") - F.lit(k - 1), F.lit(0))
    wins = base.select(
        id_col,
        F.posexplode(F.transform(
            F.sequence(F.lit(1), nwin),
            lambda i: F.array_join(F.slice(F.col("__ts"), i, k), " "),
        )).alias("__wpos", "__win"),
    )
    dup = (wins.groupBy("__win")
           .agg(F.countDistinct(id_col).alias("__nd"),
                F.min(id_col).alias("__canon"))
           .where(F.col("__nd") >= min_docs))
    # positions covered by a duplicated window in a NON-canonical doc.
    # No broadcast hint on `dup`: under Zipfian duplication it is tiny
    # and AQE broadcasts it from runtime stats anyway, but on the
    # adversarial wide-duplication corpus this operator exists for, the
    # duplicated-window table can exceed driver memory at 100 TB — a
    # forced broadcast there is an OOM, a shuffled join is just a plan.
    drop_pos = (
        wins.join(dup, on="__win")
        .where(F.col(id_col) != F.col("__canon"))
        .select(id_col, F.explode(
            F.sequence(F.col("__wpos"), F.col("__wpos") + F.lit(k - 1))
        ).alias("__pos"))
        .distinct()
    )
    tagged = toks.join(drop_pos.withColumn("__d", F.lit(1)),
                       on=[id_col, "__pos"], how="left")
    return tagged.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(
                    F.when(F.col("__d").isNull(), F.struct(
                        F.col("__pos").alias("p"), F.col("__tok").alias("t"))))),
                lambda s: s["t"],
            ),
        ).alias(text_col),
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum(F.col("__d").isNotNull().cast("int")).cast("long").alias("n_dropped"),
    )


_GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have",
                     "with"]


def gopher_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
    keep: tuple = (),
) -> DataFrame:
    """Gopher quality-rule document filter (Rae et al. 2021, "Scaling
    Language Models: Methods, Analysis & Insights from Training
    Gopher", Appendix A — the rule set C4/MassiveText-style pipelines
    apply before dedup): word-count bounds, mean-word-length bounds,
    symbol-to-word ratio (# and ellipsis), alphabetic-word fraction,
    and a minimum stop-word hit count.

    Returns ``(id, n_words, mean_word_len, symbol_ratio, alpha_frac,
    stop_hits, passes)`` — signals kept so downstream can re-threshold
    without rescanning.

    Scale shape: pure JVM expressions over one projection — a single
    map-only pass, no shuffle, no Python; the words array is BOUND to a
    column first (Catalyst does not CSE inside HOF lambdas — the
    round-4 lesson), so each signal reuses one split."""
    txt = F.coalesce(F.col(text_col), F.lit(""))
    keep = [c for c in keep if c != id_col]
    base = df.select(
        F.col(id_col), *keep,
        txt.alias("__t"),
        F.split(F.trim(txt), r"\s+").alias("__w"),
    ).select(
        id_col, *keep, "__t", "__w",
        F.when(F.trim(F.col("__t")) == "", F.lit(0))
        .otherwise(F.size("__w")).alias("n_words"),
    )
    wlen = F.aggregate(
        "__w", F.lit(0).cast("long"),
        lambda acc, w: acc + F.length(w))
    n = F.col("n_words")
    hash_count = (F.length("__t")
                  - F.length(F.replace(F.col("__t"), F.lit("#"), F.lit(""))))
    ellipsis_count = (
        (F.length("__t")
         - F.length(F.replace(F.col("__t"), F.lit("..."), F.lit("")))) / 3
    ).cast("long")
    alpha_words = F.size(F.filter(
        "__w", lambda w: w.rlike("[a-zA-Z]")))
    stop_arr = F.array(*[F.lit(s) for s in _GOPHER_STOPWORDS])
    stop_hits = F.size(F.filter(
        "__w", lambda w: F.array_contains(stop_arr, F.lower(w))))
    sig = base.select(
        id_col, *keep, "n_words",
        F.when(n > 0, F.round(wlen / n + F.lit(1e-9), 6))
        .otherwise(F.lit(0.0)).alias("mean_word_len"),
        F.when(n > 0, F.round((hash_count + ellipsis_count) / n
                              + F.lit(1e-9), 6))
        .otherwise(F.lit(0.0)).alias("symbol_ratio"),
        F.when(n > 0, F.round(alpha_words / n + F.lit(1e-9), 6))
        .otherwise(F.lit(0.0)).alias("alpha_frac"),
        stop_hits.cast("long").alias("stop_hits"),
    )
    passes = (
        (F.col("n_words") >= min_words) & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len)
        & (F.col("symbol_ratio") <= max_symbol_word_ratio)
        & (F.col("alpha_frac") >= min_alpha_word_frac)
        & (F.col("stop_hits") >= min_stopword_hits)
    )
    return sig.withColumn("passes", passes)


def c4_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_line_words: int = 3,
    min_sentences: int = 5,
    badwords: tuple = (),
    drop_brace_docs: bool = True,
) -> DataFrame:
    """C4 cleaning rules (Raffel et al. 2020, "Exploring the Limits of
    Transfer Learning with a Unified Text-to-Text Transformer", §2.2 —
    the heuristics that turned Common Crawl into C4):

    line level (lines are ``\\n``-separated; failing lines are REMOVED,
    the document survives with the kept lines):
      - keep only lines ending in a terminal punctuation mark
        (``.`` ``!`` ``?`` ``"``),
      - keep only lines with >= ``min_line_words`` words,
      - drop any line containing the word "javascript" (case-blind);
    document level (failing documents get ``passes = false``):
      - >= ``min_sentences`` sentences in the KEPT text (approximated
        as terminal-punctuation count — the paper uses a sentence
        tokenizer; the count is exact on the punctuation the line rule
        just enforced),
      - no "lorem ipsum" (case-blind) in the RAW text,
      - no curly brace in the RAW text (code page heuristic),
      - no word from ``badwords`` (word-boundary, case-blind; pass the
        production blocklist here — the default is empty).

    Returns ``(id, n_lines, n_lines_kept, n_sentences, clean_chars,
    clean_text, passes)`` — signals kept so downstream can re-threshold
    without rescanning, ``clean_text`` is the line-filtered document.

    Scale shape: like :func:`gopher_filter` a single map-only JVM
    projection — the lines array is bound to a column once (no CSE
    inside HOF lambdas), every rule is a Catalyst expression, no
    shuffle, no Python, nothing leaves the scan stage."""
    txt = F.coalesce(F.col(text_col), F.lit(""))
    base = df.select(
        F.col(id_col),
        txt.alias("__t"),
        F.split(txt, "\n").alias("__l"),
    )
    keep = lambda l: (  # noqa: E731 — HOF predicate, reads best inline
        F.trim(l).rlike('[.!?"]$')
        & (F.size(F.split(F.trim(l), r"\s+")) >= min_line_words)
        & ~F.lower(l).contains("javascript")
    )
    kept = base.select(
        id_col, "__t",
        F.size("__l").alias("n_lines"),
        F.filter("__l", keep).alias("__k"),
    ).select(
        id_col, "__t", "n_lines",
        F.size("__k").alias("n_lines_kept"),
        F.array_join(F.transform("__k", lambda l: F.trim(l)), "\n")
        .alias("clean_text"),
    )
    sig = kept.select(
        id_col, "n_lines", "n_lines_kept",
        F.regexp_count("clean_text", F.lit("[.!?]")).cast("long")
        .alias("n_sentences"),
        F.length("clean_text").cast("long").alias("clean_chars"),
        "clean_text", "__t",
    )
    passes = (
        (F.col("n_sentences") >= min_sentences)
        & ~F.lower(F.col("__t")).contains("lorem ipsum")
    )
    if drop_brace_docs:
        passes = passes & ~F.col("__t").contains("{")
    if badwords:
        pat = "(?i)\\b(" + "|".join(re.escape(w) for w in badwords) + ")\\b"
        passes = passes & ~F.col("__t").rlike(pat)
    return sig.withColumn("passes", passes).drop("__t")


def decontaminate_ngrams(
    corpus: DataFrame,
    eval_set: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_text_col: str | None = None,
    mode: str = "flag",
) -> DataFrame:
    """N-gram-overlap train/test decontamination (the GPT-3 appendix C
    method, Brown et al. 2020, and the standard eval-decontamination
    rule since: a training document is CONTAMINATED if it shares any
    word ``n``-gram — canonically 13 — with any evaluation document).

    Exact fingerprints (:func:`decontaminate`) miss near-copies with
    one changed character; 13-gram overlap catches any shared passage
    longer than ~13 words.

    ``mode='flag'`` returns ``(id, n_hits, contaminated)`` — one row
    per corpus doc with the count of overlapping n-grams, so
    downstream can threshold; ``mode='drop'`` returns the clean corpus
    rows unchanged (anti-join form).

    Scale shape: eval n-grams are DISTINCT'd and hashed to 64-bit on
    the (tiny, benchmark-sized) eval side and BROADCAST; the corpus
    side is one explode → broadcast-hash semi-probe → partial-agg
    count per doc.  Corpus rows never shuffle in 'drop' mode; 'flag'
    mode shuffles only (id, hit) pairs that actually matched.
    Normalization on both sides: lowercase + whitespace collapse."""
    from xarray_spark.extras.text import ngrams

    eval_text_col = eval_text_col or text_col
    ev = (
        eval_set.select(F.explode(
            ngrams(F.coalesce(F.col(eval_text_col), F.lit("")), n))
            .alias("__g"))
        .where(F.length("__g") > 0)
        .select(F.xxhash64("__g").alias("__gh"))
        .distinct()
    )
    grams = corpus.select(
        F.col(id_col),
        F.explode(ngrams(F.coalesce(F.col(text_col), F.lit("")), n))
        .alias("__g"),
    ).where(F.length("__g") > 0).select(
        id_col, F.xxhash64("__g").alias("__gh"))
    if mode == "drop":
        bad = (grams.join(F.broadcast(ev), on="__gh", how="left_semi")
               .select(id_col).distinct())
        return corpus.join(bad, on=id_col, how="left_anti")
    hits = (grams.join(F.broadcast(ev), on="__gh", how="left_semi")
            .groupBy(id_col).agg(F.count(F.lit(1)).alias("n_hits")))
    return (corpus.select(id_col).join(hits, on=id_col, how="left")
            .select(id_col,
                    F.coalesce("n_hits", F.lit(0)).cast("long")
                    .alias("n_hits"))
            .withColumn("contaminated", F.col("n_hits") > 0))


def pack_sequences_nosplit(
    df: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    count_col: str | None = None,
) -> DataFrame:
    """NO-STRADDLE packing (next-fit): documents are laid into
    ``budget``-token bins in deterministic id order per bucket, and a
    document that would cross the boundary STARTS A NEW BIN instead of
    straddling it (the packing SFT/instruction pipelines use when
    examples must stay whole; :func:`pack_sequences` is the
    concat-and-chunk form where straddling is allowed).

    Documents longer than ``budget`` get a bin of their own (flagged
    ``oversize`` — the caller decides whether to truncate or drop).

    Returns the input plus ``n_tokens``, ``bucket``, ``bin`` (0-based
    within the bucket), ``bin_fill`` (tokens in this doc's bin up to
    and including it) and ``oversize``.

    Scale shape: next-fit is a sequential recurrence (the carry resets
    on overflow), so it CANNOT be a window prefix-sum — but it only
    needs to be sequential WITHIN a bucket: one shuffle keyed by the
    deterministic md5 bucket, then one Arrow-batched pass per bucket
    (``applyInPandas``, state = two integers).  Buckets bound both the
    task size and the sequentiality; identical layout on every re-run,
    and the recurrence is exactly replayable in SQL via a recursive
    CTE (the q131 oracle does)."""
    import pandas as pd

    from pyspark.sql import types as T
    from xarray_spark.extras.portable import md5_long

    nt = (F.col(count_col) if count_col
          else token_count(F.col(text_col))).cast("long")
    b = F.pmod(md5_long(F.col(id_col).cast("string")), F.lit(n_buckets))
    base = df.withColumn("n_tokens", nt).withColumn("bucket", b)
    fields = [base.schema[c] for c in base.columns] + [
        T.StructField("bin", T.LongType()),
        T.StructField("bin_fill", T.LongType()),
        T.StructField("oversize", T.BooleanType()),
    ]
    out_schema = T.StructType(fields)
    cols = list(base.columns)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        bins, fills, overs = [], [], []
        cur_bin, fill = 0, 0
        first = True
        for n in pdf["n_tokens"].astype("int64"):
            n = int(n)
            if not first and fill + n > budget:
                cur_bin += 1
                fill = 0
            first = False
            fill += n
            bins.append(cur_bin)
            fills.append(fill)
            overs.append(n > budget)
        out = pdf[cols].copy()
        out["bin"] = bins
        out["bin_fill"] = fills
        out["oversize"] = overs
        return out

    return base.groupBy("bucket").applyInPandas(pack, out_schema)


def cap_per_group(df: DataFrame, cap: int,
                  by: str | list[str] = "source",
                  id_col: str = "doc_id",
                  priority=None) -> DataFrame:
    """Per-group document cap — the RefinedWeb/FineWeb-style per-domain
    quota: keep at most ``cap`` documents per group, chosen
    DETERMINISTICALLY (the ``cap`` smallest ``md5(id)`` values, so
    re-runs and incremental runs pick identical survivors).

    Scale shape: groups already within the cap never pay a window —
    one partial-aggregated count decides membership, and only the
    OVER-cap groups' rows route through the per-group row_number
    (partitioned window on the group key, ordered by the md5
    priority).  The over-cap group list is count-table-sized (heavy
    domains are few by construction) and broadcasts.  A single
    pathological group still bounds one task at that group's row
    count — the same bound any exact per-group top-k has; salting
    cannot help because the rank is global per group.

    ``priority`` overrides the ordering column (e.g. a quality score:
    ``F.col("quality").desc()``); ties break on ``id_col``.
    """
    keys = [by] if isinstance(by, str) else list(by)
    pr = (priority if priority is not None
          else F.md5(F.col(id_col).cast("string")).asc())
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("__n"))
    over = counts.where(F.col("__n") > cap).select(*keys)
    under_rows = df.join(F.broadcast(over), on=keys, how="left_anti")
    over_rows = df.join(F.broadcast(over), on=keys, how="left_semi")
    w = Window.partitionBy(*keys).orderBy(pr, F.col(id_col).asc())
    kept = (over_rows.withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") <= cap).drop("__rk"))
    return under_rows.unionByName(kept)
