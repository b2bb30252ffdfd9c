"""Corpus-statistics operators: repetition filters, corpus-LM scoring,
temperature-based domain resampling, duplicate-shingle contamination.

These are the quality/mixing stages of an LLM training-data pipeline
that sit between dedup (operators/dedup.py) and packing
(operators/packing.py):

- :func:`repetition_metrics` — Gopher-style repetition rules (Rae et
  al. 2021, "Scaling Language Models", App. A1.1) adapted to word
  granularity: duplicate-word fraction, top-word fraction, top-bigram
  fraction, and a keep flag.
- :func:`corpus_lm_scores` — a corpus-trained unigram LM quality
  signal: mean corpus frequency of a doc's tokens (per million) and
  the fraction of rare tokens. The classic perplexity filter without a
  log (the mean stays an EXACT rational, so both engines emit the
  identical double — ln() last-ulp drift across libms would break the
  oracle hash).
- :func:`temperature_sample` — domain re-weighting with w_s = sqrt(n_s)
  (temperature alpha = 0.5, the GPT-3/PaLM mixing rule) and a
  deterministic md5-uniform keep test.
- :func:`dup_shingle_stats` — per-doc fraction of its distinct 5-gram
  shingles that occur in at least one other document (intra-corpus
  contamination, the doc-level view of the pairwise Jaccard dedup).

Scale notes: every aggregation partial-aggs before its shuffle
(word/bigram/shingle counts reduce map-side); the per-source constants
in temperature_sample are a broadcast one-row join; nothing here is
all-pairs. Exact-integer HALF_UP ratios keep int64 headroom through
~10^14 scaled numerators (documented per call site).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from iheardai_data_pipeline_spark.functions.exact import ratio_half_up
from iheardai_data_pipeline_spark.operators.dedup import word_shingles
from iheardai_data_pipeline_spark.sources.batch import ensure_parallelism

# 2^60 as a float: the md5-uniform denominator (15 hex chars = 60 bits).
_U60 = float(1 << 60)


def _ws_words(text_col):
    """Raw whitespace tokenization (trim + split \\s+) — the same
    convention as operators/text.py quality metrics: NOT lowercased, so
    word identity/length match the standalone helpers and the oracles."""
    return F.split(F.trim(F.col(text_col)), r"\s+")


def md5_uniform60(col) -> F.Column:
    """Deterministic uniform in [0,1): first 15 hex chars of md5 as a
    60-bit int, divided by 2^60 in ONE double division (engine-stable).
    DuckDB mirror: CAST('0x' || substr(md5(x),1,15) AS BIGINT) / 2^60."""
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")
    return h.cast("double") / F.lit(_U60)


# --- Gopher-style repetition metrics ----------------------------------------------


def repetition_metrics(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dup_word_frac: float = 0.95,
    max_top_word_frac: float = 0.1,
    max_top_bigram_frac: float = 0.18,
) -> DataFrame:
    """Word-level repetition metrics + keep flag per document.

    Gopher's line/paragraph repetition rules assume newline structure;
    the word-granular equivalents here are:

    - ``dup_word_frac``   = 1 - distinct_words/total_words
    - ``top_word_frac``   = occurrences of the most frequent word / total
    - ``top_bigram_frac`` = occurrences of the most frequent bigram /
      total bigrams (0.0 for docs under two words)

    ``keep`` is True iff all three are at or under their thresholds.

    Plan: one explode per granularity (word, bigram), each partial-agg
    reduced on (doc, gram) BEFORE the per-doc rollup — the shuffle
    carries counts, not tokens. Ratios are exact-integer HALF_UP so the
    keep decision is bit-identical cross-engine.
    """
    base = ensure_parallelism(docs).select(
        F.col(id_col), _ws_words(text_col).alias("__a")
    )
    words = base.select(F.col(id_col), F.explode("__a").alias("word"))
    wc = words.groupBy(id_col, "word").agg(F.count(F.lit(1)).alias("c"))
    wstats = wc.groupBy(id_col).agg(
        F.sum("c").alias("n_words"),
        F.count(F.lit(1)).alias("n_distinct_words"),
        F.max("c").alias("top_c"),
    )
    # bigrams: adjacent word pairs; sequence(1, size-1) would DESCEND for
    # 1-word docs (Spark extends sequences both ways), so guard to empty
    a = F.col("__a")
    bigram_arr = F.when(
        F.size(a) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(a) - 1),
            lambda i: F.concat_ws(" ", F.element_at(a, i), F.element_at(a, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bigrams = base.select(F.col(id_col), F.explode(bigram_arr).alias("bg"))
    bc = bigrams.groupBy(id_col, "bg").agg(F.count(F.lit(1)).alias("c"))
    bstats = bc.groupBy(id_col).agg(
        F.max("c").alias("top_bc"), F.sum("c").alias("n_bigrams")
    )
    dup_frac = ratio_half_up(
        F.col("n_words") - F.col("n_distinct_words"), F.col("n_words"), 6
    )
    top_frac = ratio_half_up(F.col("top_c"), F.col("n_words"), 6)
    top_bg_frac = F.coalesce(
        ratio_half_up(F.col("top_bc"), F.col("n_bigrams"), 6), F.lit(0.0)
    )
    return (
        wstats.join(bstats, id_col, "left")
        .select(
            F.col(id_col),
            "n_words",
            "n_distinct_words",
            dup_frac.alias("dup_word_frac"),
            top_frac.alias("top_word_frac"),
            top_bg_frac.alias("top_bigram_frac"),
        )
        .withColumn(
            "keep",
            (F.col("dup_word_frac") <= max_dup_word_frac)
            & (F.col("top_word_frac") <= max_top_word_frac)
            & (F.col("top_bigram_frac") <= max_top_bigram_frac),
        )
    )


# --- corpus-frequency unigram LM ---------------------------------------------------


def corpus_lm_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    rare_threshold: int = 5,
) -> DataFrame:
    """Unigram-LM quality scores trained on the corpus itself.

    For each document: ``mean_tok_fpm`` — the mean corpus frequency of
    its tokens, in occurrences per million corpus tokens — and
    ``rare_token_frac`` — the fraction of its tokens whose corpus count
    is under ``rare_threshold``. Rare-token-heavy documents are the ones
    a perplexity filter would flag; this variant keeps the score an
    EXACT rational (sum(c*cc)*10^6 / (n*N)) so no cross-engine log/float
    drift.

    Plan: per-(doc,word) counts reduce first (partial agg), the corpus
    vocabulary aggregates from those counts (second partial agg — it
    never re-reads text), and the vocab joins back on the word key.
    At 100 TB the vocab relation is orders smaller than the corpus and
    broadcasts; int64 headroom: sum(c*cc)*10^6*2*10^4 stays exact below
    ~4*10^14 for the scaled numerator, i.e. corpora to ~10^9 tokens for
    typical doc lengths (beyond that, lower the fpm scale).
    """
    base = ensure_parallelism(docs).select(
        F.col(id_col), F.explode(_ws_words(text_col)).alias("word")
    )
    # barrier: dwc feeds BOTH the vocab aggregate and the join probe —
    # without it the text explode re-runs per reference (ReuseExchange
    # only recovered 2 of the duplicated subtrees); the checkpointed
    # relation is counts, far smaller than the text it derives from
    dwc = (
        base.groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()
    )
    vocab = dwc.groupBy("word").agg(F.sum("c").alias("cc")).localCheckpoint()
    n_corpus = vocab.agg(F.sum("cc").alias("n_corpus"))
    joined = dwc.join(vocab, "word").crossJoin(F.broadcast(n_corpus))
    return (
        joined.groupBy(id_col, "n_corpus")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.sum(F.col("c") * F.col("cc")).alias("wsum"),
            F.sum(
                F.when(F.col("cc") < rare_threshold, F.col("c")).otherwise(F.lit(0))
            ).alias("n_rare"),
        )
        .select(
            F.col(id_col),
            "n_tokens",
            ratio_half_up(
                F.col("wsum") * 1000000, F.col("n_tokens") * F.col("n_corpus"), 4
            ).alias("mean_tok_fpm"),
            ratio_half_up(F.col("n_rare"), F.col("n_tokens"), 6).alias(
                "rare_token_frac"
            ),
        )
    )


# --- temperature-based domain resampling -------------------------------------------


def temperature_sample(
    docs: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    target_num: int = 1,
    target_den: int = 2,
) -> DataFrame:
    """Deterministic domain re-weighted sample summary (alpha = 0.5).

    Domain weights are w_s = floor(sqrt(n_s)) (integer, so the weight
    total is EXACT — a float sum of sqrt() values would be agg-order-
    dependent and break cross-engine determinism). The target total is
    ``n_total * target_num DIV target_den`` documents, allocated to
    source s with probability

        p_s = min(1, (T * w_s) / (w_total * n_s))

    evaluated as ONE double division of exact int64 operands. A doc is
    kept iff md5_uniform60(doc_id) < p_s — reproducible run-to-run and
    engine-to-engine, no RNG state.

    Returns per-source ``(source, n_docs, n_sampled)``. The per-source
    constants are a broadcast join; the keep test is a narrow filter —
    the only shuffles are the two per-source count aggregates.
    Int64 headroom: T * w_s is exact below 9.2*10^18 (n_total ~ 10^12
    docs with sqrt weights ~ 10^6 — comfortably past 100 TB).
    """
    # barrier: counts is referenced by the consts aggregate AND the rate
    # table — without it each reference re-scans the corpus for the
    # same per-source count; the checkpointed relation is |sources| rows
    counts = (
        docs.groupBy(source_col)
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .withColumn(
            "w_s", F.floor(F.sqrt(F.col("n_docs").cast("double"))).cast("long")
        )
        .localCheckpoint()
    )
    consts = counts.agg(
        F.sum("w_s").alias("w_total"), F.sum("n_docs").alias("n_total")
    ).select(
        "w_total",
        F.expr(f"n_total * {target_num} DIV {target_den}").alias("t_target"),
    )
    rates = counts.crossJoin(F.broadcast(consts)).select(
        source_col,
        "n_docs",
        F.least(
            F.lit(1.0),
            (F.col("t_target") * F.col("w_s")).cast("double")
            / (F.col("w_total") * F.col("n_docs")).cast("double"),
        ).alias("p_s"),
    )
    kept = (
        docs.select(id_col, source_col)
        .join(F.broadcast(rates), source_col)
        .filter(md5_uniform60(F.col(id_col)) < F.col("p_s"))
        .groupBy(source_col)
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )
    return (
        rates.join(kept, source_col, "left")
        .select(
            F.col(source_col).alias("source"),
            "n_docs",
            F.coalesce(F.col("n_sampled"), F.lit(0).cast("long")).alias("n_sampled"),
        )
        .orderBy("source")
    )


# --- duplicate-shingle contamination ----------------------------------------------


def dup_shingle_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 5
) -> DataFrame:
    """Per-doc fraction of its distinct word n-gram shingles that also
    appear in at least one OTHER document.

    The doc-level contamination view the pairwise dedup family doesn't
    give: a doc made of other docs' text scores near 1.0 even when no
    single pair clears a Jaccard threshold. Shingle sets are row-local
    (operators/dedup.py:word_shingles — array_distinct before explode);
    the document frequency is a COUNT window over the shingle partition
    — the same shuffle a groupBy would take, but the per-row df needs
    no join-back, so the shingle explode evaluates exactly once (the
    groupBy+join form re-ran it: no ReusedExchange, 4 exchanges vs 2
    here). At 100 TB the production path keys the shuffle on
    xxhash64(shingle) (8-byte keys, ~n^2/2^64 collision bound, same
    trade-off documented for decontaminate); the string key here keeps
    the DuckDB oracle exactly equal. Hot-shingle skew lands on single
    window partitions — AQE's skew handling does not apply to windows,
    so a skewed corpus should pre-filter stop-shingles (the df cap
    ngram_jaccard_pairs uses).
    """
    from pyspark.sql import Window

    sh = word_shingles(docs, id_col=id_col, text_col=text_col, n=n)
    w = Window.partitionBy("shingle")
    return (
        sh.withColumn("df", F.count(F.lit(1)).over(w))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("df") >= 2, 1).otherwise(0)).alias("n_shared"),
        )
        .select(
            F.col(id_col),
            "n_shingles",
            "n_shared",
            ratio_half_up(F.col("n_shared"), F.col("n_shingles"), 6).alias(
                "dup_shingle_frac"
            ),
        )
    )


# --- end-to-end curation funnel ----------------------------------------------------


def curation_funnel(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Compose the round-3 corpus operators into one curation funnel:

    1. quality gate — Gopher-style repetition ``keep`` flag
       (:func:`repetition_metrics` thresholds);
    2. exact dedup — min-doc_id keeper per md5 fingerprint of the
       normalized text (the x_dedup_exact policy);
    3. domain mix — :func:`temperature_sample` over the survivors.

    Returns one row per source with the funnel counts:
    ``(source, n_input, n_quality, n_unique, n_sampled)``.

    Every stage reduces before the next: the keep flag joins back on
    doc_id (already-reduced metrics), the fingerprint keeper is a
    groupBy-min + semi-join, and the sampler sees only survivors. The
    final rollup is four per-source aggregates left-joined on the
    ~|sources|-row dimension — driver-light, shuffle-bounded.

    The fingerprint relation is ``localCheckpoint``-ed: four downstream
    branches reference it (keeper agg, semi-join probe, sampler counts,
    sampler keep test), and without the barrier each re-evaluates the
    whole repetition-gate subtree — the static plan carried 80
    exchanges vs ~20 with it (the graph.py lineage-truncation pattern;
    a production multi-stage run would write survivors to a table
    between stages instead).
    """
    from iheardai_data_pipeline_spark.operators.text import fingerprint_md5

    base = docs.select(id_col, text_col, source_col)
    keep_flags = repetition_metrics(docs, id_col=id_col, text_col=text_col).select(
        id_col, "keep"
    )
    quality = base.join(keep_flags, id_col).filter(F.col("keep"))
    fp = quality.select(
        id_col, source_col, fingerprint_md5(F.col(text_col)).alias("fingerprint")
    ).localCheckpoint()
    keepers = fp.groupBy("fingerprint").agg(F.min(id_col).alias(id_col)).select(id_col)
    survivors = fp.join(keepers, id_col, "left_semi")
    sampled = temperature_sample(
        survivors, source_col=source_col, id_col=id_col
    ).select(
        F.col("source").alias(source_col),
        F.col("n_docs").alias("n_unique"),
        "n_sampled",
    )
    n_input = base.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_input"))
    # counted from the checkpointed fp (one row per quality doc), not
    # from `quality`, so the repetition subtree is never re-evaluated
    n_quality = fp.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_quality"))
    return (
        n_input.join(n_quality, source_col, "left")
        .join(sampled, source_col, "left")
        .select(
            F.col(source_col).alias("source"),
            "n_input",
            F.coalesce("n_quality", F.lit(0).cast("long")).alias("n_quality"),
            F.coalesce("n_unique", F.lit(0).cast("long")).alias("n_unique"),
            F.coalesce("n_sampled", F.lit(0).cast("long")).alias("n_sampled"),
        )
        .orderBy("source")
    )


def top_ngrams(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 50,
) -> DataFrame:
    """Corpus-wide top-k word n-grams by document frequency — the
    boilerplate-phrase mining report a curation run uses to seed line/
    span blocklists (the phrases that appear across many documents are
    navigation chrome, license headers, cookie banners).

    Shape: per-doc DISTINCT shingles are row-local (word_shingles), the
    document-frequency count is ONE partial-agg groupBy on the shingle
    (boilerplate hot shingles reduce map-side), and the top-k is a
    TakeOrdered over (df DESC, ngram ASC) — k rows to the driver, never
    a full sort. Ties at the boundary break deterministically on the
    ngram string.

    Output: (ngram, df, rank) — rank 1..k.
    """
    from pyspark.sql import Window

    sh = word_shingles(docs, id_col, text_col, n)
    counts = sh.groupBy(F.col("shingle").alias("ngram")).agg(
        F.count(F.lit(1)).alias("df")
    )
    top = counts.orderBy(F.desc("df"), F.asc("ngram")).limit(k)
    w = Window.orderBy(F.desc("df"), F.asc("ngram"))
    # rank window runs over k rows only (post-limit) — not a corpus sort
    return top.withColumn("rank", F.row_number().over(w).cast("long"))
