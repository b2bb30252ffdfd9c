"""Text-analysis operators for training-data pipelines (north-star set).

Language-ID lives in functions/text_agent.py (P36, generalized);
this module adds token counting, quality scoring, and document
fingerprinting over a text column. All native column expressions —
a 100 TB corpus scans these at parquet speed inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from iheardai_data_pipeline_spark.functions.common import _col
from iheardai_data_pipeline_spark.functions.exact import ratio_half_up

# BPE-ish tokenization: letter runs, digit runs, or single non-space
# symbols — ASCII class so Spark (Java regex) and DuckDB (RE2) agree.
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Stopwords for the quality heuristic (English function words — the
# reference's language lists, reference text_agent_transformer.py:206).
QUALITY_STOPWORDS = ("the", "and", "is", "to", "in", "it", "you", "that", "he", "was")


def normalize_text(text: Column | str) -> Column:
    """Canonical form for fingerprint/dedup: lower + whitespace collapse + trim."""
    return F.trim(F.regexp_replace(F.lower(_col(text)), r"\s+", " "))


def fingerprint_md5(text: Column | str) -> Column:
    """Exact-dup fingerprint: md5 of the normalized text."""
    return F.md5(normalize_text(text))


def token_count_ws(text: Column | str) -> Column:
    """Whitespace token count (Python str.split semantics)."""
    t = F.trim(_col(text))
    return F.when(F.length(t) == 0, 0).otherwise(F.size(F.split(t, r"\s+")))


def token_count_bpe(text: Column | str) -> Column:
    """BPE-ish token count: letter runs + digit runs + symbols."""
    return F.regexp_count(_col(text), F.lit(BPE_TOKEN_PATTERN))


def punct_ratio(text: Column | str) -> Column:
    """Punctuation chars / total chars (0 for empty)."""
    t = _col(text)
    n_punct = F.regexp_count(t, F.lit(r"[^A-Za-z0-9\s]"))
    return F.when(F.length(t) == 0, F.lit(0.0)).otherwise(
        ratio_half_up(n_punct, F.length(t), 6)
    )


def stopword_ratio(text: Column | str) -> Column:
    """Stopword tokens / total tokens (whitespace tokens; 0 for empty)."""
    t = F.lower(F.trim(_col(text)))
    words = F.split(t, r"\s+")
    stop_arr = F.array(*[F.lit(w) for w in QUALITY_STOPWORDS])
    hits = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, w)))
    return F.when(F.length(t) == 0, F.lit(0.0)).otherwise(
        ratio_half_up(hits, F.size(words), 6)
    )


def mean_word_len(text: Column | str) -> Column:
    t = F.trim(_col(text))
    words = F.split(t, r"\s+")
    total = F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w))
    return F.when(F.length(t) == 0, F.lit(0.0)).otherwise(
        ratio_half_up(total, F.size(words), 6)
    )


def with_text_quality_metrics(df, text_col: str = "text"):
    """Append n_tokens_ws / n_tokens_bpe / punct_ratio / stopword_ratio /
    mean_word_len / quality in ONE pass over the text.

    The Column helpers above are composable but each one re-splits the
    text, and Catalyst's CollapseProject inlines an aliased split into
    every downstream reference — quality_score alone re-evaluated the
    split ~6x (measured 6.3s vs 0.6s on 5k docs at sf0.1). Here the
    word array, raw length, and punct count are computed exactly once
    behind the eval_once generator barrier and every metric derives from
    them. The split is NOT lowercased: word lengths must come from the
    raw words (Unicode lowercasing can change string length, e.g.
    U+0130 'İ' -> 'i' + combining dot), matching the standalone
    mean_word_len helper and the DuckDB oracle; only the stopword
    membership test lowercases, per word inside the filter lambda.
    """
    from iheardai_data_pipeline_spark.sources.batch import ensure_parallelism, eval_once

    # fan a single-split scan out first: every metric below is per-row
    # regex/array work, the classic case where one input split would
    # serialize the whole corpus onto one core (no-op on real inputs)
    df = ensure_parallelism(df)
    t = _col(text_col)
    base = eval_once(
        df,
        __w=F.split(F.trim(t), r"\s+"),
        __nchars=F.length(t),
        __ntrim=F.length(F.trim(t)),
        __npunct=F.regexp_count(t, F.lit(r"[^A-Za-z0-9\s]")),
        __nbpe=F.regexp_count(t, F.lit(BPE_TOKEN_PATTERN)),
    )
    lw = F.col("__w")
    nchars, ntrim = F.col("__nchars"), F.col("__ntrim")
    stop_arr = F.array(*[F.lit(w) for w in QUALITY_STOPWORDS])
    hits = F.size(F.filter(lw, lambda w: F.array_contains(stop_arr, F.lower(w))))
    wlen_total = F.aggregate(lw, F.lit(0), lambda acc, w: acc + F.length(w))
    zero = F.lit(0.0)
    base = eval_once(
        base,
        n_tokens_ws=F.when(ntrim == 0, 0).otherwise(F.size(lw)),
        n_tokens_bpe=F.col("__nbpe"),
        punct_ratio=F.when(nchars == 0, zero).otherwise(
            ratio_half_up(F.col("__npunct"), nchars, 6)
        ),
        stopword_ratio=F.when(ntrim == 0, zero).otherwise(
            ratio_half_up(hits, F.size(lw), 6)
        ),
        mean_word_len=F.when(ntrim == 0, zero).otherwise(
            ratio_half_up(wlen_total, F.size(lw), 6)
        ),
    )
    n = F.col("__nchars")
    length_score = (
        F.when((n >= 200) & (n <= 5000), 30)
        .when(((n >= 50) & (n < 200)) | ((n > 5000) & (n <= 20000)), 15)
        .otherwise(0)
    )
    sw, pr, mwl = F.col("stopword_ratio"), F.col("punct_ratio"), F.col("mean_word_len")
    quality = (
        length_score
        + F.when((sw >= 0.05) & (sw <= 0.6), 25).otherwise(0)
        + F.when(pr <= 0.2, 25).otherwise(0)
        + F.when((mwl >= 3) & (mwl <= 12), 20).otherwise(0)
    ).cast("int")
    return base.withColumn("quality", quality).drop(
        "__w", "__nchars", "__ntrim", "__npunct", "__nbpe"
    )


def quality_score(text: Column | str) -> Column:
    """Heuristic document quality in [0,100] for corpus filtering.

    Additive, fully deterministic, SQL-mirrorable:
      +30 length in [200, 5000] chars, +15 if [50,200) or (5000,20000]
      +25 stopword ratio in [0.05, 0.6] (natural language evidence)
      +25 punct ratio <= 0.2  (not symbol soup)
      +20 mean word length in [3, 12]
    """
    t = _col(text)
    n = F.length(t)
    length_score = (
        F.when((n >= 200) & (n <= 5000), 30)
        .when(((n >= 50) & (n < 200)) | ((n > 5000) & (n <= 20000)), 15)
        .otherwise(0)
    )
    sw = stopword_ratio(t)
    sw_score = F.when((sw >= 0.05) & (sw <= 0.6), 25).otherwise(0)
    pr = punct_ratio(t)
    pr_score = F.when(pr <= 0.2, 25).otherwise(0)
    mwl = mean_word_len(t)
    mwl_score = F.when((mwl >= 3) & (mwl <= 12), 20).otherwise(0)
    return (length_score + sw_score + pr_score + mwl_score).cast("int")

def tfidf_top_terms(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
):
    """Top-k characteristic terms per document by tf-idf.

    tfidf(d, t) = tf(d, t) * ln(N / df(t)); ties broken by term asc so
    the result is fully deterministic.

    Shape: tokenize narrow (duplicates kept — term frequency needs the
    multiset), then two keyed aggregations that both feed partial
    map-side combine — groupBy (doc, term) for tf, groupBy term for df —
    a broadcast-or-sortmerge join on term, and a per-doc top-k window.
    N is one scalar count action; everything else never leaves the
    executors. At 100 TB the (doc, term) shuffle dominates; it carries
    (id, 8-byte-hashable term, int) rows only.
    """
    from pyspark.sql import Window

    from iheardai_data_pipeline_spark.sources.batch import ensure_parallelism

    n_docs = docs.count()
    tokens = ensure_parallelism(docs).select(
        F.col(id_col),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("term"),
    )
    tf = tokens.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(dfreq, "term").withColumn(
        "tfidf", F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            id_col,
            "term",
            F.col("tf"),
            F.col("df"),
            F.round("tfidf", 4).alias("tfidf"),
            F.col("rnk"),
        )
    )


def chunk_documents(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 50,
    stride: int = 25,
):
    """Overlapping fixed-size token chunks per document — the
    context-window prep step of a training pipeline (chunk size =
    model window, stride < size for overlap).

    Row-local: token split, chunk index sequence, and slicing are one
    narrow projection + posexplode — no shuffle at any corpus size, and
    the per-chunk md5 gives downstream chunk-level dedup a ready key.
    Chunk count is 1 for docs at or under ``chunk_tokens`` tokens, else
    ``ceil((n - chunk_tokens)/stride) + 1`` (last chunk may be short;
    every token lands in at least one chunk).

    Output: (id, chunk_idx, n_tokens, chunk_md5, chunk_text).
    """
    from iheardai_data_pipeline_spark.sources.batch import ensure_parallelism

    toks = F.split(normalize_text(F.col(text_col)), " ")
    n = F.size(toks)
    n_chunks = (
        F.when(n <= chunk_tokens, F.lit(1))
        .otherwise(
            F.ceil((n - F.lit(chunk_tokens)) / F.lit(stride)).cast("int") + 1
        )
    )
    # n_tokens is arithmetic on the slice bounds (min(chunk_tokens,
    # n - i*stride)) — re-splitting chunk_text to count it would double
    # the string-scan work of this row-local hot path
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            F.least(F.lit(chunk_tokens), n - i * stride).alias("n_tokens"),
            F.array_join(F.slice(toks, i * stride + 1, chunk_tokens), " ").alias(
                "chunk_text"
            ),
        ),
    )
    exploded = ensure_parallelism(
        docs.where(F.col(text_col).isNotNull())
    ).select(F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "c"))
    return exploded.select(
        F.col(id_col),
        "chunk_idx",
        F.col("c.n_tokens").alias("n_tokens"),
        F.md5(F.col("c.chunk_text")).alias("chunk_md5"),
        F.col("c.chunk_text").alias("chunk_text"),
    )


def hashed_quality_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_threshold: float = 0.0,
) -> DataFrame:
    """Model-based quality filtering PLUMBING (the CCNet/fastText
    pattern): per-token weights looked up from a vocabulary table,
    summed per document, thresholded into a keep flag.

    The weights here are a deterministic stand-in — integer
    milli-weights in [-1000, 1000] derived from md5(word) — because no
    trained classifier ships in this rig; a production run swaps the
    in-query vocab derivation for its trained weights table and NOTHING
    else changes. The plumbing is the real shape: the vocab is distinct
    words (small → broadcast join against the exploded token relation),
    the per-doc sum is exact BIGINT milli-units (shuffle-order-proof,
    unlike a double sum), and the final score is one HALF_UP ratio.

    Output: (id, n_tokens, score_milli_sum, score, keep).
    """
    from iheardai_data_pipeline_spark.functions.exact import ratio_half_up
    from iheardai_data_pipeline_spark.sources.batch import ensure_parallelism

    toks = ensure_parallelism(docs.where(F.col(text_col).isNotNull())).select(
        F.col(id_col),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("word"),
    )
    vocab = toks.select("word").distinct().select(
        "word",
        (
            F.conv(F.substring(F.md5("word"), 1, 8), 16, 10).cast("long") % 2001
            - 1000
        ).alias("weight_milli"),
    )
    scored = (
        toks.join(F.broadcast(vocab), "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("weight_milli").alias("score_milli_sum"),
        )
    )
    score = ratio_half_up(
        F.col("score_milli_sum"), F.col("n_tokens") * 1000, 4
    )
    return scored.select(
        id_col,
        "n_tokens",
        "score_milli_sum",
        score.alias("score"),
        (score >= F.lit(keep_threshold)).alias("keep"),
    )


def bm25_topk(
    docs,
    queries,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "qtext",
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
):
    """Top-k documents per query by Okapi BM25 — ranked retrieval, the
    query-time complement of :func:`tfidf_top_terms`.

    score(q, d) = sum over DISTINCT query terms t of
        idf(t) * tf(t, d) * (k1 + 1) / (tf(t, d) + k1 * (1 - b + b * dl/avgdl))
    with idf(t) = ln(1 + ((N - df) + 0.5) / (df + 0.5))  (always > 0).

    Determinism discipline (the cross-engine value-replay rule): each
    per-(query, doc, term) contribution is computed in doubles with a
    FIXED parenthesization, then floored into integer micro-units
    (floor(contrib * 1e6) as BIGINT) BEFORE the per-(query, doc) sum —
    integer addition is order-independent, so the score is identical
    under any partial-agg order on any engine; floor (unlike half-up
    rounding) has no rounding-mode ambiguity. Ties break doc_id asc.

    Shape: one (doc, term) shuffle builds tf; df and doclen are
    partial-agg rollups of the same relation; N and avgdl are ONE
    bounded scalar collect; the query-term frame is tiny and BROADCAST
    onto tf, so candidate generation is postings-of-query-terms, never
    a corpus scan per query; the final top-k window partitions by
    query. At 100 TB the (doc, term) exchange carries (id, term, int)
    rows only and everything downstream is bounded by the matched
    postings. For repeated serving at scale, maintain the postings as
    persistent state instead (operators/postings_index.py).
    """
    from pyspark.sql import Window

    from iheardai_data_pipeline_spark.sources.batch import ensure_parallelism

    toks = ensure_parallelism(
        docs.where(F.col(text_col).isNotNull())
    ).select(
        F.col(id_col),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("term"),
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    doclen = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    n_docs, total_len = doclen.agg(
        F.count(F.lit(1)), F.sum("dl")
    ).collect()[0]
    if not n_docs:
        # empty / all-NULL-text corpus: total_len is NULL and avgdl
        # undefined — the ranked answer is simply no rows (mirrors
        # PostingsIndex.topk's n_docs <= 0 guard)
        return docs.sparkSession.createDataFrame(
            [],
            f"{query_id_col} long, {id_col} long, n_terms long, "
            "score_micro long, score double, rnk long",
        )
    n_docs_f = float(n_docs)
    avgdl = float(total_len) / n_docs_f
    qterms = (
        queries.select(
            F.col(query_id_col),
            F.explode(
                F.split(normalize_text(F.col(query_text_col)), " ")
            ).alias("term"),
        )
        .distinct()
    )
    idf = F.log(
        F.lit(1.0)
        + ((F.lit(n_docs_f) - F.col("df")) + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * (F.col("dl") / F.lit(avgdl))
    )
    contrib = idf * ((F.col("tf") * F.lit(k1 + 1.0)) / denom)
    matched = (
        tf.join(dfreq, "term")
        .join(F.broadcast(qterms), "term")
        .join(doclen, id_col)
        .select(
            query_id_col,
            id_col,
            F.floor(contrib * F.lit(1000000.0)).cast("long").alias("micro"),
        )
    )
    scored = matched.groupBy(query_id_col, id_col).agg(
        F.sum("micro").alias("score_micro"),
        F.count(F.lit(1)).alias("n_terms"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("score_micro"), F.asc(id_col)
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select(
            query_id_col,
            id_col,
            "n_terms",
            "score_micro",
            (F.col("score_micro") / F.lit(1000000.0)).alias("score"),
            "rnk",
        )
    )


def _validate_milli_weights(fields: dict) -> dict:
    """Field-weight contract shared by bm25f_topk and the fielded
    PostingsIndex: every weight must be a positive exact multiple of
    0.001 — milli-unit exactness is what keeps the weighted tf an
    exact BIGINT sum, which is what lets the SQL oracle replay it
    bit-for-bit."""
    if not fields:
        raise ValueError("bm25f needs at least one field")
    out = {}
    for col, w in fields.items():
        wm = round(float(w) * 1000)
        if wm <= 0 or abs(float(w) * 1000 - wm) > 1e-9:
            raise ValueError(
                f"field weight {col}={w} must be a positive exact "
                "multiple of 0.001 (exact milli-units keep the "
                "weighted tf an order-independent BIGINT sum)"
            )
        out[col] = int(wm)
    return out


def bm25f_topk(
    docs,
    queries,
    fields: dict[str, float],
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "qtext",
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
):
    """Okapi BM25F — multi-field ranked retrieval with per-field
    weights folded into term frequency BEFORE saturation (the 'simple
    weighted-field' BM25F of Robertson & Zaragoza: tf_w(d, t) =
    sum over fields f of w_f * tf_f(d, t); dl_w = sum over t of tf_w;
    avgdl over dl_w; then the standard BM25 formula on the weighted
    quantities). The standard production search shape: a title hit
    outweighs a body hit WITHOUT double-counting saturation the way
    naive per-field-BM25 summing does.

    Exactness discipline: weights must be exact milli-units
    (:func:`_validate_milli_weights`), so tf_w and dl_w are EXACT
    BIGINT milli sums — order-independent under any partial-agg
    schedule. The double domain is entered once per contribution with
    a FIXED parenthesization — (tfm / 1000.0), (dlm / 1000.0),
    avgdl = (total_milli / 1000.0) / N — then bm25_topk's micro-unit
    floor; the whole pipeline replays bit-for-bit in SQL. df(t) counts
    docs with the term in ANY field. A doc whose every field is NULL
    is excluded from N; a NULL field simply contributes nothing.

    Shape: one token union across the fields (each stream carries its
    weight as a literal), ONE (doc, term) shuffle for tf_w, rollups
    for df/dl_w — bm25_topk's plan with a wider scan, nothing else
    changes at 100 TB.
    """
    from functools import reduce

    from pyspark.sql import Window

    from iheardai_data_pipeline_spark.sources.batch import ensure_parallelism

    w_milli = _validate_milli_weights(fields)
    streams = [
        docs.where(F.col(fcol).isNotNull()).select(
            F.col(id_col),
            F.explode(
                F.split(normalize_text(F.col(fcol)), " ")
            ).alias("term"),
            F.lit(wm).cast("long").alias("w"),
        )
        for fcol, wm in sorted(w_milli.items())
    ]
    toks = ensure_parallelism(reduce(lambda a, b: a.unionByName(b), streams))
    tf = toks.groupBy(id_col, "term").agg(F.sum("w").alias("tfm"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    doclen = tf.groupBy(id_col).agg(F.sum("tfm").alias("dlm"))
    n_docs, total_milli = doclen.agg(
        F.count(F.lit(1)), F.sum("dlm")
    ).collect()[0]
    if not n_docs:
        return docs.sparkSession.createDataFrame(
            [],
            f"{query_id_col} long, {id_col} long, n_terms long, "
            "score_micro long, score double, rnk long",
        )
    n_docs_f = float(n_docs)
    avgdl = (float(total_milli) / 1000.0) / n_docs_f
    qterms = (
        queries.select(
            F.col(query_id_col),
            F.explode(
                F.split(normalize_text(F.col(query_text_col)), " ")
            ).alias("term"),
        )
        .distinct()
    )
    idf = F.log(
        F.lit(1.0)
        + ((F.lit(n_docs_f) - F.col("df")) + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    tfd = F.col("tfm") / F.lit(1000.0)
    dld = F.col("dlm") / F.lit(1000.0)
    denom = tfd + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * (dld / F.lit(avgdl))
    )
    contrib = idf * ((tfd * F.lit(k1 + 1.0)) / denom)
    matched = (
        tf.join(dfreq, "term")
        .join(F.broadcast(qterms), "term")
        .join(doclen, id_col)
        .select(
            query_id_col,
            id_col,
            F.floor(contrib * F.lit(1000000.0)).cast("long").alias("micro"),
        )
    )
    scored = matched.groupBy(query_id_col, id_col).agg(
        F.sum("micro").alias("score_micro"),
        F.count(F.lit(1)).alias("n_terms"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("score_micro"), F.asc(id_col)
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select(
            query_id_col,
            id_col,
            "n_terms",
            "score_micro",
            (F.col("score_micro") / F.lit(1000000.0)).alias("score"),
            "rnk",
        )
    )


def bm25_prf_topk(
    docs,
    queries,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "qtext",
    k: int = 5,
    fb_docs: int = 3,
    fb_terms: int = 2,
    k1: float = 1.2,
    b: float = 0.75,
):
    """Two-pass BM25 with PSEUDO-RELEVANCE-FEEDBACK query expansion
    (Rocchio/RM3-lite — the classic second retrieval stage): pass 1
    ranks with the raw query, the top ``fb_docs`` documents 'vote' for
    expansion terms, the ``fb_terms`` best NEW terms join the query,
    and pass 2 re-ranks with the expanded term set.

    Expansion-term weight is EXACT integer arithmetic so both engines
    pick identical terms: w(q, t) = sum over q's feedback docs of
    tf(t, d) * idf_micro(t), with idf_micro = floor(idf * 1e6) as
    BIGINT — a per-term constant times integer tf, order-independent
    under any partial-agg schedule. Original query terms are excluded
    from expansion (they are already in the query); ties break term
    asc. Both scoring passes are bm25_topk's fixed-parenthesization
    micro-unit discipline, so the whole two-pass pipeline replays
    bit-for-bit in SQL.

    Shape: tf/df/doclen build ONCE (the same one (doc, term) shuffle
    as bm25_topk) and feed both passes; pass 1's candidates are
    postings-of-query-terms; the expansion join touches only the
    feedback docs' tf rows (fb_docs * |queries| docs — tiny); pass 2's
    candidates are postings-of-expanded-terms. One DAG, no iteration.
    Output schema == bm25_topk's.
    """
    from pyspark.sql import Window

    from iheardai_data_pipeline_spark.sources.batch import ensure_parallelism

    toks = ensure_parallelism(
        docs.where(F.col(text_col).isNotNull())
    ).select(
        F.col(id_col),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("term"),
    )
    # pin the shared corpus build: tf feeds BOTH passes (and df/dl are
    # its rollups) as separate plan branches, and relying on Spark's
    # ReuseExchange to dedupe them leaves pass 2 silently recomputing
    # the (doc, term) shuffle if a future edit perturbs one branch's
    # projection (VERDICT r12 #5) — the checkpoint makes "build once"
    # structural instead of optimizer-dependent
    tf = (
        toks.groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    doclen = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    n_docs, total_len = doclen.agg(
        F.count(F.lit(1)), F.sum("dl")
    ).collect()[0]
    if not n_docs:
        return docs.sparkSession.createDataFrame(
            [],
            f"{query_id_col} long, {id_col} long, n_terms long, "
            "score_micro long, score double, rnk long",
        )
    n_docs_f = float(n_docs)
    avgdl = float(total_len) / n_docs_f
    qterms = (
        queries.select(
            F.col(query_id_col),
            F.explode(
                F.split(normalize_text(F.col(query_text_col)), " ")
            ).alias("term"),
        )
        .distinct()
    )
    idf = F.log(
        F.lit(1.0)
        + ((F.lit(n_docs_f) - F.col("df")) + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * (F.col("dl") / F.lit(avgdl))
    )
    contrib = idf * ((F.col("tf") * F.lit(k1 + 1.0)) / denom)

    def scored_for(qt):
        matched = (
            tf.join(dfreq, "term")
            .join(F.broadcast(qt), "term")
            .join(doclen, id_col)
            .select(
                query_id_col,
                id_col,
                F.floor(contrib * F.lit(1000000.0))
                .cast("long")
                .alias("micro"),
            )
        )
        return matched.groupBy(query_id_col, id_col).agg(
            F.sum("micro").alias("score_micro"),
            F.count(F.lit(1)).alias("n_terms"),
        )

    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("score_micro"), F.asc(id_col)
    )
    fb = (
        scored_for(qterms)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= fb_docs)
        .select(query_id_col, id_col)
    )
    # expansion-term vote: integer weight = sum of tf * idf_micro over
    # the query's feedback docs; original terms excluded; term asc ties
    idf_micro = F.floor(idf * F.lit(1000000.0)).cast("long")
    idfm = dfreq.select("term", idf_micro.alias("idf_micro"))
    cand = (
        fb.join(tf, id_col)
        .join(idfm, "term")
        .groupBy(query_id_col, "term")
        .agg(F.sum(F.col("tf") * F.col("idf_micro")).alias("w"))
        .join(qterms, [query_id_col, "term"], "left_anti")
    )
    we = Window.partitionBy(query_id_col).orderBy(
        F.desc("w"), F.asc("term")
    )
    exp = (
        cand.withColumn("rn", F.row_number().over(we))
        .filter(F.col("rn") <= fb_terms)
        .select(query_id_col, "term")
    )
    qt2 = qterms.unionByName(exp).distinct()
    return (
        scored_for(qt2)
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select(
            query_id_col,
            id_col,
            "n_terms",
            "score_micro",
            (F.col("score_micro") / F.lit(1000000.0)).alias("score"),
            "rnk",
        )
    )


def phrase_topk(
    docs,
    queries,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "qtext",
    k: int = 5,
):
    """Top-k documents per query by EXACT PHRASE occurrence count —
    the positional complement of :func:`bm25_topk` (ranked retrieval
    needs both: bag-of-words relevance and phrase precision).

    A match at base position p means token p+i of the document equals
    phrase token i for every i; overlapping matches count separately
    ("a a a" occurs twice in "a a a a" — the left-to-right convention,
    mirrored exactly by the SQL oracle). Scoring is pure integer
    counting — no float discipline needed. Ties break doc_id asc;
    documents with zero matches are absent.

    Shape: tokenize WITH POSITIONS (posexplode — still one narrow
    projection), broadcast the phrase-term frame (qid, idx, term) onto
    the token relation, shift each hit to its would-be base position
    (pos - idx), and a base completes a match iff all phrase_len
    indexes are present — one groupBy(qid, doc, base) count + one
    groupBy(qid, doc) rollup + the per-query top-k window. Candidate
    volume is postings-of-phrase-terms, never a per-query corpus scan;
    repeated phrase terms contribute one row per (idx, position) so
    duplicate-term phrases ("dog dog") count correctly.
    """
    from pyspark.sql import Window

    from iheardai_data_pipeline_spark.sources.batch import ensure_parallelism

    toks = ensure_parallelism(
        docs.where(F.col(text_col).isNotNull())
    ).select(
        F.col(id_col),
        F.posexplode(F.split(normalize_text(F.col(text_col)), " ")).alias(
            "pos", "term"
        ),
    )
    qtoks = queries.select(
        F.col(query_id_col),
        F.posexplode(
            F.split(normalize_text(F.col(query_text_col)), " ")
        ).alias("idx", "term"),
    )
    qlen = qtoks.groupBy(query_id_col).agg(
        F.count(F.lit(1)).alias("phrase_len")
    )
    hits = toks.join(F.broadcast(qtoks), "term").select(
        query_id_col,
        id_col,
        (F.col("pos") - F.col("idx")).alias("base"),
        "idx",
    )
    bases = hits.groupBy(query_id_col, id_col, "base").agg(
        F.count(F.lit(1)).alias("n_idx")
    )
    matched = (
        bases.join(F.broadcast(qlen), query_id_col)
        .filter(F.col("n_idx") == F.col("phrase_len"))
        .groupBy(query_id_col, id_col)
        .agg(F.count(F.lit(1)).alias("n_matches"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("n_matches"), F.asc(id_col)
    )
    return (
        matched.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select(query_id_col, id_col, "n_matches", "rnk")
    )
