"""Document deduplication family (north-star set): exact, n-gram Jaccard,
MinHash+LSH, SimHash.

Scale design (100 TB posture):
- exact: one shuffle on a 16-byte fingerprint — the cheapest possible key.
- n-gram Jaccard: candidates = pairs sharing a discriminative shingle.
  Shingle width n is the selectivity knob: wide shingles (default 5)
  make random co-occurrence vanish so the candidate join stays linear
  in the number of true near-dups; a document-frequency cap drops
  degenerate hot shingles (boilerplate) before the join — the classic
  skew guard, applied identically in the oracle.
- MinHash LSH: constant-size signatures (k hashes) per doc, banded so
  candidates meet only when a band collides — the sublinear global
  path; exact Jaccard verifies candidates, so false positives never
  reach the output.
- SimHash: one 64-bit sketch per doc; hamming<=k via banded equality.

Everything is DataFrame-native; hashes are xxhash64 (deterministic,
seeded), no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from iheardai_data_pipeline_spark.operators.text import fingerprint_md5, normalize_text
from iheardai_data_pipeline_spark.sources.batch import ensure_parallelism


def exact_duplicate_groups(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup by normalized-text fingerprint: every doc annotated with
    its group hash, group size, and keeper flag (min id wins)."""
    hashed = docs.select(
        F.col(id_col), fingerprint_md5(F.col(text_col)).alias("fingerprint")
    )
    groups = hashed.groupBy("fingerprint").agg(
        F.count(F.lit(1)).alias("group_size"), F.min(id_col).alias("keeper_id")
    )
    return (
        hashed.join(groups, "fingerprint")
        .select(
            id_col,
            "fingerprint",
            "group_size",
            (F.col(id_col) == F.col("keeper_id")).alias("is_keeper"),
        )
    )


def word_shingles(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 5
) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle).

    transform over a 0..len-n index range, then explode + distinct —
    all JVM-side; the distinct reuses the downstream shuffle key.
    """
    words = F.split(normalize_text(F.col(text_col)), " ")
    # docs shorter than n words yield no shingles (sequence(0,-1) would
    # descend and feed slice() an illegal start-0)
    idx = F.when(
        F.size(words) >= n, F.sequence(F.lit(0), F.size(words) - n)
    ).otherwise(F.array().cast("array<int>"))
    shingle_arr = F.transform(
        idx, lambda i: F.array_join(F.slice(words, i + 1, n), " ")
    )
    return (
        ensure_parallelism(docs)
        .select(F.col(id_col), F.explode(shingle_arr).alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    threshold: float = 0.7,
    max_doc_freq: int = 100,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs: (doc_a, doc_b, jaccard >= t).

    Candidates are pairs sharing >=1 shingle with document frequency
    <= max_doc_freq (hot-shingle skew guard); Jaccard is computed
    exactly from shared/distinct shingle counts, so the result equals
    the all-pairs answer for any pair that shares at least one
    sub-cap shingle.
    """
    # every downstream shuffle keys on the shingle: carry an 8-byte
    # xxhash64 instead of the ~n-word string (equal results up to 64-bit
    # hash collisions, ~1e-9 at millions of distinct shingles; the rare
    # collision could only merge two shingle identities, nudging one
    # jaccard by 1 count)
    sh = word_shingles(docs, id_col, text_col, n).select(
        F.col(id_col), F.xxhash64("shingle").alias("shingle_h")
    ).cache()
    counts = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    rare = (
        sh.groupBy("shingle_h")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= max_doc_freq)
        .select("shingle_h")
    )
    sh_rare = sh.join(rare, "shingle_h")
    a = sh_rare.select(F.col(id_col).alias("doc_a"), "shingle_h")
    b = sh_rare.select(F.col(id_col).alias("doc_b"), "shingle_h")
    shared = (
        a.join(b, "shingle_h")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    ca = counts.select(F.col(id_col).alias("doc_a"), F.col("n_shingles").alias("n_a"))
    cb = counts.select(F.col(id_col).alias("doc_b"), F.col("n_shingles").alias("n_b"))
    return (
        shared.join(ca, "doc_a")
        .join(cb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("shared").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("shared")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def _minhash_from_set(sh_set, k: int):
    """MinHash signature as ONE array<long> expression over a collected
    shingle set: sig[i] = min over shingles of xxhash64(i, shingle).

    Identical values to a k-column min-aggregate formulation, but the plan
    stays k-independent in width — Catalyst analysis cost (which dominates
    cold-query latency) doesn't scale with k."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.array_min(F.transform(sh_set, lambda s: F.xxhash64(i, s))),
    )


def minhash_signatures(
    shingles: DataFrame, id_col: str = "doc_id", k: int = 64
) -> DataFrame:
    """k-permutation MinHash signature per doc: ``sig`` array<long> of
    min(xxhash64(seed_i, shingle)) for every i — constant per-doc state."""
    sets = shingles.groupBy(id_col).agg(F.collect_set("shingle").alias("sh_set"))
    return sets.select(id_col, _minhash_from_set(F.col("sh_set"), k).alias("sig"))


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    k: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
) -> DataFrame:
    """MinHash-LSH near-dup pairs, exact-Jaccard verified.

    Pipeline: shingle -> k minhashes -> band into ``bands`` groups of
    k/bands rows -> candidates collide on (band, band_signature) ->
    verify candidates with exact Jaccard >= threshold.

    With r = k/bands rows per band the collision probability at
    similarity s is 1-(1-s^r)^bands (~0.9998 at s=0.7 with 16x4), so
    at the verify threshold the result matches the exact all-pairs
    answer with overwhelming probability while never comparing
    non-colliding documents.
    """
    r = k // bands
    sh = word_shingles(docs, id_col, text_col, n)
    # ONE aggregation produces both the verification shingle set and (as a
    # derived array expression) the minhash signature — the old two-agg
    # formulation shuffled the shingle relation twice.
    profile = sh.groupBy(id_col).agg(F.collect_set("shingle").alias("sh_set"))
    profile = profile.withColumn(
        "sig", _minhash_from_set(F.col("sh_set"), k)
    ).cache()
    # band key = xxhash64 of the r-slice of the signature array (any
    # injective-enough combiner works: candidates collide iff their r
    # minhash values agree)
    band_structs = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.xxhash64(F.slice(F.col("sig"), b * r + 1, r)).alias("sig"),
        ),
    )
    banded = profile.select(F.col(id_col), F.explode(band_structs).alias("bs")).select(
        id_col, F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
    )
    left = banded.select(F.col(id_col).alias("doc_a"), "band", "sig")
    right = banded.select(F.col(id_col).alias("doc_b"), "band", "sig")
    candidates = (
        left.join(right, ["band", "sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    # exact-Jaccard verification of candidates only: attach each side's
    # collected shingle set and intersect per pair — candidate count is
    # ~#near-dups, so the per-pair array_intersect work is tiny, and no
    # second shingle-level shuffle cascade is needed.
    sets = profile.select(id_col, "sh_set")
    return (
        candidates.join(
            sets.select(F.col(id_col).alias("doc_a"), F.col("sh_set").alias("set_a")),
            "doc_a",
        )
        .join(
            sets.select(F.col(id_col).alias("doc_b"), F.col("sh_set").alias("set_b")),
            "doc_b",
        )
        .withColumn("shared", F.size(F.array_intersect("set_a", "set_b")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("shared").cast("double")
                / (F.size("set_a") + F.size("set_b") - F.col("shared")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash64(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash per document from distinct word hashes.

    bit_b(doc) = 1 iff sum over words of (word-hash bit b ? +1 : -1) > 0.
    Computed as 64 conditional aggregates over one exploded pass — no
    Python, no per-row loops.
    """
    # distinct word hashes per doc, computed set-wise: the per-bit ±1 sums
    # and the final bit-pack are ONE nested array expression, not 64 wide
    # aggregate columns — identical values, but Catalyst analysis stays
    # O(1) in the sketch width (cold-plan latency dominated the old form).
    hset = (
        ensure_parallelism(docs)
        .select(
            F.col(id_col),
            F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("w"),
        )
        .distinct()
        .groupBy(id_col)
        .agg(F.collect_list(F.xxhash64("w")).alias("hs"))
    )
    packed = F.expr(
        """
        aggregate(sequence(0, 63), cast(0 as bigint), (acc, b) ->
          acc + if(
            aggregate(hs, 0, (a, h) ->
              a + if((shiftright(h, b) & 1) = 1, 1, -1)) > 0,
            shiftleft(cast(1 as bigint), b),
            cast(0 as bigint)))
        """
    )
    return hset.select(F.col(id_col), packed.alias("simhash"))


def simhash_near_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs with hamming distance <= max_hamming.

    Banding: split the 64-bit sketch into max_hamming+1 16-bit chunks —
    any pair within the distance budget must agree on >=1 chunk
    (pigeonhole), so candidates meet on an equi-join, never a cross join.
    """
    sig = simhash64(docs, id_col, text_col)
    n_chunks = max_hamming + 1
    width = 64 // n_chunks
    chunks = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk"),
                F.shiftrightunsigned(F.col("simhash"), c * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("key"),
            )
            for c in range(n_chunks)
        ]
    )
    banded = sig.select(F.col(id_col), F.col("simhash"), F.explode(chunks).alias("b")).select(
        id_col, "simhash", F.col("b.chunk").alias("chunk"), F.col("b.key").alias("key")
    )
    left = banded.select(
        F.col(id_col).alias("doc_a"), F.col("simhash").alias("sig_a"), "chunk", "key"
    )
    right = banded.select(
        F.col(id_col).alias("doc_b"), F.col("simhash").alias("sig_b"), "chunk", "key"
    )
    # A pair agreeing on several chunks would surface once per chunk; keep
    # only the FIRST agreeing chunk (a bit test on the two sketches already
    # in hand) — equivalent to distinct() but a filter instead of a second
    # shuffle over the candidate stream.
    xor = F.col("sig_a").bitwiseXOR(F.col("sig_b"))
    chunk_mask = (1 << width) - 1
    first_chunk_only = F.lit(True)
    for c in range(n_chunks - 1):
        chunk_differs = (
            F.shiftrightunsigned(xor, c * width).bitwiseAND(F.lit(chunk_mask)) != 0
        )
        first_chunk_only = first_chunk_only & ((F.col("chunk") <= c) | chunk_differs)
    pairs = (
        left.join(right, ["chunk", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(first_chunk_only)
        .withColumn("hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
    return pairs
