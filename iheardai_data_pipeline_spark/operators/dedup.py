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

from iheardai_data_pipeline_spark.functions.exact import ratio_half_up
from iheardai_data_pipeline_spark.operators.text import fingerprint_md5, normalize_text
from iheardai_data_pipeline_spark.sources.batch import ensure_parallelism, eval_once


def exact_duplicate_groups(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup by normalized-text fingerprint: every doc annotated with
    its group hash, group size, and keeper flag (min id wins).

    The input fans out first: the normalize+md5 projection is the
    per-row-heavy step and the self-join references it from two branches,
    so on a single-split scan it would run twice on one core (measured
    10.9s -> 1.9s on a 50k-doc replica)."""
    hashed = ensure_parallelism(docs).select(
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


def shingle_array(text_col, n: int = 5):
    """Row-local distinct word n-gram shingle set as ONE array expression.

    A document's shingle set is a function of that row alone, so it never
    needs a shuffle: dedup within the set is ``array_distinct``, the set
    size is ``size()``, and the MinHash signature derives from the array
    in-line. Every operator below builds on this so the (big) shingle
    relation is only ever shuffled when pair generation truly requires it.
    """
    words = F.split(normalize_text(text_col), " ")
    # docs shorter than n words yield no shingles (sequence(0,-1) would
    # descend and feed slice() an illegal start-0)
    idx = F.when(
        F.size(words) >= n, F.sequence(F.lit(0), F.size(words) - n)
    ).otherwise(F.array().cast("array<int>"))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(words, i + 1, n), " "))
    )


def word_shingles(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 5
) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle).

    Distinctness is per document, so it's resolved row-locally
    (``array_distinct`` before the explode) — no shuffle at all.
    """
    return ensure_parallelism(docs).select(
        F.col(id_col), F.explode(shingle_array(F.col(text_col), n)).alias("shingle")
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

    Shape (3 shuffles, all on 8-byte hashed keys): the per-doc shingle
    set and its size are row-local (``shingle_array``), so the exploded
    posting list carries (doc, set_size, shingle_hash) with no prior
    shuffle. Pass 1 counts document frequency per shingle (map-side
    partial agg — skew-safe even for boilerplate shingles). Pass 2
    re-keys postings on the shingle to keep only sub-cap groups; the
    posting list per surviving shingle is bounded by ``max_doc_freq``,
    so the in-line pair expansion (the inverted-index step) is capped at
    df*(df-1)/2 per shingle. Pass 3 sums shared counts per pair. Set
    sizes ride along the postings, so no count-table join is needed.
    """
    # shuffles key on an 8-byte xxhash64 instead of the ~n-word string
    # (equal results up to 64-bit hash collisions, ~1e-9 at millions of
    # distinct shingles; the rare collision could only merge two shingle
    # identities, nudging one jaccard by 1 count)
    postings = (
        eval_once(
            ensure_parallelism(docs),
            shs=F.transform(
                shingle_array(F.col(text_col), n), lambda s: F.xxhash64(s)
            ),
        )
        .select(
            F.col(id_col).alias("d"),
            F.size("shs").alias("n"),
            F.explode("shs").alias("shingle_h"),
        )
        # (d, n, shingle_h) longs only — compact; reused by the df pass
        # and the re-key pass
        .cache()
    )
    rare = (
        postings.groupBy("shingle_h")
        .agg(F.count(F.lit(1)).alias("df"))
        # df=1 shingles can't produce a pair; dropping them here keeps the
        # re-keyed posting relation to shingles that actually block
        .filter((F.col("df") >= 2) & (F.col("df") <= max_doc_freq))
        .select("shingle_h")
    )
    # join + groupBy share the shingle_h partitioning: one exchange
    grouped = (
        postings.join(rare, "shingle_h")
        .groupBy("shingle_h")
        .agg(F.array_sort(F.collect_list(F.struct("d", "n"))).alias("ds"))
    )
    pairs = grouped.select(
        F.explode(
            F.expr(
                """
                flatten(transform(sequence(0, size(ds) - 2), i ->
                  transform(sequence(i + 1, size(ds) - 1), j ->
                    struct(ds[i].d AS doc_a, ds[i].n AS n_a,
                           ds[j].d AS doc_b, ds[j].n AS n_b))))
                """
            )
        ).alias("p")
    ).select("p.*")
    return (
        pairs.groupBy("doc_a", "doc_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .withColumn(
            "jaccard",
            ratio_half_up(
                F.col("shared"), F.col("n_a") + F.col("n_b") - F.col("shared"), 4
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def incremental_minhash_dedup(
    incoming: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    k: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    verify: str = "array",
    max_candidates_per_doc: int | None = None,
) -> DataFrame:
    """Incremental NEAR-dup gate: keep only incoming docs with no
    MinHash-LSH near-dup (exact-Jaccard verified, >= ``threshold``) in
    the existing corpus NOR among lower-id docs of their own batch —
    the fuzzy sibling of :func:`incremental_dedup`'s exact-fingerprint
    gate, i.e. the ingest loop a growing training corpus runs so
    near-copies of already-held documents never enter.

    Mechanics: both sides are namespaced onto one id line (corpus ->
    2*id, incoming -> 2*id+1 — parity encodes the side, and intra-batch
    numeric order is preserved) and pushed through the SAME banded
    :func:`minhash_lsh_pairs` pipeline, so the candidate join stays
    sublinear and corpus-vs-corpus pairs are simply discarded after the
    fact. Drop rule (deterministic): an incoming doc drops when paired
    with any corpus doc, or with a lower-id incoming doc (whether or
    not that doc itself survives — the same min-id-wins convention as
    the exact gate; a production variant can re-key on the kept set).

    At scale the corpus side would be a PRE-COMPUTED signature/band
    index — that production variant exists as
    :class:`~iheardai_data_pipeline_spark.operators.neardup_index.MinHashBandIndex`;
    this composition recomputes the banding because the rig's corpora
    are small. Only pairs that can actually drop a doc are
    exact-verified (corpus-corpus candidates are discarded pre-verify).

    ``max_candidates_per_doc``: optional cap on verified candidates per
    drop target, ranked by band-collision count — the lever for
    pathological duplicate density, where candidate volume is quadratic
    in duplicate multiplicity but the gate needs only ONE disqualifying
    pair per doc. APPROXIMATE (a doc whose sole true match ranks below
    the cap is wrongly kept), hence default off; with the 16x4 banding
    a cap of 8 reproduced the exact survivor set on the 10x
    dense-duplication stress corpus (see docs/SCALE.md).

    Returns the surviving incoming rows (all original columns).
    """
    assert id_col in incoming.columns and id_col in corpus.columns
    # The 2*id(+1) namespacing needs |id| < 2^62 to not overflow the
    # 64-bit line; hash-derived ids (xxhash64) can be any long, so fail
    # loudly instead of silently wrapping. The guard is one JVM-side
    # comparison per row, fused into the projection.
    bound = 1 << 62
    def _ns(side: DataFrame, offset: int) -> DataFrame:
        nid = F.col(id_col).cast("long")
        guarded = F.when(
            (nid >= bound) | (nid <= -bound),
            F.raise_error(
                F.concat(
                    F.lit(f"incremental_minhash_dedup: |{id_col}| >= 2^62 "),
                    F.lit("overflows the 2*id parity encoding: "),
                    nid.cast("string"),
                )
            ).cast("long"),
        ).otherwise(nid * 2 + offset)
        return side.select(guarded.alias(id_col), text_col)

    u = _ns(corpus, 0).unionByName(_ns(incoming, 1))
    profile = _lsh_profile(u, id_col, text_col, n, k)
    cand = _lsh_band_candidates(profile, id_col, k, bands)
    a, b = F.col("doc_a"), F.col("doc_b")
    # sign-safe parity: Spark's % follows the dividend sign (-5 % 2 ==
    # -1), so `x % 2 == 1` is false for odd NEGATIVE ids — pmod returns
    # 1 for every odd value regardless of sign
    odd_a, odd_b = F.pmod(a, F.lit(2)) == 1, F.pmod(b, F.lit(2)) == 1
    # Only pairs that can DROP something get verified: the drop target
    # is b when b is incoming (a is then a corpus doc or a lower-id
    # peer), else a when a is incoming and b is corpus. Corpus-corpus
    # pairs decide nothing, so they are filtered BEFORE the dominant
    # exact-Jaccard step, not after it (the recompute path used to
    # verify them and throw the result away).
    targeted = cand.select(
        F.when(odd_b, b).when(odd_a, a).alias("__tgt"),
        F.when(odd_b, a).otherwise(b).alias("__oth"),
        "n_bands_hit",
    ).where(F.col("__tgt").isNotNull())
    if max_candidates_per_doc is not None:
        # the gate only needs ONE disqualifying pair per doc, so under
        # pathological duplicate density (every doc near-dups dozens of
        # others) verifying every candidate is quadratic waste: keep the
        # top-N per target by band-collision count (more colliding
        # bands ~ higher estimated Jaccard), deterministic tie-break on
        # the partner id. APPROXIMATE when a doc's only true match
        # ranks below the cap among false candidates — off by default.
        from pyspark.sql import Window

        w = Window.partitionBy("__tgt").orderBy(
            F.desc("n_bands_hit"), F.asc("__oth")
        )
        targeted = targeted.withColumn("__rn", F.row_number().over(w)).where(
            F.col("__rn") <= max_candidates_per_doc
        )
    pairs = _verify_candidate_pairs(
        profile,
        targeted.select(
            F.col("__tgt").alias("doc_a"), F.col("__oth").alias("doc_b")
        ),
        id_col,
        threshold,
        verify,
    )
    dropped = (
        pairs.select(F.col("doc_a").alias("__nid"))
        .distinct()
        # integer div, not float: float division would lose precision
        # for ids beyond 2^53 (hash-derived ids at corpus scale)
        .select(F.expr("(__nid - 1) div 2").alias(id_col))
    )
    return incoming.join(dropped, id_col, "left_anti")


def _minhash_from_set(sh_hashes, k: int):
    """MinHash signature as ONE array<long> expression over a set of
    PRE-HASHED shingles (array<long>): sig[i] = min over h of
    xxhash64(i, h).

    Two deliberate shapes:
    - the plan stays k-independent in width (vs a k-column min-aggregate
      formulation) — Catalyst analysis cost doesn't scale with k;
    - each shingle string is hashed ONCE upstream, so the k-wide inner
      loop mixes fixed-width longs instead of re-hashing ~40-byte
      strings k times (the dominant per-row cost at k=64)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.array_min(F.transform(sh_hashes, lambda h: F.xxhash64(i, h))),
    )


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    k: int = 64,
) -> DataFrame:
    """k-permutation MinHash signature per doc: ``sig`` array<long> of
    min(xxhash64(seed_i, shingle)) for every i — constant per-doc state,
    computed entirely row-locally (shingle set -> signature is one narrow
    projection; no shuffle)."""
    return (
        eval_once(
            ensure_parallelism(docs),
            sh_hashes=F.transform(
                shingle_array(F.col(text_col), n), lambda s: F.xxhash64(s)
            ),
        )
        .filter(F.size("sh_hashes") > 0)
        .select(id_col, _minhash_from_set(F.col("sh_hashes"), k).alias("sig"))
    )


def _lsh_profile(
    docs: DataFrame, id_col: str, text_col: str, n: int, k: int
) -> DataFrame:
    """(id, sh_set, sig) — the cached narrow projection every LSH
    consumer shares: shingle sets row-local, hashed to longs once,
    signature derived in-line (see minhash_lsh_pairs for why)."""
    return (
        eval_once(
            ensure_parallelism(docs),
            sh_set=F.transform(
                shingle_array(F.col(text_col), n), lambda s: F.xxhash64(s)
            ),
        )
        .filter(F.size("sh_set") > 0)
        .select(F.col(id_col), "sh_set")
        .withColumn("sig", _minhash_from_set(F.col("sh_set"), k))
        .cache()
    )


def _lsh_band_candidates(
    profile: DataFrame, id_col: str, k: int, bands: int
) -> DataFrame:
    """Banded candidate pairs (doc_a < doc_b) with ``n_bands_hit`` (how
    many of the ``bands`` band-signatures collided — a free byproduct of
    the dedup aggregation, and a ranking signal for capped gates: more
    colliding bands ~ higher estimated similarity)."""
    r = k // bands
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
    return (
        left.join(right, ["band", "sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_bands_hit"))
    )


def _verify_candidate_pairs(
    profile: DataFrame,
    candidates: DataFrame,
    id_col: str,
    threshold: float,
    verify: str,
) -> DataFrame:
    """Exact-Jaccard verification of (doc_a, doc_b) candidate pairs —
    the two strategies documented on :func:`minhash_lsh_pairs`."""
    candidates = candidates.select("doc_a", "doc_b")
    if verify == "array":
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
                ratio_half_up(
                    F.col("shared"), F.size("set_a") + F.size("set_b") - F.col("shared"), 4
                ),
            )
            .filter(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", "jaccard")
        )
    if verify != "streaming":
        raise ValueError(f"unknown verify mode {verify!r}")
    # the streaming branch references candidates TWICE (the semi-join
    # probe ids and the shared-count join); profile is cached, but the
    # band self-join above would still re-run per reference — pin the
    # (tiny: pair ids only) candidate relation once
    candidates = candidates.localCheckpoint(eager=False)
    # memory-bounded verification: |A ∩ B| as a per-shingle equi-join.
    # Every operator here streams — explode emits one (doc, hash) row at
    # a time and the count aggregates map-side — so no task ever
    # materializes a whole shingle set, whatever the document length.
    # The explode is pruned to candidate docs first (left_semi on the
    # usually-small candidate id set).
    sizes = profile.select(F.col(id_col), F.size("sh_set").alias("n"))
    cand_ids = (
        candidates.select(F.col("doc_a").alias(id_col))
        .union(candidates.select(F.col("doc_b").alias(id_col)))
        .distinct()
    )
    sh = (
        profile.join(cand_ids, id_col, "left_semi")
        .select(F.col(id_col), F.explode("sh_set").alias("h"))
    )
    shared = (
        candidates.join(
            sh.select(F.col(id_col).alias("doc_a"), "h"), "doc_a"
        )
        .join(sh.select(F.col(id_col).alias("doc_b"), "h"), ["doc_b", "h"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        shared.join(sizes.select(F.col(id_col).alias("doc_a"), F.col("n").alias("n_a")), "doc_a")
        .join(sizes.select(F.col(id_col).alias("doc_b"), F.col("n").alias("n_b")), "doc_b")
        .withColumn(
            "jaccard",
            ratio_half_up(
                F.col("shared"), F.col("n_a") + F.col("n_b") - F.col("shared"), 4
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    k: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    verify: str = "array",
) -> DataFrame:
    """MinHash-LSH near-dup pairs, exact-Jaccard verified.

    Pipeline: shingle -> k minhashes -> band into ``bands`` groups of
    k/bands rows -> candidates collide on (band, band_signature) ->
    verify candidates with exact Jaccard >= threshold.

    ``verify`` picks the exact-Jaccard strategy (identical results):
    - "array": attach both docs' hashed shingle sets to each candidate
      pair and array_intersect row-locally. Fastest for ordinary
      documents (one narrow join, no shingle-level shuffle), but holds
      two whole shingle sets in one row — memory scales with doc length.
    - "streaming": count shared shingles with a per-shingle equi-join +
      streaming aggregate; no row ever holds a whole set, so memory is
      bounded regardless of document size (book-length texts). Costs one
      extra shuffle keyed on (doc, shingle-hash), restricted to
      candidate docs only. It is ALSO the faster mode when candidate
      density is high — "array" shuffles both full shingle sets per
      pair, so its shuffle volume is pairs x set-size (measured: array
      1.0s vs streaming 2.4s on the ordinary sf0.1 corpus, but 25s vs
      10s on a 10x-duplication stress corpus with 250k true pairs).
      Rule of thumb: expect >= ~10 true near-dups per doc, pick
      streaming. Zero-overlap candidates drop out of the
      inner join, so results equal "array" mode for any threshold > 0.

    With r = k/bands rows per band the collision probability at
    similarity s is 1-(1-s^r)^bands (~0.9998 at s=0.7 with 16x4), so
    at the verify threshold the result matches the exact all-pairs
    answer with overwhelming probability while never comparing
    non-colliding documents.
    """
    # profile (hashed shingle set + signature) is a NARROW projection of
    # the doc scan — shingle sets are row-local (shingle_array, hashed to
    # longs immediately, behind an eval_once barrier so the k-reference
    # signature expression reads the materialized array instead of
    # re-shingling per reference), so nothing shuffles until banded
    # candidates meet; cached because banding and both verification
    # sides reuse it. Longs (not shingle strings) keep the cached
    # profile ~5x smaller and make the Jaccard intersect fixed-width
    # (same counts as string sets up to 64-bit collisions, ~1e-9 —
    # the same accepted trade as the n-gram pipeline above).
    profile = _lsh_profile(docs, id_col, text_col, n, k)
    candidates = _lsh_band_candidates(profile, id_col, k, bands)
    return _verify_candidate_pairs(profile, candidates, id_col, threshold, verify)


def _word_hash64_md5(w):
    """SQL-portable 64-bit word hash: the first 16 hex chars of md5,
    interpreted as a two's-complement int64 (two 32-bit halves combined
    with shift+or so neither engine's signed-overflow checks trip).
    Bit-identical to the DuckDB oracle's HUGEINT-wrapped equivalent."""
    m = F.md5(w)
    hi = F.conv(F.substring(m, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(m, 9, 8), 16, 10).cast("long")
    return F.shiftleft(hi, 32).bitwiseOR(lo)


def simhash64(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    word_hash: str = "xxhash64",
) -> DataFrame:
    """64-bit SimHash per document from distinct word hashes.

    bit_b(doc) = 1 iff sum over words of (word-hash bit b ? +1 : -1) > 0.
    The distinct word-hash set, the per-bit ±1 sums, and the final
    bit-pack are ONE nested array expression per row — no shuffle at all
    (the old explode/distinct/collect_list form shuffled the word
    relation twice), and Catalyst analysis stays O(1) in sketch width.

    ``word_hash``: "xxhash64" (default — fastest, JVM-native) or
    "md5_portable" (md5-derived int64, exactly reproducible in ANSI
    SQL / DuckDB, so the sketch itself can be value-oracled).
    """
    if word_hash == "xxhash64":
        hash_fn = F.xxhash64
    elif word_hash == "md5_portable":
        hash_fn = _word_hash64_md5
    else:
        raise ValueError(f"unknown word_hash {word_hash!r}")
    hset = eval_once(
        ensure_parallelism(docs).filter(F.col(text_col).isNotNull()),
        hs=F.array_distinct(
            F.transform(
                F.split(normalize_text(F.col(text_col)), " "),
                lambda w: hash_fn(w),
            )
        ),
    ).select(F.col(id_col), "hs")
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
    word_hash: str = "xxhash64",
) -> DataFrame:
    """SimHash near-dup pairs with hamming distance <= max_hamming.

    Banding: split the 64-bit sketch into max_hamming+1 16-bit chunks —
    any pair within the distance budget must agree on >=1 chunk
    (pigeonhole), so candidates meet on an equi-join, never a cross join.
    The banding is exhaustive, so the result EQUALS the naive all-pairs
    hamming filter — which is what the DuckDB oracle computes.
    """
    sig = simhash64(docs, id_col, text_col, word_hash=word_hash)
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


def bloom_prefilter_flags(
    rows: DataFrame,
    bloom: DataFrame | list[int],
    key_col: str,
    m: int = 4096,
    k: int = 6,
    flag_col: str = "__maybe_present",
) -> DataFrame:
    """Annotate ``rows`` with a ROW-LOCAL Bloom membership flag — no
    shuffle, no per-key join.

    The relational Bloom (``sketch.bloom_build``'s <=m distinct bit
    rows) folds to its dense m/64-word bitmap (``bloom_pack_words``),
    which rides to every task as ONE broadcast row holding an
    array<bigint> — the shipped-sketch pattern (centroids, codebooks),
    sized by ``m`` alone, never by the corpus. Each row then tests its
    ``k`` bit positions against that array in an unrolled column
    expression (k is a small build-time constant; unrolling keeps the
    whole test inside whole-stage codegen).

    Contract (Bloom's own): ``flag_col`` FALSE is definite absence — a
    key the filter has seen NEVER probes FALSE; TRUE is "maybe", at the
    standard (1 - e^(-kn/m))^k false-positive rate. Downstream may
    therefore skip exact membership work for FALSE rows without
    changing any answer.

    ``bloom`` accepts the sketch at any maintenance stage: the raw bit
    relation (``bloom_build``), the packed-word relation
    (``bloom_pack_words``), or the fully collected ``list[int]`` word
    array — the driver-side serving artifact (centroid/codebook
    class: sized by the filter constant ``m``, never the data).
    Relational forms densify through a BOUNDED driver collect (<= m/64
    rows); serving loops should collect ONCE at index load and pass
    the list, so repeated batches pay zero Spark jobs for the filter.
    The dense-in-Spark alternative (element_at over a collected map)
    is O(words^2) in one task and was measured 67s at m=2^21 — the
    collect is milliseconds."""
    from functools import reduce
    from operator import and_

    from iheardai_data_pipeline_spark.operators.sketch import (
        _bloom_bit,
        bloom_pack_words,
    )

    n_words = (m + 63) // 64
    if isinstance(bloom, DataFrame):
        packed = (
            bloom
            if "word_idx" in bloom.columns
            else bloom_pack_words(bloom, m)
        )
        arr = [0] * n_words
        for r in packed.collect():
            arr[int(r["word_idx"])] = int(r["word"])
    else:
        arr = list(bloom) + [0] * (n_words - len(bloom))
    words = rows.sparkSession.createDataFrame(
        [(arr,)], "__bloom_words array<bigint>"
    )
    bit_cols = {
        f"__bb{i}": _bloom_bit(F.lit(i), F.col(key_col), m) for i in range(k)
    }
    flagged = eval_once(rows.crossJoin(F.broadcast(words)), **bit_cols)
    checks = [
        F.expr(
            f"(element_at(__bloom_words, CAST(__bb{i} div 64 AS INT) + 1) & "
            f"shiftleft(CAST(1 AS BIGINT), CAST(pmod(__bb{i}, 64) AS INT))) != 0"
        )
        for i in range(k)
    ]
    # A NULL key hashes to NULL bit positions, turning every check NULL;
    # coalesce to FALSE: a null fingerprint can never equal any corpus
    # fingerprint, so "definitely absent" reproduces the plain anti-join
    # path's keep-behavior exactly (NULL != NULL under SQL join equality).
    return flagged.withColumn(
        flag_col, F.coalesce(reduce(and_, checks), F.lit(False))
    ).drop("__bloom_words", *bit_cols)


def incremental_dedup(
    incoming: DataFrame,
    corpus_fingerprints: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    fp_col: str = "fingerprint",
    bloom: DataFrame | list[int] | None = None,
    bloom_m: int = 4096,
    bloom_k: int = 6,
) -> DataFrame:
    """Incremental-ingest dedup: keep only incoming docs whose normalized
    fingerprint is absent from the existing corpus index AND unique
    within the batch (min id wins on intra-batch dupes).

    The production loop every growing corpus runs: the fingerprint index
    is the only state carried between runs, the check is one LEFT ANTI
    join (shuffle keyed on a 16-byte hash; the index side is cheap to
    bucket on fingerprint so re-ingest joins shuffle-free), and the
    intra-batch window shares the anti-join's key. Never rescans the
    corpus text.

    ``bloom`` (the corpus fingerprints' ``sketch.bloom_build`` relation,
    built once when the index is maintained) engages the classic
    pre-filter: every incoming row tests its fingerprint against the
    broadcast bitmap ROW-LOCALLY (:func:`bloom_prefilter_flags`), and
    only rows probing TRUE — the true-duplicate fraction plus the
    filter's false-positive rate — continue into the corpus anti-join.
    Rows probing FALSE are DEFINITELY new (no false negatives), so they
    bypass the probe entirely, and the survivor set is IDENTICAL by
    the Bloom contract (pinned in tests/test_dedup_edges.py).

    Plan order: the intra-batch keeper window runs FIRST — equivalent
    either way (corpus membership is an fp-level predicate, so it
    commutes with the per-fp min-id keeper), but window-first means
    the batch is shuffled exactly once on fp and the suspects'
    anti-join REUSES that exchange (the filter preserves hash(fp)
    partitioning), instead of the post-join union forcing a second
    full-batch shuffle. The flag itself is computed BEFORE that
    exchange: the union's two branches share only the exchange
    execution (Catalyst re-runs post-exchange operators per branch),
    so putting the k-hash probe upstream of it makes the md5 work run
    once and ride through as one boolean. At 100 TB the win compounds:
    the anti-join's probe side is the suspect fraction of the batch,
    so against a bucketed fingerprint index (the production layout —
    the index side never re-shuffles) the join repartitions and
    sort-merges ~(dup_rate + fp_rate) of the batch rather than all of
    it, and a bucket-pruned index read touches only the suspects'
    buckets. Measured (200k batch, 10% dups, bucketed 200k-fp index,
    m=2^21 passed as the collected word list: suspect fraction 0.106):
    total shuffle write 18.5 -> 10.2 MB (-45%; the residual is the
    keeper window's own batch exchange, which the suspects' anti-join
    reuses), anti-join probe side 200k -> 21.2k rows (-89%);
    docs/SCALE.md."""
    from pyspark.sql import Window

    hashed = incoming.withColumn(fp_col, fingerprint_md5(F.col(text_col)))
    w = Window.partitionBy(fp_col).orderBy(id_col)

    def keeper(df: DataFrame) -> DataFrame:
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    if bloom is None:
        return keeper(hashed).join(
            corpus_fingerprints.select(F.col(fp_col)), fp_col, "left_anti"
        )
    flagged = keeper(
        bloom_prefilter_flags(hashed, bloom, fp_col, m=bloom_m, k=bloom_k)
    )
    definite_new = flagged.filter(~F.col("__maybe_present")).drop(
        "__maybe_present"
    )
    suspects = flagged.filter(F.col("__maybe_present")).drop(
        "__maybe_present"
    )
    return definite_new.unionByName(
        suspects.join(
            corpus_fingerprints.select(F.col(fp_col)), fp_col, "left_anti"
        )
    )


def decontaminate(
    corpus: DataFrame,
    testset: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing any word
    n-gram with a held-out evaluation set (the standard 8-13-gram
    collision test used before LLM training runs).

    Two-phase shape, collision-proof at narrow-row cost:

    Phase 1 (find candidates): the corpus side shingles row-locally and
    projects to ``(doc_id, xxhash64)`` — 8-byte keys, NO raw shingle
    strings cross the exchange — then LEFT SEMI probes the test side's
    distinct shingle hashes (typically tiny → broadcast). Output: the
    candidate doc-id set, which for any sane corpus/test pair is a
    vanishing fraction of the corpus.

    Phase 2 (exact verify): only the candidate docs are re-shingled and
    joined against the test side's RAW distinct shingles, so a 64-bit
    hash collision between distinct shingles can never inflate
    n_collisions — the result exactly matches a raw-string join (which
    is what the DuckDB oracle computes), and a doc whose every phase-1
    hit was a pure hash collision drops out here. The wide raw-shingle
    rows therefore exist only for the (tiny) contaminated set.

    Output: every corpus doc with its collision count (docs with 0
    collisions are clean and absent; anti-join against this result to
    get the clean corpus).
    """
    test_sh = (
        word_shingles(testset, id_col, text_col, n).select("shingle").distinct()
    )
    test_h = test_sh.select(F.xxhash64("shingle").alias("h")).distinct()
    corpus_h = word_shingles(corpus, id_col, text_col, n).select(
        id_col, F.xxhash64("shingle").alias("h")
    )
    cand_ids = (
        corpus_h.join(test_h, "h", "left_semi").select(id_col).distinct()
    )
    cand_docs = corpus.join(cand_ids, id_col, "left_semi")
    return (
        word_shingles(cand_docs, id_col, text_col, n)
        .join(test_sh.withColumnRenamed("shingle", "__t_shingle"),
              F.col("shingle") == F.col("__t_shingle"))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_collisions"))
    )


def duplicate_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_words: int = 10,
    min_docs: int = 2,
) -> DataFrame:
    """Substring-level exact dedup: flag every overlapping
    ``span_words``-word span that appears verbatim in >= ``min_docs``
    DISTINCT documents, and report per document how many start positions
    are duplicated and how many word positions those spans cover.

    This is the Spark-able counterpart of suffix-array substring dedup
    (Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    Better"): any cross-document duplicated run of >= span_words tokens
    shares ALL of its aligned spans with its twin because every
    overlapping start position is emitted (stride 1), so detection is
    exact at span granularity with no corpus-wide suffix sort and no
    all-pairs comparison. Spans repeated only WITHIN one document are
    deliberately not flagged (intra-doc repetition is the Gopher
    repetition filter's job, ``operators/corpus.py``).

    Scale shape: spans are emitted row-locally and hashed to md5 in the
    same projection (16-byte engine-portable key — raw span strings
    never cross an exchange); corpus-wide span document-frequency is one
    groupBy on the hash (two-phase distinct-count, map-side partials
    crush boilerplate); the flag-back join's build side is one row per
    duplicated span hash (broadcastable, AQE-skew-split above that); the
    covered-position explode touches ONLY duplicated spans — k x the
    contaminated fraction, not k x the corpus.

    Output: one row per doc — n_words, n_spans, n_dup_spans (distinct
    duplicated start positions), dup_cover_words (distinct word
    positions inside any duplicated span: the excision budget a
    span-removal pass would cut).
    """
    k = span_words
    base = ensure_parallelism(docs.where(F.col(text_col).isNotNull())).select(
        F.col(id_col), F.split(normalize_text(F.col(text_col)), " ").alias("__ws")
    )
    idx = F.when(
        F.size("__ws") >= k, F.sequence(F.lit(0), F.size("__ws") - k)
    ).otherwise(F.array().cast("array<int>"))
    spans = base.select(
        id_col,
        F.posexplode(
            F.transform(
                idx, lambda i: F.md5(F.array_join(F.slice("__ws", i + 1, k), " "))
            )
        ).alias("pos", "span_hash"),
    )
    dup = (
        spans.groupBy("span_hash")
        .agg(F.countDistinct(id_col).alias("__nd"))
        .where(F.col("__nd") >= min_docs)
        .select("span_hash")
    )
    covered = spans.join(dup, "span_hash").select(
        id_col,
        "pos",
        F.explode(F.sequence(F.col("pos"), F.col("pos") + k - 1)).alias("wpos"),
    )
    per_doc = covered.groupBy(id_col).agg(
        F.countDistinct("pos").alias("n_dup_spans"),
        F.countDistinct("wpos").alias("dup_cover_words"),
    )
    doc_stats = base.select(
        id_col,
        F.size("__ws").cast("long").alias("n_words"),
        F.greatest(F.size("__ws") - k + 1, F.lit(0)).cast("long").alias("n_spans"),
    )
    return doc_stats.join(per_doc, id_col, "left").select(
        id_col,
        "n_words",
        "n_spans",
        F.coalesce("n_dup_spans", F.lit(0).cast("long")).alias("n_dup_spans"),
        F.coalesce("dup_cover_words", F.lit(0).cast("long")).alias("dup_cover_words"),
    )


def excise_duplicate_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_words: int = 10,
    min_docs: int = 2,
) -> DataFrame:
    """Substring-dedup EXCISION: remove every word position covered by a
    cross-document duplicated span (see :func:`duplicate_spans` for the
    detection contract) and reassemble each document from its surviving
    words in order — the "cut the duplicated substring, keep the rest"
    policy of suffix-array dedup pipelines (Lee et al. 2022), where
    dropping whole documents would waste the unique remainder.

    Same scale shape as detection (md5 span keys, duplicated-fraction
    explode) plus one per-doc covered-position set: collected as an
    array (bounded by the doc's own word count — row-local memory) and
    applied as a hash-based set difference + positional gather
    (``array_except`` then ``element_at`` — linear in words + covered
    positions), so reassembly never shuffles the corpus text a second
    time and long heavily-duplicated docs stay O(n), not O(n^2).

    Output: one row per doc — n_words, n_kept_words, kept_text.
    """
    k = span_words
    base = ensure_parallelism(docs.where(F.col(text_col).isNotNull())).select(
        F.col(id_col), F.split(normalize_text(F.col(text_col)), " ").alias("__ws")
    )
    idx = F.when(
        F.size("__ws") >= k, F.sequence(F.lit(0), F.size("__ws") - k)
    ).otherwise(F.array().cast("array<int>"))
    spans = base.select(
        id_col,
        F.posexplode(
            F.transform(
                idx, lambda i: F.md5(F.array_join(F.slice("__ws", i + 1, k), " "))
            )
        ).alias("pos", "span_hash"),
    )
    dup = (
        spans.groupBy("span_hash")
        .agg(F.countDistinct(id_col).alias("__nd"))
        .where(F.col("__nd") >= min_docs)
        .select("span_hash")
    )
    cov_arr = (
        spans.join(dup, "span_hash")
        .select(
            id_col,
            F.explode(F.sequence(F.col("pos"), F.col("pos") + k - 1)).alias("wpos"),
        )
        .groupBy(id_col)
        .agg(F.collect_set("wpos").alias("__cov"))
    )
    cov = F.coalesce(F.col("__cov"), F.array().cast("array<int>"))
    # surviving positions in O(n_words + n_covered): array_except is a
    # hash-based set difference that preserves the first array's order,
    # so kept positions come back ascending and a positional gather
    # rebuilds the text — NOT an array_contains probe per word, which
    # was O(n_words x n_covered) row-locally and quadratic on long,
    # heavily-duplicated documents
    all_pos = F.when(
        F.size("__ws") > 0, F.sequence(F.lit(0), F.size("__ws") - 1)
    ).otherwise(F.array().cast("array<int>"))
    kept = F.transform(
        F.array_except(all_pos, cov),
        lambda p: F.element_at(F.col("__ws"), p + 1),
    )
    joined = eval_once(base.join(cov_arr, id_col, "left"), __kept=kept)
    return joined.select(
        id_col,
        F.size("__ws").cast("long").alias("n_words"),
        F.size("__kept").cast("long").alias("n_kept_words"),
        F.array_join("__kept", " ").alias("kept_text"),
    )


def segment_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    words_per_line: int = 10,
) -> DataFrame:
    """Explode documents into ordered line units: (id, line_idx, line).

    Production corpora split on ``\\n``; the synthetic test corpus is
    single-line, so the unit is a fixed ``words_per_line``-word span of
    the normalized text (an honest stand-in with identical downstream
    mechanics — swap the segmenter expression to ``split(text, '\\n')``
    for real web text). Row-local: the explode is a narrow op, no
    shuffle until the caller aggregates.
    """
    toks = F.split(normalize_text(F.col(text_col)), " ")
    n_lines = F.ceil(F.size(toks) / F.lit(words_per_line)).cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), n_lines - 1),
        lambda i: F.array_join(
            F.slice(toks, i * words_per_line + 1, words_per_line), " "
        ),
    )
    # fan out first: the split+segment expression is per-row-heavy and a
    # single-split scan would run it (and the explode) on one core
    return ensure_parallelism(docs.where(F.col(text_col).isNotNull())).select(
        F.col(id_col), F.posexplode(lines).alias("line_idx", "line")
    )


def line_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    words_per_line: int = 10,
    min_freq: int = 2,
) -> DataFrame:
    """C4/RefinedWeb-style line-level dedup: drop every occurrence of any
    line whose corpus-wide frequency reaches ``min_freq``, then reassemble
    each document from its kept lines in order.

    Scale shape (the reason this beats the obvious window): line
    frequency comes from a ``groupBy(line)`` — partial aggregation
    crushes boilerplate hot lines map-side, where a
    ``count() OVER (PARTITION BY line)`` would ship every copy of a hot
    line to one reducer. The join back is an equi-join against the
    distinct-line counts (one row per line on the build side, AQE
    skew-split handles residual hot keys). Reassembly is one
    ``groupBy(doc)`` over structs sorted in-row — 3 shuffles total,
    each on the narrowest possible key, never all-pairs.

    Output: one row per input doc — n_lines, n_kept, kept_text (kept
    lines joined in original order; empty string when everything was
    boilerplate).
    """
    seg = segment_lines(docs, id_col, text_col, words_per_line)
    freq = seg.groupBy("line").agg(F.count(F.lit(1)).alias("line_freq"))
    flagged = seg.join(freq, "line").withColumn(
        "kept", F.col("line_freq") < F.lit(min_freq)
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("kept").cast("long")).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("kept"),
                                F.struct(F.col("line_idx"), F.col("line")),
                            )
                        )
                    ),
                    lambda s: s["line"],
                ),
                " ",
            ).alias("kept_text"),
        )
    )


def containment_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    threshold: float = 0.8,
) -> DataFrame:
    """EXACT directional shingle-containment join: ordered pairs
    (doc_a, doc_b) with |A∩B| / |A| >= t — doc_a's n-gram set is
    (mostly) CONTAINED in doc_b's. The asymmetric complement to
    :func:`prefix_filter_pairs`' symmetric Jaccard: a short document
    quoted inside a long one scores containment ~1 while its Jaccard is
    tiny, so this is the quote/excerpt/subset detector (the substring
    dedup family's set-semantics sibling, robust to reordering where
    the span detector is positional).

    Prefix-filter theorem, containment form: |A∩B| >= c := ceil(t|A|)
    forces A's first |A| - c + 1 tokens under ANY global total order to
    intersect B (otherwise the shared tokens all sit in A's remaining
    c - 1 tokens — pigeonhole). So candidates = A-PREFIX tokens joined
    against B's FULL posting list: complete by theorem, no LSH miss, no
    df cap. Ordering rarest-first keeps A-prefixes on short posting
    lists (the hot-token control); the B side is the full index, which
    is why containment is inherently costlier than the symmetric join —
    documented, not hidden. The |B| >= ceil(t|A|) length filter and the
    exact integer ceil ((p*n + q - 1) div q — float 0.8*15 = 12.000...2
    would over-demand a token) follow prefix_filter_pairs.

    Output: (doc_a, doc_b, containment) with half-up 4-dp containment,
    ordered pairs (a mutually-near-dup pair appears in both directions,
    matching the directional semantics).
    """
    from fractions import Fraction

    fr = Fraction(str(threshold))
    p, q = fr.numerator, fr.denominator

    from pyspark.sql import Window

    prof = (
        eval_once(
            ensure_parallelism(docs.where(F.col(text_col).isNotNull())),
            sh_set=F.transform(
                shingle_array(F.col(text_col), n), lambda s: F.xxhash64(s)
            ),
        )
        .filter(F.size("sh_set") > 0)
        .select(
            F.col(id_col).alias("d"),
            "sh_set",
            F.size("sh_set").alias("n_sh"),
        )
        .cache()
    )
    postings = prof.select("d", "n_sh", F.explode("sh_set").alias("shingle_h"))
    df_tbl = postings.groupBy("shingle_h").agg(F.count(F.lit(1)).alias("df"))
    ranked = postings.join(df_tbl, "shingle_h").withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("d").orderBy("df", "shingle_h")),
    )
    # A-side prefix under containment: |A| - ceil(t|A|) + 1 tokens
    ceil_tn = F.expr(f"CAST(({p} * n_sh + {q} - 1) div {q} AS INT)")
    prefix = ranked.filter(F.col("rn") <= F.col("n_sh") - ceil_tn + 1).select(
        "shingle_h", F.col("d").alias("doc_a"), F.col("n_sh").alias("n_a")
    )
    cand = (
        prefix.join(
            postings.select("shingle_h", F.col("d").alias("doc_b"), F.col("n_sh").alias("n_b")),
            "shingle_h",
        )
        .filter(F.col("doc_a") != F.col("doc_b"))
        # length filter: |B| >= ceil(t|A|)  <=>  q*n_b >= p*n_a
        .filter(F.lit(q) * F.col("n_b") >= F.lit(p) * F.col("n_a"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    return (
        cand.join(
            prof.select(F.col("d").alias("doc_a"), F.col("sh_set").alias("set_a"), F.col("n_sh").alias("n_a")),
            "doc_a",
        )
        .join(
            prof.select(F.col("d").alias("doc_b"), F.col("sh_set").alias("set_b")),
            "doc_b",
        )
        .withColumn("shared", F.size(F.array_intersect("set_a", "set_b")))
        # exact integer threshold: shared/|A| >= p/q
        .filter(F.lit(q) * F.col("shared") >= F.lit(p) * F.col("n_a"))
        .select(
            "doc_a",
            "doc_b",
            ratio_half_up(F.col("shared"), F.col("n_a"), 4).alias("containment"),
        )
    )


def prefix_filter_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    threshold: float = 0.7,
) -> DataFrame:
    """EXACT n-gram Jaccard join via PPJoin-style PREFIX FILTERING
    (Xiao et al. 2008, "Efficient Similarity Joins for Near Duplicate
    Detection") — the deterministic alternative to both the banded LSH
    (probabilistic miss) and :func:`ngram_jaccard_pairs`' df cap
    (which silently ignores pairs that only share hot shingles): this
    equals the NO-CAP all-pairs answer, guaranteed.

    Theory: Jaccard(A,B) >= t forces overlap >= ceil(t/(1+t)
    (|A|+|B|)). Order all shingles by ONE global total order and take
    each set's first ``|X| - ceil(t|X|) + 1`` tokens as its PREFIX: two
    sets whose prefixes are disjoint cannot reach that overlap (at most
    min(|A|,|B|) - prefix-excluded tokens remain), so candidates =
    pairs sharing >= 1 PREFIX token — complete by theorem, not by
    probability. Ordering rarest-first (df ascending) makes prefixes
    low-frequency, so posting lists of prefix tokens stay short — the
    skew control the df cap bought, WITHOUT dropping hot-shingle-only
    pairs (they are simply found through their rarer prefix tokens).
    The length filter (t*max(|A|,|B|) <= min(|A|,|B|)) prunes the rest.

    Exactness discipline: ``ceil(t*|X|)`` is INTEGER arithmetic on the
    threshold's exact decimal fraction ((p*n + q - 1) div q) — a float
    0.7*20 rounds to 14.000000000000002 and ceil would silently demand
    one token too many, losing pairs at the boundary. Verification is
    exact set intersection with half-up Jaccard, same as every dedup
    gate.

    Shape: postings + df (one partial-agg pass), per-doc global-order
    rank (one window on the doc key), prefix self-join on the shingle
    hash (short posting lists by construction), then a candidate-
    bounded array verify. Three shuffles on 8-byte keys + the verify.
    """
    from fractions import Fraction

    fr = Fraction(str(threshold))
    p, q = fr.numerator, fr.denominator

    from pyspark.sql import Window

    prof = (
        eval_once(
            ensure_parallelism(docs.where(F.col(text_col).isNotNull())),
            sh_set=F.transform(
                shingle_array(F.col(text_col), n), lambda s: F.xxhash64(s)
            ),
        )
        .filter(F.size("sh_set") > 0)
        .select(
            F.col(id_col).alias("d"),
            "sh_set",
            F.size("sh_set").alias("n_sh"),
        )
        .cache()
    )
    postings = prof.select("d", "n_sh", F.explode("sh_set").alias("shingle_h"))
    df_tbl = postings.groupBy("shingle_h").agg(F.count(F.lit(1)).alias("df"))
    # global total order = (df asc, shingle_h asc); per-doc rank under it
    ranked = postings.join(df_tbl, "shingle_h").withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("d").orderBy("df", "shingle_h")
        ),
    )
    # prefix length |X| - ceil(t|X|) + 1 with EXACT integer ceil
    ceil_tn = F.expr(f"CAST(({p} * n_sh + {q} - 1) div {q} AS INT)")
    prefix = ranked.filter(F.col("rn") <= F.col("n_sh") - ceil_tn + 1).select(
        "shingle_h", "d", "n_sh"
    )
    cand = (
        prefix.select(
            "shingle_h", F.col("d").alias("doc_a"), F.col("n_sh").alias("n_a")
        )
        .join(
            prefix.select(
                "shingle_h", F.col("d").alias("doc_b"), F.col("n_sh").alias("n_b")
            ),
            "shingle_h",
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        # length filter: t * max <= min (exact integer cross-multiply)
        .filter(
            F.lit(p) * F.greatest("n_a", "n_b")
            <= F.lit(q) * F.least("n_a", "n_b")
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    verified = (
        cand.join(
            prof.select(F.col("d").alias("doc_a"), F.col("sh_set").alias("set_a")),
            "doc_a",
        )
        .join(
            prof.select(
                F.col("d").alias("doc_b"),
                F.col("sh_set").alias("set_b"),
                F.col("n_sh").alias("n_b"),
            ),
            "doc_b",
        )
        .withColumn("shared", F.size(F.array_intersect("set_a", "set_b")))
        .withColumn(
            "jaccard",
            ratio_half_up(
                F.col("shared"),
                F.size("set_a") + F.col("n_b") - F.col("shared"),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return verified
