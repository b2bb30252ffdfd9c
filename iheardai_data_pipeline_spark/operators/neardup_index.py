"""Persistent MinHash-LSH band index: incremental near-dup ingest
without re-banding the corpus.

:func:`~iheardai_data_pipeline_spark.operators.dedup.incremental_minhash_dedup`
re-shingles and re-bands the ENTIRE corpus on every call — correct, but
at 100 TB the corpus side dwarfs every batch and its banding never
changes. This module persists the banding once: band keys and shingle
profiles live in two :class:`BucketedTransactionalStore`\\ s, a batch
PROBES them (bucket-pruned point lookups + candidate-bounded joins — no
work proportional to corpus size), and then appends its own bands, so
ingest cost is a function of batch size and candidate count only.

Semantics (arrival-order gate, same convention as the recompute path
and the t12 stream): an incoming doc is DROPPED when it has an
exact-Jaccard-verified near-dup (>= ``threshold``)

- already in the index (anything previously appended or ingested,
  whether or not it survived its own gate — near-dup is not
  transitive, so rejected docs must stay probe-able or chains split
  across batches would resolve differently than one batch), or
- among LOWER-id docs of its own batch.

Feeding id-ordered batches therefore reproduces the one-shot
``incremental_minhash_dedup(all_incoming, corpus)`` answer exactly
(same shingle, signature, band-key, and half-up Jaccard arithmetic).

Scale posture: the band store buckets on the 8-byte band key, so a
probe reads only the buckets its keys hash to (``read_keys``); the
profile store is touched only for verified CANDIDATES. Both stores
append via OCC partial rewrites (only touched buckets rewritten).
``n_buckets`` is a layout constant — size it so one bucket's band rows
fit an executor (e.g. thousands at corpus scale; the rig default 16).

Reference parity: the reference has no persistent near-dup index; this
is part of the training-data extension set (SURVEY §2 extensions), the
production variant its own docs promised for the r4 incremental gate.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iheardai_data_pipeline_spark.functions.exact import ratio_half_up
from iheardai_data_pipeline_spark.operators.dedup import (
    _minhash_from_set,
    shingle_array,
)
from iheardai_data_pipeline_spark.sources.batch import ensure_parallelism, eval_once
from iheardai_data_pipeline_spark.streaming.stores import BucketedTransactionalStore


def _append_rows():
    """Key-local store fold: plain append, NO dedup shuffle. Duplicate
    rows (a replayed batch re-appending its bands/profiles) are
    CORRECTNESS-HARMLESS here: ingest() distincts candidate pairs and
    drop targets, so results are identical with or without them — the
    query answers stay replay-idempotent while each commit saves a
    full shuffle. Storage hygiene after crash-replays is a compaction
    concern (rewrite a bucket with dropDuplicates), not a hot-path one.
    """

    def fn(current: DataFrame | None, upd: DataFrame) -> DataFrame:
        if current is None:
            return upd
        return current.unionByName(upd)

    return fn


class MinHashBandIndex:
    """Persistent LSH band + profile index over a growing corpus.

    ``append(docs)`` indexes documents unconditionally (corpus
    bootstrap); ``ingest(batch)`` gates a batch against everything
    indexed so far (and its own lower-id peers), appends ALL batch docs
    to the index, and returns the surviving rows.

    The LSH parameters are part of the on-disk layout (mixing two
    bandings in one index silently loses candidates), so the creator
    pins them in ``_lsh_meta.json`` and later opens must match or pass
    defaults-by-inheritance.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        n: int = 5,
        k: int = 64,
        bands: int = 16,
        threshold: float = 0.7,
        n_buckets: int = 16,
    ) -> None:
        if k % bands != 0:
            raise ValueError(f"k={k} must divide into bands={bands}")
        self.spark = spark
        self.path = path
        self.id_col = id_col
        self.text_col = text_col
        os.makedirs(path, exist_ok=True)
        meta = {"n": n, "k": k, "bands": bands, "threshold": threshold}
        meta_path = os.path.join(path, "_lsh_meta.json")
        if os.path.exists(meta_path):
            with open(meta_path) as fh:
                persisted = json.load(fh)
            if persisted != meta:
                raise ValueError(
                    f"index at {path} was created with {persisted}; got {meta} "
                    "— one banding per index"
                )
        else:
            tmp = meta_path + f".tmp-{uuid.uuid4().hex}"
            with open(tmp, "w") as fh:
                json.dump(meta, fh)
            try:
                os.link(tmp, meta_path)  # exclusive: first creator wins
            except FileExistsError:
                with open(meta_path) as fh:
                    if json.load(fh) != meta:
                        raise
            finally:
                os.unlink(tmp)
        self.n, self.k, self.bands, self.threshold = n, k, bands, threshold
        self._band_store = BucketedTransactionalStore(
            spark,
            os.path.join(path, "bands"),
            key_cols=["bkey"],
            order_cols=[id_col],
            n_buckets=n_buckets,
        )
        self._profile_store = BucketedTransactionalStore(
            spark,
            os.path.join(path, "profiles"),
            key_cols=[id_col],
            order_cols=[id_col],
            n_buckets=n_buckets,
        )

    # -- row-local derivations (no shuffle) -----------------------------------

    def _profiles(self, docs: DataFrame) -> DataFrame:
        """(id, sh_set, n_sh, sig) — one narrow projection; docs shorter
        than the shingle width have no set and can neither match nor be
        matched, so they pass every gate and stay out of the index
        (identical to the recompute path's size>0 filter)."""
        return (
            eval_once(
                ensure_parallelism(docs),
                sh_set=F.transform(
                    shingle_array(F.col(self.text_col), self.n),
                    lambda s: F.xxhash64(s),
                ),
            )
            .filter(F.size("sh_set") > 0)
            .select(
                F.col(self.id_col),
                "sh_set",
                F.size("sh_set").alias("n_sh"),
                _minhash_from_set(F.col("sh_set"), self.k).alias("sig"),
            )
        )

    def _band_rows(self, profiles: DataFrame) -> DataFrame:
        """(bkey, id): one 8-byte key per (band, band-signature) — the
        same r-slice banding as minhash_lsh_pairs, collapsed to a single
        long so the store buckets on it (a cross-band xxhash64 collision
        only adds a candidate pair, which exact verification discards)."""
        r = self.k // self.bands
        bkeys = F.transform(
            F.sequence(F.lit(0), F.lit(self.bands - 1)),
            lambda b: F.xxhash64(b, F.xxhash64(F.slice(F.col("sig"), b * r + 1, r))),
        )
        return profiles.select(
            F.col(self.id_col), F.explode(bkeys).alias("bkey")
        ).select("bkey", self.id_col)

    def _verified_pairs(
        self, cand: DataFrame, left_prof: DataFrame, right_prof: DataFrame
    ) -> DataFrame:
        """Exact-Jaccard filter of candidate (id_a, id_b) pairs — the
        same half-up arithmetic as the recompute path, so the gate is
        bit-identical to incremental_minhash_dedup."""
        ic = self.id_col
        return (
            cand.join(
                left_prof.select(
                    F.col(ic).alias("id_a"),
                    F.col("sh_set").alias("set_a"),
                    F.col("n_sh").alias("n_a"),
                ),
                "id_a",
            )
            .join(
                right_prof.select(
                    F.col(ic).alias("id_b"),
                    F.col("sh_set").alias("set_b"),
                    F.col("n_sh").alias("n_b"),
                ),
                "id_b",
            )
            .withColumn("shared", F.size(F.array_intersect("set_a", "set_b")))
            .withColumn(
                "jaccard",
                ratio_half_up(
                    F.col("shared"),
                    F.col("n_a") + F.col("n_b") - F.col("shared"),
                    4,
                ),
            )
            .filter(F.col("jaccard") >= self.threshold)
            .select("id_a", "id_b", "jaccard")
        )

    # -- public API -----------------------------------------------------------

    def append(self, docs: DataFrame) -> None:
        """Index documents unconditionally (corpus bootstrap / trusted
        sources). Two OCC appends; profiles computed once."""
        prof = self._profiles(docs).cache()
        try:
            self._band_store.apply_keyed(self._band_rows(prof), _append_rows())
            # plain append, not LWW merge: a doc's profile is a pure
            # function of its text, so re-appends are identical rows and
            # both the ordering window and the dedup would be wasted
            # shuffles per batch (see _append_rows)
            self._profile_store.apply_keyed(
                prof.select(self.id_col, "sh_set", "n_sh"), _append_rows()
            )
        finally:
            prof.unpersist()

    def ingest(self, batch: DataFrame) -> DataFrame:
        """Gate ``batch`` against the index + lower-id batch peers,
        append ALL batch docs (kept and rejected — see module doc),
        return the surviving rows with every original column.

        Cost anatomy: probe = one bucket-pruned read of the band store
        (only buckets the batch's band keys hash to) + one equi-join on
        the 8-byte key; verification = profile fetches for CANDIDATE
        ids only; intra-batch = a batch-local band self-join. Nothing
        scales with corpus size.

        The returned frame reads pinned store snapshots — materialize
        it before ``vacuum()`` drops old versions.
        """
        ic = self.id_col
        prof = self._profiles(batch).cache()
        bands_inc = self._band_rows(prof).cache()
        try:
            dropped = None
            stored = self._band_store.read_keys(bands_inc.select("bkey"))
            if stored is not None:
                # REPLAY GUARD: a crash-replayed batch (appended to the
                # store but not stream-checkpointed — the at-least-once
                # window foreachBatch allows) finds its OWN bands already
                # stored; without this anti-join every replayed doc
                # self-matches at Jaccard 1.0 and the whole batch is
                # silently dropped. Excluding stored rows whose id is in
                # the current batch (broadcast — batch-sized) restores
                # the first run's exact candidate set, so replayed
                # ingest() returns the same survivors (intra-batch
                # ordering is re-derived below, as on the first run).
                cand = (
                    bands_inc.withColumnRenamed(ic, "id_a")
                    .join(stored.withColumnRenamed(ic, "id_b"), "bkey")
                    .join(
                        F.broadcast(prof.select(F.col(ic).alias("id_b"))),
                        "id_b",
                        "left_anti",
                    )
                    .select("id_a", "id_b")
                    .distinct()
                )
                idx_prof = self._profile_store.read_keys(
                    cand.select(F.col("id_b").alias(ic))
                )
                if idx_prof is not None:
                    dropped = (
                        self._verified_pairs(cand, prof, idx_prof)
                        .select(F.col("id_a").alias(ic))
                        .distinct()
                    )
            # intra-batch: later id drops when a lower-id peer matches,
            # regardless of that peer's own fate (one-shot convention)
            intra_cand = (
                bands_inc.withColumnRenamed(ic, "id_a")
                .join(bands_inc.withColumnRenamed(ic, "id_b"), "bkey")
                .filter(F.col("id_a") > F.col("id_b"))
                .select("id_a", "id_b")
                .distinct()
            )
            intra_dropped = (
                self._verified_pairs(intra_cand, prof, prof)
                .select(F.col("id_a").alias(ic))
                .distinct()
            )
            dropped = (
                intra_dropped
                if dropped is None
                else dropped.unionByName(intra_dropped).distinct()
            )
            survivors = batch.join(dropped, ic, "left_anti")
            # left_anti re-executes per action; pin the (batch-sized)
            # result so the appends below can't race its store reads
            survivors = survivors.localCheckpoint(eager=True)
            self._band_store.apply_keyed(bands_inc, _append_rows())
            self._profile_store.apply_keyed(
                prof.select(ic, "sh_set", "n_sh"), _append_rows()
            )
            return survivors
        finally:
            bands_inc.unpersist()
            prof.unpersist()

    def compact(self) -> None:
        """Storage hygiene: rewrite both stores with duplicates dropped
        (rows a crash-replayed batch re-appended — results never depend
        on them, see _append_rows; this reclaims the space). One full
        snapshot rewrite per store — run it on the maintenance cadence,
        not the ingest path."""
        bands = self._band_store.read()
        if bands is not None:
            self._band_store.write_snapshot(
                bands.dropDuplicates(["bkey", self.id_col])
            )
        profs = self._profile_store.read()
        if profs is not None:
            self._profile_store.write_snapshot(
                profs.dropDuplicates([self.id_col])
            )

    def vacuum(self, keep: int = 2, grace_seconds: float = 3600.0) -> None:
        self._band_store.vacuum(keep, grace_seconds)
        self._profile_store.vacuum(keep, grace_seconds)
