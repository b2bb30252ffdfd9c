"""Persistent MinHash band index: batch-split ingest must reproduce the
one-shot recompute gate exactly, probes must be bucket-pruned, and the
index must survive (and stay consistent across) process-style reopens."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from iheardai_data_pipeline_spark.operators.dedup import incremental_minhash_dedup
from iheardai_data_pipeline_spark.operators.neardup_index import MinHashBandIndex


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BASE = " ".join(f"w{i}" for i in range(30))
UNIQ = " ".join(f"u{i}" for i in range(30))
OTHER = " ".join(f"v{i}" for i in range(30))


def test_indexed_ingest_matches_one_shot_recompute(spark, tmp_path):
    corpus = _docs(spark, [(100, BASE), (101, OTHER)])
    incoming_rows = [
        (1, BASE + " extra"),          # near-dup of corpus -> dropped
        (2, UNIQ),                     # unique -> kept
        (3, UNIQ + " tail"),           # near-dup of 2 (lower id, kept) -> dropped
        (4, "short"),                  # no shingles -> kept, not indexed
        (5, OTHER + " more"),          # near-dup of corpus -> dropped
        (6, UNIQ + " tail2"),          # near-dup of 2 AND of rejected 3 -> dropped
        (7, BASE.replace("w0", "q0") + " zz"),  # near BASE; exact-Jaccard decides
    ]
    incoming = _docs(spark, incoming_rows)
    want = {
        r["doc_id"]
        for r in incremental_minhash_dedup(incoming, corpus, threshold=0.7).collect()
    }

    idx = MinHashBandIndex(spark, str(tmp_path / "idx"), threshold=0.7)
    idx.append(corpus)
    got: set[int] = set()
    # id-ordered batches of 2: the arrival-order gate must equal one-shot
    for lo in range(1, 8, 2):
        batch = incoming.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 2)
        )
        got |= {r["doc_id"] for r in idx.ingest(batch).collect()}
    assert got == want

    # rejected docs are probe-able: 6 was dropped, but a later near-dup
    # of 6 must still drop (near-dup chains are not transitive)
    later = _docs(spark, [(8, UNIQ + " tail2 x")])
    assert idx.ingest(later).count() == 0


def test_indexed_ingest_survives_reopen(spark, tmp_path):
    path = str(tmp_path / "idx")
    idx = MinHashBandIndex(spark, path)
    idx.append(_docs(spark, [(100, BASE)]))
    # a different handle (fresh open, same path) sees the same corpus
    idx2 = MinHashBandIndex(spark, path)
    kept = idx2.ingest(_docs(spark, [(1, BASE + " extra"), (2, UNIQ)]))
    assert {r["doc_id"] for r in kept.collect()} == {2}
    # parameter mismatch is an error, not silent candidate loss
    with pytest.raises(ValueError, match="one banding"):
        MinHashBandIndex(spark, path, bands=8)


def test_probe_is_bucket_pruned(spark, tmp_path):
    """The probe must NOT read the whole band store: with enough buckets
    a tiny batch touches a strict subset of the stored bucket dirs."""
    path = str(tmp_path / "idx")
    idx = MinHashBandIndex(spark, path, n_buckets=64)
    corpus = _docs(
        spark,
        [(i, " ".join(f"c{i}_{j}" for j in range(30))) for i in range(40)],
    )
    idx.append(corpus)
    store = idx._store
    manifest = (store._manifest(store.current_version()) or {}).get("bands")
    assert manifest and len(manifest) > 16  # corpus spreads over many buckets

    probe = idx._band_rows(idx._profiles(_docs(spark, [(1000, UNIQ)])))
    pruned = store.read_keys("bands", probe.select("bkey"))
    # 16 band keys -> at most 16 of the stored buckets are readable
    touched = {p.split("__bucket=")[1].split("/")[0] for p in pruned.inputFiles()} if pruned is not None else set()
    assert len(touched) <= 16 < len(manifest)


def test_replayed_append_is_result_idempotent_and_compactable(spark, tmp_path):
    """A crash-replayed append duplicates store rows but must not change
    any gate answer; compact() then reclaims the duplicates."""
    idx = MinHashBandIndex(spark, str(tmp_path / "idx"))
    corpus = _docs(spark, [(100, BASE)])
    idx.append(corpus)
    idx.append(corpus)  # replay
    bands = idx._store.read("bands").select("bkey", "doc_id")
    n_rows, n_distinct = bands.count(), bands.distinct().count()
    assert n_rows == 2 * n_distinct  # duplicates present...
    kept = idx.ingest(_docs(spark, [(1, BASE + " extra"), (2, UNIQ)]))
    assert {r["doc_id"] for r in kept.collect()} == {2}  # ...answers unchanged
    idx.compact()
    b2 = idx._store.read("bands").select("bkey", "doc_id")
    assert b2.count() > 0
    assert b2.count() == b2.distinct().count()  # duplicates gone


def test_append_with_epoch_skips_true_replay(spark, tmp_path):
    """An epoch-tagged append replay is a store-level NO-OP (no
    duplicate rows at all), the exactly-once upgrade over the
    result-idempotent untagged path."""
    idx = MinHashBandIndex(spark, str(tmp_path / "idx"))
    corpus = _docs(spark, [(100, BASE)])
    idx.append(corpus, epoch=0)
    idx.append(corpus, epoch=0)  # replay: skipped at the commit log
    bands = idx._store.read("bands").select("bkey", "doc_id")
    assert bands.count() == bands.distinct().count()


def test_replayed_ingest_returns_same_survivors(spark, tmp_path):
    """The at-least-once window: a batch whose bands were APPENDED but
    whose output was never checkpointed gets re-ingested. Without the
    index-probe replay guard every replayed doc would self-match at
    Jaccard 1.0 and the whole batch would silently drop; with it the
    replay returns the first run's exact survivor set."""
    idx = MinHashBandIndex(spark, str(tmp_path / "idx"), threshold=0.7)
    idx.append(_docs(spark, [(100, BASE), (101, OTHER)]))
    batch = _docs(
        spark,
        [
            (1, BASE + " extra"),   # near-dup of corpus -> dropped
            (2, UNIQ),              # unique -> kept
            (3, UNIQ + " tail"),    # near-dup of lower-id peer 2 -> dropped
        ],
    )
    first = {r["doc_id"] for r in idx.ingest(batch).collect()}
    assert first == {2}
    # replay: the batch's own bands are already in the store
    replay = {r["doc_id"] for r in idx.ingest(batch).collect()}
    assert replay == first
    # and the index still gates LATER docs against the batch normally
    later = idx.ingest(_docs(spark, [(9, UNIQ + " x")]))
    assert later.count() == 0


def test_buckets_for_corpus_sizing_rule():
    from iheardai_data_pipeline_spark.operators.neardup_index import (
        buckets_for_corpus,
    )

    assert buckets_for_corpus(5_000) == 16            # rig scale: floor
    assert buckets_for_corpus(1_000_000) == 64        # 16M rows / 250k
    assert buckets_for_corpus(100_000_000) == 8192    # 1.6B rows
    assert buckets_for_corpus(1_000_000_000) == 65536 # clamp top
    with pytest.raises(ValueError):
        buckets_for_corpus(0)
    # rows-per-bucket stays bounded near the target across the range
    for docs in (10**6, 10**8, 10**9):
        n = buckets_for_corpus(docs)
        assert docs * 16 / n <= 2 * 250_000 or n == 65536


def test_probe_pruning_holds_at_second_bucket_count(spark, tmp_path):
    """The sizing rule changes n_buckets with corpus size; pruning must
    hold at other layouts too, not just the rig default (n_buckets is a
    layout constant — this pins 256)."""
    idx = MinHashBandIndex(
        spark, str(tmp_path / "idx"), n_buckets=256
    )
    corpus = _docs(
        spark,
        [(i, " ".join(f"c{i}_{j}" for j in range(30))) for i in range(60)],
    )
    idx.append(corpus)
    store = idx._store
    manifest = (store._manifest(store.current_version()) or {}).get("bands")
    assert manifest and len(manifest) > 16
    probe = idx._band_rows(idx._profiles(_docs(spark, [(1000, UNIQ)])))
    pruned = store.read_keys("bands", probe.select("bkey"))
    touched = (
        {p.split("__bucket=")[1].split("/")[0] for p in pruned.inputFiles()}
        if pruned is not None
        else set()
    )
    # 16 band keys -> at most 16 of the 256 stored buckets are readable
    assert len(touched) <= 16 < len(manifest)


# --- tombstone / upsert contract (round 7) ------------------------------------------


@pytest.mark.parametrize("n_buckets", [64, 256])
def test_delete_makes_doc_stop_matching(spark, tmp_path, n_buckets):
    """A retracted doc must stop gating probes at BOTH layouts: scan-all
    (64, plain read) and pruned (256, read_keys point lookups)."""
    path = str(tmp_path / f"del{n_buckets}")
    idx = MinHashBandIndex(spark, path, threshold=0.7, n_buckets=n_buckets)
    idx.append(_docs(spark, [(100, BASE), (101, OTHER)]), seq=1)
    idx.delete(_docs(spark, [(100, "")]).select("doc_id"), seq=2)
    # near-dup of the DELETED doc survives; near-dup of the live one dies
    kept = idx.ingest(
        _docs(spark, [(1, BASE + " extra"), (2, OTHER + " more")]), seq=3
    )
    assert {r["doc_id"] for r in kept.collect()} == {1}


def test_delete_then_reingest_is_upsert(spark, tmp_path):
    """Re-ingesting a deleted id with a HIGHER seq makes the NEW text
    live (LWW): probes match the new version, never the old."""
    path = str(tmp_path / "ups")
    idx = MinHashBandIndex(spark, path, threshold=0.7)
    idx.append(_docs(spark, [(100, BASE)]), seq=1)
    idx.delete(spark.createDataFrame([(100,)], "doc_id long"), seq=2)
    # old text no longer matches...
    assert idx.ingest(_docs(spark, [(1, BASE + " pad")]), seq=3).count() == 1
    # ...re-ingest 100 with NEW text (survives: nothing matches UNIQ)
    assert idx.ingest(_docs(spark, [(100, UNIQ)]), seq=4).count() == 1
    # the new version gates; the old one stays dead
    kept = idx.ingest(
        _docs(spark, [(5, UNIQ + " tail"), (6, OTHER)]), seq=5
    )
    assert {r["doc_id"] for r in kept.collect()} == {6}


@pytest.mark.parametrize("n_buckets", [64, 256])
def test_delete_is_epoch_idempotent_and_compact_reclaims(spark, tmp_path, n_buckets):
    path = str(tmp_path / f"didem{n_buckets}")
    idx = MinHashBandIndex(spark, path, threshold=0.7, n_buckets=n_buckets)
    idx.append(_docs(spark, [(100, BASE), (101, OTHER)]), seq=1)
    ids = spark.createDataFrame([(100,)], "doc_id long")
    idx.delete(ids, seq=2, epoch="d1")
    idx.delete(ids, seq=2, epoch="d1")  # replay: one tombstone row
    prof = idx._store.read("profiles")
    assert prof.filter(~F.col("live")).count() == 1
    # replayed ingest: same survivors, rows not duplicated
    batch = _docs(spark, [(1, BASE + " extra"), (2, OTHER + " more")])
    k1 = {r["doc_id"] for r in idx.ingest(batch, epoch="e1", seq=3).collect()}
    k2 = {r["doc_id"] for r in idx.ingest(batch, epoch="e1", seq=3).collect()}
    assert k1 == k2 == {1}
    # compact: tombstone + superseded rows physically gone, bands rebuilt
    idx.compact()
    prof = idx._store.read("profiles")
    assert prof.filter(~F.col("live")).count() == 0
    assert prof.filter(F.col("doc_id") == 100).count() == 0
    bands = idx._store.read("bands")
    assert bands.filter(F.col("doc_id") == 100).count() == 0
    # post-compact probes still gate exactly (101 live, 100 gone)
    kept = idx.ingest(
        _docs(spark, [(7, BASE + " zz"), (8, OTHER + " q")]), seq=4
    )
    # 7 matches doc 1 (BASE-like, live in index); 8 matches 101
    assert kept.count() == 0
    kept = idx.ingest(_docs(spark, [(9, " ".join(f"z{i}" for i in range(30)))]), seq=5)
    assert kept.count() == 1


def test_pre_versioned_layout_refuses_to_open(spark, tmp_path):
    """An index persisted under the r6 3-column layout (meta without a
    format field) must refuse to open — reading mixed profile schemas
    would silently drop the pre-upgrade corpus from the gate."""
    import json

    path = str(tmp_path / "old_idx")
    os.makedirs(path)
    with open(os.path.join(path, "_lsh_meta.json"), "w") as fh:
        json.dump({"n": 5, "k": 64, "bands": 16, "threshold": 0.7}, fh)
    with pytest.raises(ValueError, match="on-disk format"):
        MinHashBandIndex(spark, path)


def test_format_version_round_trips(spark, tmp_path):
    """A freshly created index persists the format version and reopens
    cleanly with matching parameters."""
    path = str(tmp_path / "new_idx")
    MinHashBandIndex(spark, path)
    MinHashBandIndex(spark, path)  # reopen: no raise
    with pytest.raises(ValueError, match="one banding per index"):
        MinHashBandIndex(spark, path, bands=8)


def test_merge_gates_like_union_index(spark, tmp_path):
    """Two band-index shards on disjoint corpus halves, merged, must
    gate incoming docs exactly like one index built on the union — and
    a shard's tombstone keeps killing after the merge."""
    corpus_rows = [(100, BASE), (101, OTHER)]
    a = MinHashBandIndex(spark, str(tmp_path / "m_a"), threshold=0.7)
    a.append(_docs(spark, [corpus_rows[0]]))
    b = MinHashBandIndex(spark, str(tmp_path / "m_b"), threshold=0.7)
    b.append(_docs(spark, [corpus_rows[1]]))
    # shard B also deletes a doc it indexed (tombstone must propagate)
    b.append(_docs(spark, [(200, UNIQ)]))
    b.delete(_docs(spark, [(200, "")]).select("doc_id"), seq=5)
    a.merge(b, epoch="m1")
    a.merge(b, epoch="m1")  # replayed merge must no-op
    assert a._has_tombstones
    union = MinHashBandIndex(spark, str(tmp_path / "m_u"), threshold=0.7)
    union.append(_docs(spark, corpus_rows))
    incoming = _docs(
        spark,
        [
            (1, BASE + " extra"),   # near-dup of shard A's corpus
            (2, OTHER + " more"),   # near-dup of shard B's corpus
            (3, UNIQ + " tail"),    # near-dup of B's DELETED doc -> kept
            (4, " ".join(f"q{i}" for i in range(30))),  # fresh
        ],
    )
    got = {r["doc_id"] for r in a.ingest(incoming).collect()}
    want = {r["doc_id"] for r in union.ingest(incoming).collect()}
    assert got == want == {3, 4}
    # banding-parameter mismatch refuses
    c = MinHashBandIndex(spark, str(tmp_path / "m_c"), bands=8)
    with pytest.raises(ValueError, match="parameter set"):
        a.merge(c)
