"""PersistentAnnIndex: row-identity with the in-memory ivfpq_search,
incremental append serving, bucket-pruned probes, and replay safety.
The corpus-scale recall gate runs in test_catalog_oracle
(x_sim_index_topk at sf0.01)."""

from __future__ import annotations

from pyspark.sql import functions as F

from iheardai_data_pipeline_spark.operators import pq
from iheardai_data_pipeline_spark.operators.ann_index import PersistentAnnIndex
from iheardai_data_pipeline_spark.operators.similarity import _collect_centroids

DIMS = 8


def _vecs(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


def _unit(d, scale=1.0):
    v = [0.0] * DIMS
    v[d] = scale
    return v


def _corpus(spark):
    # 4 orthogonal directions, 10 jittered members each
    rows = [
        (100 * d + j, [x * (1.0 - 0.01 * j) + (0.001 * j if i == (d + 1) % DIMS else 0.0)
                       for i, x in enumerate(_unit(d))])
        for d in range(4)
        for j in range(10)
    ]
    return _vecs(spark, rows)


def _artifacts(spark, corpus, n_centroids=4):
    norm = pq.normalize_rows(corpus)
    cents = [
        v for _, v in _collect_centroids(norm, n_centroids, "vec_id", "embedding", "first")
    ]
    books = pq.pq_train(norm, m=2, k=4, iters=1, allow_fewer=True)
    return cents, books


def test_topk_matches_inmemory_exactly(spark, tmp_path):
    corpus = _corpus(spark)
    cents, books = _artifacts(spark, corpus)
    idx = PersistentAnnIndex.bootstrap(
        spark, str(tmp_path / "ann"), corpus, centroids=cents, books=books
    )
    q = _unit(2)
    got = idx.topk(q, k=5, nprobe=2, shortlist=20, exclude_id=200).collect()
    ref = pq.ivfpq_search(
        corpus, q, k=5, n_centroids=4, nprobe=2, shortlist=20,
        exclude_id=200, centroids=cents, books=books,
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in ref]


def test_append_then_topk_sees_new_vectors(spark, tmp_path):
    corpus = _corpus(spark)
    cents, books = _artifacts(spark, corpus)
    idx = PersistentAnnIndex.bootstrap(
        spark, str(tmp_path / "ann2"), corpus, centroids=cents, books=books
    )
    # off-axis query: no corpus member sits exactly on it
    q = [0.0, 1.0, 0.3, 0.0, 0.0, 0.0, 0.0, 0.0]
    # shortlist must out-size the coarse 2x4 PQ code ties (ties cut
    # by id, and 9999 is the largest id) so the EXACT re-rank decides
    before = idx.topk(q, k=1, nprobe=1, shortlist=20).collect()
    assert before[0]["vec_id"] != 9999
    # a new vector exactly on the query direction serves immediately
    idx.append(_vecs(spark, [(9999, q)]))
    after = idx.topk(q, k=1, nprobe=1, shortlist=20).collect()
    assert after[0]["vec_id"] == 9999
    # reopen: artifacts and state persist
    idx2 = PersistentAnnIndex(spark, str(tmp_path / "ann2"))
    assert idx2.centroids == idx.centroids
    assert idx2.topk(q, k=1, nprobe=1, shortlist=20).collect()[0]["vec_id"] == 9999


def test_topk_reads_only_probed_buckets(spark, tmp_path):
    corpus = _corpus(spark)
    cents, books = _artifacts(spark, corpus)
    idx = PersistentAnnIndex.bootstrap(
        spark, str(tmp_path / "ann3"), corpus,
        centroids=cents, books=books, n_buckets=256,
    )
    assert idx._prune_probes
    probe_ids = idx._probe_ids([float(x) for x in _unit(3)], 1)
    for rel in ("codes", "vectors"):
        rows = idx._read_probed(rel, probe_ids)
        buckets = {
            f.split("__bucket=")[1].split("/")[0] for f in rows.inputFiles()
        }
        manifest = (
            idx._store._manifest(idx._store.current_version()) or {}
        ).get(rel)
        # one probed cluster -> at most one of the 4 populated buckets
        assert len(buckets) == 1 < len(manifest)
    # and the pruned serve is still correct end-to-end
    got = idx.topk(_unit(3), k=3, nprobe=1, shortlist=10).collect()
    assert all(300 <= r["vec_id"] < 400 for r in got)


def test_append_epoch_idempotent_and_compact(spark, tmp_path):
    corpus = _corpus(spark)
    cents, books = _artifacts(spark, corpus)
    idx = PersistentAnnIndex.bootstrap(
        spark, str(tmp_path / "ann4"), corpus, centroids=cents, books=books
    )
    batch = _vecs(spark, [(5000, _unit(0, 0.5))])
    idx.append(batch, epoch="e1")
    idx.append(batch, epoch="e1")  # replay: no duplicate rows
    n = idx._store.read("codes").filter(F.col("vec_id") == 5000).count()
    assert n == 1
    # un-epoched replay duplicates physically; compact() reclaims
    idx.append(batch)
    assert idx._store.read("codes").filter(F.col("vec_id") == 5000).count() == 2
    idx.compact()
    assert idx._store.read("codes").filter(F.col("vec_id") == 5000).count() == 1
    assert idx._store.read("vectors").filter(F.col("vec_id") == 5000).count() == 1
