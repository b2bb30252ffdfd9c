"""Persistent IVF-PQ serving index: the READ half of the ANN story.

`ivfpq_search` (operators/pq.py) composes the production ANN read path
— IVF list pruning, ADC over PQ codes, exact shortlist re-rank — but
runs it against an in-memory DataFrame, re-assigning and re-encoding
the corpus on every query. At 100 TB the corpus IS the index: vectors
and their PQ codes live cluster-keyed on disk, written once at ingest,
and a query touches only its probed clusters' buckets.

This module persists both relations under ONE
:class:`~iheardai_data_pipeline_spark.streaming.stores.MultiRelationTransactionalStore`
commit log (the same machinery as the dedup indexes in
``neardup_index.py`` / ``semantic_index.py``):

- ``codes``   (centroid_id-keyed): (id, codes array<int>, centroid_id)
  — the ADC scan side, ~32x smaller than the vectors it summarizes.
- ``vectors`` (centroid_id-keyed): (id, normalized vector, centroid_id)
  — the exact re-rank side, read only for the shortlist.

The IVF centroids and PQ codebooks are PINNED index artifacts (the
shipped-model pattern of plans/ann_artifact.py), stored in the index's
meta JSON at bootstrap: serving must score against exactly what the
index was built with, and re-centering would silently re-assign stored
rows (rebuild instead). Vectors are L2-normalized at append time — the
ivfpq_search metric discipline (on unit vectors L2 order == cosine
order; raw vectors measured 0.1-0.3 recall vs 0.8-1.0 normalized).

Query anatomy (:meth:`topk`), at any corpus size:

1. rank the pinned centroids driver-side (bounded — an index-build
   constant, never a Spark job),
2. read ONLY the ``nprobe`` probed clusters' code buckets
   (``read_keys`` bucket pruning — the 100 TB layout; rig-small
   layouts scan-all per the shared ``_prune_probes`` rule),
3. ADC-rank those codes against the query's m x k lookup table
   (``pq_adc_topk`` — the identical fold the in-memory path runs),
4. fetch the shortlist's vectors from the SAME probed buckets and
   exact-re-rank.

Given the same artifacts and parameters, the result is row-identical
to ``ivfpq_search`` — pinned by test and by the x_sim_index_topk
catalog gate (persistent recall >= in-memory recall vs the exact
brute-force top-k).

Reference parity: training-data extension set (SURVEY §2 extensions);
the serving counterpart of the reference's signature upsert/lookup
stores (etl/load/enhanced_kpi_consumer.py:395-434 keeps state keyed
for point reads; here the key is the IVF list).
"""

from __future__ import annotations

import json
import math
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iheardai_data_pipeline_spark.operators.pq import (
    normalize_rows,
    pq_adc_topk,
    pq_encode,
)
from iheardai_data_pipeline_spark.operators.similarity import (
    _assign_to_centroids,
)
from iheardai_data_pipeline_spark.streaming.stores import (
    MultiRelationTransactionalStore,
)


class PersistentAnnIndex:
    """Cluster-keyed persistent IVF-PQ index with an O(batch) append
    path and a bucket-pruned ``topk`` serving path.

    Create with :meth:`bootstrap` (pins artifacts + indexes the
    corpus); reopen by constructing with the same path.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        n_buckets: int | None = None,
    ) -> None:
        self.spark = spark
        self.path = path
        self.id_col = id_col
        self.vec_col = vec_col
        meta_path = os.path.join(path, "_ann_meta.json")
        if not os.path.exists(meta_path):
            raise ValueError(
                f"no ANN index at {path} — build one with bootstrap()"
            )
        with open(meta_path) as fh:
            meta = json.load(fh)
        self.centroids: list[list[float]] = meta["centroids"]
        self.books: list[list[list[float]]] = meta["books"]
        self._store = MultiRelationTransactionalStore(
            spark,
            os.path.join(path, "state"),
            relations={"codes": ["centroid_id"], "vectors": ["centroid_id"]},
            n_buckets=n_buckets,
        )
        # prune-vs-scan rule — see MinHashBandIndex._prune_probes
        self._prune_probes = self._store.n_buckets > 64

    @classmethod
    def bootstrap(
        cls,
        spark: SparkSession,
        path: str,
        corpus: DataFrame,
        centroids: list[list[float]],
        books,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        n_buckets: int | None = None,
    ) -> "PersistentAnnIndex":
        """Pin the trained artifacts (IVF centroid vectors + PQ
        codebooks, both over NORMALIZED vectors — train them with
        tools/regen_ann_artifacts.py's recipe or inject the shipped
        plans/ann_artifact.py constants) and index the corpus."""
        os.makedirs(path, exist_ok=True)
        meta = {
            "centroids": [[float(x) for x in v] for v in centroids],
            "books": [
                [[float(x) for x in c] for c in book] for book in books
            ],
        }
        meta_path = os.path.join(path, "_ann_meta.json")
        tmp = meta_path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump(meta, fh)
        try:
            os.link(tmp, meta_path)  # exclusive: first creator wins
        except FileExistsError:
            pass
        finally:
            os.unlink(tmp)
        idx = cls(spark, path, id_col, vec_col, n_buckets=n_buckets)
        idx.append(corpus)
        return idx

    # -- internals ------------------------------------------------------------

    def _assigned(self, batch: DataFrame) -> DataFrame:
        """(id, NORMALIZED vec, centroid_id) under the pinned centroids
        — two narrow projections, no shuffle."""
        vecs = normalize_rows(batch, self.id_col, self.vec_col)
        return _assign_to_centroids(
            vecs, list(enumerate(self.centroids)), self.id_col, self.vec_col
        ).select(self.id_col, self.vec_col, "centroid_id")

    def _probe_ids(self, query_vec: list[float], nprobe: int) -> list[int]:
        """Driver-side centroid ranking — identical tie-break to
        ivfpq_search ((-cosine, index) ascending)."""
        qn = math.sqrt(sum(float(x) * float(x) for x in query_vec))

        def qsim(vec):
            d = sum(float(a) * b for a, b in zip(query_vec, vec))
            return d / (qn * math.sqrt(sum(x * x for x in vec)))

        ranked = sorted(
            ((qsim(vec), i) for i, vec in enumerate(self.centroids)),
            key=lambda t: (-t[0], t[1]),
        )
        return [i for _, i in ranked[:nprobe]]

    def _read_probed(self, rel: str, probe_ids: list[int]) -> DataFrame | None:
        """Rows of ``rel`` in the probed clusters. Pruned layouts read
        only the touched buckets (the key frame is nprobe literal rows
        — the touched-bucket collect is a constant-size local job);
        scan-all layouts read every dir and let the filter prune."""
        if self._prune_probes:
            keys = self.spark.createDataFrame(
                [(int(i),) for i in probe_ids], "centroid_id int"
            )
            return self._store.read_keys(rel, keys)
        rows = self._store.read(rel)
        if rows is None:
            return None
        return rows.filter(F.col("centroid_id").isin(probe_ids))

    # -- public API -------------------------------------------------------------

    def append(self, batch: DataFrame, epoch=None) -> None:
        """Index a batch: normalize, assign to the pinned lists, PQ-
        encode — three narrow projections — then ONE atomic O(batch)
        add-files commit of both relations (codes never visible without
        their vectors). ``epoch`` makes replays idempotent."""
        assigned = self._assigned(batch).localCheckpoint(eager=True)
        try:
            codes = pq_encode(
                assigned,
                self.books,
                id_col=self.id_col,
                vec_col=self.vec_col,
                extra_cols=("centroid_id",),
            )
            self._store.append_keyed(
                {"codes": codes, "vectors": assigned}, epoch=epoch
            )
        finally:
            assigned.unpersist()

    def topk(
        self,
        query_vec: list[float],
        k: int = 10,
        nprobe: int = 4,
        shortlist: int = 100,
        exclude_id: int | None = None,
    ) -> DataFrame:
        """Approximate top-k serve: probe ``nprobe`` lists, ADC-rank
        their stored codes, exact-re-rank the ``shortlist``. Returns
        (id, l2_dist) ascending over the normalized vectors — the
        ivfpq_search output contract, row-identical given the same
        artifacts."""
        qn0 = math.sqrt(sum(float(x) * float(x) for x in query_vec)) or 1.0
        qv = [float(x) / qn0 for x in query_vec]
        probe_ids = self._probe_ids(qv, nprobe)
        codes = self._read_probed("codes", probe_ids)
        if codes is None:
            raise ValueError(f"ANN index at {self.path} holds no vectors")
        short = pq_adc_topk(
            codes,
            self.books,
            qv,
            k=shortlist,
            id_col=self.id_col,
            exclude_id=exclude_id,
        ).select(self.id_col)
        vecs = self._read_probed("vectors", probe_ids)
        qcol = F.array(*[F.lit(float(v)) for v in qv])
        l2 = F.aggregate(
            F.zip_with(
                F.col(self.vec_col),
                qcol,
                lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        return (
            vecs.join(short, self.id_col, "left_semi")
            .select(F.col(self.id_col), l2.alias("l2_dist"))
            .orderBy("l2_dist", self.id_col)
            .limit(k)
            .select(self.id_col, F.round("l2_dist", 6).alias("l2_dist"))
        )

    def compact(self) -> None:
        """Fold append-dir lists + drop replayed duplicate rows."""
        ic = self.id_col

        def fold(rel: str, current: DataFrame, upd) -> DataFrame:
            return current.dropDuplicates([ic])

        self._store.apply_keyed_all_buckets(fold)

    def vacuum(self, keep: int = 2, grace_seconds: float = 3600.0) -> None:
        self._store.vacuum(keep, grace_seconds)
