"""Per-phase wall-time split for the persistent-index catalog entries
(round 10 — VERDICT r9 #2).

The bench records ONE wall number per entry, but the index entries'
timed workflows are bootstrap-dominated: `x_sim_index_update` spends
most of its wall building TWO indexes and only a fraction actually
serving. Across rounds that made the entry's raw tail drift (8.6s ->
14.9s with no code change) ambiguous — a real serving regression could
hide inside bootstrap noise, and exonerating the drift took an
interleaved-control side analysis. This tool splits each entry's
workflow into its phases with explicit barriers (every phase ends in
an action) and regenerates ``docs/PHASE_TIMINGS.md``; the gauntlet
runs it each round, so a serving regression shows up as a serve-row
delta, not a buried total.

Phases mirror the entries' documented workflows 1:1 (same index APIs,
same parameters, same data splits — the catalog entry stays the single
source of truth for CORRECTNESS; this tool only re-runs the workflow
with stopwatches between the commits):

- ``x_sim_index_update``:  bootstrap | churn (append+replay+delete+
  append) | serve | gate (fresh build + exceptAll compare)
- ``x_dedup_indexed_exact``: bootstrap | ingest (two gated batches) |
  gate (bloom-bitexact compare)
- ``x_sim_index_batch_topk``: bootstrap | batch-serve | gate (8
  per-query serves + exceptAll)
- ``x_sim_index_compact``: bootstrap+churn | serve-pre | compact |
  serve-post (the compact row isolates the fold's own cost from the
  churn that feeds it)

Timings are min-of-N (default 2) over FULL fresh-index repeats, so
one-time JIT/codegen amortizes the way bench.py's min-of-2 does.

Usage:
    python tools/phase_timings.py [--repeats 2] [--sf-dir DIR] [--print-only]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _shm_tmp(prefix: str) -> str:
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    return tempfile.mkdtemp(prefix=prefix, dir=shm)


def time_ann_update(spark, sf_dir: str) -> dict[str, float]:
    from pyspark.sql import functions as F

    from iheardai_data_pipeline_spark.operators.ann_index import (
        PersistentAnnIndex,
    )
    from iheardai_data_pipeline_spark.plans.extension_queries import (
        _SERVE_BOOKS,
        _SERVE_CENTROIDS,
        _probe_vector,
    )
    from iheardai_data_pipeline_spark.sources.batch import load_table

    emb = load_table(spark, sf_dir, "embeddings").where(
        F.col("embedding").isNotNull()
    )
    n = emb.count()
    qid, qvec = _probe_vector(emb)
    # the round-10 catalog entries serve under the PINNED sf0.01
    # artifacts at every SF (the DuckDB replay embeds them as
    # literals); the timer must use the same ones or it times a
    # different cluster occupancy than the entry it claims to mirror
    # (ADVICE r10 phase_timings.py:73)
    centroids, books = _SERVE_CENTROIDS, _SERVE_BOOKS
    shortlist = max(100, n // 5)
    corpus = emb.filter(F.col("vec_id") % 2 == 0)
    b1 = emb.filter(F.col("vec_id") % 4 == 1)
    b2 = emb.filter(F.col("vec_id") % 4 == 3)
    deleted = emb.filter(F.col("vec_id") % 10 == 0).select("vec_id")
    final_state = emb.filter(F.col("vec_id") % 10 != 0)
    root, root2 = _shm_tmp("pt_annupd_"), _shm_tmp("pt_annupd_fresh_")
    out: dict[str, float] = {}
    try:
        t0 = time.time()
        idx = PersistentAnnIndex.bootstrap(
            spark, root, corpus, centroids=centroids, books=books
        )
        out["bootstrap"] = time.time() - t0
        t0 = time.time()
        idx.append(b1, seq=2, epoch="b1")
        idx.append(b1, seq=2, epoch="b1")
        idx.delete(deleted, seq=3)
        idx.append(b2, seq=4)
        out["churn"] = time.time() - t0
        t0 = time.time()
        got = idx.topk(
            qvec, k=10, nprobe=4, shortlist=shortlist, exclude_id=qid
        ).localCheckpoint(eager=True)
        out["serve"] = time.time() - t0
        t0 = time.time()
        fresh = PersistentAnnIndex.bootstrap(
            spark, root2, final_state, centroids=centroids, books=books
        )
        want = fresh.topk(
            qvec, k=10, nprobe=4, shortlist=shortlist, exclude_id=qid
        )
        assert got.exceptAll(want).count() + want.exceptAll(got).count() == 0
        out["gate"] = time.time() - t0
    finally:
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(root2, ignore_errors=True)
    return out


def time_fp_exact(spark, sf_dir: str) -> dict[str, float]:
    from pyspark.sql import functions as F

    from iheardai_data_pipeline_spark.operators.fingerprint_index import (
        FingerprintIndex,
    )
    from iheardai_data_pipeline_spark.operators.sketch import bloom_build
    from iheardai_data_pipeline_spark.sources.batch import load_table

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    corpus = docs.filter(F.col("doc_id") % 3 != 0).select("doc_id", "text")
    incoming = docs.filter(F.col("doc_id") % 3 == 0).select(
        "doc_id", "lang", "text"
    )
    root = _shm_tmp("pt_fpidx_")
    out: dict[str, float] = {}
    try:
        t0 = time.time()
        idx = FingerprintIndex(spark, root, expected_docs=docs.count())
        idx.append(corpus)
        out["bootstrap"] = time.time() - t0
        hi = docs.agg(F.max("doc_id")).collect()[0][0] or 0
        cuts = [0, hi // 2 + 1, hi + 1]
        t0 = time.time()
        n_kept = 0
        for lo, up in zip(cuts, cuts[1:]):
            batch = incoming.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < up)
            )
            n_kept += idx.ingest(batch).count()
        out["ingest"] = time.time() - t0
        t0 = time.time()
        stored_bits = (
            idx._store.read("bloom_bits")
            .select("bit")
            .dropDuplicates(["bit"])
        )
        one_shot = bloom_build(
            idx._store.read("fingerprints").select("fingerprint").distinct(),
            "fingerprint",
            m=idx.m,
            k=idx.k,
        )
        assert (
            stored_bits.exceptAll(one_shot).count()
            + one_shot.exceptAll(stored_bits).count()
            == 0
        )
        out["gate"] = time.time() - t0
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def time_batch_topk(spark, sf_dir: str) -> dict[str, float]:
    from pyspark.sql import functions as F

    from iheardai_data_pipeline_spark.operators.ann_index import (
        PersistentAnnIndex,
    )
    from iheardai_data_pipeline_spark.plans.extension_queries import (
        _SERVE_BOOKS,
        _SERVE_CENTROIDS,
    )
    from iheardai_data_pipeline_spark.sources.batch import load_table

    emb = load_table(spark, sf_dir, "embeddings").where(
        F.col("embedding").isNotNull()
    )
    n = emb.count()
    # pinned artifacts — must match the catalog entry (ADVICE r10)
    centroids, books = _SERVE_CENTROIDS, _SERVE_BOOKS
    shortlist = max(100, n // 5)
    qrows = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.orderBy("vec_id").limit(8).collect()
    ]
    queries = spark.createDataFrame(
        qrows, "query_id long, embedding array<float>"
    )
    root = _shm_tmp("pt_annbatch_")
    out: dict[str, float] = {}
    try:
        t0 = time.time()
        idx = PersistentAnnIndex.bootstrap(
            spark, root, emb, centroids=centroids, books=books
        )
        out["bootstrap"] = time.time() - t0
        t0 = time.time()
        got = idx.topk_batch(
            queries, k=5, nprobe=4, shortlist=shortlist, exclude_self=True
        ).localCheckpoint(eager=True)
        out["batch-serve"] = time.time() - t0
        t0 = time.time()
        per_query = None
        for qid, qvec in qrows:
            one = idx.topk(
                qvec, k=5, nprobe=4, shortlist=shortlist, exclude_id=qid
            ).select(
                F.lit(qid).cast("long").alias("query_id"),
                "vec_id",
                "l2_dist",
            )
            per_query = one if per_query is None else per_query.unionByName(one)
        assert (
            got.exceptAll(per_query).count()
            + per_query.exceptAll(got).count()
            == 0
        )
        out["gate"] = time.time() - t0
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def time_ann_compact(spark, sf_dir: str) -> dict[str, float]:
    from pyspark.sql import functions as F

    from iheardai_data_pipeline_spark.operators.ann_index import (
        PersistentAnnIndex,
    )
    from iheardai_data_pipeline_spark.plans.extension_queries import (
        _SERVE_BOOKS,
        _SERVE_CENTROIDS,
        _probe_vector,
    )
    from iheardai_data_pipeline_spark.sources.batch import load_table

    emb = load_table(spark, sf_dir, "embeddings").where(
        F.col("embedding").isNotNull()
    )
    n = emb.count()
    qid, qvec = _probe_vector(emb)
    shortlist = max(100, n // 5)
    corpus = emb.filter(F.col("vec_id") % 2 == 0)
    b1 = emb.filter(F.col("vec_id") % 4 == 1)
    b2 = emb.filter(F.col("vec_id") % 4 == 3)
    deleted = emb.filter(F.col("vec_id") % 10 == 0).select("vec_id")
    root = _shm_tmp("pt_anncpt_")
    out: dict[str, float] = {}
    try:
        t0 = time.time()
        idx = PersistentAnnIndex.bootstrap(
            spark, root, corpus, centroids=_SERVE_CENTROIDS, books=_SERVE_BOOKS
        )
        idx.append(b1, seq=2, epoch="b1")
        idx.append(b1, seq=2, epoch="b1")
        idx.delete(deleted, seq=3)
        idx.append(b2, seq=4)
        out["bootstrap+churn"] = time.time() - t0
        t0 = time.time()
        before = idx.topk(
            qvec, k=10, nprobe=4, shortlist=shortlist, exclude_id=qid
        ).localCheckpoint(eager=True)
        out["serve-pre"] = time.time() - t0
        t0 = time.time()
        idx.compact()
        out["compact"] = time.time() - t0
        t0 = time.time()
        after = idx.topk(
            qvec, k=10, nprobe=4, shortlist=shortlist, exclude_id=qid
        ).localCheckpoint(eager=True)
        out["serve-post"] = time.time() - t0
        assert (
            before.exceptAll(after).count() + after.exceptAll(before).count()
            == 0
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def time_bm25_indexed(spark, sf_dir: str) -> dict[str, float]:
    """Mirrors x_text_bm25_indexed + x_text_bm25_compact (round 11):
    bootstrap | mutate (epoch-replayed append + upsert + delete) |
    serve | compact | serve-post (post-compact serve must be
    row-identical — the reclamation-invisible gate)."""
    from iheardai_data_pipeline_spark.operators.postings_index import (
        PostingsIndex,
    )
    from iheardai_data_pipeline_spark.plans.extension_queries import (
        _BM25_B,
        _BM25_K1,
        _bm25_query_frame,
        _bm25_scenario_frames,
    )

    boot, upsert, dele = _bm25_scenario_frames(spark, sf_dir)
    queries = _bm25_query_frame(spark)
    root = _shm_tmp("pt_bm25_")
    out: dict[str, float] = {}
    try:
        # round 14: bootstrap/mutate are BOLD write-path rows for the
        # postings family (VERDICT r13 #7) — the r13 maintenance trade
        # doubled the append fixed cost with no drift-proof comparison
        # surface of its own; these rows are the before/after for the
        # fresh-batch append diet (bootstrap = the fresh-id bulk shape
        # that now skips the forward-diff probe; mutate = the
        # replay+upsert+delete scenario that still pays the exact diff)
        t0 = time.time()
        idx = PostingsIndex(spark, root, k1=_BM25_K1, b=_BM25_B)
        idx.append(boot, seq=0, epoch="boot")
        out["bootstrap"] = time.time() - t0
        t0 = time.time()
        idx.append(boot, seq=0, epoch="boot")  # replay: must no-op
        idx.append(upsert, seq=1, epoch="upsert")
        idx.delete(dele, seq=2, epoch="delete")
        out["mutate"] = time.time() - t0
        t0 = time.time()
        before = idx.topk(queries, k=5).localCheckpoint(eager=True)
        out["serve"] = time.time() - t0
        t0 = time.time()
        pruned = idx.topk(queries, k=5, prune=True).localCheckpoint(
            eager=True
        )
        out["serve-pruned"] = time.time() - t0
        # the max-score serve is an evaluation-strategy change only
        assert (
            before.exceptAll(pruned).count()
            + pruned.exceptAll(before).count()
            == 0
        )
        t0 = time.time()
        idx.compact()
        out["compact"] = time.time() - t0
        t0 = time.time()
        after = idx.topk(queries, k=5).localCheckpoint(eager=True)
        out["serve-post"] = time.time() - t0
        assert (
            before.exceptAll(after).count() + after.exceptAll(before).count()
            == 0
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def time_bm25_prf(spark, sf_dir: str) -> dict[str, float]:
    """Mirrors x_text_bm25_prf_indexed (round 13 — VERDICT r12 #3):
    bootstrap | mutate | serve-prf. The entry's bench wall is
    scenario-dominated (~80% bootstrap+mutate), so without this split
    a PRF-serving regression hides in bootstrap noise exactly as r10
    established for the ANN family. serve-prf is the whole two-pass
    pipeline: pass 1 at k=fb_docs, forward-relation expansion vote,
    pass 2 over the expanded term sets."""
    from iheardai_data_pipeline_spark.operators.postings_index import (
        PostingsIndex,
    )
    from iheardai_data_pipeline_spark.plans.extension_queries import (
        _BM25_B,
        _BM25_K1,
        _bm25_query_frame,
        _bm25_scenario_frames,
    )

    boot, upsert, dele = _bm25_scenario_frames(spark, sf_dir)
    queries = _bm25_query_frame(spark)
    root = _shm_tmp("pt_bm25prf_")
    out: dict[str, float] = {}
    try:
        t0 = time.time()
        idx = PostingsIndex(spark, root, k1=_BM25_K1, b=_BM25_B)
        idx.append(boot, seq=0, epoch="boot")
        out["bootstrap"] = time.time() - t0
        t0 = time.time()
        idx.append(boot, seq=0, epoch="boot")  # replay: must no-op
        idx.append(upsert, seq=1, epoch="upsert")
        idx.delete(dele, seq=2, epoch="delete")
        out["mutate"] = time.time() - t0
        t0 = time.time()
        got = idx.prf_topk(
            queries, k=5, fb_docs=3, fb_terms=2
        ).localCheckpoint(eager=True)
        out["serve-prf"] = time.time() - t0
        # round 14: both PRF passes through the max-score serve — the
        # x_text_bm25_prf_wand path; pruning is evaluation-strategy
        # only, so the rows must match the unpruned serve exactly
        t0 = time.time()
        pruned = idx.prf_topk(
            queries, k=5, fb_docs=3, fb_terms=2, prune=True
        ).localCheckpoint(eager=True)
        out["serve-prf-pruned"] = time.time() - t0
        assert (
            got.exceptAll(pruned).count()
            + pruned.exceptAll(got).count()
            == 0
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


ENTRIES = {
    "x_sim_index_update": time_ann_update,
    "x_dedup_indexed_exact": time_fp_exact,
    "x_sim_index_batch_topk": time_batch_topk,
    "x_sim_index_compact": time_ann_compact,
    "x_text_bm25_indexed": time_bm25_indexed,
    "x_text_bm25_prf_indexed": time_bm25_prf,
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument(
        "--print-only",
        action="store_true",
        help="print the table without rewriting docs/PHASE_TIMINGS.md",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .appName("phase-timings")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict[str, float]] = {}
    for name, fn in ENTRIES.items():
        runs = [fn(spark, args.sf_dir) for _ in range(max(1, args.repeats))]
        results[name] = {
            ph: min(r[ph] for r in runs) for ph in runs[0]
        }
        total = sum(results[name].values())
        print(f"{name}: " + "  ".join(
            f"{ph}={s:.2f}s" for ph, s in results[name].items()
        ) + f"  (total {total:.2f}s)")

    lines = [
        "# Per-phase wall times for the persistent-index entries",
        "",
        f"Regenerated by `python tools/phase_timings.py` (gauntlet step) —",
        f"min-of-{args.repeats} over full fresh-index repeats at "
        f"`{args.sf_dir}`, local["
        f"{os.environ.get('SPARK_GRAFT_CPUS', '32')}]. Phases mirror the "
        "catalog entries' documented workflows 1:1; every phase ends in "
        "an action, so the split is a real execution barrier, not a lazy-"
        "plan artifact. The SERVE row is the number to watch round-over-"
        "round: bootstrap/gate are verification scaffolding whose cost "
        "does not exist on a production serving path — EXCEPT the "
        "postings (bm25) entries, whose bootstrap/mutate rows are bold "
        "WRITE-PATH surfaces (round 14): bootstrap is the fresh-id bulk "
        "append shape, mutate the replace-carrying scenario, the "
        "before/after pair for the append-side maintenance cost.",
        "",
        "| entry | phase | seconds |",
        "|---|---|---|",
    ]
    write_path_bold = {
        "x_text_bm25_indexed": ("bootstrap", "mutate"),
        "x_text_bm25_prf_indexed": ("bootstrap", "mutate"),
    }
    for name, phases in results.items():
        for ph, s in phases.items():
            bold = (
                "**"
                if ph
                in (
                    "serve",
                    "batch-serve",
                    "ingest",
                    "compact",
                    "serve-pruned",
                    "serve-prf",
                    "serve-prf-pruned",
                )
                or ph in write_path_bold.get(name, ())
                else ""
            )
            lines.append(f"| `{name}` | {bold}{ph}{bold} | {s:.2f} |")
        lines.append(
            f"| `{name}` | _total_ | {sum(phases.values()):.2f} |"
        )
    lines.append("")
    md = "\n".join(lines)
    if args.print_only:
        print(md)
    else:
        out_path = os.path.join(REPO, "docs", "PHASE_TIMINGS.md")
        with open(out_path, "w") as fh:
            fh.write(md)
        print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
