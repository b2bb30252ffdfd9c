"""Retrieval-index scale probes (SCALE.md round-11/12 rows): ingest
flatness, hot-term pruned-vs-unpruned BM25 serve, phrase serve — at
5k and 500k docs on a synthetic zipf-ish corpus (2000-term vocab, 20
terms/doc, 256 buckets). Run on a QUIET box (timing-sensitive):

    python tools/stress_retrieval_scale.py [hot|phrase|ingest]

`hot` (default) reproduces the round-12 max-score rows: every doc
additionally carries a literal 'the' (df = 100%, idf ~ 1e-6 — the true
stopword profile), queries mix it with zipf-tail rare terms, and the
probe prints pruned vs unpruned walls + the pruning diag counts and
ASSERTS row equality. `phrase` reproduces the phrase-at-100x rows.
`ingest` reproduces the round-11 fixed-2k-batch flatness rows (round
14: the batch is FRESH-id, so it also measures the append diet — the
forward-diff probe skipped). `prf` (round 14) is the hot probe's
two-pass PRF twin: prf_topk pruned vs unpruned on the same stopword
corpus/queries, diag accumulated across both passes, rows asserted
equal — the measurement behind the x_text_bm25_prf_wand SCALE row.
"""
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from iheardai_data_pipeline_spark.operators.postings_index import (  # noqa: E402
    PostingsIndex,
)
from iheardai_data_pipeline_spark.operators.text import phrase_topk  # noqa: E402
from iheardai_data_pipeline_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="stress-retrieval-scale")
VOCAB = 2000  # max realized rank is 1999*49/50 = 1959 — query terms must stay below


def corpus(n, start=0, stopword=False):
    """Deterministic zipf-ish text: doc i gets 20 terms, term ranks by
    multiplicative hashing (low ranks common); ``stopword=True`` adds a
    literal 'the' to EVERY doc (df = 100%)."""
    ids = spark.range(start, start + n).select(F.col("id").alias("doc_id"))
    zipf = [
        F.concat(
            F.lit("w"),
            (
                F.pmod(F.xxhash64(F.col("doc_id") * 37 + j), F.lit(VOCAB))
                * F.pmod(F.xxhash64(F.col("doc_id") + j * 101), F.lit(50))
                / F.lit(50)
            ).cast("long"),
        )
        for j in range(20)
    ]
    parts = ([F.lit("the")] if stopword else []) + zipf
    return ids.select("doc_id", F.concat_ws(" ", *parts).alias("text"))


def qf(rows):
    return spark.createDataFrame(rows, "query_id long, qtext string")


def rows_of(df):
    return sorted(tuple(r) for r in df.collect())


HOT_Q = [(0, "the w1900 w1850"), (1, "the w1940"), (2, "w1700 the w1800")]
PHRASE_Q = [(0, "w3 w17"), (1, "w0 w1"), (2, "w100 w250 w7")]
INGEST_Q = [(0, "w3 w17 w40"), (1, "w100 w250"), (2, "w7 w900 w1500")]


def probe_hot(n):
    root = tempfile.mkdtemp(prefix=f"srs_hot_{n}_", dir="/dev/shm")
    try:
        idx = PostingsIndex(spark, root, n_buckets=256)
        t0 = time.time()
        idx.append(corpus(n, stopword=True), seq=0)
        build = time.time() - t0
        assert rows_of(idx.topk(qf(HOT_Q), k=10)) == rows_of(
            idx.topk(qf(HOT_Q), k=10, prune=True)
        ), "pruned != unpruned at scale!"
        un, pr = [], []
        for _ in range(2):
            t0 = time.time()
            idx.topk(qf(HOT_Q), k=10).collect()
            un.append(time.time() - t0)
            t0 = time.time()
            idx.topk(qf(HOT_Q), k=10, prune=True).collect()
            pr.append(time.time() - t0)
        diag: dict = {}
        idx.topk(qf(HOT_Q), k=10, prune=True, diag=diag).collect()
        print(
            f"N={n}: build={build:.1f}s unpruned={min(un):.2f}s "
            f"pruned={min(pr):.2f}s diag={diag} rows_equal=True",
            flush=True,
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def probe_prf(n):
    root = tempfile.mkdtemp(prefix=f"srs_prf_{n}_", dir="/dev/shm")
    try:
        idx = PostingsIndex(spark, root, n_buckets=256)
        t0 = time.time()
        idx.append(corpus(n, stopword=True), seq=0)
        build = time.time() - t0
        kw = dict(k=10, fb_docs=3, fb_terms=2)
        assert rows_of(idx.prf_topk(qf(HOT_Q), **kw)) == rows_of(
            idx.prf_topk(qf(HOT_Q), prune=True, **kw)
        ), "pruned PRF != unpruned PRF at scale!"
        un, pr = [], []
        for _ in range(2):
            t0 = time.time()
            idx.prf_topk(qf(HOT_Q), **kw).collect()
            un.append(time.time() - t0)
            t0 = time.time()
            idx.prf_topk(qf(HOT_Q), prune=True, **kw).collect()
            pr.append(time.time() - t0)
        diag: dict = {}
        idx.prf_topk(qf(HOT_Q), prune=True, diag=diag, **kw).collect()
        print(
            f"N={n}: build={build:.1f}s prf_unpruned={min(un):.2f}s "
            f"prf_pruned={min(pr):.2f}s diag={diag} rows_equal=True",
            flush=True,
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def probe_phrase(n):
    root = tempfile.mkdtemp(prefix=f"srs_ph_{n}_", dir="/dev/shm")
    try:
        idx = PostingsIndex(spark, root, n_buckets=256)
        t0 = time.time()
        idx.append(corpus(n), seq=0)
        build = time.time() - t0
        docs = corpus(n)
        br, ix = [], []
        for _ in range(2):
            t0 = time.time()
            phrase_topk(docs, qf(PHRASE_Q), k=10).collect()
            br.append(time.time() - t0)
            t0 = time.time()
            idx.phrase_topk(qf(PHRASE_Q), k=10).collect()
            ix.append(time.time() - t0)
        terms = sorted({t for _, q in PHRASE_Q for t in q.split()})
        td = spark.createDataFrame([(t,) for t in terms], "term string")
        pl = idx._store.read_keys("postings", td).join(F.broadcast(td), "term")
        r = pl.agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(F.size("positions")).alias("pos"),
        ).collect()[0]
        print(
            f"N={n}: build={build:.1f}s phrase_brute={min(br):.2f}s "
            f"phrase_indexed={min(ix):.2f}s probed_postings={r['rows']} "
            f"exploded_positions={r['pos']}",
            flush=True,
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def probe_ingest(n):
    root = tempfile.mkdtemp(prefix=f"srs_ing_{n}_", dir="/dev/shm")
    try:
        idx = PostingsIndex(spark, root, n_buckets=256)
        t0 = time.time()
        idx.append(corpus(n), seq=0)
        build = time.time() - t0
        batch = corpus(2000, start=10_000_000)
        t0 = time.time()
        idx.append(batch, seq=0)
        ingest = time.time() - t0
        serves = []
        for _ in range(2):
            t0 = time.time()
            idx.topk(qf(INGEST_Q), k=10).collect()
            serves.append(time.time() - t0)
        print(
            f"N={n}: build={build:.1f}s ingest2k={ingest:.2f}s "
            f"serve={min(serves):.2f}s",
            flush=True,
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "hot"
    probe = {
        "hot": probe_hot,
        "phrase": probe_phrase,
        "ingest": probe_ingest,
        "prf": probe_prf,
    }[mode]
    for n in (5_000, 500_000):
        probe(n)
    print("DONE", flush=True)
