"""Regenerate the pinned unigram-LM tokenizer artifact
(plans/unigram_artifact.py) from the sf0.01 documents table.

Like the BPE merge list (_BPE_MERGES) and the ANN artifacts, the
tokenizer is a SHIPPED artifact: training inside a query would make
token counts scale-factor-dependent and the oracle inexpressible, so
one table is trained once here and applied at every SF.

    python tools/regen_unigram_artifact.py
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from pyspark.sql import SparkSession

    from iheardai_data_pipeline_spark.operators.unigram import unigram_train
    from iheardai_data_pipeline_spark.sources.batch import load_table

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    pieces = unigram_train(
        docs, vocab_size=160, seed_size=512, n_iters=2
    )
    out = os.path.join(
        REPO, "iheardai_data_pipeline_spark", "plans", "unigram_artifact.py"
    )
    with open(out, "w") as fh:
        fh.write(
            '"""Pinned unigram-LM tokenizer artifact (GENERATED — do not '
            "edit;\nregenerate with tools/regen_unigram_artifact.py after "
            "testdata\nchanges). Trained by operators/unigram.py:"
            "unigram_train on the\nsf0.01 documents table (vocab_size=160, "
            "seed_size=512, n_iters=2).\nScores are BIGINT micro-log-units "
            '— see operators/unigram.py.\n"""\n\n'
        )
        fh.write("UNIGRAM_PIECES: list[tuple[str, int]] = [\n")
        for p, s in pieces:
            fh.write(f"    ({p!r}, {s}),\n")
        fh.write("]\n")
    print(f"wrote {len(pieces)} pieces to {out}")


if __name__ == "__main__":
    main()
