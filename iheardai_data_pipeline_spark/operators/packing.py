"""Token-budget shard packing for training-data pipelines.

A training run wants the corpus cut into contiguous shards of ~N tokens
(sequence packing / shard manifests). That is a global running total —
the textbook "window with no partition" trap: ``Window.orderBy(id)``
with no partition key moves the ENTIRE corpus to one reducer.

The scalable restatement is a two-level prefix sum, all deterministic
column algebra:

1. bucket the global order key into fixed-width buckets
   (``bucket = id DIV bucket_size``) — no data movement decision
   involved, the bucket is a pure function of the key;
2. local exclusive cumsum within each bucket (window partitioned by
   bucket — a real partition key, so the shuffle spreads);
3. per-bucket totals (one map-side-combinable groupBy of
   corpus/bucket_size rows), exclusive-cumsum'd over the tiny bucket
   relation (single-partition window over ~n/bucket_size rows — bounded
   by construction, pick bucket_size so this stays ≤ a few million) and
   broadcast back.

start_offset = bucket_offset + local_offset; shard = start DIV budget.
Every value is exact integer arithmetic, so the result is
engine-portable and hash-stable. At 100 TB only step 3's bucket
relation ever concentrates, and its size is corpus/bucket_size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_global_running_total(
    df: DataFrame,
    order_col: str,
    value_col: str,
    bucket_size: int = 1024,
    out_col: str = "start_offset",
) -> DataFrame:
    """Exclusive global running total of ``value_col`` in ``order_col``
    order, without a single-partition window. ``order_col`` must be
    numeric and unique (doc ids); ordering follows its numeric order."""
    # integer DIV, not float division: keys/offsets can exceed double's
    # 2^53 exact-integer range at corpus scale
    bucket = F.expr(f"CAST(`{order_col}` AS BIGINT) DIV {bucket_size}").alias("__bucket")
    local_w = (
        Window.partitionBy("__bucket")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_local = df.withColumn("__bucket", bucket).withColumn(
        "__local_off", F.coalesce(F.sum(value_col).over(local_w), F.lit(0)).cast("long")
    )
    # totals aggregate from the RAW rows, not from with_local: reading the
    # windowed frame would drag the window's shuffle+sort into this branch,
    # which only needs an ordinary partial-agg groupBy
    totals = (
        df.withColumn("__bucket", bucket)
        .groupBy("__bucket")
        .agg(F.sum(value_col).cast("long").alias("__tot"))
    )
    # the bucket relation is corpus/bucket_size rows — the one place a
    # no-partition window is CORRECT, because the input is bounded
    bucket_w = Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__bucket",
        F.coalesce(F.sum("__tot").over(bucket_w), F.lit(0)).cast("long").alias("__bucket_off"),
    )
    return (
        with_local.join(F.broadcast(offsets), "__bucket")
        .withColumn(out_col, (F.col("__bucket_off") + F.col("__local_off")).cast("long"))
        .drop("__bucket", "__local_off", "__bucket_off")
    )


def token_budget_shards(
    docs: DataFrame,
    order_col: str,
    token_col: str,
    budget: int,
    bucket_size: int = 1024,
) -> DataFrame:
    """Assign each doc to the contiguous training shard in which it
    STARTS: shard_id = floor(exclusive_cumsum(tokens) / budget).

    A shard may overflow the budget by at most one document (the
    standard greedy packing convention); empty docs inherit their
    neighbor's shard. Deterministic, exact-integer, engine-portable.
    """
    out = with_global_running_total(
        docs, order_col, token_col, bucket_size=bucket_size, out_col="start_offset"
    )
    return out.withColumn("shard_id", F.expr(f"start_offset DIV {budget}"))
