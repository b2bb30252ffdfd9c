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


def bfd_pack(
    docs: DataFrame,
    group_col: str,
    id_col: str,
    size_col: str,
    capacity: int,
) -> DataFrame:
    """Best-fit-decreasing bin packing WITHIN bounded groups: items
    sorted by (size DESC, id ASC), each placed into the open bin with
    the SMALLEST residual capacity that still fits (ties to the lowest
    bin id), else a new bin — the classic BFD heuristic, guaranteed
    ≤ (11·OPT + 6)/9 bins (Johnson 1973/Dósa 2007), vs the prefix-sum
    packer (:func:`token_budget_shards`) which hits the ceil(total/
    budget) LOWER BOUND only by letting shards overflow the budget.
    BFD never overflows: every bin respects ``capacity`` except a
    single item larger than ``capacity``, which gets a bin of its own
    (the only possible placement).

    Distributed shape — the honest restatement of an inherently
    sequential greedy: packing runs PER GROUP (the natural pack domains
    of a training manifest — per source / language / day), each group's
    items collected to one array and folded in a single row-local
    ``aggregate`` expression; groups distribute across the cluster. The
    per-group item count must be executor-bounded (a manifest group is
    docs-per-day-sized, not corpus-sized — for a global contiguous
    manifest use ``token_budget_shards``). Fold cost is
    O(items × bins) per group with constant expression size.

    Everything is exact integer arithmetic with total tie-orders, so
    the assignment is deterministic and engine-portable — the DuckDB
    oracle replays the identical fold (x_pack_bfd_shards).

    Returns one row per item: (group_col, id_col, size (bigint), bin_id
    (int), n_bins (int) — the group's bin count). Rows with NULL size
    are the caller's problem (filter or default upstream).
    """
    cap = int(capacity)
    fits = "filter(acc.bins, b -> b.free >= it.sz)"
    best = (
        f"element_at(array_sort(transform({fits}, "
        "b -> named_struct('free', b.free, 'bid', b.bid))), 1)"
    )
    fold = f"""
    aggregate(
      __items,
      named_struct(
        'bins', array_repeat(named_struct('bid', 0, 'free', CAST(0 AS BIGINT)), 0),
        'asg',  array_repeat(named_struct('id', CAST(0 AS BIGINT), 'sz', CAST(0 AS BIGINT), 'bid', 0), 0)),
      (acc, it) -> named_struct(
        'bins',
          CASE WHEN size({fits}) > 0 THEN
            transform(acc.bins, b -> IF(b.bid = {best}.bid,
              named_struct('bid', b.bid, 'free', b.free - it.sz), b))
          ELSE
            concat(acc.bins, array(named_struct(
              'bid', CAST(size(acc.bins) AS INT),
              'free', CAST({cap} AS BIGINT) - it.sz)))
          END,
        'asg', concat(acc.asg, array(named_struct(
          'id', it.id, 'sz', it.sz,
          'bid', IF(size({fits}) > 0, {best}.bid,
                    CAST(size(acc.bins) AS INT)))))
      )
    )
    """
    grouped = docs.groupBy(group_col).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    (-F.col(size_col).cast("long")).alias("ns"),
                    F.col(id_col).cast("long").alias("id"),
                    F.col(size_col).cast("long").alias("sz"),
                )
            )
        ).alias("__items")
        # spread the folds one-group-per-task: the O(items x bins) fold
        # is COMPUTE-heavy on byte-light collected arrays, so AQE's
        # size-based coalescing would serialize several groups onto one
        # core (measured: the whole pack ran as 2 tasks). An explicit
        # group-keyed repartition is never coalesced; its shuffle moves
        # only the already-collected arrays once.
    ).repartition(group_col)
    packed = grouped.select(
        group_col, F.expr(fold).alias("__res")
    ).select(
        group_col,
        F.size("__res.bins").alias("n_bins"),
        F.explode("__res.asg").alias("__a"),
    )
    return packed.select(
        group_col,
        F.col("__a.id").alias(id_col),
        F.col("__a.sz").alias(size_col),
        F.col("__a.bid").alias("bin_id"),
        "n_bins",
    )
