"""As-of (point-in-time) join — an operator Spark's DataFrame API lacks,
built as a composition of native ops (SURVEY.md §2.6 note: the reference
delegates all join strategy to its warehouses; this is an engine
extension in the training-data/feature-store family).

Semantics: for every left row, attach the single right row with the same
key whose timestamp is the latest at-or-before the left timestamp
(``direction="backward"``; ``"forward"`` = earliest at-or-after). Rows
with no match keep NULLs (left-join semantics).

Scale design — the naive formulation is a range join
(``l.key = r.key AND r.ts <= l.ts`` + a per-row max), which Spark plans
as a broadcast-nested-loop or an exploding theta-join. Instead:

1. union both sides, tagged, with the right payload packed into ONE
   struct column (left rows carry NULL);
2. one window over ``partitionBy(key).orderBy(ts, side)`` with
   ``last_value(payload, ignorenulls=True)`` over the preceding frame —
   each left row picks up the most recent right payload in-line;
3. keep the left rows, unpack the struct.

Cost: ONE shuffle on the key (the same shuffle any keyed join pays) and
a linear in-partition sort — no quadratic candidate space, no skew
amplification beyond the key's own row count. Ties on the timestamp
resolve right-before-left, so an exactly-simultaneous right row matches
(``<=``), matching DuckDB ``ASOF JOIN`` semantics.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str] | None = None,
    direction: str = "backward",
    suffix: str = "_asof",
) -> DataFrame:
    """Point-in-time enrich ``left`` with the nearest ``right`` row per key.

    ``right_cols`` — right columns to carry over (default: all but the
    key columns), each renamed with ``suffix``. ``direction``:
    ``"backward"`` (latest right at-or-before left, the default) or
    ``"forward"`` (earliest right at-or-after left).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    on = list(on)
    payload_cols = list(right_cols) if right_cols is not None else [
        c for c in right.columns if c not in on
    ]
    if right_ts not in payload_cols:
        payload_cols = [right_ts, *payload_cols]

    # one struct column carries the whole right payload through the window
    r = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("__payload"),
    )
    l = left.select(  # noqa: E741
        *[F.col(c) for c in on],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__row"),
    )
    r = r.withColumn("__row", F.lit(None).cast(l.schema["__row"].dataType))

    both = l.unionByName(r)
    if direction == "backward":
        # right rows sort before left at equal ts => "<=" match
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("__ts").asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        # scan from the future backwards; right still wins ties => ">="
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("__ts").desc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    matched = both.withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w)
    ).filter(F.col("__side") == 1)

    out = matched.select(
        *[F.col("__row")[c].alias(c) for c in left.columns],
        *[F.col("__match")[c].alias(f"{c}{suffix}") for c in payload_cols],
    )
    return out
