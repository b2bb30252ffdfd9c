"""Custom stateful streaming operator: per-key session state via
``applyInPandasWithState`` (SURVEY.md §1.2 / §2.11 T4+T6, K5/J4/W3).

The reference keeps hot per-session state in a Redis hash
``session:{session_id}:state`` with fields like seq / engagement /
started_at and a 1-hour TTL (enhanced_kpi_consumer.py:638-673,
config/config.yaml:146-151). The engine already covers the batch and
``foreachBatch`` restatements (streaming/sinks.py); this module is the
genuinely-stateful restatement: Spark's keyed state store IS the Redis
hash, and the state timeout IS the TTL.

Scale posture: state lives in the executor state store (RocksDB-backed
on a real cluster), partitioned by the grouping key — no external KV
round-trips, no driver involvement, and timeouts evict idle keys so
state size tracks the number of LIVE sessions, not the event volume.

``applyInPandasWithState`` feeds each key's micro-batch rows to a
Python function as Arrow-backed pandas frames together with that key's
``GroupState`` — the per-batch work is vectorized pandas, not per-row
Python.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame

STATE_SCHEMA = (
    "n_events BIGINT, sum_value DOUBLE, started_at_s BIGINT, "
    "last_seen_s BIGINT, max_event_id BIGINT"
)

OUTPUT_SCHEMA = (
    "user_id BIGINT, n_events BIGINT, sum_value DOUBLE, started_at_s BIGINT, "
    "last_seen_s BIGINT, max_event_id BIGINT, closed BOOLEAN"
)


def track_session_state(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    seq_col: str = "event_id",
    ttl_ms: int | None = 3_600_000,
) -> DataFrame:
    """Maintain one state row per key across micro-batches and emit the
    updated snapshot each time the key sees data (output mode: update).

    State fields mirror the reference's Redis hash: event count, value
    sum, session start / last-seen (epoch seconds), and the monotonic
    high-water ``seq`` (the reference's compare-and-set guard — here the
    max event_id seen). ``ttl_ms`` maps the Redis ``EXPIRE 3600``: a key
    idle past the TTL times out, emits a final ``closed`` snapshot, and
    its state is removed from the store.

    Pass ``ttl_ms=None`` for bounded replays (availableNow harnesses,
    backfills): with a processing-time timeout armed, Spark keeps
    scheduling empty timeout-check batches, so an availableNow trigger
    never reaches termination — TTL eviction only makes sense for
    continuously-running deployments.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator["pd.DataFrame"],  # noqa: F821
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        if state.hasTimedOut:
            n, s, st, ls, mx = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "user_id": key[0],
                        "n_events": n,
                        "sum_value": round(s, 2),
                        "started_at_s": st,
                        "last_seen_s": ls,
                        "max_event_id": mx,
                        "closed": True,
                    }
                ]
            )
            return

        n, s, st, ls, mx = state.get if state.exists else (0, 0.0, None, None, None)
        for pdf in pdfs:
            if not len(pdf):
                continue
            n += len(pdf)
            s += float(pdf[value_col].sum())
            # unit-proof epoch-seconds floor (Arrow may hand back ns or us)
            secs = pd.to_datetime(pdf[ts_col]).values.astype("datetime64[s]").astype("int64")
            lo, hi = int(secs.min()), int(secs.max())
            st = lo if st is None else min(st, lo)
            ls = hi if ls is None else max(ls, hi)
            batch_mx = int(pdf[seq_col].max())
            mx = batch_mx if mx is None else max(mx, batch_mx)
        state.update((n, s, st, ls, mx))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(
            [
                {
                    "user_id": key[0],
                    "n_events": n,
                    "sum_value": round(s, 2),
                    "started_at_s": st,
                    "last_seen_s": ls,
                    "max_event_id": mx,
                    "closed": False,
                }
            ]
        )

    timeout_conf = (
        GroupStateTimeout.NoTimeout
        if ttl_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout_conf,
    )
