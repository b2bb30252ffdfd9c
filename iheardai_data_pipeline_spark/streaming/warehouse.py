"""Warehouse batch-load sink (SURVEY §2.2 K6).

The reference's Snowflake loader (etl/load/snowflake_loader.py:114-136)
drains Kafka topics and ``write_pandas``-appends each poll batch into a
per-topic warehouse table (chunked, keyed tables). The Spark
restatement is a foreachBatch-able loader with the same split the Kafka
reader uses (``streaming/readers.py:read_kafka_stream``): the
engine-side semantics — in-batch last-write-wins dedup on the key,
and, for every ``make_upsert_store`` format, exactly-once via the
stream checkpoint + idempotent keyed merge — are real and tested.
The ``snowflake`` format is connector-lazy (resolved at write time;
this rig has no warehouse) and is a plain ``mode('append')`` save:
that path is APPEND-ONLY / AT-LEAST-ONCE — a micro-batch replayed
after a crash between write and checkpoint commit appends its rows
again, and the in-batch dedup does not make the table-level append
idempotent. A production deployment wanting exactly-once on Snowflake
stages each batch into a temp table and issues a keyed server-side
MERGE (the store formats model exactly that contract locally).

At scale the loader is shuffle-minimal: the only exchange per batch is
the key-partitioned window for in-batch dedup (micro-batch sized, not
table sized); the merge itself is the chosen store's contract
(bucket-partial rewrites for ``parquet_bucketed``, server-side MERGE
for a real warehouse connector).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class WarehouseBatchLoader:
    """K6 batch loader: dedup-within-batch then merge/append to a
    warehouse table or a local store stand-in.

    ``fmt='snowflake'`` targets the spark-snowflake connector
    (``target`` = dbtable, ``connector_options`` = sfURL/sfUser/... as
    documented by the connector) with append-only / at-least-once
    delivery (see module doc); any :func:`make_upsert_store` format
    (``parquet``, ``parquet_txn``, ``parquet_bucketed``, ``delta``)
    makes ``target`` a local path and gives real keyed-upsert,
    replay-idempotent semantics — the same K2 pattern the coverage doc
    promised for K6.
    """

    def __init__(
        self,
        spark: SparkSession,
        target: str,
        key_cols: list[str],
        order_cols: list[str],
        fmt: str = "parquet_txn",
        connector_options: dict | None = None,
    ) -> None:
        self.spark = spark
        self.target = target
        self.key_cols = list(key_cols)
        self.order_cols = list(order_cols)
        self.fmt = fmt
        self.connector_options = dict(connector_options or {})
        self._store = None

    def _dedup_batch(self, df: DataFrame) -> DataFrame:
        """Last-write-wins within one batch: a poll batch can carry
        several versions of one key (the reference appends them all and
        leans on downstream views; the loader resolves them up front so
        the merge is deterministic and idempotent on replay)."""
        from pyspark.sql import Window

        w = Window.partitionBy(*self.key_cols).orderBy(
            *[F.desc(c) for c in self.order_cols]
        )
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    def load_batch(self, df: DataFrame) -> None:
        batch = self._dedup_batch(df)
        if self.fmt == "snowflake":
            try:
                (
                    batch.write.format("snowflake")
                    .options(**self.connector_options)
                    .option("dbtable", self.target)
                    .mode("append")
                    .save()
                )
            except Exception as e:  # connector-lazy: absent in this rig
                raise RuntimeError(
                    "snowflake write failed — the spark-snowflake connector "
                    "must be on the classpath (net.snowflake:spark-snowflake) "
                    "and sfURL/sfUser/... set in connector_options"
                ) from e
            return
        if self._store is None:
            from iheardai_data_pipeline_spark.streaming.stores import (
                make_upsert_store,
            )

            self._store = make_upsert_store(
                self.spark, self.target, self.key_cols, self.order_cols, self.fmt
            )
        self._store.merge(batch)

    def read(self) -> DataFrame:
        """Current stand-in table contents (store formats only)."""
        if self._store is None:
            raise RuntimeError("nothing loaded yet (or fmt='snowflake')")
        return self._store.read()

    def foreach_batch(self):
        """Adapter for ``writeStream.foreachBatch`` — the streaming K6
        path, the reference's manual-commit loop restated. Store
        formats: checkpointed offsets + idempotent keyed merge =
        effective exactly-once. ``fmt='snowflake'``: at-least-once
        (append-only; see module doc)."""

        def _fn(df: DataFrame, epoch_id: int) -> None:
            self.load_batch(df)

        return _fn
