"""Custom Python Data Source: the REST-poll extractor as a first-class
Spark source (S3/S4/S6).

The reference polls JSON pages from REST endpoints with a persisted
``since`` checkpoint (frontend_events_extractor.py:66-94,267-306;
text_agent_events_extractor.py:77-162,372-409). Spark 4's Python Data
Source API lets that ingestion contract live INSIDE the engine instead
of beside it:

- batch: one InputPartition per page file -> pages scan in parallel,
  schema declared (SURVEY §1.4 — no inference);
- streaming: the reader's offset IS the reference's ``since``
  checkpoint — ``initialOffset``/``latestOffset`` track how many pages
  exist, each micro-batch reads only the new ones, and Spark's
  checkpointLocation persists the offset exactly where the reference
  hand-rolled a checkpoint file (S2).

The "API" here is a directory of JSON-lines page files (the rig has no
network); swapping `_list_pages`/`_read_page` for HTTP GETs is the only
production delta — partitioning, offsets, and recovery stay identical.

Register with ``spark.dataSource.register(EventApiDataSource)`` and read
with ``spark.read.format("event_api").option("path", dir)`` or
``spark.readStream.format("event_api")...``.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

EVENT_API_SCHEMA = (
    "event_id string, ts_ms long, user_id long, event_type string, value double"
)


def _list_pages(path: str) -> list[str]:
    return sorted(
        f for f in os.listdir(path) if f.startswith("page-") and f.endswith(".jsonl")
    )


def _read_page(path: str, name: str, field_names: list[str]):
    with open(os.path.join(path, name)) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            yield tuple(rec.get(k) for k in field_names)


class _PagePartition(InputPartition):
    def __init__(self, name: str):
        self.name = name


class _EventApiBatchReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.path = options["path"]
        self.field_names = [f.name for f in schema.fields]

    def partitions(self):
        return [_PagePartition(n) for n in _list_pages(self.path)]

    def read(self, partition: _PagePartition):
        yield from _read_page(self.path, partition.name, self.field_names)


class _EventApiStreamReader(DataSourceStreamReader):
    """Micro-batch reader whose offset = count of pages consumed — the
    engine-native restatement of the reference's ``since`` checkpoint."""

    def __init__(self, schema: StructType, options: dict):
        self.path = options["path"]
        self.field_names = [f.name for f in schema.fields]

    def initialOffset(self):
        return {"page_count": 0}

    def latestOffset(self):
        return {"page_count": len(_list_pages(self.path))}

    def partitions(self, start: dict, end: dict):
        pages = _list_pages(self.path)[start["page_count"] : end["page_count"]]
        return [_PagePartition(n) for n in pages]

    def read(self, partition: _PagePartition):
        yield from _read_page(self.path, partition.name, self.field_names)

    def commit(self, end: dict) -> None:
        pass  # pages are immutable; nothing to acknowledge


class EventApiDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "event_api"

    def schema(self) -> str:
        return EVENT_API_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return _EventApiBatchReader(schema, self.options)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return _EventApiStreamReader(schema, self.options)
