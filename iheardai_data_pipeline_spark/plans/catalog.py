"""Query catalog: every operator from SURVEY.md §2 as a named query.

Each entry pairs a Spark implementation ``(spark, sf_dir) -> DataFrame``
with (where SQL-expressible) an ANSI-SQL oracle string that DuckDB runs
on the same parquet tables. The driver hash-compares the two at sf0.01;
this module is therefore the single source of truth for the engine's
declared surface.

Column-name discipline: every computed column is aliased identically in
the Spark code and the oracle SQL (the driver sorts columns by name
before hashing).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    fn: QueryFn
    oracle: str | None = None  # None => non-SQL-expressible, rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


CATALOG: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    doc: str = "",
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        # Import-time integrity guard (round 9): a misplaced decorator —
        # e.g. left sitting on an extracted helper after a refactor —
        # registered a 3-arg helper as a catalog entry in round 8 and
        # crashed the bench harness with a TypeError. Every catalog entry
        # must BE the function it names and take exactly (spark, sf_dir).
        import inspect

        if fn.__name__ != name:
            raise TypeError(
                f"catalog entry {name!r} decorates function "
                f"{fn.__name__!r}; the registered name must match the "
                "def name (misplaced @register?)"
            )
        params = [
            p
            for p in inspect.signature(fn).parameters.values()
            if p.default is inspect.Parameter.empty
            and p.kind
            in (
                inspect.Parameter.POSITIONAL_ONLY,
                inspect.Parameter.POSITIONAL_OR_KEYWORD,
            )
        ]
        if len(params) != 2:
            raise TypeError(
                f"catalog entry {name!r} must take exactly "
                f"(spark, sf_dir); got required params "
                f"{[p.name for p in params]}"
            )
        CATALOG[name] = QuerySpec(fn=fn, oracle=oracle, tags=tags, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def query_map() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: spec.fn for name, spec in CATALOG.items()}


def oracle_map() -> dict[str, str]:
    _ensure_loaded()
    return {name: spec.oracle for name, spec in CATALOG.items() if spec.oracle is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every query module so registration side effects run."""
    global _LOADED
    if _LOADED:
        return
    import importlib

    for mod in (
        "iheardai_data_pipeline_spark.plans.core_queries",
        "iheardai_data_pipeline_spark.plans.transform_queries",
        "iheardai_data_pipeline_spark.plans.aggregate_queries",
        "iheardai_data_pipeline_spark.plans.benchmark_queries",
        "iheardai_data_pipeline_spark.plans.benchmark_queries_ext",
        "iheardai_data_pipeline_spark.plans.streaming_queries",
        "iheardai_data_pipeline_spark.plans.extension_queries",
        "iheardai_data_pipeline_spark.plans.transform_queries_wide",
        "iheardai_data_pipeline_spark.plans.corpus_queries",
        "iheardai_data_pipeline_spark.plans.enrichment_queries",
        "iheardai_data_pipeline_spark.plans.embedding_queries",
    ):
        importlib.import_module(mod)
    _LOADED = True
