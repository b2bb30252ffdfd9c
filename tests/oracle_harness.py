"""Local replica of the driver's DuckDB-oracle comparison.

Runs a catalog query on Spark and its oracle SQL on DuckDB over the same
parquet tables, then compares row count, column names, and
order-insensitive values. Floats compare EXACTLY (== on the doubles):
the driver hashes exact values, and the engine's determinism discipline
(docs/DETERMINISM.md) is designed to produce bit-identical floats — a
tolerance here would let cross-engine drift pass locally and fail the
driver's gate.
"""

from __future__ import annotations


import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.sql(sql).df()


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.reindex(sorted(df.columns), axis=1)
    # array cells (numpy arrays / lists) aren't sortable keys — use tuples
    def _tuplify(v):
        if isinstance(v, (str, bytes)) or not hasattr(v, "__len__"):
            return v
        return tuple(v)

    out = out.apply(lambda s: s.map(_tuplify) if s.dtype == object else s)
    if len(out):
        out = out.sort_values(by=list(out.columns), ignore_index=True)
    return out.reset_index(drop=True)


def _is_float_scalar(v) -> bool:
    return isinstance(v, (float, np.floating))


def _is_int_scalar(v) -> bool:
    return isinstance(v, (int, np.integer)) and not isinstance(v, (bool, np.bool_))


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    # int-vs-float is a MISMATCH even when numerically equal: the driver
    # hashes rendered values, so Spark int64 `1` vs DuckDB HUGEIN->float64
    # `1.0` fails its gate (this exact divergence hit a1_session_kpis in r2).
    if (_is_float_scalar(a) and _is_int_scalar(b)) or (
        _is_int_scalar(a) and _is_float_scalar(b)
    ):
        return False
    if _is_float_scalar(a) or _is_float_scalar(b):
        try:
            return float(a) == float(b)
        except (TypeError, ValueError):
            return False
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        la, lb = list(a), list(b)
        return len(la) == len(lb) and all(_values_equal(x, y) for x, y in zip(la, lb))
    return str(a) == str(b)


def compare(spark_df, oracle_df: pd.DataFrame, max_report: int = 5) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    sp = canonicalize(spark_df.toPandas())
    ora = canonicalize(oracle_df)
    problems: list[str] = []
    if list(sp.columns) != list(ora.columns):
        problems.append(f"columns differ: spark={list(sp.columns)} oracle={list(ora.columns)}")
        return problems
    if len(sp) != len(ora):
        problems.append(f"row count differs: spark={len(sp)} oracle={len(ora)}")
        return problems
    for col in sp.columns:
        ka, kb = sp[col].dtype.kind, ora[col].dtype.kind
        if "f" in (ka, kb) and ({ka, kb} & {"i", "u"}):
            problems.append(
                f"col {col}: dtype kind differs: spark={sp[col].dtype} "
                f"oracle={ora[col].dtype} (int-vs-float fails the driver hash)"
            )
    if problems:
        return problems
    for col in sp.columns:
        bad = [
            i
            for i in range(len(sp))
            if not _values_equal(sp[col].iloc[i], ora[col].iloc[i])
        ]
        if bad:
            i = bad[0]
            problems.append(
                f"col {col}: {len(bad)} mismatches, first at row {i}: "
                f"spark={sp[col].iloc[i]!r} oracle={ora[col].iloc[i]!r}"
            )
            if len(problems) >= max_report:
                break
    return problems


def check_query(spark, name: str, sf_dir: str) -> list[str]:
    from iheardai_data_pipeline_spark.plans.catalog import CATALOG, _ensure_loaded

    _ensure_loaded()
    spec = CATALOG[name]
    sdf = spec.fn(spark, sf_dir)
    if spec.oracle is None:
        n = sdf.count()
        return [] if n >= 0 else [f"{name}: rows-only check failed"]
    return compare(sdf, run_oracle(spec.oracle, sf_dir))
