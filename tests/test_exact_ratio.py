"""Cross-engine determinism of functions.exact (the ROUND(double) fix).

The property under test: for integral num/den, Spark's ratio_half_up and
DuckDB's sql_ratio_half_up produce the IDENTICAL double — including at
exact decimal-half midpoints where plain ROUND(num/den, k) diverges
between the engines (round-1 a2/a5 hash failures).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from iheardai_data_pipeline_spark.functions.exact import (
    ratio_half_up,
    sql_ratio_half_up,
)

CASES = [
    # (num, den, digits) — midpoint-heavy denominators (2^k * 5^m) included
    (1, 8, 4),       # 0.125 -> exact at 4
    (1, 16, 4),      # 0.0625
    (3, 16, 4),      # 0.1875 -> tie at 4: 0.1875 -> HALF_UP 0.188? (digits=4 keeps)
    (1, 32, 4),      # 0.03125 -> tie: HALF_UP -> 0.0313
    (3, 128, 6),     # 0.0234375 -> tie at 6 -> 0.023438
    (211612353130, 800, 4),  # the a2 class: cents/100n with n=8
    (5, 2, 0),       # 2.5 -> 3 (HALF_UP at 0 digits)
    (-1, 32, 4),     # negative: half away from zero -> -0.0313
    (-5, 2, 0),      # -2.5 -> -3
    (0, 7, 4),
    (123456789, 97, 6),  # non-terminating
]


@pytest.fixture(scope="module")
def spark():
    from iheardai_data_pipeline_spark.session import get_spark

    return get_spark(app_name="test-exact")


def test_ratio_matches_duckdb_bitwise(spark):
    con = duckdb.connect()
    for n, d, k in CASES:
        s_val = (
            spark.range(1)
            .select(ratio_half_up(F.lit(n), F.lit(d), k).alias("r"))
            .collect()[0]["r"]
        )
        d_val = con.execute(
            f"SELECT {sql_ratio_half_up(str(n), str(d), k)}"
        ).fetchone()[0]
        assert s_val == d_val, (n, d, k, s_val, d_val)


def test_half_up_semantics(spark):
    # 1/32 = 0.03125: HALF_UP at 4 digits rounds the trailing 5 up
    v = (
        spark.range(1)
        .select(ratio_half_up(F.lit(1), F.lit(32), 4).alias("r"))
        .collect()[0]["r"]
    )
    assert v == 0.0313
    # negative mirrors away from zero
    v = (
        spark.range(1)
        .select(ratio_half_up(F.lit(-1), F.lit(32), 4).alias("r"))
        .collect()[0]["r"]
    )
    assert v == -0.0313


def test_zero_denominator_is_null(spark):
    v = (
        spark.range(1)
        .select(ratio_half_up(F.lit(5), F.lit(0), 4).alias("r"))
        .collect()[0]["r"]
    )
    assert v is None
    con = duckdb.connect()
    assert con.execute(f"SELECT {sql_ratio_half_up('5', '0', 4)}").fetchone()[0] is None
