"""Cross-engine-deterministic ratio arithmetic.

``ROUND(double, k)`` is NOT portable: Spark rounds the exact binary
expansion HALF_UP via BigDecimal, DuckDB rounds through a float
multiply — near digit boundaries (common when the true ratio is a
small-denominator rational, e.g. sum_cents/8) the two disagree, which
broke the a2/a5 oracle hashes in round 1 (6/2399 and 3/1500 rows).

The portable form computes HALF_UP(num/den, k) in EXACT integer
arithmetic — floor((2*|num|*10^k + den) / (2*den)) with the sign
reapplied — and then performs ONE double division by 10^k.  A single
IEEE-754 division of identical operands yields the identical double in
every engine, so hashes match bit-for-bit.

``ratio_half_up`` builds the Spark Column; ``sql_ratio_half_up`` emits
the equivalent DuckDB SQL so query and oracle can never drift.  Exact
integer floor-division is built from pmod (no precision loss at any
magnitude, unlike float floor(a/b)); ANSI mode is on, so the den=0 case
is guarded to NULL explicitly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def int_sum(col: Column | str, scale: int = 100, dec: str = "decimal(18,2)") -> Column:
    """Exact integer-scaled sum: SUM(cast(col as dec) * scale) as long.

    Per-row scaling keeps every addend integral, so the long sum is the
    exact scaled total (money in cents by default).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum((c.cast(dec) * scale).cast("long"))


def sql_int_sum(col_sql: str, scale: int = 100, dec: str = "DECIMAL(18,2)") -> str:
    """DuckDB equivalent of :func:`int_sum` (SUM(BIGINT) -> HUGEINT, fine)."""
    return f"SUM(CAST(CAST({col_sql} AS {dec}) * {scale} AS BIGINT))"


def _floor_div(num: Column, den: Column) -> Column:
    """Exact floor division of non-negative integral columns.

    (num - pmod(num, den)) is exactly divisible by den; the decimal
    division of two exact operands whose quotient is integral is itself
    exact, so no float precision cliff at any magnitude.
    """
    exact = (num - F.pmod(num, den)).cast("decimal(38,0)")
    return (exact / den.cast("decimal(38,0)")).cast("long")


def ratio_half_up(num: Column, den: Column, digits: int) -> Column:
    """HALF_UP(num/den, digits) as a cross-engine-stable double.

    num/den must be integral-valued columns (cast to long internally);
    NULL when den is 0 or NULL. Negative numerators round half away
    from zero, matching BigDecimal HALF_UP.
    """
    s = 10**digits
    num_l = num.cast("long")
    den_l = den.cast("long")
    # guard BEFORE the arithmetic: ANSI mode turns pmod-by-zero into an error
    safe_den = F.when(den_l > 0, den_l)
    mag = F.abs(num_l) * (2 * s) + safe_den
    q = _floor_div(mag, safe_den * 2)
    signed = F.when(num_l < 0, -q).otherwise(q)
    return signed.cast("double") / F.lit(float(s))


def sql_ratio_half_up(num_sql: str, den_sql: str, digits: int) -> str:
    """DuckDB SQL emitting the identical value to :func:`ratio_half_up`.

    Operands are cast to BIGINT up front: DuckDB keeps INT32 arithmetic in
    INT32 and raises on overflow, and SUM() yields HUGEINT — both normalize
    to the same int64 domain Spark computes in.
    """
    s = 10**digits
    n = f"CAST(({num_sql}) AS BIGINT)"
    d = f"CAST(({den_sql}) AS BIGINT)"
    q = f"((2*abs({n})*{s} + {d}) // (2*{d}))"
    return (
        f"CASE WHEN {d} > 0 THEN "
        f"CAST(CASE WHEN {n} < 0 THEN -{q} ELSE {q} END AS DOUBLE) / {s}.0 "
        f"END"
    )


def avg_money(value_col: str, digits: int = 4, dec: str = "decimal(18,2)") -> Column:
    """Stable AVG of a money-ish column at ``digits`` decimals."""
    return ratio_half_up(int_sum(value_col, 100, dec), F.count(F.lit(1)) * 100, digits)


def sql_avg_money(col_sql: str, digits: int = 4, dec: str = "DECIMAL(18,2)") -> str:
    """DuckDB equivalent of :func:`avg_money`."""
    return sql_ratio_half_up(sql_int_sum(col_sql, 100, dec), "COUNT(*) * 100", digits)
