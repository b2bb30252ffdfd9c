"""Skew-tolerant equi-join via key salting.

A shuffled equi-join hashes rows to reducers BY KEY: one hot key (a
viral session, a null-ish default id, a mega-customer) lands its entire
row set on one task, and the stage runs as long as that straggler. AQE's
skew-join split (on in ``session.py``) handles this at runtime for
sort-merge joins; salting is the *plan-level* tool for the cases AQE
cannot rewrite — aggregation-free broadcast-ineligible joins feeding a
stateful op, deterministic tests of skew behavior, or engines/configs
without AQE. The reference delegates all join physics to
PostgreSQL/Snowflake (SURVEY §2.6); this operator is part of the
100 TB posture.

Mechanics: the large side gets a salt in [0, n_salts) derived from a
NON-key column (the same key must scatter across salts); the small side
is replicated once per salt value. The join key becomes (key, salt), so
a hot key's rows spread over n_salts reducers. An inner/left equi-join
over the salted key is row-for-row identical to the unsalted join —
every large-side row still meets every matching small-side row exactly
once, in the one salt partition it carries.

Cost model: small side is replicated n_salts x (keep it
broadcast-small or n_salts modest); large side shuffles once either
way. Worst case overhead is bounded and known; worst case WITHOUT
salting is a single-task stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str] | str,
    salt_on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``large`` (skewed side) with ``small``, spreading each
    join key over ``n_salts`` reducers.

    ``on``: equi-join column name(s) present in both frames.
    ``salt_on``: a column of ``large`` whose hash scatters rows WITHIN a
    key (any row-level column that is not constant per key).
    ``how``: 'inner' or 'left' (large side preserved).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    salted_large = large.withColumn(
        _SALT, F.pmod(F.xxhash64(F.col(salt_on)), F.lit(n_salts)).cast("int")
    )
    salted_small = small.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_large.join(salted_small, keys + [_SALT], how).drop(_SALT)
