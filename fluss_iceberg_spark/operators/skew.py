"""Skew-aware join: salting for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized partitions. Salting is the complementary
*plan-level* technique for the pathological case — a single key carrying a
large fraction of all rows (power-law fact tables), where even a split
partition bottlenecks on one reducer:

- the large side gets a random-but-deterministic salt in [0, n_salts)
- the small side is replicated n_salts times
- the join key becomes (key, salt) → the hot key spreads over n_salts
  reducers; results are identical to the unsalted join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    n_salts: int = 16,
) -> DataFrame:
    """Equi-join ``large ⋈ small`` on column ``on`` with the large side
    salted. Deterministic salt (hash of the whole large row) so results
    are reproducible. Output columns = the plain join's columns."""
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in large.columns]), F.lit(n_salts))
    l_salted = large.withColumn("__salt", salt)
    s_replicated = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return l_salted.join(s_replicated, on=[on, "__salt"], how=how).drop("__salt")
