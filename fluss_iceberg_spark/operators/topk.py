"""Top-k — the reference's ``ORDER BY revenue DESC LIMIT 5`` (README.md:280-283).

``orderBy(...).limit(k)`` is planned by Catalyst as TakeOrderedAndProject:
each partition keeps a size-k heap and only k rows per partition reach the
driver — no global sort, no full shuffle. This is exactly the plan you want
at 100 TB (verified in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def top_k(df: DataFrame, k: int, *order: Column) -> DataFrame:
    """T1: top-k rows by the given order expressions."""
    return df.orderBy(*order).limit(k)
