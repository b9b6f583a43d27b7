"""Seeded synthetic generators — parity with the reference's faker sources.

The reference generates its workload with the flink-faker connector
(sql-client.sql:1-48): per-field expressions over bounded / rate-limited
row streams. We reproduce the *distributions and domains* (not byte
values) with pure deterministic column expressions: every field is a
function of the row id via ``xxhash64`` — reproducible across runs,
partitions and engines, no Python UDFs.

Field generators (S3-S7):
- uniform int      ``#{number.numberBetween 'a','b'}``  (sql-client.sql:12-13,31,33,46)
- random decimal   ``#{number.randomDouble '3','1','1000'}`` (sql-client.sql:14,35)
- past date        ``#{date.past '100' 'DAYS'}``        (sql-client.sql:15)
- categorical      ``#{regexify '(low|medium|high){1}'}`` (sql-client.sql:16-17,36,47)
- names / phones   ``#{funnyName.name}``, ``#{phoneNumber.cellPhone}`` (sql-client.sql:32,34)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

NATION_NAMES = [
    "ALGERIA", "ARGENTINA", "BRAZIL", "CANADA", "EGYPT", "ETHIOPIA",
    "FRANCE", "GERMANY", "INDIA", "INDONESIA", "IRAN", "IRAQ", "JAPAN",
    "JORDAN", "KENYA", "MOROCCO", "MOZAMBIQUE", "PERU", "CHINA", "ROMANIA",
]
FIRST_NAMES = ["Alex", "Brook", "Casey", "Dana", "Ellis", "Flynn", "Gray", "Harper"]
LAST_NAMES = ["Stone", "Rivers", "Fields", "Woods", "Brooks", "Hayes", "Lane", "Cole"]
PRIORITIES = ["low", "medium", "high"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD"]


def _u(id_col: Column, salt: int, lo: int, hi: int) -> Column:
    """S3: deterministic uniform int in [lo, hi) from the row id."""
    return (F.pmod(F.xxhash64(id_col, F.lit(salt)), F.lit(hi - lo)) + lo).cast("int")


def _pick(id_col: Column, salt: int, values: list[str]) -> Column:
    """S6: deterministic categorical pick."""
    arr = F.array(*[F.lit(v) for v in values])
    return F.element_at(arr, _u(id_col, salt, 1, len(values) + 1))


def _decimal(id_col: Column, salt: int, lo: float, hi: float) -> Column:
    """S4: deterministic decimal in [lo, hi) with 2 dp."""
    frac = F.pmod(F.xxhash64(id_col, F.lit(salt)), F.lit(1_000_000)) / 1_000_000.0
    return (F.lit(lo) + frac * (hi - lo)).cast("decimal(15,2)")


def _order_columns(id_col: Column) -> dict[str, Column]:
    """fluss_order field expressions (sql-client.sql:9-18)."""
    return {
        "order_key": F.pmod(F.xxhash64(id_col, F.lit(1)), F.lit(100_000_000)),
        "cust_key": _u(id_col, 2, 0, 20),
        "total_price": _decimal(id_col, 3, 1.0, 1000.0),
        "order_date": F.date_sub(F.current_date(), _u(id_col, 4, 0, 100)),
        "order_priority": _pick(id_col, 5, PRIORITIES),
        "clerk": F.concat(F.lit("Clerk"), _u(id_col, 6, 1, 5).cast("string")),
    }


def _customer_columns(id_col: Column) -> dict[str, Column]:
    """fluss_customer field expressions (sql-client.sql:29-37)."""
    return {
        "cust_key": _u(id_col, 10, 0, 20),
        "name": F.concat_ws(
            " ", _pick(id_col, 11, FIRST_NAMES), _pick(id_col, 12, LAST_NAMES)
        ),
        "phone": F.concat(
            F.lit("+1-"),
            _u(id_col, 13, 100, 999).cast("string"),
            F.lit("-"),
            _u(id_col, 14, 1000, 9999).cast("string"),
        ),
        "nation_key": _u(id_col, 15, 1, 20),
        "acctbal": _decimal(id_col, 16, 1.0, 1000.0),
        "mktsegment": _pick(id_col, 17, SEGMENTS),
    }


def _nation_columns(id_col: Column) -> dict[str, Column]:
    """fluss_nation field expressions (sql-client.sql:44-48)."""
    key = _u(id_col, 20, 1, 20)
    return {
        "nation_key": key,
        "name": F.element_at(F.array(*[F.lit(n) for n in NATION_NAMES]), key),
    }


def _apply(df: DataFrame, cols: dict[str, Column]) -> DataFrame:
    return df.select(*[expr.alias(name) for name, expr in cols.items()])


# ---------- bounded (batch) sources: S1 ----------

def orders_batch(spark: SparkSession, n: int = 10_000) -> DataFrame:
    """Bounded order source (sql-client.sql:9-18: 10,000 rows)."""
    return _apply(spark.range(n), _order_columns(F.col("id")))


def customers_batch(spark: SparkSession, n: int = 200) -> DataFrame:
    """Bounded customer source (sql-client.sql:30: 200 generated rows,
    ≤20 live keys after upsert)."""
    return _apply(spark.range(n), _customer_columns(F.col("id")))


def nations_batch(spark: SparkSession, n: int = 100) -> DataFrame:
    """Bounded nation source (sql-client.sql:45: 100 rows, ≤19 keys)."""
    return _apply(spark.range(n), _nation_columns(F.col("id")))


# ---------- rate-limited unbounded sources: S2 ----------

def orders_stream(
    spark: SparkSession, rows_per_second: int = 10, number_of_rows: int | None = 10_000
) -> DataFrame:
    """Rate-limited streaming order source (sql-client.sql:10-11:
    rows-per-second=10 bounded at 10,000 rows)."""
    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
    if number_of_rows is not None:
        stream = stream.filter(F.col("value") < number_of_rows)
    return _apply(stream, _order_columns(F.col("value")))
