"""Parquet fixture-table loading.

All query-surface operators read the driver's TPC-H-ish parquet tables
(TESTDATA.md).  The ``events`` fixture's ``ts`` physical type varies by
generation run: TIMESTAMP(NANOS) (which Spark's vectorized reader
rejects — read via ``spark.sql.legacy.parquet.nanosAsLong`` and
convert, losslessly, since the data is microsecond-granular) or plain
TIMESTAMP(MICROS) (read natively).  The conversion is applied only
when the column actually resolves as bigint, so both shapes work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from substreams_sink_clickhouse_spark.session import tune_session

TABLE_NAMES = [
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
]

#: Columns that arrive as long nanos under ``nanosAsLong`` and must be
#: converted back to TimestampType.
_NANOS_COLUMNS = {"events": ["ts"]}

#: Plan-object memo: re-reading the same table re-lists files and
#: re-reads parquet footers on the driver (~100 ms each) — pure
#: overhead when many queries hit the same tables in one session.
_PLAN_CACHE: dict[tuple[int, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table; normalize nano-timestamp columns.
    Memoizes the DataFrame (logical plan) per (session, dir, table)."""
    tune_session(spark)
    key = (id(spark.sparkContext), sf_dir, name)
    if key in _PLAN_CACHE:
        return _PLAN_CACHE[key]
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANOS_COLUMNS.get(name, []):
        if dict(df.dtypes).get(col) == "bigint":
            # integer nanos -> micros (exact: fixture is micro-granular)
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    _PLAN_CACHE[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in (names or TABLE_NAMES)}


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register fixture tables as temp views for ``spark.sql`` queries."""
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)
