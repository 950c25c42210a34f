"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the star-join revenue rollup)
at sf0.001; ``queries()`` / ``oracle_sql()`` expose every implemented
operator from SURVEY.md §2 via the engine's central registry
(``substreams_sink_clickhouse_spark/registry.py``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from substreams_sink_clickhouse_spark.registry import all_specs
from substreams_sink_clickhouse_spark.session import tune_session

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from substreams_sink_clickhouse_spark.operators.relational import _q07

    tune_session(spark)
    return _q07(spark, _SMOKE_SF_DIR)


#: Prepared-plan cache: building a complex DataFrame plan costs
#: 0.1-0.4s of driver-side work (py4j + Catalyst analysis); a repeated
#: query on the same session + data dir reuses the analyzed plan, the
#: way a database reuses a prepared statement.  Keyed by session id so
#: per-profile child sessions each hold their own plans.
_PLAN_MEMO: dict[tuple, DataFrame] = {}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(name, builder):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            key = (id(spark), sf_dir, name)
            df = _PLAN_MEMO.get(key)
            if df is None:
                tune_session(spark)
                df = builder(spark, sf_dir)
                _PLAN_MEMO[key] = df
            return df

        return run

    return {spec.name: wrap(spec.name, spec.builder) for spec in all_specs()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for non-SQL ops)."""
    return {spec.name: spec.oracle for spec in all_specs() if spec.oracle is not None}
