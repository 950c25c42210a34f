"""Query-spec plumbing shared by all operator modules."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

#: builder(spark, sf_dir) -> DataFrame
Builder = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    """One engine query: a Spark builder + (when SQL-expressible) the
    equivalent DuckDB oracle SQL.  Column names/aliases must agree
    between the two — the driver sorts columns by name before hashing.
    """

    name: str
    doc: str
    builder: Builder
    oracle: Optional[str] = None
