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
    #: Execution profile the engine's query server prefers for this
    #: prepared plan (see ``session.interactive_session``):
    #:
    #: * ``"adaptive"`` — AQE on.  Right whenever runtime statistics
    #:   change the plan: join-heavy shapes where AQE's runtime
    #:   broadcast conversion / skew splitting is worth its per-stage
    #:   materialization jobs.  Always right at cluster scale.
    #: * ``"interactive"`` — AQE off + small static shuffle width.
    #:   Right for sub-second plans whose physical strategy is already
    #:   decided (narrow scans, single aggregates, fixed broadcast
    #:   hints): AQE's stage-by-stage job materialization is pure
    #:   latency there (measured 1.5-2x on such queries at sf0.1).
    #:
    #: Profile selection is a property of the prepared plan, the way a
    #: database attaches hints/feedback to a plan-cache entry; the
    #: correctness path ignores it (results are identical by
    #: construction — only scheduling differs).
    profile: str = "adaptive"
