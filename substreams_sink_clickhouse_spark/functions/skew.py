"""Skew-mitigation primitives for 100 TB joins and aggregations.

AQE's skew-join splitting handles sort-merge joins automatically, but
two cases still need explicit salting at scale:

* broadcast-ineligible joins where one key dominates (the classic
  hot-key fact⋈fact join);
* ``collect_list``-style aggregations where one group holds a large
  fraction of all rows (hot bands in MinHash, hot shingles in the
  Jaccard join).

``salted_join`` replicates the (smaller) build side ``n_salts`` times
and scatters the probe side across salts, turning one hot partition
into ``n_salts`` even ones.  ``two_phase_agg`` pre-aggregates on a
salted key before the final combine — map-side combine for aggregates
Catalyst can't partially compute.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, key: str, n_salts: int, salt_col: str = "__salt") -> DataFrame:
    """Deterministic salt derived from a stable row hash — never
    ``rand()`` (breaks retries/resume)."""
    return df.withColumn(salt_col, F.pmod(F.xxhash64(*df.columns), F.lit(n_salts)))


def replicate_for_salt(df: DataFrame, n_salts: int, salt_col: str = "__salt") -> DataFrame:
    """Replicate every row once per salt value (build side)."""
    return df.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi join with hot-key scattering: probe rows spread over
    ``n_salts`` sub-partitions per key; build rows replicated to meet
    them.  Result is identical to ``probe.join(build, on, how)``."""
    salted_probe = with_salt(probe, on[0], n_salts)
    salted_build = replicate_for_salt(build, n_salts)
    out = salted_probe.join(salted_build, on + ["__salt"], how)
    return out.drop("__salt")


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Decouple a compute-dense stage's parallelism from its input
    splits.

    A small parquet file (one row group) scans as ONE partition, so a
    per-row-expensive stage downstream (per-shingle hashing, UDF feature
    extraction) runs on one core no matter how many the cluster has.
    Round-robin repartition fans it out.  No-op when the scan already
    has enough splits — always the case at real scale, where inputs
    have thousands of row groups — so this only fires on small inputs,
    where the extra shuffle is cheap.
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    try:
        current = df.rdd.getNumPartitions()
    except Exception:
        return df
    if current >= min(8, target):
        return df
    return df.repartition(target)


def two_phase_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    n_salts: int = 16,
) -> DataFrame:
    """Salted two-phase aggregation: phase 1 groups on (keys + salt),
    phase 2 combines the partials per key.  Use when a single group is
    large enough to bottleneck one reducer."""
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(*keys), F.lit(n_salts)))
    phase1 = salted.groupBy(*keys, "__salt").agg(*partial_aggs)
    return phase1.groupBy(*keys).agg(*final_aggs)
