"""Incrementally-maintained aggregates (ClickHouse materialized-view /
AggregatingMergeTree parity): folding batches one at a time must equal
aggregating everything at once."""

from pyspark.sql import functions as F

from substreams_sink_clickhouse_spark.streaming.mataggs import IncrementalAggregate


def _rows(spark, data):
    return spark.createDataFrame(data, "k: string, v: double")


def test_incremental_equals_batch(spark, tmp_path):
    agg = IncrementalAggregate(
        spark,
        str(tmp_path / "agg"),
        keys=["k"],
        measures={
            "cnt": ("count", "v"),
            "sv": ("sum", "v"),
            "mn": ("min", "v"),
            "mx": ("max", "v"),
        },
    )
    b1 = [("a", 1.0), ("a", 2.0), ("b", 10.0)]
    b2 = [("a", 4.0), ("c", -1.0)]
    b3 = [("b", 0.5), ("c", 7.0), ("c", 3.0)]
    agg.update(_rows(spark, b1), version=1)
    agg.update(_rows(spark, b2), version=2)
    agg.update(_rows(spark, b3), version=3)
    got = {
        r["k"]: (r["cnt"], r["sv"], r["mn"], r["mx"]) for r in agg.current().collect()
    }
    full = _rows(spark, b1 + b2 + b3).groupBy("k").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("v").alias("sv"),
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
    )
    want = {r["k"]: (r["cnt"], r["sv"], r["mn"], r["mx"]) for r in full.collect()}
    assert got == want


def test_new_groups_and_untouched_groups(spark, tmp_path):
    agg = IncrementalAggregate(
        spark, str(tmp_path / "agg2"), keys=["k"], measures={"cnt": ("count", "v")}
    )
    agg.update(_rows(spark, [("a", 1.0)]))
    agg.update(_rows(spark, [("b", 1.0)]))  # 'a' untouched, 'b' new
    got = {r["k"]: r["cnt"] for r in agg.current().collect()}
    assert got == {"a": 1, "b": 1}


def test_rejects_unknown_measure(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError, match="unsupported measure"):
        IncrementalAggregate(
            spark, str(tmp_path / "agg3"), keys=["k"], measures={"x": ("median", "v")}
        )
