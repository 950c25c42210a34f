"""Dictionary (dictGet) operator: literal-map vs broadcast-join
equivalence, default handling, size cap, and the no-join plan shape."""

import pytest
from pyspark.sql import functions as F

from substreams_sink_clickhouse_spark.operators import dictionary as D
from substreams_sink_clickhouse_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_dict_get_matches_broadcast_join(spark):
    nation = load_table(spark, SF, "nation")
    cust = load_table(spark, SF, "customer")
    lookup = D.dict_get(nation, "n_nationkey", "n_name")
    via_map = cust.select("c_custkey", lookup(F.col("c_nationkey")).alias("nation"))
    via_join = D.dict_join(
        cust, nation, "c_nationkey", "n_nationkey", "n_name", "nation"
    ).select("c_custkey", "nation")
    assert sorted(map(tuple, via_map.collect())) == sorted(map(tuple, via_join.collect()))


def test_dict_get_default_for_misses(spark):
    dim = spark.range(3).select(
        F.col("id").alias("k"), F.concat(F.lit("v"), F.col("id")).alias("v")
    )
    lookup = D.dict_get(dim, "k", "v", default="miss")
    probe = spark.range(5).select(F.col("id").alias("k"))
    got = {
        r["k"]: r["res"]
        for r in probe.select("k", lookup(F.col("k")).alias("res")).collect()
    }
    assert got == {0: "v0", 1: "v1", 2: "v2", 3: "miss", 4: "miss"}


def test_dict_get_null_without_default(spark):
    dim = spark.range(2).select(F.col("id").alias("k"), F.col("id").alias("v"))
    lookup = D.dict_get(dim, "k", "v")
    probe = spark.range(4).select(F.col("id").alias("k"))
    vals = [r["res"] for r in probe.orderBy("k").select(lookup(F.col("k")).alias("res")).collect()]
    assert vals == [0, 1, None, None]


def test_dict_too_large_raises(monkeypatch, spark):
    monkeypatch.setattr(D, "MAX_INLINE_ENTRIES", 2)
    dim = spark.range(5).select(F.col("id").alias("k"), F.col("id").alias("v"))
    with pytest.raises(D.DictionaryTooLargeError):
        D.dict_get(dim, "k", "v")


def test_q59_plan_has_no_join(spark):
    df = D._q59_dict_get(spark, SF)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan, plan
