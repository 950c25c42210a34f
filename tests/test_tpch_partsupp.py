"""Synthesized-partsupp properties and the Q2/Q11/Q16/Q20 plumbing."""

from __future__ import annotations

from pyspark.sql import functions as F

from substreams_sink_clickhouse_spark.operators.tpch_partsupp import load_partsupp

SF = "/root/testdata/sf0.001"


def test_partsupp_shape_and_determinism(spark):
    ps = load_partsupp(spark, SF)
    n_parts = spark.read.parquet(f"{SF}/part.parquet").count()
    n_supp = spark.read.parquet(f"{SF}/supplier.parquet").count()
    rows = ps.collect()
    assert len(rows) == 4 * n_parts  # TPC-H: 4 suppliers per part
    # supplier keys land inside the real supplier key space (0-based)
    assert all(0 <= r["ps_suppkey"] < n_supp for r in rows)
    assert all(1 <= r["ps_availqty"] <= 9999 for r in rows)
    assert all(1.0 <= r["ps_supplycost"] <= 1000.99 for r in rows)
    # cents column IS the cost (exact money math for Q11's threshold)
    assert all(abs(r["ps_cents"] / 100.0 - r["ps_supplycost"]) < 1e-12 for r in rows)
    # deterministic: a second build is bit-identical
    again = load_partsupp(spark, SF).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_partsupp_build_is_map_only(spark):
    # the loader must not shuffle: explode over part + a broadcast
    # 1-row count — no Exchange other than the broadcast
    plan = load_partsupp(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert "CartesianProduct" not in plan


def test_q2_min_cost_semantics(spark):
    from substreams_sink_clickhouse_spark.operators.tpch_partsupp import _tpch_q2

    out = _tpch_q2(spark, SF)
    assert set(out.columns) == {
        "s_acctbal", "s_name", "n_name", "p_partkey", "ps_supplycost"
    }
    rows = out.collect()
    # every returned (part, cost) is the min cost among returned rows
    # of the same part (the region-wide min property, weakened to the
    # observable set; the gate checks full equality vs DuckDB)
    by_part = {}
    for r in rows:
        by_part.setdefault(r["p_partkey"], set()).add(r["ps_supplycost"])
    assert all(len(costs) == 1 for costs in by_part.values())
