"""Plan-shape regression tests: pushdown, pruning, broadcast, top-k.

These pin the physical properties that matter at 100 TB (SURVEY §4):
pushed filters reach the parquet scan, projections prune the read
schema, dimension joins broadcast, top-k avoids a global sort.
"""

import pytest
from pyspark.sql import functions as F

from substreams_sink_clickhouse_spark.operators import relational as R
from substreams_sink_clickhouse_spark.plans.explain import (
    count_shuffles,
    has_broadcast,
    read_columns,
    scan_info,
    simple_plan,
)

SF = "/root/testdata/sf0.001"


def test_projection_prunes_scan(spark):
    df = R._q02(spark, SF)
    cols = read_columns(df, "orders")
    assert cols == {"o_orderkey", "o_totalprice"}, cols


def test_filters_pushed_to_scan(spark):
    df = R._q03(spark, SF)
    scans = scan_info(df)
    assert scans, "no parquet scan found"
    pushed = scans[0]["pushed_filters"]
    assert "l_shipdate" in pushed and "l_quantity" in pushed, pushed
    # projection pruning too: only the 4 referenced columns are read
    cols = read_columns(df, "lineitem")
    assert cols == {"l_orderkey", "l_linenumber", "l_shipdate", "l_discount", "l_quantity"}


def test_dimension_join_broadcasts(spark):
    assert has_broadcast(R._q06(spark, SF))


def test_star_join_broadcasts_dims(spark):
    df = R._q07(spark, SF)
    plan = simple_plan(df)
    assert plan.count("BroadcastHashJoin") >= 2, plan[:2000]


def test_topk_avoids_global_sort(spark):
    df = R._q14(spark, SF)
    assert "TakeOrderedAndProject" in simple_plan(df)
    assert count_shuffles(df) == 0


def test_agg_has_partial_and_final(spark):
    # Catalyst plans two-phase hash aggregation (map-side combine)
    plan = simple_plan(R._q04(spark, SF))
    assert plan.count("HashAggregate") >= 2, plan[:2000]


def test_scan_has_codegen(spark):
    from substreams_sink_clickhouse_spark.plans.explain import codegen_spans

    assert codegen_spans(R._q04(spark, SF)) >= 1


def test_minhash_has_no_join(spark):
    # bucket expansion replaced the band self-join: signatures are
    # computed once; candidate pairs come from groupBy + per-bucket
    # expansion, so the plan has no join operator at all
    from substreams_sink_clickhouse_spark.operators import dedup as D

    plan = simple_plan(D._dedup_minhash(spark, SF))
    assert "Join" not in plan, plan[:2000]


def test_simhash_has_no_join(spark):
    from substreams_sink_clickhouse_spark.operators import dedup as D

    plan = simple_plan(D._dedup_simhash(spark, SF))
    assert "Join" not in plan, plan[:2000]


def test_asof_join_is_union_plus_window(spark):
    # one window over the union — no join operator, no range explosion
    plan = simple_plan(R._q31_asof(spark, SF))
    assert "Join" not in plan, plan[:2000]
    assert "Window" in plan


def test_semantic_dedup_has_no_cross_cluster_pairs(spark):
    # SemDeDup candidates come from per-cluster bucket expansion over
    # plan-literal centroid assignment: no join operator anywhere, so
    # cross-cluster pairs are structurally impossible
    from substreams_sink_clickhouse_spark.operators import dedup as D

    df = D._dedup_semantic(spark, SF)
    plan = simple_plan(df)
    assert "Join" not in plan, plan[:2000]
    # 4 since round 12: the pair expansion carries its own explicit
    # (cluster, sub) exchange instead of reusing the window's
    # cluster-only one (AQE coalesced the expansion stage to ~2 tasks;
    # measured 8.4 -> 3.4 s noop on the 10x corpus — SCALE.md)
    assert count_shuffles(df) <= 4


def test_span_longest_streams_no_join(spark):
    # duplicated-ness is two streaming row_numbers over one hash
    # exchange; run chaining is the islands trick on the doc exchange:
    # no join, no count() buffering anywhere
    from substreams_sink_clickhouse_spark.operators import dedup as D

    df = D._dedup_span_longest(spark, SF)
    plan = simple_plan(df)
    assert "Join" not in plan, plan[:2000]
    assert "Window" in plan
    assert count_shuffles(df) <= 3


def test_span_scrub_streams_no_join(spark):
    # the scrub decision is a streaming row_number over the span-hash
    # partition: no join back on the hash, no per-hash array buffering
    from substreams_sink_clickhouse_spark.operators import dedup as D

    df = D._dedup_span_scrub(spark, SF)
    plan = simple_plan(df)
    assert "Join" not in plan, plan[:2000]
    assert "Window" in plan
    assert count_shuffles(df) <= 3


def test_dialect_asof_translation_is_bounded(spark):
    # the ClickHouse ASOF JOIN translation's common case (plain-column
    # ON) takes the same union+window shape as the native operator:
    # NO join fan-out before the pick — a hot key streams
    from substreams_sink_clickhouse_spark.operators import (
        clickhouse_compat_ext4 as C4,
    )

    df = C4._q187_dialect_asof_join(spark, SF)
    plan = simple_plan(df)
    assert "Join" not in plan, plan[:2000]
    assert "Window" in plan
    assert count_shuffles(df) <= 2


def test_cdc_merge_empty_target_skips_reconcile_join(spark):
    from substreams_sink_clickhouse_spark.operators import streaming_q as S

    plan = simple_plan(S._cdc_merge(spark, SF))
    assert "SortMergeJoin" not in plan, plan[:2000]


def test_ivf_uses_broadcast_only(spark):
    # centroid assignment + probed-list semi join must broadcast; the
    # corpus side never shuffles for a join
    from substreams_sink_clickhouse_spark.operators import similarity as SIM

    plan = simple_plan(SIM._sim_ivf(spark, SF))
    assert "SortMergeJoin" not in plan, plan[:2000]
    assert "Broadcast" in plan


def test_window_funnel_single_event_shuffle(spark):
    """q60: the three chained stage minima must reuse ONE user_id hash
    partitioning — the raw events scan feeds exactly one exchange, and
    no per-partition sort is required (whole-partition frames)."""
    from substreams_sink_clickhouse_spark.operators import clickhouse_compat as C

    plan = simple_plan(C._q60_window_funnel(spark, SF))
    # exchanges: events->user_id, then the tiny level aggregation + final
    # order-by; the events table itself is exchanged exactly once
    assert plan.count("hashpartitioning(user_id") == 1, plan[:3000]
    assert plan.count("Window") == 3


def test_chunking_is_narrow(spark):
    """text_chunk: no exchange before the final presentation sort —
    the fan-out + slice + hash pipeline is map-side only."""
    from substreams_sink_clickhouse_spark.operators import text as TX

    chunks_no_sort = TX._chunk(spark, SF)
    # strip the deterministic ORDER BY (gate presentation): everything
    # before it must be exchange-free
    plan = simple_plan(chunks_no_sort.limit(10**9))
    assert plan.count("Exchange") <= 1, plan[:3000]  # only the rangepartitioning sort


def test_decontaminate_corpus_never_shuffles_shingles(spark):
    """The benchmark shingle set broadcasts; no shuffle keyed on the
    exploded shingle column may appear on the corpus side."""
    from substreams_sink_clickhouse_spark.operators import dedup as D

    plan = simple_plan(D._dedup_decontaminate(spark, SF))
    assert "BroadcastHashJoin" in plan, plan[:3000]
    assert "SortMergeJoin" not in plan


def test_bucket_expansion_equals_self_join(spark):
    """The pair-generation rewrite must be value-identical to the
    self-join it replaced, including duplicate ids within a bucket and
    multi-bucket membership."""
    from pyspark.sql import functions as F

    from substreams_sink_clickhouse_spark.operators.dedup import _pair_rows

    rows = [(b, d) for b, ds in
            [(0, [3, 1, 2]), (1, [5]), (2, [7, 7, 8]), (3, [9, 4, 6, 2])]
            for d in ds]
    bands = spark.createDataFrame(rows, "band: int, doc_id: int")
    a, b = bands.alias("a"), bands.alias("b")
    join_pairs = sorted(
        (r["da"], r["db"])
        for r in a.join(
            b,
            (F.col("a.band") == F.col("b.band")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .distinct()
        .collect()
    )
    buckets = (
        bands.groupBy("band")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    expand_pairs = sorted(
        (r["doc_a"], r["doc_b"])
        for r in _pair_rows(buckets, "ids")
        .select(F.col("x").alias("doc_a"), F.col("y").alias("doc_b"))
        .distinct()
        .collect()
    )
    assert expand_pairs == join_pairs


def test_tpch_q19_single_predicate_broadcast(spark):
    # the OR'd brackets must stay one BroadcastHashJoin + residual,
    # not a union of three scans
    from substreams_sink_clickhouse_spark.operators.tpch import _tpch_q19

    plan = simple_plan(_tpch_q19(spark, SF))
    assert plan.count("BroadcastHashJoin") == 1, plan[:2000]
    assert plan.count("FileScan parquet") == 2, plan[:2000]


def test_tpch_q18_scans_lineitem_once(spark):
    # the HAVING aggregate broadcasts back; lineitem is read one time
    from substreams_sink_clickhouse_spark.operators.tpch import _tpch_q18

    plan = simple_plan(_tpch_q18(spark, SF))
    assert plan.count("lineitem.parquet") == 1, plan[:3000]


def test_train_mix_filter_rides_scan(spark):
    # mixture control must be a map-only filter on the scan: no
    # shuffle before the aggregate's exchange pair (agg + sort)
    from substreams_sink_clickhouse_spark.operators.training import _train_mix

    df = _train_mix(spark, SF)
    assert count_shuffles(df) <= 2, simple_plan(df)[:2000]
    cols = read_columns(df, "documents")
    assert cols == {"doc_id", "source", "n_chars"}, cols


def test_shuffle_hash_hint_respected(spark):
    # physical-strategy control: a SHUFFLE_HASH hint must produce a
    # ShuffledHashJoin (no sort on either side) — the right choice when
    # one side is small-ish but over the broadcast threshold
    from substreams_sink_clickhouse_spark.sources.tables import load_table

    l = load_table(spark, SF, "lineitem")
    o = load_table(spark, SF, "orders").hint("shuffle_hash")
    plan = simple_plan(l.join(o, l.l_orderkey == o.o_orderkey))
    assert "ShuffledHashJoin" in plan, plan[:2000]


def test_bucketed_tables_join_without_exchange(spark, tmp_path):
    # bucketing = the 100 TB co-located-join tool: two tables bucketed
    # by the join key join with ZERO Exchange operators in the plan
    import uuid

    from substreams_sink_clickhouse_spark.sources.tables import load_table

    suffix = uuid.uuid4().hex[:8]
    lt, ot = f"l_bkt_{suffix}", f"o_bkt_{suffix}"
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        (load_table(spark, SF, "lineitem")
         .select("l_orderkey", "l_quantity")
         .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
         .mode("overwrite").saveAsTable(lt))
        (load_table(spark, SF, "orders")
         .select("o_orderkey", "o_totalprice")
         .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
         .mode("overwrite").saveAsTable(ot))
        joined = spark.table(lt).join(
            spark.table(ot), F.col("l_orderkey") == F.col("o_orderkey")
        )
        plan = simple_plan(joined)
        assert "Exchange" not in plan, plan[:3000]
        assert joined.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql(f"DROP TABLE IF EXISTS {lt}")
        spark.sql(f"DROP TABLE IF EXISTS {ot}")


def test_pq_encode_is_zero_shuffle(spark):
    """sim_pq: the codebook is plan literals; encoding must be a pure
    row-local projection — no Exchange anywhere above the scan."""
    from substreams_sink_clickhouse_spark.operators.similarity import _sim_pq

    df = _sim_pq(spark, SF)
    assert count_shuffles(df) == 0, simple_plan(df)


def test_pq_adc_search_is_scan_plus_topk(spark):
    """sim_pq_adc: distance tables are plan literals; the search is a
    scan + TakeOrdered — no Exchange, no join."""
    from substreams_sink_clickhouse_spark.operators.similarity import _sim_pq_adc

    df = _sim_pq_adc(spark, SF)
    plan = simple_plan(df)
    assert count_shuffles(df) == 0, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "Join" not in plan, plan


def test_with_totals_is_single_scan_expand(spark):
    """q108: WITH TOTALS must come from ONE scan via rollup Expand,
    never a union of two aggregations."""
    from substreams_sink_clickhouse_spark.operators.clickhouse_compat_ext2 import (
        _q108_with_totals,
    )

    df = _q108_with_totals(spark, SF)
    plan = simple_plan(df)
    assert plan.count("Scan parquet") <= 1, plan
    assert "Expand" in plan, plan
    assert "Union" not in plan, plan


def test_interval_ops_sort_within_key_partitions_only(spark):
    # q111/q112 sort only inside the per-key window partitions: one
    # exchange on the group key, no global sort before the final
    # presentation orderBy
    from substreams_sink_clickhouse_spark.operators import clickhouse_compat_ext3 as C3

    for fn in (C3._q111_interval_length_sum, C3._q112_max_intersections):
        plan = simple_plan(fn(spark, SF))
        assert "CartesianProduct" not in plan
        assert "Join" not in plan, plan[:1500]


def test_ks_and_mwu_window_over_grouped_values(spark):
    # q114/q115 must aggregate per distinct value BEFORE the ordered
    # window: the exchange carries value cardinality, not row count.
    # In the optimized plan the HashAggregate sits below the Window.
    from substreams_sink_clickhouse_spark.operators import clickhouse_compat_ext3 as C3

    for fn in (C3._q114_ks_test, C3._q115_mannwhitney_u):
        plan = simple_plan(fn(spark, SF))
        assert "Window" in plan
        i_agg = plan.find("HashAggregate")
        assert i_agg != -1
        i_win = plan.find("Window")
        # the plan prints top-down: the *last* HashAggregate line is the
        # pre-window per-value rollup and must appear after Window
        assert plan.rfind("HashAggregate") > i_win, plan[:1500]


def test_bit_aggs_single_exchange_partial_final(spark):
    from substreams_sink_clickhouse_spark.operators import clickhouse_compat_ext3 as C3

    df = C3._q116_bit_aggs(spark, SF)
    plan = simple_plan(df)
    assert plan.count("HashAggregate") >= 2, plan[:1500]
    cols = read_columns(df, "orders")
    assert cols == {"o_orderpriority", "o_orderkey"}, cols


def test_tpch_q7_fact_joins_once_dims_broadcast(spark):
    from substreams_sink_clickhouse_spark.operators import tpch as T

    df = T._tpch_q7(spark, SF)
    plan = simple_plan(df)
    # supplier, customer, and both nation roles broadcast
    assert plan.count("BroadcastHashJoin") >= 4, plan[:2000]
    # ship-date filter reaches the lineitem scan
    scans = scan_info(df)
    li = [s for s in scans if "lineitem" in s.get("location", "")]
    assert li and "l_shipdate" in li[0]["pushed_filters"], scans


def test_tpch_q15_reuses_revenue_aggregate(spark):
    from substreams_sink_clickhouse_spark.operators import tpch as T

    plan = simple_plan(T._tpch_q15(spark, SF))
    # the revenue view feeds both the scalar max and the equality probe
    # off one aggregation (ReusedExchange or a reused subquery stage)
    assert "ReusedExchange" in plan or plan.count("HashAggregate") >= 2, plan[:2000]


def test_gopher_rules_is_narrow_map_only(spark):
    from substreams_sink_clickhouse_spark.operators import text as TX

    df = TX._gopher_rules(spark, SF)
    # one parquet scan of exactly (doc_id, text); no join, no mid-plan
    # exchange besides the presentation sort
    cols = read_columns(df, "documents")
    assert cols == {"doc_id", "text"}, cols
    plan = simple_plan(df)
    assert "Join" not in plan, plan[:1500]


def test_knn_join_lsh_has_no_cross_join(spark):
    # the scale route for batch retrieval: candidates from an
    # equi-join on the bucket id, never a cartesian/cross product
    from substreams_sink_clickhouse_spark.operators import similarity as S2

    plan = simple_plan(S2._sim_knn_join_lsh(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan, plan[:1500]


def test_q08_aggregates_below_outer_join(spark):
    # TPC-H Q13 shape: per-custkey counts collapse BEFORE the outer
    # join — the join input carries customer cardinality, not order
    # cardinality (the printed plan shows the aggregate under the
    # join's build/stream side, not above the join)
    plan = simple_plan(R._q08(spark, SF))
    i_join = plan.find("Join")
    assert i_join != -1, plan[:1500]
    assert "HashAggregate" in plan[i_join:], plan[:2000]


def test_range_join_is_equi_not_nested_loop(spark):
    """The bucketed interval self-join must plan as an equi join on
    (user, bin) — a BNLJ/cartesian here is the quadratic 100 TB
    killer the rewrite exists to avoid."""
    from substreams_sink_clickhouse_spark.operators.relational import (
        _q133_range_join,
    )

    plan = (
        _q133_range_join(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    )


def test_tpch_q1_map_side_partials(spark):
    # Q1 is scan + partial agg + 6-row exchange: exactly one shuffle,
    # pushed shipdate filter, only the 7 referenced columns read
    from substreams_sink_clickhouse_spark.operators.tpch import _tpch_q1

    df = _tpch_q1(spark, SF)
    assert count_shuffles(df) <= 2, simple_plan(df)[:2000]  # agg + sort
    scans = scan_info(df)
    assert any("l_shipdate" in s["pushed_filters"] for s in scans)
    cols = read_columns(df, "lineitem")
    assert cols == {
        "l_returnflag", "l_linestatus", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_shipdate",
    }, cols


def test_tpch_q5_fact_shuffles_once(spark):
    # supplier/nation/region broadcast; lineitem scanned once and
    # shuffled only for the orders join
    from substreams_sink_clickhouse_spark.operators.tpch import _tpch_q5

    df = _tpch_q5(spark, SF)
    plan = simple_plan(df)
    assert plan.count("lineitem.parquet") == 1, plan[:3000]
    assert plan.count("BroadcastHashJoin") >= 3, plan[:3000]


def test_tpch_q21_reuses_orderkey_exchange(spark):
    # the per-order aggregate and the late-rows join key on the same
    # l_orderkey partitioning; lineitem must not be scanned 3x as the
    # naive EXISTS/NOT-EXISTS self-join pair would
    from substreams_sink_clickhouse_spark.operators.tpch import _tpch_q21

    df = _tpch_q21(spark, SF)
    plan = simple_plan(df)
    assert plan.count("lineitem.parquet") <= 2, plan[:3000]
    assert "CartesianProduct" not in plan


def test_lttb_small_series_pass_through(spark):
    from substreams_sink_clickhouse_spark.operators.window_ext import lttb

    df = spark.createDataFrame(
        [("a", i, float(i % 3)) for i in range(5)], "g string, x long, y double"
    )
    out = lttb(df, ["g"], "x", "y", 20).collect()
    assert [(r.x, r.y) for r in out] == [(i, float(i % 3)) for i in range(5)]


def test_lttb_keeps_endpoints_and_bucket_count(spark):
    from substreams_sink_clickhouse_spark.operators.window_ext import lttb

    rows = [("a", i, float((i * 37) % 101)) for i in range(200)]
    df = spark.createDataFrame(rows, "g string, x long, y double")
    out = [(r.x, r.y) for r in lttb(df, ["g"], "x", "y", 12).collect()]
    assert len(out) == 12
    assert out[0] == (0, 0.0) and out[-1] == (199, float((199 * 37) % 101))
    assert [x for x, _ in out] == sorted(x for x, _ in out)


def test_lttb_peak_survives_downsampling(spark):
    # the visual guarantee: an isolated spike must be selected
    from substreams_sink_clickhouse_spark.operators.window_ext import lttb

    rows = [("a", i, 1000.0 if i == 57 else 1.0) for i in range(300)]
    df = spark.createDataFrame(rows, "g string, x long, y double")
    out = [(r.x, r.y) for r in lttb(df, ["g"], "x", "y", 10).collect()]
    assert (57, 1000.0) in out and len(out) == 10


def test_session_window_single_exchange(spark):
    """q24's plan: one exchange (partition by user) feeds both the
    session assembly and the aggregate — a second exchange here was
    the round-5 bench's suspected regression (it proved to be host
    load: 0.133 s at matched loadavg vs r4's 0.131 s), so the shape
    is pinned either way."""
    import __spark_entry__ as E

    df = E.queries()["q24_session_window"](spark, SF)
    assert count_shuffles(df) == 1


def test_theils_u_join_free_single_exchange(spark):
    """theilsU folds both entropies from per-cell window sums — no
    joins at all (the 1-row broadcast crossJoins it used through
    round 5 planned as BroadcastNestedLoopJoins)."""
    from substreams_sink_clickhouse_spark.operators.clickhouse_compat_ext3 import (
        _q113_theils_u,
    )

    df = _q113_theils_u(spark, SF)
    plan = simple_plan(df)
    assert "Join" not in plan, plan
    assert count_shuffles(df) <= 2


def test_ivf_pq_broadcast_only_scan_topk(spark):
    """sim_ivf_pq: list pruning must be a broadcast semi join and the
    ADC distances plan literals — no sort-merge join, one TakeOrdered,
    no extra exchange beyond the coarse-assignment window."""
    from substreams_sink_clickhouse_spark.operators import similarity as SIM

    df = SIM._sim_ivf_pq(spark, SF)
    plan = simple_plan(df)
    assert "SortMergeJoin" not in plan, plan[:2000]
    assert "Broadcast" in plan, plan[:2000]
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    assert count_shuffles(df) <= 2, plan[:2000]


def test_matryoshka_zero_shuffle(spark):
    """sim_matryoshka: every leg is a TakeOrdered over the scan; the
    10-row rank windows and overlap joins must add no exchange."""
    from substreams_sink_clickhouse_spark.operators import similarity as SIM

    df = SIM._sim_matryoshka(spark, SF)
    assert count_shuffles(df) == 0, simple_plan(df)[:2000]
    assert "CartesianProduct" not in simple_plan(df)
