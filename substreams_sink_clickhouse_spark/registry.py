"""Central query registry: aggregates every operator module's specs.

``__spark_entry__.py`` derives its ``queries()`` / ``oracle_sql()``
contract from this registry, so adding a QuerySpec to any module is all
it takes to put an operator under the correctness gate.
"""

from __future__ import annotations

from substreams_sink_clickhouse_spark.operators.spec import QuerySpec

#: Prepared plans whose best execution profile is the interactive one
#: (AQE off + small static shuffle width — see QuerySpec.profile and
#: session.interactive_session).  Chosen by A/B measurement at sf0.1:
#: sub-second plans where AQE's stage-materialization jobs are pure
#: latency.  The join shapes qualify too once the warm buffer pool is
#: up — cached relations carry accurate size statistics, so the static
#: planner already makes the right broadcast decisions (measured:
#: q16's decorrelated agg broadcasts statically, 362ms -> 173ms).
#: Everything else stays adaptive — at cluster scale everything should.
_INTERACTIVE_PROFILE = {
    "q03_filter",
    "q04_agg",
    "q05_count_distinct",
    "q07_star_join",
    "q08_outer_join",
    "q12_window_rank",
    "q14_topk",
    "q16_correlated",
    "q18_dates",
    "q22_json",
    "q23_tumbling_window",
    "q24_session_window",
    "q26_last_op",
    "cdc_merge",
    "dedup_exact",
    "dedup_minhash",
    "sim_topk",
    "text_fingerprint",
    "multimodal_features",
    "corpus_prep",
}


def all_specs() -> list[QuerySpec]:
    from substreams_sink_clickhouse_spark.operators import (
        clickhouse_compat,
        clickhouse_compat_ext,
        clickhouse_compat_ext2,
        clickhouse_compat_ext3,
        clickhouse_compat_ext4,
        clickhouse_stats,
        dedup,
        dictionary,
        multimodal,
        relational,
        similarity,
        streaming_q,
        text,
        tpch,
        tpch_partsupp,
        training,
        udfs,
        window_ext,
    )

    specs: list[QuerySpec] = []
    for module in (
        relational,
        tpch,
        tpch_partsupp,
        streaming_q,
        clickhouse_compat,
        clickhouse_compat_ext,
        clickhouse_compat_ext2,
        clickhouse_compat_ext3,
        clickhouse_compat_ext4,
        clickhouse_stats,
        dictionary,
        udfs,
        dedup,
        similarity,
        text,
        training,
        window_ext,
        multimodal,
    ):
        specs.extend(module.SPECS)
    for s in specs:
        if s.name in _INTERACTIVE_PROFILE:
            s.profile = "interactive"
    names = [s.name for s in specs]
    if len(names) != len(set(names)):
        dupes = sorted({n for n in names if names.count(n) > 1})
        raise ValueError(f"duplicate query names in registry: {dupes}")
    return specs
