"""Central query registry: aggregates every operator module's specs.

``__spark_entry__.py`` derives its ``queries()`` / ``oracle_sql()``
contract from this registry, so adding a QuerySpec to any module is all
it takes to put an operator under the correctness gate.
"""

from __future__ import annotations

from substreams_sink_clickhouse_spark.operators.spec import QuerySpec


def all_specs() -> list[QuerySpec]:
    from substreams_sink_clickhouse_spark.operators import (
        clickhouse_compat,
        clickhouse_compat_ext,
        clickhouse_stats,
        dedup,
        dictionary,
        multimodal,
        relational,
        similarity,
        streaming_q,
        text,
        tpch,
        training,
        udfs,
        window_ext,
    )

    specs: list[QuerySpec] = []
    for module in (
        relational,
        tpch,
        streaming_q,
        clickhouse_compat,
        clickhouse_compat_ext,
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
    names = [s.name for s in specs]
    if len(names) != len(set(names)):
        dupes = sorted({n for n in names if names.count(n) > 1})
        raise ValueError(f"duplicate query names in registry: {dupes}")
    return specs
