"""Smoke test: every registered query runs at sf0.001 and returns a
DataFrame with a stable schema.  (Value correctness is the DuckDB
oracle gate — tools/check_correctness.py.)"""

import pytest

from substreams_sink_clickhouse_spark.registry import all_specs

SF_DIR = "/root/testdata/sf0.001"

_SPECS = {s.name: s for s in all_specs()}


#: Since round 6 every entry carries an oracle (the approximate
#: sketches emit exact counts + validated error-bound booleans).
_ROWS_ONLY_OK: set[str] = set()


def test_registry_unique_and_oracled():
    specs = all_specs()
    assert len(specs) >= 40
    no_oracle = {s.name for s in specs if s.oracle is None}
    assert no_oracle <= _ROWS_ONLY_OK, no_oracle


@pytest.mark.parametrize("name", sorted(_SPECS))
def test_query_runs(spark, name):
    spec = _SPECS[name]
    df = spec.builder(spark, SF_DIR)
    rows = df.limit(5).collect() if name != "q25_watermark" else df.collect()
    assert df.columns, f"{name}: no columns"
    assert rows is not None
    # The external driver canonicalizes results with pandas sort/hash,
    # which crashes on complex-typed columns — render arrays/maps as
    # delimited strings instead (round-1 verdict; tools/audit_schemas.py
    # is the standalone form of this check).
    from pyspark.sql.types import ArrayType, MapType, StructType

    complex_cols = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not complex_cols, f"{name}: driver-hostile columns {complex_cols}"
