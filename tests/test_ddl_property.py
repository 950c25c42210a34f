"""Property-based ClickHouse-DDL parser test: render a random schema as
DDL (with random engine family, clause order, separators, whitespace,
and column options) and assert the parse recovers the schema exactly.

Pure-Python — no Spark session needed.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from substreams_sink_clickhouse_spark.sources.clickhouse_ddl import (
    parse_clickhouse_ddl,
)

#: (ClickHouse type text, expected Spark type) — one per scalar family.
_TYPES = [
    ("String", T.StringType()),
    ("Nullable(String)", T.StringType()),
    ("LowCardinality(String)", T.StringType()),
    ("Bool", T.BooleanType()),
    ("Int32", T.IntegerType()),
    ("Int64", T.LongType()),
    ("UInt64", T.DecimalType(20, 0)),
    ("Float64", T.DoubleType()),
    ("DateTime", T.TimestampType()),
    ("DateTime64(3)", T.TimestampType()),
    ("Decimal(10, 2)", T.DecimalType(10, 2)),
    ("Array(Int64)", T.ArrayType(T.LongType())),
    ("Map(String, Int64)", T.MapType(T.StringType(), T.LongType())),
]

_NAME = st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True)
_COLS = st.lists(
    st.tuples(_NAME, st.sampled_from(_TYPES)),
    min_size=1,
    max_size=6,
    unique_by=lambda t: t[0],
)
_OPTION = st.sampled_from(["", " DEFAULT 0", " CODEC(ZSTD)", " COMMENT 'c'"])
_WS = st.sampled_from([" ", "\n", "\n    "])


@st.composite
def _ddl_case(draw):
    cols = draw(_COLS)
    pk = cols[0][0]
    engine = draw(
        st.sampled_from(
            ["MergeTree", "MergeTree()", f"ReplacingMergeTree({pk})", "TinyLog"]
        )
    )
    # table-level clauses after ENGINE, in random order; ORDER BY always
    # present so the primary key is well-defined
    clauses = [f"ORDER BY ({pk})"]
    if draw(st.booleans()):
        clauses.append(f"PARTITION BY {pk}")
    if draw(st.booleans()):
        clauses.append("SETTINGS index_granularity = 8192")
    clauses = draw(st.permutations(clauses))
    ws = draw(_WS)
    col_defs = []
    for name, (ch_type, _) in cols:
        col_defs.append(f"{name} {ch_type}{draw(_OPTION)}")
    sep = draw(st.sampled_from([";", "", ";\n"]))
    ddl = (
        f"CREATE TABLE t ({ws}{(',' + ws).join(col_defs)}{ws})"
        f"{ws}ENGINE = {engine}{ws}{ws.join(clauses)}{sep}"
    )
    return ddl, cols, pk, engine


@settings(max_examples=200, deadline=None)
@given(_ddl_case())
def test_ddl_roundtrip(case):
    ddl, cols, pk, engine = case
    (t,) = parse_clickhouse_ddl(ddl)
    assert t.name == "t"
    assert t.primary_key == pk
    assert t.schema.fieldNames() == [name for name, _ in cols]
    for name, (_, expected) in cols:
        assert t.schema[name].dataType == expected, (name, ddl)
        assert t.schema[name].nullable == (name != pk)
    assert t.engine == engine.split("(")[0]
    if engine.startswith("ReplacingMergeTree("):
        assert t.version_column == pk
    else:
        assert t.version_column is None


@settings(max_examples=50, deadline=None)
@given(st.lists(_ddl_case(), min_size=2, max_size=3))
def test_ddl_multi_statement(cases):
    """Multiple statements parse independently regardless of separator
    style (the reference's schema file has no semicolons)."""
    ddl = "\n".join(c[0].replace("CREATE TABLE t", f"CREATE TABLE t{i}") for i, c in enumerate(cases))
    tables = parse_clickhouse_ddl(ddl)
    assert [t.name for t in tables] == [f"t{i}" for i in range(len(cases))]
    for t, (_, cols, pk, _) in zip(tables, cases):
        assert t.primary_key == pk
        assert t.schema.fieldNames() == [name for name, _ in cols]
