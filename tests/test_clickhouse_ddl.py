"""ClickHouse DDL → catalog translation tests (the setup-path parity
surface: a reference deployment's schema.sql must translate directly,
/root/reference/devel/schema.sql:1-12 shape)."""

import pytest
from pyspark.sql import types as T

from substreams_sink_clickhouse_spark.sources.clickhouse_ddl import (
    catalog_from_clickhouse_ddl,
    parse_clickhouse_ddl,
    parse_clickhouse_type,
)

#: Same shape as the reference's example workload schema
#: (block_meta + cursors, ClickHouse MergeTree DDL with inline
#: PRIMARY KEY and no statement terminators).
_REFERENCE_SHAPE_DDL = """
CREATE TABLE block_meta
(
    id          String,
\tPRIMARY KEY (id),
    at          String,
    number      Int32,
    hash        String,
    parent_hash String,
    timestamp   String
)
ENGINE = MergeTree()
ORDER BY id

CREATE TABLE IF NOT EXISTS cursors
(
    id         String,
    cursor     String,
    block_num  Int64,
    block_id   String,
    PRIMARY KEY (id)
) ENGINE = MergeTree()
ORDER BY id
"""


def test_reference_shape_schema_parses():
    tables = {t.name: t for t in parse_clickhouse_ddl(_REFERENCE_SHAPE_DDL)}
    assert set(tables) == {"block_meta", "cursors"}
    bm = tables["block_meta"]
    assert bm.primary_key == "id"
    assert bm.schema.fieldNames() == [
        "id", "at", "number", "hash", "parent_hash", "timestamp",
    ]
    assert bm.schema["number"].dataType == T.IntegerType()
    assert bm.schema["id"].nullable is False
    cur = tables["cursors"]
    assert cur.schema["block_num"].dataType == T.LongType()
    assert cur.primary_key == "id"


def test_order_by_supplies_primary_key():
    ddl = """
    CREATE TABLE t (key String, v Float64) ENGINE = MergeTree()
    ORDER BY key
    """
    (t,) = parse_clickhouse_ddl(ddl)
    assert t.primary_key == "key"
    assert t.schema["key"].nullable is False


@pytest.mark.parametrize(
    "ch, spark",
    [
        ("String", T.StringType()),
        ("FixedString(16)", T.StringType()),
        ("UInt8", T.ShortType()),
        ("UInt64", T.DecimalType(20, 0)),
        ("Int64", T.LongType()),
        ("Float32", T.FloatType()),
        ("DateTime", T.TimestampType()),
        ("DateTime64(3)", T.TimestampType()),
        ("Date", T.DateType()),
        ("Decimal(18, 4)", T.DecimalType(18, 4)),
        ("Nullable(Int32)", T.IntegerType()),
        ("LowCardinality(String)", T.StringType()),
        ("Enum8('a' = 1, 'b' = 2)", T.StringType()),
        ("Array(UInt32)", T.ArrayType(T.LongType())),
        ("Map(String, Nullable(Int64))", T.MapType(T.StringType(), T.LongType())),
        ("Array(Array(Float64))", T.ArrayType(T.ArrayType(T.DoubleType()))),
    ],
)
def test_type_mapping(ch, spark):
    assert parse_clickhouse_type(ch) == spark


def test_unknown_type_raises():
    with pytest.raises(ValueError, match="unsupported ClickHouse type"):
        parse_clickhouse_type("AggregateFunction(sum, UInt64)")


def test_column_options_dropped():
    ddl = """
    CREATE TABLE t (
        id String,
        n Int32 DEFAULT 0,
        s String CODEC(ZSTD),
        PRIMARY KEY (id)
    ) ENGINE = MergeTree()
    """
    (t,) = parse_clickhouse_ddl(ddl)
    assert t.schema["n"].dataType == T.IntegerType()
    assert t.schema["s"].dataType == T.StringType()


def test_catalog_from_ddl_registers_everything():
    catalog = catalog_from_clickhouse_ddl(_REFERENCE_SHAPE_DDL)
    assert "block_meta" in catalog.tables
    assert catalog.get("cursors").primary_key == "id"


def test_alter_add_column_applied():
    ddl = """
CREATE TABLE t (id String, PRIMARY KEY (id), v Int64) ENGINE = MergeTree() ORDER BY id;
ALTER TABLE t ADD COLUMN gas_used UInt64;
ALTER TABLE t ADD COLUMN IF NOT EXISTS gas_used UInt64;
ALTER TABLE db.t ADD COLUMN note String DEFAULT '' AFTER v;
"""
    cat = catalog_from_clickhouse_ddl(ddl)
    schema = cat.get("t").schema
    assert "gas_used" in schema.fieldNames()
    assert "note" in schema.fieldNames()
    assert isinstance(schema["note"].dataType, T.StringType)
    # duplicate add WITHOUT IF NOT EXISTS raises
    with pytest.raises(ValueError, match="already exists"):
        catalog_from_clickhouse_ddl(ddl + "\nALTER TABLE t ADD COLUMN v Int64;")


def test_replacing_mergetree_with_clauses():
    """Real-world MergeTree DDL: engine arguments, PARTITION BY before
    ORDER BY, SETTINGS tail — all previously silently unparsed."""
    ddl = """
CREATE TABLE positions (
    id String,
    owner String,
    balance Float64,
    block_num UInt32
) ENGINE = ReplacingMergeTree(block_num)
PARTITION BY owner
ORDER BY (id, owner)
SETTINGS index_granularity = 8192;
"""
    (t,) = parse_clickhouse_ddl(ddl)
    assert t.primary_key == "id"  # first ORDER BY column, despite PARTITION BY in between
    assert t.engine == "ReplacingMergeTree"
    assert t.version_column == "block_num"


def test_table_level_primary_key_clause_after_engine():
    ddl = """
CREATE TABLE t (a String, b Int64)
ENGINE = MergeTree
PRIMARY KEY a
ORDER BY (a, b)
TTL now() + INTERVAL 1 DAY;
"""
    (t,) = parse_clickhouse_ddl(ddl)
    assert t.primary_key == "a"
    assert t.engine == "MergeTree"
    assert t.version_column is None


def test_tuple_order_by_falls_back_to_id_default():
    ddl = "CREATE TABLE t (id String, v Int64) ENGINE = MergeTree ORDER BY tuple();"
    (t,) = parse_clickhouse_ddl(ddl)
    assert t.primary_key == "id"


def test_collapse_versions_final_read(spark):
    from substreams_sink_clickhouse_spark.operators.merge import collapse_versions

    df = spark.createDataFrame(
        [("a", 1, "old"), ("a", 3, "new"), ("b", 2, "only"), ("a", 2, "mid")],
        "id string, ver int, payload string",
    )
    got = {
        (r["id"], r["ver"], r["payload"])
        for r in collapse_versions(df, "id", "ver").collect()
    }
    assert got == {("a", 3, "new"), ("b", 2, "only")}


def test_summing_mergetree_parse_and_collapse(spark):
    from substreams_sink_clickhouse_spark.operators.merge import collapse_summing

    ddl = """
CREATE TABLE daily_totals (day String, clicks Int64, cost Float64, note String)
ENGINE = SummingMergeTree((clicks, cost))
ORDER BY day;
"""
    (t,) = parse_clickhouse_ddl(ddl)
    assert t.engine == "SummingMergeTree"
    assert t.sum_columns == ["clicks", "cost"]
    assert t.primary_key == "day"

    df = spark.createDataFrame(
        [("d1", 2, 1.5, "a"), ("d1", 3, 2.5, "b"), ("d2", 1, 1.0, "z")],
        "day string, clicks long, cost double, note string",
    )
    got = {
        (r["day"], r["clicks"], r["cost"], r["note"])
        for r in collapse_summing(df, t.primary_key, t.sum_columns).collect()
    }
    assert got == {("d1", 5, 4.0, "b"), ("d2", 1, 1.0, "z")}

    # default (no engine args): every numeric non-key column sums
    got_default = {
        (r["day"], r["clicks"], r["cost"])
        for r in collapse_summing(df.drop("note"), "day", None).collect()
    }
    assert got_default == {("d1", 5, 4.0), ("d2", 1, 1.0)}


def test_ddl_roundtrip_render_then_parse():
    """SHOW CREATE parity: rendering a TableInfo to ClickHouse DDL and
    re-parsing it yields the same schema, pk, engine, and modifiers."""
    from pyspark.sql import types as T

    from substreams_sink_clickhouse_spark.catalog import TableInfo
    from substreams_sink_clickhouse_spark.sources.clickhouse_ddl import (
        catalog_from_clickhouse_ddl,
        render_clickhouse_ddl,
    )

    infos = [
        TableInfo(
            "plain",
            T.StructType(
                [
                    T.StructField("id", T.StringType(), False),
                    T.StructField("n", T.LongType()),
                    T.StructField("u", T.DecimalType(20, 0)),
                    T.StructField("tags", T.ArrayType(T.StringType())),
                    T.StructField("at", T.TimestampType()),
                ]
            ),
            "id",
        ),
        TableInfo(
            "versions",
            T.StructType(
                [
                    T.StructField("id", T.StringType(), False),
                    T.StructField("ver", T.LongType()),
                ]
            ),
            "id",
            engine="ReplacingMergeTree",
            version_column="ver",
        ),
        TableInfo(
            "sums",
            T.StructType(
                [
                    T.StructField("id", T.StringType(), False),
                    T.StructField("a", T.LongType()),
                    T.StructField("b", T.DoubleType()),
                ]
            ),
            "id",
            engine="SummingMergeTree",
            sum_columns=["a", "b"],
        ),
    ]
    for info in infos:
        ddl = render_clickhouse_ddl(info)
        cat = catalog_from_clickhouse_ddl(ddl)
        back = cat.get(info.name)
        assert back.schema == info.schema, (info.name, ddl)
        assert back.primary_key == info.primary_key
        assert back.engine == info.engine
        assert back.version_column == info.version_column
        assert back.sum_columns == info.sum_columns
