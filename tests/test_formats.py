"""Round-trip tests for the generic table-source formats."""

import pytest

from substreams_sink_clickhouse_spark.sources.formats import read_table, write_table
from substreams_sink_clickhouse_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "tsv", "json"])
def test_region_roundtrips_every_format(spark, tmp_path, fmt):
    src = load_table(spark, SF, "region")
    path = str(tmp_path / f"region_{fmt}")
    write_table(src, path, fmt)
    back = read_table(spark, path, fmt, schema=src.schema)
    key = lambda r: r["r_regionkey"]
    assert sorted((r.asDict() for r in back.collect()), key=key) == sorted(
        (r.asDict() for r in src.collect()), key=key
    )


def test_text_formats_refuse_schema_inference(spark):
    with pytest.raises(ValueError, match="explicit schema"):
        read_table(spark, "/tmp/x", "csv")
    with pytest.raises(ValueError, match="unsupported format"):
        read_table(spark, "/tmp/x", "avro")


def test_wire_codec_rejects_garbage():
    from substreams_sink_clickhouse_spark.sources.protobuf_wire import (
        parse_database_changes,
    )

    with pytest.raises((ValueError, IndexError)):
        parse_database_changes(b"\xff" * 12)  # unterminated varint
    with pytest.raises(ValueError):
        parse_database_changes(b"\x0a\x7f")  # length past end of buffer


def test_engine_register_external_queryable(spark, tmp_path):
    from substreams_sink_clickhouse_spark.engine import Engine

    src = load_table(spark, SF, "nation")
    path = str(tmp_path / "nation_csv")
    write_table(src, path, "csv")
    eng = Engine(spark)
    eng.register_external("nation_ext", path, "csv", schema=src.schema)
    out = eng.sql(
        "SELECT count(*) AS n, max(n_nationkey) AS mx FROM nation_ext"
    ).collect()[0]
    assert out["n"] == src.count()


def test_xml_round_trip(spark, tmp_path):
    """Spark 4 built-in XML source through the format layer
    (ClickHouse `file(..., XML)` parity; rowTag-framed rows)."""
    from pyspark.sql import types as T

    from substreams_sink_clickhouse_spark.sources.formats import (
        read_table,
        write_table,
    )

    df = spark.range(4).selectExpr("id", "concat('v', id) AS s")
    path = str(tmp_path / "x")
    write_table(df, path, "xml")
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("s", T.StringType())]
    )
    back = read_table(spark, path, "xml", schema=schema)
    assert sorted((r["id"], r["s"]) for r in back.collect()) == [
        (0, "v0"), (1, "v1"), (2, "v2"), (3, "v3"),
    ]
    import pytest

    with pytest.raises(ValueError, match="schema"):
        read_table(spark, path, "xml")
