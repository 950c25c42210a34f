"""Changes decode + validation tests (O2/O3/O4)."""

import json

import pytest
from pyspark.sql import types as T

from substreams_sink_clickhouse_spark.catalog import Catalog, TableInfo
from substreams_sink_clickhouse_spark.errors import UnknownTableError
from substreams_sink_clickhouse_spark.sources.changes import (
    decode_database_changes,
    read_changes_jsonl,
    validate_change_tables,
)


def _msg(block_num=1, table="t", pk="k", op="CREATE", fields=None):
    return {
        "block_num": block_num,
        "block_id": f"0x{block_num:x}",
        "table_changes": [
            {
                "table": table,
                "pk": pk,
                "ordinal": 1,
                "operation": op,
                "fields": [
                    {"name": n, "new_value": v, "old_value": None}
                    for n, v in (fields or {"a": "1"}).items()
                ],
            }
        ],
    }


def test_decode_flattens_and_projects_new_values(spark):
    raw = spark.createDataFrame([(json.dumps(_msg(fields={"a": "1", "b": "x"})),)], "value string")
    rows = decode_database_changes(raw).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["block_num"], r["table"], r["pk"], r["op"]) == (1, "t", "k", "CREATE")
    # old_value dropped, new values kept (sinker.go:147-151)
    assert r["fields"] == {"a": "1", "b": "x"}


def test_read_jsonl(spark, tmp_path):
    path = tmp_path / "changes.jsonl"
    path.write_text("\n".join(json.dumps(_msg(block_num=i)) for i in range(1, 4)))
    rows = read_changes_jsonl(spark, str(path)).collect()
    assert sorted(r["block_num"] for r in rows) == [1, 2, 3]


def test_validate_unknown_table_raises(spark, changes_df):
    cat = Catalog()
    cat.register(TableInfo("known", T.StructType([T.StructField("id", T.StringType())]), "id"))
    changes = changes_df([(1, "b", 1, "nope", "k", "CREATE", {"id": "1"})])
    with pytest.raises(UnknownTableError, match="nope"):
        validate_change_tables(changes, cat)


def test_validate_known_table_passes(spark, changes_df):
    cat = Catalog()
    cat.register(TableInfo("known", T.StructType([T.StructField("id", T.StringType())]), "id"))
    changes = changes_df([(1, "b", 1, "known", "k", "CREATE", {"id": "1"})])
    validate_change_tables(changes, cat)  # no raise


def test_protobuf_decode_gated(spark):
    """No spark-protobuf connector in this container: the protobuf wire
    path must degrade to an actionable error, not a raw ClassNotFound."""
    import pytest

    from substreams_sink_clickhouse_spark.sources.changes import (
        decode_database_changes_protobuf,
    )

    raw = spark.createDataFrame([(bytearray(b"\x01"),)], "value: binary")
    with pytest.raises(NotImplementedError, match="spark-protobuf"):
        decode_database_changes_protobuf(raw, "/tmp/nonexistent.desc").collect()


def test_kafka_source_gated(spark):
    """No spark-sql-kafka connector in this container: the Kafka
    transport must degrade to an actionable error."""
    import pytest

    from substreams_sink_clickhouse_spark.sources.changes import read_changes_kafka

    with pytest.raises(NotImplementedError, match="spark-sql-kafka"):
        read_changes_kafka(spark, "localhost:9092", "changes")
