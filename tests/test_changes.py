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


def test_protobuf_wire_roundtrip_pure_python():
    from substreams_sink_clickhouse_spark.sources.protobuf_wire import (
        encode_database_changes,
        parse_database_changes,
    )

    changes = [
        {"table": "block_meta", "pk": "b1", "ordinal": 1, "op": "CREATE",
         "fields": {"number": "100", "hash": "0xabc"}},
        {"table": "block_meta", "pk": "b1", "ordinal": 2, "op": "UPDATE",
         "fields": {"hash": "0xdef"}},
        {"table": "block_meta", "pk": "b2", "ordinal": 3, "op": "DELETE",
         "fields": {}},
    ]
    wire = encode_database_changes(changes)
    parsed = parse_database_changes(wire)
    assert parsed == changes


def test_protobuf_wire_cross_checked_against_google_protobuf():
    # when the real protobuf runtime is available, our hand-rolled
    # encoding must parse identically through it (schema-less probe)
    pytest.importorskip("google.protobuf")
    from google.protobuf.internal import decoder  # noqa: F401 (presence check)

    from substreams_sink_clickhouse_spark.sources.protobuf_wire import (
        encode_table_change,
        parse_table_change,
    )

    tc = encode_table_change("t", "k", 7, "UPDATE", {"a": "1"})
    assert parse_table_change(tc) == {
        "table": "t", "pk": "k", "ordinal": 7, "op": "UPDATE",
        "fields": {"a": "1"},
    }


def test_protobuf_decode_matches_json_decode(spark):
    import json

    from substreams_sink_clickhouse_spark.sources.changes import (
        decode_database_changes,
    )
    from substreams_sink_clickhouse_spark.sources.protobuf_wire import (
        decode_database_changes_protobuf_pure,
        encode_database_changes,
    )

    changes = [
        {"table": "block_meta", "pk": "b1", "ordinal": 1, "op": "CREATE",
         "fields": {"number": "100", "ts": "1700000000"}},
        {"table": "block_meta", "pk": "b2", "ordinal": 2, "op": "UPDATE",
         "fields": {"number": "101"}},
    ]
    # binary path
    wire = encode_database_changes(changes)
    raw_bin = spark.createDataFrame(
        [(5, "0xb5", bytearray(wire))], "block_num long, block_id string, value binary"
    )
    via_proto = decode_database_changes_protobuf_pure(raw_bin).collect()
    # JSON path on the equivalent payload
    msg = {
        "block_num": 5, "block_id": "0xb5",
        "table_changes": [
            {"table": c["table"], "pk": c["pk"], "ordinal": c["ordinal"],
             "operation": c["op"],
             "fields": [{"name": k, "new_value": v, "old_value": None}
                        for k, v in c["fields"].items()]}
            for c in changes
        ],
    }
    raw_json = spark.createDataFrame([(json.dumps(msg),)], "value string")
    via_json = decode_database_changes(raw_json).collect()
    key = lambda r: (r["block_num"], r["ordinal"])
    assert sorted([r.asDict() for r in via_proto], key=key) == sorted(
        [r.asDict() for r in via_json], key=key
    )


def test_protobuf_connector_falls_back_to_pure_decoder(spark):
    from substreams_sink_clickhouse_spark.sources.changes import (
        decode_database_changes_protobuf,
    )
    from substreams_sink_clickhouse_spark.sources.protobuf_wire import (
        encode_database_changes,
    )

    wire = encode_database_changes(
        [{"table": "t", "pk": "k", "ordinal": 1, "op": "CREATE",
          "fields": {"a": "1"}}]
    )
    raw = spark.createDataFrame(
        [(9, "0xb9", bytearray(wire))], "block_num long, block_id string, value binary"
    )
    # no connector jar in this container -> must route to the pure parser
    rows = decode_database_changes_protobuf(raw, "/tmp/nonexistent.desc").collect()
    assert [(r["block_num"], r["table"], r["op"], dict(r["fields"])) for r in rows] == [
        (9, "t", "CREATE", {"a": "1"})
    ]


def test_protobuf_wire_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from substreams_sink_clickhouse_spark.sources.protobuf_wire import (
        encode_database_changes,
        parse_database_changes,
    )

    text = st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40
    )
    change = st.fixed_dictionaries(
        {
            "table": st.sampled_from(["t1", "t2", "block_meta"]),
            "pk": text,
            "ordinal": st.integers(min_value=0, max_value=2**63 - 1),
            "op": st.sampled_from(["UNSET", "CREATE", "UPDATE", "DELETE"]),
            "fields": st.dictionaries(
                st.text(min_size=1, max_size=10), text, max_size=4
            ),
        }
    )

    @settings(max_examples=150, deadline=None)
    @given(st.lists(change, max_size=6))
    def roundtrip(changes):
        assert parse_database_changes(encode_database_changes(changes)) == changes

    roundtrip()


def test_varint_rejects_negative():
    from substreams_sink_clickhouse_spark.sources.protobuf_wire import _varint

    with pytest.raises(ValueError, match="non-negative"):
        _varint(-1)


def test_protobuf_fallback_refuses_other_message_types(spark):
    """Connector absent: the pure wire parser must only stand in for
    DatabaseChanges — any other message type is an error, not a silent
    mis-decode (round-1 advisory)."""
    from substreams_sink_clickhouse_spark.sources.changes import (
        decode_database_changes_protobuf,
        protobuf_connector_available,
    )

    if protobuf_connector_available(spark):
        pytest.skip("spark-protobuf connector present in this deployment")
    raw = spark.createDataFrame(
        [(1, "b1", bytearray(b"\x01"))], "block_num: long, block_id: string, value: binary"
    )
    with pytest.raises(NotImplementedError, match="only decodes"):
        decode_database_changes_protobuf(
            raw, "/tmp/whatever.desc", message_name="other.v1.Message"
        )


def test_missing_table_and_pk_normalize_to_proto3_defaults(spark):
    """A JSON change OMITTING table/pk decodes to empty strings (the
    proto3 wire default, pb/.../database.pb.go:122-132) — a NULL there
    would crash the flush summary's bucket math instead of raising the
    clean unknown-table error."""
    import json as _json

    from substreams_sink_clickhouse_spark.sources.changes import (
        decode_database_changes,
    )

    msg = _json.dumps(
        {
            "block_num": 1,
            "block_id": "b1",
            "table_changes": [
                {"ordinal": 1, "operation": "CREATE",
                 "fields": [{"name": "x", "new_value": "1", "old_value": None}]}
            ],
        }
    )
    df = spark.createDataFrame([(msg,)], "value string")
    row = decode_database_changes(df, "value").collect()[0]
    assert row["table"] == "" and row["pk"] == ""
