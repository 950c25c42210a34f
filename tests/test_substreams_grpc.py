"""Live-transport client without the socket: request encoding, response
parsing, cursor resume, reorg signals, spooling, and the spool ->
pipeline integration — everything the gRPC leg does except connect().
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from substreams_sink_clickhouse_spark.catalog import Catalog, TableInfo
from substreams_sink_clickhouse_spark.sources.protobuf_wire import (
    _fields_of,
    _len_delim,
    _varint_field,
    encode_database_changes,
)
from substreams_sink_clickhouse_spark.sources.substreams_grpc import (
    ACCEPTED_TYPE_URLS,
    BlockScopedData,
    BlockUndoSignal,
    SubstreamsLiveSource,
    encode_blocks_request,
    parse_block_range,
    parse_response,
)


def test_parse_block_range():
    assert parse_block_range("") == (0, None)
    assert parse_block_range("100:200") == (100, 200)
    assert parse_block_range("100:") == (100, None)
    assert parse_block_range("100") == (100, None)
    with pytest.raises(ValueError):
        parse_block_range("200:100")


def test_blocks_request_roundtrip():
    wire = encode_blocks_request(
        "db_out", start_block=100, stop_block=200, cursor="c1"
    )
    fields = {}
    for tag, _w, val in _fields_of(wire):
        fields[tag] = val
    assert fields[1] == 100          # start_block_num
    assert fields[2] == b"c1"        # start_cursor
    assert fields[3] == 200          # stop_block_num
    assert fields[4] == 1            # final_blocks_only
    assert fields[5] == 1            # production_mode
    assert fields[6] == b"db_out"    # output_module


def test_blocks_request_negative_start_is_head_relative_int64():
    wire = encode_blocks_request("db_out", start_block=-1000)
    (tag, _w, val), *_ = list(_fields_of(wire))
    assert tag == 1
    # proto int64: two's complement in a uint64 varint
    assert val - (1 << 64) == -1000


def _clock(block_id: str, num: int) -> bytes:
    return _len_delim(1, block_id.encode()) + _varint_field(2, num)


def _any(type_url: str, payload: bytes) -> bytes:
    return _len_delim(1, type_url.encode()) + _len_delim(2, payload)


def _block_data_response(block_id, num, cursor, type_url, payload) -> bytes:
    map_out = _len_delim(1, b"db_out") + _len_delim(2, _any(type_url, payload))
    bsd = (
        _len_delim(1, map_out)
        + _len_delim(2, _clock(block_id, num))
        + _len_delim(3, cursor.encode())
    )
    return _len_delim(3, bsd)  # Response.block_scoped_data = 3


def test_parse_response_block_data():
    payload = encode_database_changes(
        [{"table": "t", "pk": "k", "ordinal": 1, "op": "CREATE", "fields": {"a": "1"}}]
    )
    raw = _block_data_response("0xabc", 42, "cur42", ACCEPTED_TYPE_URLS[0], payload)
    msg = parse_response(raw)
    assert isinstance(msg, BlockScopedData)
    assert (msg.block_id, msg.block_num, msg.cursor) == ("0xabc", 42, "cur42")
    assert msg.type_url == ACCEPTED_TYPE_URLS[0]
    assert msg.payload == payload


def test_parse_response_undo_signal():
    ref = _len_delim(1, b"0xff") + _varint_field(2, 99)
    undo = _len_delim(1, ref) + _len_delim(2, b"cur99")
    msg = parse_response(_len_delim(4, undo))  # Response.block_undo_signal = 4
    assert isinstance(msg, BlockUndoSignal)
    assert (msg.last_valid_block, msg.last_valid_id, msg.last_valid_cursor) == (
        99,
        "0xff",
        "cur99",
    )


def test_parse_response_session_is_ignored():
    assert parse_response(_len_delim(1, b"\x0a\x02id")) is None


def test_channel_gated_without_grpcio():
    try:
        import grpc  # noqa: F401

        pytest.skip("grpcio present in this deployment")
    except ImportError:
        pass
    src = SubstreamsLiveSource("example.invalid:443", "db_out", "/tmp/unused")
    with pytest.raises(NotImplementedError, match="grpcio"):
        src.run()


def test_spool_feeds_protobuf_pipeline(spark, tmp_path):
    """End-to-end minus the socket: spool BlockScopedData batches the
    way the live client does, then run the real protobuf ingest
    pipeline over the spool dir and check the merged state."""
    from substreams_sink_clickhouse_spark.streaming.pipeline import (
        ChangesIngestPipeline,
    )

    spool = str(tmp_path / "spool")
    src = SubstreamsLiveSource("example.invalid:443", "db_out", spool)

    def block(num, changes):
        return BlockScopedData(
            block_id=f"0x{num:x}",
            block_num=num,
            cursor=f"cur{num}",
            type_url=ACCEPTED_TYPE_URLS[0],
            payload=encode_database_changes(changes),
        )

    src._spool(
        [
            block(1, [{"table": "kv", "pk": "a", "ordinal": 1, "op": "CREATE",
                       "fields": {"v": "1"}}]),
            block(2, [{"table": "kv", "pk": "b", "ordinal": 1, "op": "CREATE",
                       "fields": {"v": "2"}}]),
        ],
        seq=0,
    )
    src._spool(
        [
            block(3, [{"table": "kv", "pk": "a", "ordinal": 1, "op": "UPDATE",
                       "fields": {"v": "11"}}]),
        ],
        seq=1,
    )

    cat = Catalog()
    cat.register(
        TableInfo(
            "kv",
            T.StructType(
                [
                    T.StructField("id", T.StringType(), False),
                    T.StructField("v", T.LongType(), True),
                ]
            ),
            primary_key="id",
        )
    )
    pipe = ChangesIngestPipeline(
        spark,
        cat,
        warehouse_dir=str(tmp_path / "wh"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    pipe.run_protobuf_to_completion(spool, timeout_s=120)
    rows = {r["id"]: r["v"] for r in pipe.table("kv").collect()}
    assert rows == {"a": 11, "b": 2}
    cursor = pipe.cursors.get_cursor("default")
    assert cursor is not None and cursor.block_num == 3
