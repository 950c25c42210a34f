"""Loopback socket e2e for the live Substreams client (O1).

grpcio is absent in this container, so the HTTP/2 leg stays grpcio's
job in production; everything else — the hand-rolled request/response
wire codec, gRPC 5-byte message framing, the connect → stream → undo
→ abrupt-disconnect → reconnect-with-cursor-resume → spool state
machine, and the spool → protobuf ingest pipeline — runs here over a
REAL TCP socket against a scripted loopback server that parses the
client's actual request bytes with the engine's own
``parse_blocks_request``.

Scenario (mirrors a reorg + transport failure mid-sync):

* session 1: blocks 1-3 streamed, then an undo signal back to block 2
  (client must flush the valid prefix and adopt the fork cursor),
  then block 3', then the server DROPS the connection mid-stream;
* session 2: the server asserts the client resumed from cursor
  ``cur3b`` (the last accepted message), streams blocks 4-5, closes
  cleanly;
* the spool then feeds the real ingest pipeline and the merged table
  + committed cursor are checked.
"""

from __future__ import annotations

import socket
import struct
import threading

from pyspark.sql import types as T

from substreams_sink_clickhouse_spark.catalog import Catalog, TableInfo
from substreams_sink_clickhouse_spark.sources.protobuf_wire import (
    _len_delim,
    _varint_field,
    encode_database_changes,
)
from substreams_sink_clickhouse_spark.sources.substreams_grpc import (
    ACCEPTED_TYPE_URLS,
    BLOCKS_METHOD,
    RawSocketChannel,
    SubstreamsLiveSource,
    parse_blocks_request,
)


def _clock(block_id: str, num: int) -> bytes:
    return _len_delim(1, block_id.encode()) + _varint_field(2, num)


def _any(type_url: str, payload: bytes) -> bytes:
    return _len_delim(1, type_url.encode()) + _len_delim(2, payload)


def _block_response(num: int, cursor: str, changes: list[dict]) -> bytes:
    """sf.substreams.rpc.v2.Response{block_scoped_data=3} bytes:
    BlockScopedData{output=1 (MapModuleOutput{map_output=2: Any}),
    clock=2, cursor=3}."""
    payload = encode_database_changes(changes)
    map_output = _len_delim(2, _any(ACCEPTED_TYPE_URLS[0], payload))
    data = (
        _len_delim(1, map_output)
        + _len_delim(2, _clock(f"0x{num:x}", num))
        + _len_delim(3, cursor.encode())
    )
    return _len_delim(3, data)


def _undo_response(last_num: int, last_cursor: str) -> bytes:
    """Response{block_undo_signal=4}: roll back past last_num."""
    block_ref = _len_delim(1, f"0x{last_num:x}".encode()) + _varint_field(2, last_num)
    undo = _len_delim(1, block_ref) + _len_delim(2, last_cursor.encode())
    return _len_delim(4, undo)


def _frame(msg: bytes) -> bytes:
    return b"\x00" + struct.pack(">I", len(msg)) + msg


class _LoopbackServer(threading.Thread):
    """Scripted Blocks server: one session handler per accepted
    connection; records every parsed client request."""

    def __init__(self, sessions):
        super().__init__(daemon=True)
        self.sessions = list(sessions)
        self.requests: list[dict] = []
        self.errors: list[str] = []
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(4)
        self.port = self.sock.getsockname()[1]

    def run(self) -> None:
        for handler in self.sessions:
            try:
                conn, _ = self.sock.accept()
                with conn:
                    rfile = conn.makefile("rb")
                    method = rfile.readline().decode().strip()
                    if method != BLOCKS_METHOD:
                        self.errors.append(f"bad method {method!r}")
                        continue
                    header = rfile.read(5)
                    (length,) = struct.unpack(">I", header[1:])
                    request = parse_blocks_request(rfile.read(length))
                    self.requests.append(request)
                    handler(conn, request)
            except Exception as exc:  # pragma: no cover - surfaced below
                self.errors.append(repr(exc))
        self.sock.close()


def _kv_change(pk: str, op: str, v: str | None, ordinal: int = 1) -> dict:
    return {
        "table": "kv",
        "pk": pk,
        "ordinal": ordinal,
        "op": op,
        "fields": {"v": v} if v is not None else {},
    }


def test_loopback_stream_undo_reconnect_resume_and_ingest(spark, tmp_path):
    def session_one(conn, request):
        assert request["output_module"] == "db_out"
        assert request["cursor"] is None  # fresh start
        conn.sendall(_frame(_block_response(1, "cur1", [_kv_change("a", "CREATE", "1")])))
        conn.sendall(_frame(_block_response(2, "cur2", [_kv_change("b", "CREATE", "2")])))
        conn.sendall(_frame(_block_response(3, "cur3", [_kv_change("c", "CREATE", "3")])))
        # reorg: everything after block 2 is invalid
        conn.sendall(_frame(_undo_response(2, "cur2")))
        # the fork's replacement block 3 (higher ordinal: the orphaned
        # block's op and the replacement's must order deterministically
        # in the spool — the pipeline's undo-rollback path, tested in
        # test_engine.py::test_undo_rolls_back_to_fork_point, is what
        # discards orphans in a live run)
        conn.sendall(
            _frame(_block_response(3, "cur3b", [_kv_change("c", "UPDATE", "33", ordinal=2)]))
        )
        # abrupt transport failure mid-stream: a frame header promising
        # 64 bytes followed by connection teardown.  (A deterministic
        # stand-in for an RST: the client consumes every buffered frame
        # above, then hits the mid-frame EOF and must reconnect.)
        conn.sendall(b"\x00" + struct.pack(">I", 64) + b"partial")
        conn.close()

    def session_two(conn, request):
        # reconnect must resume from the LAST ACCEPTED cursor
        assert request["cursor"] == "cur3b"
        conn.sendall(_frame(_block_response(4, "cur4", [_kv_change("a", "UPDATE", "11")])))
        conn.sendall(_frame(_block_response(5, "cur5", [_kv_change("b", "DELETE", None)])))
        # clean close = end of stream

    server = _LoopbackServer([session_one, session_two])
    server.start()

    spool = str(tmp_path / "spool")
    cursors_seen: list[tuple[str, int]] = []
    src = SubstreamsLiveSource(
        f"127.0.0.1:{server.port}",
        "db_out",
        spool,
        spool_batch=2,
        backoff_s=0.05,
        channel_factory=lambda: RawSocketChannel("127.0.0.1", server.port),
    )
    final = src.run(on_cursor=lambda c, n: cursors_seen.append((c, n)))
    server.join(timeout=10)

    assert not server.errors, server.errors
    assert final == "cur5"
    # both sessions' requests parsed by the engine's own request codec
    assert [r["cursor"] for r in server.requests] == [None, "cur3b"]
    # the undo was surfaced for pipeline rollback
    assert len(src.undo_signals) == 1
    assert src.undo_signals[0].last_valid_block == 2
    assert src.undo_signals[0].last_valid_cursor == "cur2"
    # checkpoints fire only at spool boundaries, AFTER the batch is
    # durable, with the last spooled message's cursor (the reference
    # commits cursor + data in one transaction, db/flush.go:52-56):
    # batch-full after block2, undo-flush after block3, reconnect-flush
    # after block3b, batch-full after block5
    assert cursors_seen == [("cur2", 2), ("cur3", 3), ("cur3b", 3), ("cur5", 5)]

    # spool -> real ingest pipeline -> merged state
    from substreams_sink_clickhouse_spark.streaming.pipeline import (
        ChangesIngestPipeline,
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
    # NOTE: block 3 (pre-fork, v=3) was spooled before the undo arrived;
    # the spool keeps it and the undo signal is the pipeline's rollback
    # trigger (exercised in test_engine.py).  Block 3' updates pk c to
    # v=33 at a later ordinal, so last-writer-wins lands on the
    # post-fork truth.
    assert rows == {"a": 11, "c": 33}
    cursor = pipe.cursors.get_cursor("default")
    assert cursor is not None and cursor.block_num == 5


def test_blocks_request_parse_roundtrip():
    from substreams_sink_clickhouse_spark.sources.substreams_grpc import (
        encode_blocks_request,
    )

    wire = encode_blocks_request(
        "db_out", start_block=-500, stop_block=900, cursor="abc"
    )
    back = parse_blocks_request(wire)
    assert back["start_block"] == -500
    assert back["stop_block"] == 900
    assert back["cursor"] == "abc"
    assert back["output_module"] == "db_out"
    assert back["final_blocks_only"] and back["production_mode"]


def test_spool_seq_resumes_past_existing_files(tmp_path):
    """A restarted client must continue the spool sequence — seq=0
    would os.rename OVER earlier files (review finding)."""
    spool = str(tmp_path / "spool")
    src = SubstreamsLiveSource("example.invalid:443", "db_out", spool)
    blk = __import__(
        "substreams_sink_clickhouse_spark.sources.substreams_grpc",
        fromlist=["BlockScopedData"],
    ).BlockScopedData("0x1", 1, "c1", ACCEPTED_TYPE_URLS[0], b"")
    src._spool([blk], 0)
    src._spool([blk], 1)
    assert src._next_spool_seq() == 2
    fresh = SubstreamsLiveSource("example.invalid:443", "db_out", str(tmp_path / "empty"))
    assert fresh._next_spool_seq() == 0


def test_spool_seq_ignores_stray_files(tmp_path):
    """A user-copied ``spool-backup.parquet`` (or any non-numeric
    middle) must not abort startup with a ValueError (review
    finding) — only the source's own 8-digit names count."""
    spool = tmp_path / "spool"
    spool.mkdir()
    (spool / "spool-backup.parquet").write_bytes(b"x")
    (spool / "spool-00000003.parquet.bak").write_bytes(b"x")
    src = SubstreamsLiveSource("example.invalid:443", "db_out", str(spool))
    assert src._next_spool_seq() == 0
    (spool / "spool-00000007.parquet").write_bytes(b"x")
    assert src._next_spool_seq() == 8


def test_spool_seq_counts_names_wider_than_8_digits(tmp_path):
    """``{seq:08d}`` widens to 9+ digits once seq reaches 10^8; those
    files must still count toward the max or a restart would reset the
    sequence low and os.rename silently OVERWRITE them (review
    finding)."""
    spool = tmp_path / "spool"
    spool.mkdir()
    (spool / "spool-00000007.parquet").write_bytes(b"x")
    (spool / f"spool-{10**8:08d}.parquet").write_bytes(b"x")  # 9 digits
    src = SubstreamsLiveSource("example.invalid:443", "db_out", str(spool))
    assert src._next_spool_seq() == 10**8 + 1


def test_on_cursor_fires_only_after_durable_spool(tmp_path, monkeypatch):
    """Crash-safety of the checkpoint callback: if the spool write
    fails, on_cursor must NOT have fired for that batch — a persisted
    cursor ahead of unspooled data permanently skips those blocks on
    resume (the reference commits cursor + data atomically,
    db/flush.go:52-56)."""
    spool = str(tmp_path / "spool")
    src = SubstreamsLiveSource(
        "example.invalid:443",
        "db_out",
        spool,
        spool_batch=1,
        max_reconnects=0,
    )
    seen: list[tuple[str, int]] = []

    def boom(batch, seq):
        raise OSError("disk full")

    monkeypatch.setattr(src, "_spool", boom)

    class OneBlockChannel:
        def unary_stream(self, method, request_serializer, response_deserializer):
            def call(request, metadata=None):
                # unframed Response bytes: the channel contract yields
                # deserialized messages, framing is transport-internal
                yield _block_response(1, "cur1", [_kv_change("a", "CREATE", "1")])

            return call

    src.channel_factory = OneBlockChannel
    import pytest

    with pytest.raises(OSError):
        src.run(on_cursor=lambda c, n: seen.append((c, n)))
    # the batch never became durable, so no checkpoint was reported
    assert seen == []
