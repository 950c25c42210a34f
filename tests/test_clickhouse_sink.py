"""ClickHouse statement-generation parity tests
(/root/reference/db/operations.go:75-209 shapes + db/operations_test.go
coercion case)."""

from pyspark.sql import types as T

from substreams_sink_clickhouse_spark.catalog import Catalog, TableInfo
from substreams_sink_clickhouse_spark.sinks.clickhouse import (
    cursor_update_statement,
    delete_statement,
    insert_statement,
    literal_for,
    statements_for_ops,
    update_statement,
)

INFO = TableInfo(
    "block_meta",
    T.StructType(
        [
            T.StructField("id", T.StringType(), False),
            T.StructField("number", T.IntegerType(), True),
            T.StructField("flag", T.BooleanType(), True),
            T.StructField("at", T.TimestampType(), True),
        ]
    ),
    "id",
)


def test_literal_typing_rules():
    # string quoted + escaped (operations.go:152-153, 203-209)
    assert literal_for("it's", T.StringType()) == "'it''s'"
    # bool quoted (operations.go:155-156; db/operations_test.go:22-31)
    assert literal_for("true", T.BooleanType()) == "'true'"
    # numerics raw (operations.go:158-165)
    assert literal_for("42", T.IntegerType()) == "42"
    assert literal_for("1.5", T.DoubleType()) == "1.5"
    # unix seconds -> RFC3339 (operations.go:167-180)
    assert literal_for("1700000000", T.TimestampType()) == "'2023-11-14T22:13:20Z'"
    # plain time string passes through escaped
    assert literal_for("2024-01-01 00:00:00", T.TimestampType()) == "'2024-01-01 00:00:00'"
    assert literal_for(None, T.IntegerType()) == "NULL"


def test_insert_multi_row():
    sql = insert_statement(INFO, [{"id": "a", "number": "1"}, {"id": "b"}])
    assert sql == 'INSERT INTO "block_meta" ("id","number") VALUES (\'a\',1),(\'b\',NULL)'


def test_update_statement_shape():
    sql = update_statement(INFO, "k'1", {"number": "9", "flag": "false"})
    assert sql == (
        'ALTER TABLE "block_meta" UPDATE "flag"=\'false\', "number"=9 '
        "WHERE \"id\" = 'k''1'"
    )


def test_delete_statement_shape():
    assert delete_statement(INFO, "k1") == 'DELETE FROM "block_meta" WHERE "id" = \'k1\''


def test_statements_for_ops_batches_inserts():
    cat = Catalog()
    cat.register(INFO)
    ops = [
        {"table": "block_meta", "pk": "a", "op": "CREATE", "fields": {"id": "a", "number": "1"}},
        {"table": "block_meta", "pk": "b", "op": "CREATE", "fields": {"id": "b", "number": "2"}},
        {"table": "block_meta", "pk": "c", "op": "UPDATE", "fields": {"number": "3"}},
        {"table": "block_meta", "pk": "d", "op": "DELETE", "fields": {}},
    ]
    stmts = list(statements_for_ops(ops, cat))
    assert [s.split()[0] for s in stmts] == ["ALTER", "DELETE", "INSERT"]
    assert "VALUES ('a',1),('b',2)" in stmts[2]


def test_cursor_update_statement():
    sql = cursor_update_statement("hash1", "cur", 42, "0xa")
    assert sql == (
        'ALTER TABLE "cursors" UPDATE "cursor"=\'cur\', "block_num"=42, '
        "\"block_id\"='0xa' WHERE \"id\" = 'hash1'"
    )


def test_pipeline_emits_wire_statements(spark, tmp_path):
    """Wire parity: a pipeline with a ClickHouse sink attached emits
    the reference's statement shapes for every committed epoch
    (INSERT for creates + cursor ALTER UPDATE, db/flush.go:12-63)."""
    import json as _json

    from substreams_sink_clickhouse_spark.catalog import (
        BLOCK_META_SCHEMA,
        Catalog,
        TableInfo,
    )
    from substreams_sink_clickhouse_spark.sinks.clickhouse import ClickHouseHTTPSink
    from substreams_sink_clickhouse_spark.streaming.pipeline import ChangesIngestPipeline

    capture = tmp_path / "statements.log"

    class RecordingSink(ClickHouseHTTPSink):
        # executes in local-mode worker processes -> capture via file
        def execute_statement(self, sql: str) -> None:
            with open(str(capture), "a", encoding="utf-8") as fh:
                fh.write(sql.replace("\n", " ") + "\n")

    cat = Catalog()
    cat.register(TableInfo("block_meta", BLOCK_META_SCHEMA, "id"))
    sink = RecordingSink("clickhouse://u:p@localhost:8123/db", cat)
    stream = tmp_path / "changes"
    stream.mkdir()
    (stream / "b1.jsonl").write_text(
        _json.dumps(
            {
                "block_num": 7,
                "block_id": "0x7",
                "table_changes": [
                    {
                        "table": "block_meta",
                        "pk": "k1",
                        "ordinal": 1,
                        "operation": "CREATE",
                        "fields": [{"name": "number", "new_value": "7", "old_value": None}],
                    }
                ],
            }
        )
    )
    pipe = ChangesIngestPipeline(
        spark,
        cat,
        warehouse_dir=str(tmp_path / "wh"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        module_hash="mh",
        clickhouse_sink=sink,
    )
    pipe.run_to_completion(str(stream), timeout_s=300)
    stmts = capture.read_text().strip().split("\n")
    assert any(s.startswith('INSERT INTO "block_meta"') for s in stmts), stmts
    assert any("cursors" in s and "UPDATE" in s for s in stmts), stmts
    # parquet state still committed alongside the wire emit
    assert pipe.table("block_meta").count() == 1
