"""CLI parity tests (reference cmd/substreams-sink-clickhouse):
run -> ingest + summary, cursors list/delete, sql over the warehouse."""

import json

from substreams_sink_clickhouse_spark import cli

_SCHEMA = """
CREATE TABLE block_meta
(
    id          String,
    PRIMARY KEY (id),
    at          String,
    number      Int64,
    hash        String,
    parent_hash String,
    timestamp   String
)
ENGINE = MergeTree()
ORDER BY id
"""


def _msg(block_num, changes):
    return json.dumps(
        {
            "block_num": block_num,
            "block_id": f"0x{block_num:04x}",
            "table_changes": [
                {
                    "table": t,
                    "pk": pk,
                    "ordinal": ordinal,
                    "operation": op,
                    "fields": [
                        {"name": n, "new_value": v, "old_value": None}
                        for n, v in (fields or {}).items()
                    ],
                }
                for (t, pk, ordinal, op, fields) in changes
            ],
        }
    )


def _write_fixture(tmp_path):
    schema = tmp_path / "schema.sql"
    schema.write_text(_SCHEMA)
    stream = tmp_path / "changes"
    stream.mkdir()
    (stream / "a.jsonl").write_text(
        "\n".join(
            [
                _msg(1, [("block_meta", "k1", 1, "CREATE", {"number": "1", "hash": "h1"})]),
                _msg(2, [("block_meta", "k2", 1, "CREATE", {"number": "2", "hash": "h2"})]),
                _msg(3, [("block_meta", "k1", 2, "UPDATE", {"number": "11"})]),
            ]
        )
    )
    return schema, stream


def _common(tmp_path, schema=None):
    flags = [
        "--warehouse",
        str(tmp_path / "wh"),
        "--checkpoint",
        str(tmp_path / "ckpt"),
        "--module-hash",
        "mod-1",
    ]
    if schema is not None:
        flags += ["--clickhouse-schema", str(schema)]
    return flags


def test_cli_run_and_sql(spark, tmp_path, capsys):
    schema, stream = _write_fixture(tmp_path)
    rc = cli.main(["run", str(stream)] + _common(tmp_path, schema))
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["tables"]["block_meta"] == 2
    assert summary["cursor"]["block_num"] == 3

    rc = cli.main(
        ["sql", "SELECT id, number FROM block_meta ORDER BY id"]
        + _common(tmp_path, schema)
    )
    assert rc == 0
    rows = [json.loads(line) for line in capsys.readouterr().out.strip().splitlines()]
    assert [(r["id"], r["number"]) for r in rows] == [("k1", 11), ("k2", 2)]


def test_cli_cursors(spark, tmp_path, capsys):
    schema, stream = _write_fixture(tmp_path)
    assert cli.main(["run", str(stream)] + _common(tmp_path, schema)) == 0
    capsys.readouterr()

    assert cli.main(["cursors", "list"] + _common(tmp_path)) == 0
    rows = json.loads(capsys.readouterr().out.strip())
    assert rows and rows[0]["id"] == "mod-1" and rows[0]["block_num"] == 3

    assert cli.main(["cursors", "delete"] + _common(tmp_path)) == 0
    capsys.readouterr()
    assert cli.main(["cursors", "list"] + _common(tmp_path)) == 0
    assert json.loads(capsys.readouterr().out.strip()) == []


def test_cli_setup_lists_tables(spark, tmp_path, capsys):
    schema, _ = _write_fixture(tmp_path)
    assert cli.main(["setup"] + _common(tmp_path, schema)) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert "block_meta" in out["tables"]


def test_cli_maintain(spark, tmp_path, capsys):
    schema, stream = _write_fixture(tmp_path)
    assert cli.main(["run", str(stream)] + _common(tmp_path, schema)) == 0
    capsys.readouterr()

    assert cli.main(["maintain", "parts", "block_meta"] + _common(tmp_path, schema)) == 0
    parts = json.loads(capsys.readouterr().out.strip())
    assert sum(p["rows"] for p in parts) == 2

    assert cli.main(["maintain", "optimize", "block_meta"] + _common(tmp_path, schema)) == 0
    stats = json.loads(capsys.readouterr().out.strip())
    assert stats["files_after"] >= 1

    assert (
        cli.main(["maintain", "rebucket", "block_meta", "--new-n-buckets", "4"] + _common(tmp_path, schema))
        == 0
    )
    assert json.loads(capsys.readouterr().out.strip())["n_buckets_after"] == 4

    assert (
        cli.main(["maintain", "ttl", "block_meta", "--predicate", "number > 10"] + _common(tmp_path, schema))
        == 0
    )
    assert json.loads(capsys.readouterr().out.strip())["expired_rows"] == 1

    assert cli.main(["maintain", "vacuum"] + _common(tmp_path, schema)) == 0
    assert json.loads(capsys.readouterr().out.strip())["deleted_paths"] >= 0

    rc = cli.main(["sql", "SELECT id FROM block_meta ORDER BY id"] + _common(tmp_path, schema))
    assert rc == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert [r["id"] for r in rows] == ["k2"]


def test_reference_flag_spellings_accepted():
    from substreams_sink_clickhouse_spark.cli import build_parser

    p = build_parser()
    # the reference misspells its flag (run.go:29) — both spellings work
    a1 = p.parse_args(["run", "/x", "--schema", "s.sql", "--on-module-hash-mistmatch", "warn"])
    a2 = p.parse_args(["run", "/x", "--schema", "s.sql", "--on-module-hash-mismatch", "warn"])
    assert a1.on_module_hash_mismatch == a2.on_module_hash_mismatch == "warn"
    # operator flags from main.go:27-29 parse
    a3 = p.parse_args(
        ["--delay-before-start", "0.5", "--metrics-listen-addr", "localhost:9102",
         "--pprof-listen-addr", "localhost:6060", "setup", "--schema", "s.sql"]
    )
    assert a3.delay_before_start == 0.5
    assert a3.metrics_listen_addr == "localhost:9102"


def test_cli_run_block_range(spark, tmp_path, capsys):
    """--range start:stop (the reference's positional [<start>:<stop>],
    run.go:22): blocks outside the range never reach the merge."""
    schema, stream = _write_fixture(tmp_path)
    rc = cli.main(["run", str(stream), "--range", "1:3"] + _common(tmp_path, schema))
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # block 3 (the k1 UPDATE) is outside the exclusive stop: both
    # CREATEs land, k1 keeps number=1
    assert summary["tables"]["block_meta"] == 2
    rc = cli.main(
        ["sql", "SELECT id, number FROM block_meta ORDER BY id"]
        + _common(tmp_path, schema)
    )
    assert rc == 0
    rows = [json.loads(line) for line in capsys.readouterr().out.strip().splitlines()]
    assert [(r["id"], r["number"]) for r in rows] == [("k1", 1), ("k2", 2)]


def test_cli_system_views_and_explain(spark, tmp_path, capsys):
    """The reference's own introspection queries work against the
    engine (db/operations.go:211-277), modulo dots in view names."""
    schema, stream = _write_fixture(tmp_path)
    assert cli.main(["run", str(stream)] + _common(tmp_path, schema)) == 0
    capsys.readouterr()

    assert cli.main(
        ["sql", "SELECT name FROM system_tables WHERE database = 'default' ORDER BY name"]
        + _common(tmp_path, schema)
    ) == 0
    names = [json.loads(l)["name"] for l in capsys.readouterr().out.strip().splitlines()]
    assert "block_meta" in names

    assert cli.main(
        ["sql",
         "SELECT name FROM system_columns WHERE table = 'block_meta' "
         "AND is_in_primary_key ORDER BY position"]
        + _common(tmp_path, schema)
    ) == 0
    pks = [json.loads(l)["name"] for l in capsys.readouterr().out.strip().splitlines()]
    assert pks == ["id"]

    assert cli.main(
        ["sql", "--explain", "SELECT count(*) FROM block_meta"]
        + _common(tmp_path, schema)
    ) == 0
    out = capsys.readouterr().out
    assert "Physical Plan" in out


def test_cli_sql_csv_format(spark, tmp_path, capsys):
    schema, stream = _write_fixture(tmp_path)
    assert cli.main(["run", str(stream)] + _common(tmp_path, schema)) == 0
    capsys.readouterr()
    assert cli.main(
        ["sql", "--format", "csv", "SELECT id, number FROM block_meta ORDER BY id"]
        + _common(tmp_path, schema)
    ) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert lines[0] == "id,number"
    assert lines[1:] == ["k1,11", "k2,2"]


def test_cli_show_create_table(spark, tmp_path, capsys):
    schema = tmp_path / "schema.sql"
    schema.write_text(
        "CREATE TABLE block_meta (id String, number Int64, PRIMARY KEY (id)) "
        "ENGINE = MergeTree() ORDER BY id;"
    )
    from substreams_sink_clickhouse_spark import cli

    rc = cli.main(
        [
            "sql",
            "SHOW CREATE TABLE block_meta",
            "--clickhouse-schema",
            str(schema),
            "--warehouse",
            str(tmp_path / "wh"),
        ]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert out.startswith("CREATE TABLE block_meta")
    assert "ENGINE = MergeTree()" in out
