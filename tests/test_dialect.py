"""ClickHouse→Spark SQL dialect translation: string-level rewrites and
executed results, including the reference's user-facing query shape
(ClickHouse SQL over a sunk block_meta table, README.md:29-52)."""

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from substreams_sink_clickhouse_spark.catalog import BLOCK_META_SCHEMA, Catalog, TableInfo
from substreams_sink_clickhouse_spark.config import EngineConfig
from substreams_sink_clickhouse_spark.engine import Engine
from substreams_sink_clickhouse_spark.functions.dialect import clickhouse_to_spark_sql


def test_name_swaps_and_literals_untouched():
    out = clickhouse_to_spark_sql(
        "SELECT uniq(u), countIf(v > 5), groupArray(x), 'countIf(lit)' AS s FROM t"
    )
    assert "approx_count_distinct(u)" in out
    assert "count_if(v > 5)" in out
    assert "collect_list(x)" in out
    assert "'countIf(lit)'" in out  # string literal preserved verbatim


def test_if_combinator_with_string_arg():
    out = clickhouse_to_spark_sql("SELECT sumIf(value, event_type = 'click') FROM e")
    assert "sum(CASE WHEN event_type = 'click' THEN value END)" in out


def test_nested_casts_and_numbers():
    out = clickhouse_to_spark_sql("SELECT toInt64(toString(number)) FROM numbers(5)")
    assert "CAST(CAST(number AS STRING) AS BIGINT)" in out
    assert "FROM (SELECT id AS number FROM range(5))" in out


def test_todatetime_unix_seconds_rule():
    out = clickhouse_to_spark_sql("SELECT toDateTime(ts_str) FROM t")
    assert "RLIKE '^[0-9]+$'" in out and "from_unixtime" in out


def test_format_clause_stripped():
    out = clickhouse_to_spark_sql("SELECT 1 FORMAT JSONEachRow")
    assert out.strip() == "SELECT 1"


def test_executed_results_match_spark_equivalents(spark):
    spark.range(100).selectExpr(
        "id AS user_id",
        "CAST(id % 7 AS DOUBLE) AS value",
        "CASE WHEN id % 2 = 0 THEN 'click' ELSE 'view' END AS event_type",
    ).createOrReplaceTempView("dialect_events")
    got = spark.sql(
        clickhouse_to_spark_sql(
            "SELECT uniqExact(user_id) AS u, "
            "countIf(event_type = 'click') AS c, "
            "sumIf(value, event_type = 'click') AS s, "
            "toInt32(maxIf(value, event_type = 'view')) AS m "
            "FROM dialect_events"
        )
    ).collect()[0]
    assert got["u"] == 100
    assert got["c"] == 50
    assert got["s"] == sum(i % 7 for i in range(0, 100, 2))
    assert got["m"] == 6


def test_numbers_table_function_executes(spark):
    rows = spark.sql(
        clickhouse_to_spark_sql("SELECT toInt64(number) * 2 AS n FROM numbers(4)")
    ).collect()
    assert sorted(r["n"] for r in rows) == [0, 2, 4, 6]


def _msg(block_num, changes):
    return json.dumps(
        {
            "block_num": block_num,
            "block_id": f"0x{block_num:04x}",
            "table_changes": [
                {
                    "table": t,
                    "pk": pk,
                    "ordinal": o,
                    "operation": op,
                    "fields": [
                        {"name": n, "new_value": v, "old_value": None}
                        for n, v in (fields or {}).items()
                    ],
                }
                for (t, pk, o, op, fields) in changes
            ],
        }
    )


def test_engine_sql_clickhouse_dialect_end_to_end(spark, tmp_path):
    """The reference's workload: sink block_meta changes, then query
    with ClickHouse SQL — unchanged — through the dialect shim."""
    stream = tmp_path / "changes"
    stream.mkdir()
    (stream / "b1.jsonl").write_text(
        "\n".join(
            _msg(
                i,
                [
                    (
                        "block_meta",
                        f"blk{i}",
                        1,
                        "CREATE",
                        {"number": str(i), "timestamp": str(1700000000 + i)},
                    )
                ],
            )
            for i in (1, 2, 3)
        )
    )
    cat = Catalog()
    cat.register(TableInfo("block_meta", BLOCK_META_SCHEMA, "id"))
    eng = Engine(
        spark,
        EngineConfig(
            warehouse_dir=str(tmp_path / "wh"), checkpoint_dir=str(tmp_path / "ckpt")
        ),
    )
    eng.ingest(str(stream), cat)
    row = eng.sql(
        "SELECT uniqExact(id) AS n_blocks, any(hash) AS h, "
        "toInt64(maxIf(number, number < 3)) AS m "
        "FROM block_meta FORMAT JSONEachRow",
        dialect="clickhouse",
    ).collect()[0]
    assert row["n_blocks"] == 3
    assert row["m"] == 2
    import pytest

    with pytest.raises(ValueError, match="dialect"):
        eng.sql("SELECT 1", dialect="oracle")


def test_array_join_clause(spark):
    out = clickhouse_to_spark_sql(
        "SELECT id, v FROM arr_t ARRAY JOIN vals AS v ORDER BY id, v"
    )
    assert "LATERAL VIEW explode(vals) _aj_v AS v" in out
    spark.sql(
        "SELECT 1 AS id, array(10, 20) AS vals "
        "UNION ALL SELECT 2, array() "
    ).createOrReplaceTempView("arr_t")
    rows = spark.sql(out).collect()
    assert [(r["id"], r["v"]) for r in rows] == [(1, 10), (1, 20)]
    # LEFT ARRAY JOIN keeps the empty-array row with NULL
    left = clickhouse_to_spark_sql(
        "SELECT id, v FROM arr_t LEFT ARRAY JOIN vals AS v ORDER BY id, v"
    )
    assert "LATERAL VIEW OUTER explode" in left
    rows = spark.sql(left).collect()
    assert [(r["id"], r["v"]) for r in rows] == [(1, 10), (1, 20), (2, None)]


def test_prewhere_and_global():
    out = clickhouse_to_spark_sql("SELECT a FROM t PREWHERE a > 1")
    assert "WHERE a > 1" in out and "PREWHERE" not in out
    out = clickhouse_to_spark_sql("SELECT a FROM t GLOBAL JOIN u ON t.k = u.k")
    assert "GLOBAL" not in out
    import pytest

    with pytest.raises(ValueError, match="PREWHERE"):
        clickhouse_to_spark_sql("SELECT a FROM t PREWHERE a > 1 WHERE b < 2")
    with pytest.raises(ValueError, match="FINAL"):
        clickhouse_to_spark_sql("SELECT a FROM t FINAL")


def test_translation_robust_to_composition():
    """Property-ish composition check: nesting any supported construct
    inside any other still yields balanced, FORMAT-free SQL with no
    ClickHouse-only function names left behind."""
    import itertools
    import re

    frags = [
        "toInt64(x)",
        "sumIf(v, t = 'a,b(c')",
        "uniqExact(u)",
        "toDateTime(s)",
        "toYYYYMM(d)",
        "groupArray(g)",
        "toInt64OrZero(s)",
        "arrayFirst(x -> x > 1, a)",
        "replaceAll(s, '(', ')')",
        "arrayReduce('max', a)",
    ]
    def _code(sql):
        # drop string literals before structural checks
        return re.sub(r"'[^']*'", "''", sql)

    for a, b in itertools.permutations(frags, 2):
        # splice b in as an argument of a where possible
        q = f"SELECT {a}, {b} FROM t FORMAT CSV"
        out = clickhouse_to_spark_sql(q)
        assert _code(out).count("(") == _code(out).count(")"), (q, out)
        assert "FORMAT" not in out
        for name in ("toInt64", "sumIf", "uniqExact", "toDateTime",
                     "toYYYYMM", "groupArray", "toInt64OrZero",
                     "arrayFirst", "replaceAll", "arrayReduce"):
            assert not re.search(rf"\b{name}\s*\(", out), (q, out)
    # nested: every construct inside sumIf's value argument
    for f in frags:
        q = f"SELECT sumIf({f}, cond) FROM t"
        out = clickhouse_to_spark_sql(q)
        assert _code(out).count("(") == _code(out).count(")"), (q, out)
        assert "sumIf" not in out


def test_query_cache_hits_and_invalidates(spark, tmp_path):
    """ClickHouse use_query_cache parity: repeats return the persisted
    result; an ingest epoch advance invalidates."""
    stream = tmp_path / "changes"
    stream.mkdir()
    (stream / "b1.jsonl").write_text(
        _msg(1, [("block_meta", "k1", 1, "CREATE", {"number": "1"})])
    )
    cat = Catalog()
    cat.register(TableInfo("block_meta", BLOCK_META_SCHEMA, "id"))
    eng = Engine(
        spark,
        EngineConfig(
            warehouse_dir=str(tmp_path / "wh"), checkpoint_dir=str(tmp_path / "ckpt")
        ),
    )
    eng.ingest(str(stream), cat)
    q = "SELECT count(*) AS n FROM block_meta"
    df1 = eng.sql(q, use_query_cache=True)
    assert df1.collect()[0]["n"] == 1
    df2 = eng.sql(q, use_query_cache=True)
    assert df2 is df1  # cache hit returns the same persisted frame
    # new epoch -> invalidated
    (stream / "b2.jsonl").write_text(
        _msg(2, [("block_meta", "k2", 1, "CREATE", {"number": "2"})])
    )
    eng.ingest(str(stream), cat)
    df3 = eng.sql(q, use_query_cache=True)
    assert df3 is not df1
    assert df3.collect()[0]["n"] == 2


def test_multiif_and_array_functions(spark):
    out = clickhouse_to_spark_sql(
        "SELECT multiIf(x > 2, 'big', x > 0, 'small', 'neg') AS c, "
        "has(a, 2) AS h, indexOf(a, 3) AS i, arrayElement(a, 1) AS e "
        "FROM t"
    )
    assert "CASE WHEN x > 2 THEN 'big' WHEN x > 0 THEN 'small' ELSE 'neg' END" in out
    assert "array_contains(a, 2)" in out
    assert "array_position(a, 3)" in out
    assert "element_at(a, 1)" in out
    spark.sql("SELECT 3 AS x, array(1, 2, 3) AS a").createOrReplaceTempView("t")
    r = spark.sql(out).collect()[0]
    assert (r["c"], r["h"], r["i"], r["e"]) == ("big", True, 3, 1)
    import pytest

    with pytest.raises(ValueError, match="multiIf"):
        clickhouse_to_spark_sql("SELECT multiIf(a, b) FROM t")


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAVE_HYP = True
except ImportError:  # pragma: no cover
    _HAVE_HYP = False


if _HAVE_HYP:
    _IDENT = st.sampled_from(["x", "y", "v", "t", "arr"])
    _LIT = st.sampled_from(["1", "2.5", "'a,b(c'", "'it''s'", "NULL"])

    def _exprs(depth):
        if depth == 0:
            return st.one_of(_IDENT, _LIT)
        sub = _exprs(depth - 1)
        return st.one_of(
            _IDENT,
            _LIT,
            st.builds(lambda a: f"toInt64({a})", sub),
            st.builds(lambda a: f"toDateTime({a})", sub),
            st.builds(lambda a: f"toYYYYMM({a})", sub),
            st.builds(lambda a: f"uniqExact({a})", sub),
            st.builds(lambda a, b: f"sumIf({a}, {b})", sub, sub),
            st.builds(lambda a, b: f"avgIf({a}, {b})", sub, sub),
            st.builds(
                lambda a, b, c: f"multiIf({a}, {b}, {c})", sub, sub, sub
            ),
            st.builds(lambda a: f"groupArray({a})", sub),
            st.builds(lambda a, b: f"has({a}, {b})", sub, sub),
            st.builds(lambda a, b: f"argMax({a}, {b})", sub, sub),
            st.builds(lambda a, b: f"argMin({a}, {b})", sub, sub),
            st.builds(lambda a: f"quantile(0.9)({a})", sub),
            st.builds(lambda a: f"quantileExact(0.5)({a})", sub),
            st.builds(lambda a: f"quantilesExact(0.25, 0.75)({a})", sub),
            st.builds(lambda a, b: f"uniqIf({a}, {b})", sub, sub),
            st.builds(lambda a, b: f"[{a}, {b}]", sub, sub),
            st.builds(lambda a: f"arr[{a}]", sub),
            st.builds(lambda a, b: f"arrayCumSum([{a}, {b}])", sub, sub),
            st.builds(lambda a, b: f"dateDiff('hour', {a}, {b})", sub, sub),
            st.builds(lambda a: f"toStartOfHour({a})", sub),
            st.builds(lambda a: f"kurtPop({a})", sub),
            # round-5 continuation batches
            st.builds(lambda a, b: f"arrayPushBack([{a}], {b})", sub, sub),
            st.builds(lambda a, b: f"arrayRotateLeft([{a}, {b}], 3)", sub, sub),
            st.builds(lambda a: f"arrayStringConcat([{a}], ',')", sub),
            st.builds(lambda a, b: f"bitAnd({a}, {b})", sub, sub),
            st.builds(lambda a: f"bitNot({a})", sub),
            st.builds(lambda a, b: f"countSubstrings({a}, {b})", sub, sub),
            st.builds(lambda a: f"formatReadableSize({a})", sub),
            st.builds(lambda a: f"toStartOfInterval({a}, INTERVAL 2 HOUR)", sub),
            st.builds(lambda a, b: f"arrayFold((acc, x) -> acc + x, [{a}], {b})", sub, sub),
            st.builds(lambda a: f"toDayOfWeek({a})", sub),
            st.builds(lambda a, b: f"addDays({a}, {b})", sub, sub),
            st.builds(lambda a, b: f"hasAll([{a}], [{b}])", sub, sub),
            st.builds(lambda a, b: f"JSONExtractInt({a}, {b})", sub, sub),
            st.builds(lambda a: f"cutQueryString({a})", sub),
            st.builds(lambda a, b: f"mapContains(map('k', {a}), {b})", sub, sub),
            st.builds(lambda a, b: f"quantileExactWeighted(0.5)({a}, {b})", sub, sub),
        )

    @given(e1=_exprs(3), e2=_exprs(2))
    @settings(max_examples=200, deadline=None)
    def test_dialect_fuzz_deep_nesting(e1, e2):
        """Random deep compositions of every supported construct stay
        balanced and fully translated — no ClickHouse-only names
        survive outside string literals."""
        import re

        q = f"SELECT {e1} AS a, {e2} AS b FROM t FORMAT Values"
        out = clickhouse_to_spark_sql(q)
        code = re.sub(r"'(?:[^']|'')*'", "''", out)
        assert code.count("(") == code.count(")"), (q, out)
        assert "FORMAT" not in code
        for name in (
            "toInt64", "toDateTime", "toYYYYMM", "uniqExact", "sumIf",
            "avgIf", "multiIf", "groupArray", "argMax", "argMin",
            "quantileExact", "quantilesExact", "uniqIf",
            "arrayPushBack", "arrayRotateLeft", "arrayStringConcat",
            "bitAnd", "bitNot", "countSubstrings", "formatReadableSize",
            "toStartOfInterval", "arrayFold", "toDayOfWeek", "addDays",
            "hasAll", "JSONExtractInt", "cutQueryString", "mapContains",
            "quantileExactWeighted",
        ):
            assert not re.search(rf"\b{name}\s*\(", code), (q, out)


def test_query_log_records_and_views(spark, tmp_path):
    eng = Engine(
        spark,
        EngineConfig(
            warehouse_dir=str(tmp_path / "wh"), checkpoint_dir=str(tmp_path / "ckpt")
        ),
    )
    eng.sql("SELECT 1 AS one").collect()
    eng.sql("SELECT uniqExact(1) AS u", dialect="clickhouse").collect()
    log = eng.query_log().collect()
    assert len(log) == 2
    assert log[1]["dialect"] == "clickhouse"
    assert "count(DISTINCT" in log[1]["query"]  # stores the translation
    assert spark.sql(
        "SELECT count(*) AS n FROM system_query_log"
    ).collect()[0]["n"] == 2


def test_higher_order_array_functions(spark):
    out = clickhouse_to_spark_sql(
        "SELECT arrayMap(x -> x * 2, a) AS m, arrayFilter(x -> x > 1, a) AS f, "
        "arrayExists(x -> x = 3, a) AS e, arrayAll(x -> x > 0, a) AS l, "
        "arrayCount(x -> x % 2 = 1, a) AS c, arraySum(a) AS s, "
        "arraySum(x -> x * x, a) AS sq FROM t"
    )
    assert "transform(a, x -> x * 2)" in out
    assert "filter(a, x -> x > 1)" in out
    assert "exists(a, x -> x = 3)" in out
    assert "forall(a, x -> x > 0)" in out
    assert "size(filter(a, x -> x % 2 = 1))" in out
    spark.sql("SELECT array(1, 2, 3) AS a").createOrReplaceTempView("t")
    r = spark.sql(out).collect()[0]
    assert r["m"] == [2, 4, 6]
    assert r["f"] == [2, 3]
    assert r["e"] is True and r["l"] is True
    assert r["c"] == 2
    assert r["s"] == 6.0 and r["sq"] == 14.0


def test_untranslatable_clauses_raise_with_guidance():
    import pytest

    for q, msg in [
        ("SELECT a FROM t SAMPLE 0.1", "q33_sample"),
        # LIMIT BY over a depth-0 set op is ambiguous
        (
            "SELECT a FROM t UNION ALL SELECT a FROM u LIMIT 1 BY a",
            "set operation",
        ),
    ]:
        with pytest.raises(ValueError, match=msg):
            clickhouse_to_spark_sql(q)
    # plain LIMIT still passes through
    assert "LIMIT 3" in clickhouse_to_spark_sql("SELECT a FROM t LIMIT 3")


def test_with_totals_having_uses_before_having_semantics(spark):
    """ClickHouse's DEFAULT totals_mode='before_having': the totals
    row aggregates ALL rows, including groups HAVING eliminates."""
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW wth AS SELECT * FROM VALUES "
        "('x', 1), ('x', 2), ('y', 10), ('z', 5) AS t(k, v)"
    )
    out = clickhouse_to_spark_sql(
        "SELECT k, count(*) AS n, sum(v) AS s FROM wth "
        "GROUP BY k WITH TOTALS HAVING count(*) > 1 ORDER BY k"
    )
    assert "grouping(k) = 1 OR (count(*) > 1)" in out
    rows = {(r["k"], r["n"], r["s"]) for r in spark.sql(out).collect()}
    # only x passes HAVING; the totals row still covers x+y+z
    assert rows == {("x", 2, 3), (None, 4, 18)}


def test_with_totals_only_fires_after_group_by(spark):
    # a CTE (or any identifier) literally named ``totals`` is NOT the
    # WITH TOTALS clause — it must pass through untouched, not raise
    q = "WITH totals AS (SELECT 1 AS x) SELECT x FROM totals"
    assert clickhouse_to_spark_sql(q) == q
    assert spark.sql(clickhouse_to_spark_sql(q)).collect()[0]["x"] == 1
    # no preceding GROUP BY anywhere: leave untouched (Spark will give
    # its own parse error rather than a misleading dialect raise)
    q = "SELECT a, count(*) FROM t WITH TOTALS"
    assert clickhouse_to_spark_sql(q) == q
    # a CTE named totals does not confuse a REAL trailing WITH TOTALS
    q = (
        "WITH totals AS (SELECT 'x' AS k UNION ALL SELECT 'x') "
        "SELECT k, count(*) AS n FROM totals GROUP BY k WITH TOTALS"
    )
    out = clickhouse_to_spark_sql(q)
    assert "GROUPING SETS" in out and out.startswith("WITH totals AS")
    rows = {(r["k"], r["n"]) for r in spark.sql(out).collect()}
    assert rows == {("x", 2), (None, 2)}


def test_limit_by_translates_and_executes(spark):
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW lbt AS SELECT * FROM VALUES "
        "(1, 'a', 30.0), (1, 'b', 20.0), (1, 'c', 10.0), "
        "(2, 'd', 5.0), (2, 'e', 50.0) AS t(uid, tag, v)"
    )
    # top-2 per uid by v DESC, then a global LIMIT
    out = clickhouse_to_spark_sql(
        "SELECT uid, tag, v FROM lbt ORDER BY v DESC LIMIT 2 BY uid LIMIT 3"
    )
    rows = [tuple(r) for r in spark.sql(out).collect()]
    assert rows == [(2, "e", 50.0), (1, "a", 30.0), (1, "b", 20.0)]
    # offset form: skip the best row per group, keep the next 1
    out = clickhouse_to_spark_sql(
        "SELECT uid, tag, v FROM lbt ORDER BY v DESC LIMIT 1, 1 BY uid"
    )
    rows = {tuple(r) for r in spark.sql(out).collect()}
    assert rows == {(1, "b", 20.0), (2, "d", 5.0)}
    # alternate offset spelling, SWAPPED operand order:
    # LIMIT n OFFSET o BY == LIMIT o, n BY
    out = clickhouse_to_spark_sql(
        "SELECT uid, tag, v FROM lbt ORDER BY v DESC LIMIT 1 OFFSET 1 BY uid"
    )
    rows = {tuple(r) for r in spark.sql(out).collect()}
    assert rows == {(1, "b", 20.0), (2, "d", 5.0)}
    # without ORDER BY: still exactly n per group
    out = clickhouse_to_spark_sql("SELECT uid, tag FROM lbt LIMIT 1 BY uid")
    assert spark.sql(out).count() == 2
    # nested inside a subquery
    out = clickhouse_to_spark_sql(
        "SELECT count(*) AS n FROM "
        "(SELECT uid, v FROM lbt ORDER BY v DESC LIMIT 2 BY uid) WHERE v > 15"
    )
    assert spark.sql(out).collect()[0]["n"] == 3


def test_with_totals_translates_and_executes(spark):
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW wtt AS SELECT * FROM VALUES "
        "('x', 1), ('x', 2), ('y', 10) AS t(k, v)"
    )
    out = clickhouse_to_spark_sql(
        "SELECT k, sum(v) AS s FROM wtt GROUP BY k WITH TOTALS"
    )
    assert "GROUPING SETS" in out
    rows = {(r["k"], r["s"]) for r in spark.sql(out).collect()}
    assert rows == {("x", 3), ("y", 10), (None, 13)}
    # multi-key: exactly the group rows plus ONE grand total (no
    # intermediate rollup levels)
    out = clickhouse_to_spark_sql(
        "SELECT k, v % 2 AS par, count(*) AS n FROM wtt GROUP BY k, v % 2 WITH TOTALS"
    )
    res = spark.sql(out).collect()
    totals = [r for r in res if r["k"] is None and r["par"] is None]
    assert len(totals) == 1 and totals[0]["n"] == 3
    assert len(res) == 4  # 3 group rows + totals


def test_final_guard_catches_backquoted_tables():
    import pytest

    # a backquoted table in FINAL position must raise (not silently
    # parse FINAL as an alias)
    with pytest.raises(ValueError, match="Engine.table"):
        clickhouse_to_spark_sql("SELECT x FROM `events` FINAL")
    # an alias literally named final (with AS) stays legal
    out = clickhouse_to_spark_sql("SELECT final.x FROM t AS final")
    assert out == "SELECT final.x FROM t AS final"


def test_rewrite_final_tables_resolves_backquoted_names():
    from substreams_sink_clickhouse_spark.functions.dialect import (
        rewrite_final_tables,
    )

    out = rewrite_final_tables(
        "SELECT x FROM `events` FINAL", lambda n: n + "_v"
    )
    assert out == "SELECT x FROM events_v AS events"
    # a single-quoted literal in table-ish position is never resolved
    out = rewrite_final_tables(
        "SELECT 'FROM x FINAL' AS s FROM events FINAL", lambda n: n + "_v"
    )
    assert out == "SELECT 'FROM x FINAL' AS s FROM events_v AS events"


def test_show_create_round_trips(spark, tmp_path):
    from substreams_sink_clickhouse_spark.sources.clickhouse_ddl import (
        catalog_from_clickhouse_ddl,
    )

    stream = tmp_path / "changes"
    stream.mkdir()
    (stream / "b1.jsonl").write_text(
        _msg(1, [("block_meta", "k1", 1, "CREATE", {"number": "1"})])
    )
    cat = Catalog()
    cat.register(TableInfo("block_meta", BLOCK_META_SCHEMA, "id"))
    eng = Engine(
        spark,
        EngineConfig(
            warehouse_dir=str(tmp_path / "wh"), checkpoint_dir=str(tmp_path / "ckpt")
        ),
    )
    eng.ingest(str(stream), cat)
    ddl = eng.show_create("block_meta")
    assert ddl.startswith("CREATE TABLE block_meta")
    back = catalog_from_clickhouse_ddl(ddl).get("block_meta")
    assert back.primary_key == "id"
    assert set(back.schema.fieldNames()) == set(BLOCK_META_SCHEMA.fieldNames())
    import pytest

    with pytest.raises(ValueError, match="unknown table"):
        eng.show_create("nope")


def test_backslash_escaped_quote_in_literal():
    # ClickHouse's default string escaping is C-style: \' inside a
    # single-quoted literal must NOT terminate it — the tail would be
    # rewritten as code (round-2 advisory).
    out = clickhouse_to_spark_sql(
        r"SELECT countIf(name = 'it\'s uniq(x)') AS c FROM t"
    )
    assert r"'it\'s uniq(x)'" in out  # literal untouched, uniq NOT swapped
    assert "count_if(name =" in out


def test_final_and_sample_anchored_to_table_position():
    import pytest

    # a column/alias literally named final is legal (round-2 advisory)
    out = clickhouse_to_spark_sql("SELECT status AS final FROM t")
    assert "AS final" in out
    out = clickhouse_to_spark_sql("SELECT * FROM t WHERE final = 1")
    assert "final = 1" in out
    # ... but real FROM t FINAL still raises with the Engine pointer
    with pytest.raises(ValueError, match="final=True"):
        clickhouse_to_spark_sql("SELECT * FROM t FINAL")
    with pytest.raises(ValueError, match="final=True"):
        clickhouse_to_spark_sql("SELECT * FROM db.t AS a FINAL WHERE x = 1")
    # SAMPLE likewise: table position raises, a column named sample passes
    with pytest.raises(ValueError, match="SAMPLE"):
        clickhouse_to_spark_sql("SELECT * FROM hits SAMPLE 0.1")
    out = clickhouse_to_spark_sql("SELECT sample + 1 FROM t")
    assert "sample + 1" in out


def test_argmax_argmin_translate_and_execute(spark):
    out = clickhouse_to_spark_sql("SELECT argMax(u, ts), argMin(u, ts) FROM t")
    assert "max_by(u, ts)" in out and "min_by(u, ts)" in out
    spark.range(10).selectExpr(
        "CAST(id % 3 AS INT) AS grp",
        "concat('u', id) AS u",
        "id AS ts",
    ).createOrReplaceTempView("argmax_t")
    rows = spark.sql(
        clickhouse_to_spark_sql(
            "SELECT grp, argMax(u, ts) AS newest, argMin(u, ts) AS oldest, "
            "anyLast(u) AS some FROM argmax_t GROUP BY grp ORDER BY grp"
        )
    ).collect()
    # grp 0: ids 0,3,6,9 -> newest u9, oldest u0
    assert rows[0]["newest"] == "u9" and rows[0]["oldest"] == "u0"
    assert rows[1]["newest"] == "u7" and rows[1]["oldest"] == "u1"
    assert rows[2]["newest"] == "u8" and rows[2]["oldest"] == "u2"
    assert all(r["some"] is not None for r in rows)


def test_from_final_resolves_for_ingested_tables(spark, tmp_path):
    """``FROM t FINAL`` on an engine-ingested ReplacingMergeTree table
    resolves to the version-collapsed view instead of raising; unknown
    tables still raise with the Engine.table pointer."""
    import pytest
    from pyspark.sql import types as T

    stream = tmp_path / "changes"
    stream.mkdir()
    (stream / "b1.jsonl").write_text(
        "\n".join(
            [
                _msg(1, [("versions", "a", 1, "CREATE", {"ver": "1"}),
                          ("versions", "b", 2, "CREATE", {"ver": "1"})]),
                _msg(2, [("versions", "a", 1, "UPDATE", {"ver": "2"})]),
            ]
        )
    )
    cat = Catalog()
    cat.register(
        TableInfo(
            "versions",
            T.StructType(
                [
                    T.StructField("id", T.StringType(), False),
                    T.StructField("ver", T.LongType(), True),
                ]
            ),
            "id",
            engine="ReplacingMergeTree",
            version_column="ver",
        )
    )
    eng = Engine(
        spark,
        EngineConfig(
            warehouse_dir=str(tmp_path / "wh"), checkpoint_dir=str(tmp_path / "ckpt")
        ),
    )
    eng.ingest(str(stream), cat)
    rows = eng.sql(
        "SELECT id, ver FROM versions FINAL ORDER BY id", dialect="clickhouse"
    ).collect()
    assert [(r["id"], r["ver"]) for r in rows] == [("a", 2), ("b", 1)]
    # the literal-safety and unknown-table guards are unchanged
    with pytest.raises(ValueError, match="final=True"):
        eng.sql("SELECT * FROM not_a_table FINAL", dialect="clickhouse")
    out = eng.sql(
        "SELECT 'FROM versions FINAL' AS s, count(*) AS n FROM versions",
        dialect="clickhouse",
    ).collect()[0]
    assert out["s"] == "FROM versions FINAL" and out["n"] == 2


def test_parameterized_aggregates_translate_and_execute(spark):
    out = clickhouse_to_spark_sql(
        "SELECT quantile(0.9)(v) AS q90, quantilesExact(0.5, 0.9)(v) AS qs, "
        "quantileExact(0.25)(v) AS q25, uniqIf(u, v > 5) AS ui, "
        "uniqExactIf(u, v > 5) AS uei FROM t"
    )
    assert "percentile_approx(v, 0.9)" in out
    assert "percentile(v, array(0.5, 0.9))" in out
    assert "percentile(v, 0.25)" in out
    assert "approx_count_distinct(CASE WHEN v > 5 THEN u END)" in out
    assert "count(DISTINCT CASE WHEN v > 5 THEN u END)" in out
    # single-group form is ClickHouse's median default, not an error
    out1 = clickhouse_to_spark_sql("SELECT quantile(0.9) FROM t")
    assert "percentile_approx(0.9, 0.5)" in out1

    spark.range(101).selectExpr(
        "CAST(id AS DOUBLE) AS v", "id % 7 AS u"
    ).createOrReplaceTempView("paggs_t")
    row = spark.sql(
        clickhouse_to_spark_sql(
            "SELECT quantileExact(0.5)(v) AS med, "
            "quantilesExact(0.0, 1.0)(v) AS ends, "
            "uniqExactIf(u, v >= 50) AS uei FROM paggs_t"
        )
    ).collect()[0]
    assert row["med"] == 50.0
    assert list(row["ends"]) == [0.0, 100.0]
    assert row["uei"] == 7


def test_settings_clause_stripped():
    out = clickhouse_to_spark_sql(
        "SELECT count(*) FROM t SETTINGS max_threads = 8, max_memory_usage = '10G'"
    )
    assert "SETTINGS" not in out and out.strip().endswith("FROM t")
    out = clickhouse_to_spark_sql(
        "SELECT 1 SETTINGS max_threads=4 FORMAT JSONEachRow"
    )
    assert out.strip() == "SELECT 1"
    # a column named settings is untouched
    out = clickhouse_to_spark_sql("SELECT settings FROM t WHERE settings = 'x'")
    assert "SELECT settings FROM t" in out


def test_topk_parameterized_executes(spark):
    out = clickhouse_to_spark_sql("SELECT topK(2)(et) AS top FROM t GROUP BY g")
    assert "collect_list(et)" in out and "array_distinct" in out
    spark.range(100).selectExpr(
        "id % 3 AS g",
        "CASE WHEN id % 10 < 5 THEN 'a' WHEN id % 10 < 8 THEN 'b' ELSE 'c' END AS et",
    ).createOrReplaceTempView("topk_t")
    rows = spark.sql(
        clickhouse_to_spark_sql(
            "SELECT g, topK(2)(et) AS top, topK(1)(et) AS top1 "
            "FROM topk_t GROUP BY g ORDER BY g"
        )
    ).collect()
    # per group: 'a' ~50%, 'b' ~30%, 'c' ~20% -> top2 = [a, b]
    for r in rows:
        assert list(r["top"]) == ["a", "b"]
        assert list(r["top1"]) == ["a"]


def test_review_fixes_dialect(spark, tmp_path):
    """Round-3 review findings: FINAL alias/qualified-ref forms resolve;
    SETTINGS never eats a literal; single-group quantile/topK defaults."""
    import pytest
    from pyspark.sql import types as T

    # SETTINGS-shaped text INSIDE a literal must survive verbatim
    out = clickhouse_to_spark_sql("SELECT c FROM t WHERE s = 'x SETTINGS y = 2'")
    assert "'x SETTINGS y = 2'" in out
    # a real SETTINGS clause whose value is a quoted literal strips fine
    out = clickhouse_to_spark_sql("SELECT 1 SETTINGS max_memory_usage = '10G'")
    assert out.strip() == "SELECT 1"
    # single-group forms: ClickHouse defaults (median / k=10)
    out = clickhouse_to_spark_sql("SELECT quantile(v) FROM t")
    assert "percentile_approx(v, 0.5)" in out
    out = clickhouse_to_spark_sql("SELECT topK(v) FROM t")
    assert "slice(" in out and ", 10))[0]" in out
    with pytest.raises(ValueError, match="level list"):
        clickhouse_to_spark_sql("SELECT quantiles(v) FROM t")

    # FINAL with alias + qualified refs, end-to-end through the engine
    stream = tmp_path / "changes"
    stream.mkdir()
    (stream / "b1.jsonl").write_text(
        _msg(1, [("versions", "a", 1, "CREATE", {"ver": "1"})])
    )
    cat = Catalog()
    cat.register(
        TableInfo(
            "versions",
            T.StructType(
                [
                    T.StructField("id", T.StringType(), False),
                    T.StructField("ver", T.LongType(), True),
                ]
            ),
            "id",
            engine="ReplacingMergeTree",
            version_column="ver",
        )
    )
    eng = Engine(
        spark,
        EngineConfig(
            warehouse_dir=str(tmp_path / "wh"), checkpoint_dir=str(tmp_path / "ckpt")
        ),
    )
    eng.ingest(str(stream), cat)
    # alias form keeps the alias; qualified refs keep resolving
    rows = eng.sql(
        "SELECT v.id, v.ver FROM versions AS v FINAL", dialect="clickhouse"
    ).collect()
    assert [(r["id"], r["ver"]) for r in rows] == [("a", 1)]
    # bare form: the view is aliased back to the table name
    rows = eng.sql(
        "SELECT versions.ver FROM versions FINAL", dialect="clickhouse"
    ).collect()
    assert rows[0]["ver"] == 1
    # `FROM t WHERE final` must not parse WHERE as an alias
    rows = eng.sql(
        "SELECT count(*) AS n FROM versions WHERE ver = 1", dialect="clickhouse"
    ).collect()
    assert rows[0]["n"] == 1


if _HAVE_HYP:

    @given(
        n=st.integers(1, 5),
        o=st.integers(0, 3),
        spelling=st.sampled_from(["plain", "comma", "offset"]),
        keys=st.lists(st.sampled_from(["x", "y", "v % 2"]), min_size=1,
                      max_size=2, unique=True),
        order=st.booleans(),
        trailing_limit=st.booleans(),
        totals=st.sampled_from([None, "plain", "having"]),
        cte_totals=st.booleans(),
    )
    @settings(max_examples=150, deadline=None)
    def test_dialect_fuzz_clause_rewrites(
        n, o, spelling, keys, order, trailing_limit, totals, cte_totals
    ):
        """Random combinations of the clause-level rewrites (LIMIT BY
        spellings, WITH TOTALS ± HAVING, a CTE literally named totals)
        stay balanced, fully translated, and structurally correct."""
        import re

        key_sql = ", ".join(keys)
        cte = "WITH totals AS (SELECT 1 AS q) " if cte_totals else ""
        if totals is None:
            body = f"SELECT {key_sql}, v FROM t"
            if order:
                body += " ORDER BY v DESC"
            if spelling == "plain":
                body += f" LIMIT {n} BY {key_sql}"
            elif spelling == "comma":
                body += f" LIMIT {o}, {n} BY {key_sql}"
            else:
                body += f" LIMIT {n} OFFSET {o} BY {key_sql}"
            if trailing_limit:
                body += " LIMIT 7"
        else:
            body = f"SELECT {key_sql}, count() AS n FROM t GROUP BY {key_sql} WITH TOTALS"
            if totals == "having":
                body += " HAVING count() > 1"
            if order:
                body += " ORDER BY n"
        q = cte + body
        out = clickhouse_to_spark_sql(q)
        code = re.sub(r"'(?:[^']|'')*'", "''", out)
        assert code.count("(") == code.count(")"), (q, out)
        # the ClickHouse-only clause forms must be gone (the CTE name
        # 'totals' may legitimately survive)
        assert not re.search(r"\bBY\s*$", code)
        assert not re.search(r"\bLIMIT\s+\d+\s*(,|OFFSET)\s*\d+\s*BY\b", code, re.I)
        if not cte_totals:
            assert not re.search(r"\bWITH\s+TOTALS\b", code, re.I)
        if totals is not None:
            assert "GROUPING SETS" in code
            if totals == "having":
                assert re.search(r"grouping\(", code)
        if totals is None:
            assert "row_number() OVER" in code
            if o and spelling in ("comma", "offset"):
                assert f"__lb_rn > {o}" in code


def test_round5_function_batch(spark):
    """stddevPop/skewPop/kurtPop, toStartOf*/toMonday, dateDiff
    (boundary-crossing), arrayCumSum/Compact/Difference/Avg/Min/Max,
    notEmpty/empty, and bracket array literals."""
    spark.sql(
        "SELECT * FROM VALUES "
        "(1.0, array(3, 1, 2), TIMESTAMP '2024-01-01 23:30:00', TIMESTAMP '2024-01-02 01:00:00'), "
        "(5.0, array(4, 5, 6), TIMESTAMP '2024-01-03 00:00:00', TIMESTAMP '2024-01-03 06:00:00') "
        "AS t(v, a, ts1, ts2)"
    ).createOrReplaceTempView("r5t")
    out = clickhouse_to_spark_sql(
        "SELECT round(stddevPop(v), 6) AS sp, round(skewPop(v), 6) AS sk, "
        "round(kurtPop(v), 6) AS ku FROM r5t"
    )
    r = spark.sql(out).collect()[0]
    # two points {1, 5}: sigma = 2, skew 0, kurtosis mu4/sigma^4 = 1
    assert (r["sp"], r["sk"], r["ku"]) == (2.0, 0.0, 1.0)
    out = clickhouse_to_spark_sql(
        "SELECT dateDiff('day', ts1, ts2) AS dd, dateDiff('hour', ts1, ts2) AS dh, "
        "toStartOfHour(ts1) AS sh, toMonday(ts1) AS mo, "
        "arrayCumSum(a) AS cs, arrayCompact([1, 1, 2, 2, 1]) AS cp, "
        "arrayDifference(a) AS df, arrayAvg(a) AS av, arrayMin(a) AS mn, "
        "notEmpty(a) AS ne, empty([]) AS em "
        "FROM r5t ORDER BY v"
    )
    r = spark.sql(out).collect()[0]
    assert r["dd"] == 1  # 23:30 -> 01:00 crosses ONE midnight (ClickHouse semantics)
    assert r["dh"] == 2  # 23:xx -> 01:xx crosses two hour marks
    assert str(r["sh"]) == "2024-01-01 23:00:00"
    assert str(r["mo"]) == "2024-01-01 00:00:00"  # Jan 1 2024 IS a Monday
    assert r["cs"] == [3.0, 4.0, 6.0]
    assert r["cp"] == [1, 2, 1]
    assert r["df"] == [0.0, -2.0, 1.0]
    assert r["av"] == 2.0 and r["mn"] == 1
    assert r["ne"] is True and r["em"] is True
    # bracket literals vs indexing coexist; subscripts keep
    # ClickHouse's 1-BASED, negative-from-end semantics (element_at)
    out = clickhouse_to_spark_sql(
        "SELECT [10, 20, 30][2] AS x, a[1] AS y, a[-1] AS z FROM r5t ORDER BY v"
    )
    assert "element_at(array(10, 20, 30), 2)" in out
    r = spark.sql(out).collect()[0]
    assert (r["x"], r["y"], r["z"]) == (20, 3, 2)
    # second sub-batch: sketch variants, medians, array utilities,
    # integer ops, function-form arrayJoin
    out = clickhouse_to_spark_sql(
        "SELECT uniqCombined(v) AS u, median(v) AS md, medianExact(v) AS me, "
        "arrayUniq([1, 2, 2, 3]) AS au, countEqual([1, 2, 2, 3], 2) AS ce, "
        "intDiv(7, 2) AS idv, modulo(7, 2) AS mo FROM r5t"
    )
    r = spark.sql(out).collect()[0]
    assert (r["u"], r["md"], r["me"]) == (2, 1.0, 3.0)
    assert (r["au"], r["ce"], r["idv"], r["mo"]) == (3, 2, 3, 1)
    out = clickhouse_to_spark_sql("SELECT arrayJoin(a) AS e FROM r5t WHERE v = 1.0")
    assert sorted(x["e"] for x in spark.sql(out).collect()) == [1, 2, 3]
    import pytest

    with pytest.raises(ValueError, match="unit"):
        clickhouse_to_spark_sql("SELECT dateDiff('fortnight', ts1, ts2) FROM r5t")


def test_with_fill_and_into_outfile_raise_with_guidance():
    import pytest

    with pytest.raises(ValueError, match="gap-fill"):
        clickhouse_to_spark_sql("SELECT h, v FROM t ORDER BY h WITH FILL STEP 1")
    with pytest.raises(ValueError, match="OUTFILE"):
        clickhouse_to_spark_sql("SELECT 1 INTO OUTFILE 'out.csv'")


def test_clickhouse_transform_value_mapping(spark):
    """ClickHouse's transform(x, [from], [to][, default]) — distinct
    from Spark's HOF transform, which must survive untouched (it is
    what arrayMap rewrites to)."""
    spark.sql("SELECT 2 AS x, array(5, 6) AS a").createOrReplaceTempView("xform_t")
    out = clickhouse_to_spark_sql(
        "SELECT transform(x, [1, 2, 3], ['a', 'b', 'c'], 'other') AS m, "
        "transform(9, [1, 2], ['a', 'b']) AS keep, "
        "arrayMap(y -> y * 2, a) AS hof FROM xform_t"
    )
    assert "map_from_arrays" in out and "transform(a, y -> y * 2)" in out
    r = spark.sql(out).collect()[0]
    assert r["m"] == "b" and r["keep"] == 9 and r["hof"] == [10, 12]


def test_asof_and_any_join_guidance():
    import pytest

    # ASOF JOIN translates for real since round 9 (see
    # test_asof_join_rewrite); [LEFT|INNER] ANY JOIN with plain-column
    # equality ON translates since round 10 (dedupe-right + equi join)
    for q in (
        "SELECT a.x, b.y FROM t1 a ANY LEFT JOIN t2 b ON a.k = b.k",
        "SELECT a.x, b.y FROM t1 a LEFT ANY JOIN t2 b ON a.k = b.k",
        "SELECT a.x, b.y FROM t1 a INNER ANY JOIN t2 b ON a.k = b.k",
    ):
        out = clickhouse_to_spark_sql(q)
        assert "min(b) AS b" in out and "GROUP BY __any_k0" in out, out
        assert ("LEFT JOIN" in out) == ("LEFT" in q)
    # USING desugars to the equality ON list (round 11), then the
    # same dedupe-side translation fires
    for q in (
        "SELECT a.x, b.y FROM t1 a ANY LEFT JOIN t2 b USING (k)",
        "SELECT a.x, b.y FROM t1 a LEFT ANY JOIN t2 b USING (k)",
    ):
        out = clickhouse_to_spark_sql(q)
        assert "min(b) AS b" in out and "GROUP BY __any_k0" in out, out
    # FULL ANY (legacy semantics): only the RIGHT side dedupes; the
    # left stays at full multiplicity, struct-wrapped, FULL JOIN
    out = clickhouse_to_spark_sql(
        "SELECT a.x, b.y FROM t1 a FULL ANY JOIN t2 b ON a.k = b.k"
    )
    assert "min(b) AS b" in out and "min(a)" not in out, out
    assert "FULL JOIN" in out, out
    # non-equi ON is not an ANY translation target: curated raise
    with pytest.raises(ValueError, match="ch_any_join"):
        clickhouse_to_spark_sql(
            "SELECT a.x FROM t1 a ANY LEFT JOIN t2 b ON a.k >= b.k"
        )
    # a preceding join in the same FROM scope would corrupt the
    # splice - curated guidance instead of unparseable SQL
    with pytest.raises(ValueError, match="only join"):
        clickhouse_to_spark_sql(
            "SELECT * FROM t0 JOIN t1 k ON t0.k = k.k "
            "RIGHT ANY JOIN t2 b ON k.id = b.id"
        )


def test_any_join_executes(spark):
    """LEFT/INNER ANY JOIN end-to-end: one row per left row, the pick
    pinned to the lexicographically smallest right row, unmatched
    LEFT rows keep NULLs, and the plan joins a PRE-AGGREGATED right
    side (no fan-out: the join input is one row per key)."""
    spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "k int, a int"
    ).createOrReplaceTempView("any_a")
    spark.createDataFrame(
        [(1, 5, "x"), (1, 3, "y"), (2, 7, "z")], "k int, v int, s string"
    ).createOrReplaceTempView("any_b")
    out = spark.sql(clickhouse_to_spark_sql(
        "SELECT a.a AS av, b.v AS bv, b.s AS bs FROM any_a a "
        "ANY LEFT JOIN any_b b ON a.k = b.k ORDER BY av"
    ))
    assert [tuple(r) for r in out.collect()] == [
        (10, 3, "y"),  # min struct of k=1: (1, 3, 'y') < (1, 5, 'x')
        (20, 7, "z"),
        (30, None, None),
    ]
    inner = spark.sql(clickhouse_to_spark_sql(
        "SELECT a.a AS av, b.v AS bv FROM any_a a "
        "INNER ANY JOIN any_b b ON a.k = b.k ORDER BY av"
    ))
    assert [tuple(r) for r in inner.collect()] == [(10, 3), (20, 7)]
    # RIGHT ANY mirrors: every RIGHT row survives, at most one left
    # match each (the LEFT side is the deduped one)
    right = spark.sql(clickhouse_to_spark_sql(
        "SELECT a.a AS av, b.v AS bv FROM any_b b "
        "RIGHT ANY JOIN any_a a ON b.k = a.k ORDER BY av"
    ))
    assert [tuple(r) for r in right.collect()] == [
        (10, 3), (20, 7), (30, None)
    ]
    # SELECT * flattens to left-table star + right struct star
    star = spark.sql(clickhouse_to_spark_sql(
        "SELECT * FROM any_a a ANY LEFT JOIN any_b b ON a.k = b.k"
    ))
    assert star.columns == ["k", "a", "k", "v", "s"]
    # the right side is deduped pre-join (min over struct plans as a
    # SortAggregate - still partial/final, map-side combine intact)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Aggregate" in plan and plan.index("Aggregate") > 0
    # a column named any_join / table alias 'any' must not false-fire
    out = clickhouse_to_spark_sql("SELECT any_join FROM t")
    assert "any_join" in out
    # the word ANY inside a string literal is opaque
    out = clickhouse_to_spark_sql("SELECT 'ANY LEFT JOIN' AS s FROM t")
    assert "ANY LEFT JOIN" in out


def test_full_any_join_executes(spark):
    """FULL ANY JOIN end-to-end (legacy ClickHouse semantics): EVERY
    left row survives with at most one pinned right match; each
    unmatched right KEY appears once with NULL left legs; left-row
    multiplicity is never changed."""
    spark.createDataFrame(
        [(1, 10), (1, 9), (2, 20)], "k int, a int"
    ).createOrReplaceTempView("fany_a")
    spark.createDataFrame(
        [(1, 5, "x"), (1, 3, "y"), (3, 7, "z")], "k int, v int, s string"
    ).createOrReplaceTempView("fany_b")
    out = spark.sql(clickhouse_to_spark_sql(
        "SELECT a.k AS lk, a.a AS av, b.k AS rk, b.v AS bv FROM fany_a a "
        "FULL ANY JOIN fany_b b ON a.k = b.k"
    ))
    got = sorted(
        [tuple(r) for r in out.collect()],
        key=lambda r: tuple((x is None, x or 0) for x in r),
    )
    assert got == [
        (1, 9, 1, 3),          # both k=1 left rows keep the min right
        (1, 10, 1, 3),         #   struct (1, 3, 'y')
        (2, 20, None, None),   # left-only row
        (None, None, 3, 7),    # right-only KEY, once
    ]
    # the right side pre-aggregates to key cardinality - the join can
    # never fan out a left row across right duplicates
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Aggregate") >= 2


def test_any_and_asof_using_execute(spark):
    """USING desugars to the ON equality list (ANY) / equality list +
    trailing >= closest-match column (ASOF), then the normal
    translations fire."""
    spark.createDataFrame(
        [(1, 100), (2, 200)], "k int, t int"
    ).createOrReplaceTempView("us_a")
    spark.createDataFrame(
        [(1, 90, "early"), (1, 99, "late"), (1, 101, "after"), (2, 300, "no")],
        "k int, t int, s string",
    ).createOrReplaceTempView("us_b")
    out = spark.sql(clickhouse_to_spark_sql(
        "SELECT a.k AS k, a.t AS at, b.t AS bt, b.s AS bs "
        "FROM us_a a ASOF LEFT JOIN us_b b USING (k, t) ORDER BY k"
    ))
    assert [tuple(r) for r in out.collect()] == [
        (1, 100, 99, "late"),   # closest t <= 100
        (2, 200, None, None),   # no b.t <= 200 for k=2
    ]
    out = spark.sql(clickhouse_to_spark_sql(
        "SELECT a.k AS k, b.t AS bt FROM us_a a "
        "ANY LEFT JOIN us_b b USING (k) ORDER BY k"
    ))
    assert [tuple(r) for r in out.collect()] == [(1, 90), (2, 300)]


def test_arrayfold_and_tostartofinterval():
    out = clickhouse_to_spark_sql(
        "SELECT arrayFold((acc, x) -> acc + x, [1, 2, 3], CAST(0 AS BIGINT))"
    )
    assert "aggregate(array(1, 2, 3), CAST(0 AS BIGINT), (acc, x) -> acc + x)" in out
    out = clickhouse_to_spark_sql(
        "SELECT toStartOfInterval(ts, INTERVAL 15 MINUTE) FROM t"
    )
    assert "floor(unix_timestamp(ts) / 900) * 900" in out
    out = clickhouse_to_spark_sql(
        "SELECT toStartOfInterval(ts, INTERVAL 3 MONTH) FROM t"
    )
    assert "months_between" in out and "* 3" in out
    import pytest

    with pytest.raises(ValueError, match="toMonday"):
        clickhouse_to_spark_sql(
            "SELECT toStartOfInterval(ts, INTERVAL 1 WEEK) FROM t"
        )


def test_array_mutation_family():
    out = clickhouse_to_spark_sql("SELECT arrayPushBack([1,2], 3)")
    assert "concat(array(1,2), array(3))" in out.replace("1, 2", "1,2")
    out = clickhouse_to_spark_sql("SELECT arrayPopFront(a) FROM t")
    assert "slice(a, 2, greatest(size(a) - 1, 0))" in out
    out = clickhouse_to_spark_sql("SELECT arrayRotateRight(a, -3) FROM t")
    assert "pmod(-(-3), size(a))" in out
    out = clickhouse_to_spark_sql("SELECT arrayStringConcat(a) FROM t")
    assert "array_join(a, '')" in out
    import pytest

    # an UNCATALOGED column stays a curated raise (fill unknowable)
    with pytest.raises(ValueError, match="explicit fill"):
        clickhouse_to_spark_sql("SELECT arrayResize(a, 7) FROM t")


def test_array_resize_default_fill_inference():
    """2-arg arrayResize/arrayShift*: the type-default pad element is
    inferred for array literals (lexically) and cataloged columns
    (column_types lookup); opaque expressions keep the raise."""
    import pytest

    # literal legs: Int -> 0, Float -> 0.0d, String -> ''
    assert "array_repeat(0," in clickhouse_to_spark_sql(
        "SELECT arrayResize([1, 2], 5)"
    )
    assert "array_repeat(CAST(0 AS DOUBLE)," in clickhouse_to_spark_sql(
        "SELECT arrayResize([1.5], 3)"
    )
    assert "array_repeat(''," in clickhouse_to_spark_sql(
        "SELECT arrayResize(['a'], 3)"
    )
    # cataloged column: element type from the lookup
    out = clickhouse_to_spark_sql(
        "SELECT arrayResize(arr, 5) FROM t",
        column_types={"arr": "ARRAY<BIGINT>"},
    )
    assert "array_repeat(CAST(0 AS BIGINT)," in out
    out = clickhouse_to_spark_sql(
        "SELECT arrayShiftLeft(sarr, 1) FROM t",
        column_types={"sarr": "array<string>"},
    )
    assert "array_repeat(''," in out
    # the context must not leak into the next translation
    with pytest.raises(ValueError, match="explicit fill"):
        clickhouse_to_spark_sql("SELECT arrayResize(arr, 5) FROM t")
    # opaque expression: still a raise even with a catalog
    with pytest.raises(ValueError, match="explicit fill"):
        clickhouse_to_spark_sql(
            "SELECT arrayResize(arrayConcat(arr, arr), 5) FROM t",
            column_types={"arr": "ARRAY<BIGINT>"},
        )
    # empty literal: element type unknowable
    with pytest.raises(ValueError, match="explicit fill"):
        clickhouse_to_spark_sql("SELECT arrayResize([], 5)")


def test_bit_scalar_family():
    out = clickhouse_to_spark_sql("SELECT bitAnd(a, b), bitXor(a, 3) FROM t")
    assert "((a) & (b))" in out and "((a) ^ (3))" in out
    out = clickhouse_to_spark_sql("SELECT bitNot(a), bitShiftLeft(a, 2) FROM t")
    assert "(~(a))" in out and "shiftleft(a, CAST(2 AS INT))" in out
    out = clickhouse_to_spark_sql("SELECT bitCount(a), covarPop(a, b) FROM t")
    assert "bit_count(a)" in out and "covar_pop(a, b)" in out


def test_quantile_exact_weighted():
    out = clickhouse_to_spark_sql(
        "SELECT quantileExactWeighted(0.9)(value, w) AS p90 FROM t"
    )
    assert "percentile(value, 0.9, w)" in out
    out = clickhouse_to_spark_sql("SELECT quantileExactWeighted(x, w) FROM t")
    assert "percentile(x, 0.5, w)" in out


def test_geohash_known_vectors(spark):
    # canonical test vectors from the geohash reference implementation
    from substreams_sink_clickhouse_spark.functions.hashing import geohash_sql

    # full 11-char value from the geohash literature for the first
    # vector; widely-cited 6-char prefixes for the rest, plus
    # cross-engine byte equality at full precision for all
    cases = [
        (57.64911, 10.40744, "u4pruydqqvj"),
        (48.8566, 2.3522, "u09tvw"),
        (-33.8688, 151.2093, "r3gx2f"),
        (0.0, 0.0, "s00000"),
    ]
    import duckdb

    for lat, lng, expect in cases:
        got = spark.sql(
            f"SELECT {geohash_sql(str(lat), str(lng), 11, 'spark')} AS gh"
        ).collect()[0]["gh"]
        dgot = duckdb.sql(
            f"SELECT {geohash_sql(str(lat), str(lng), 11, 'duckdb')} AS gh"
        ).fetchone()[0]
        assert got == dgot, (lat, lng, got, dgot)
        assert got.startswith(expect), (lat, lng, got, expect)


def test_array_set_predicates():
    out = clickhouse_to_spark_sql("SELECT arrayIntersect(a, b, c) FROM t")
    assert "array_intersect(array_intersect(a, b), c)" in out
    out = clickhouse_to_spark_sql("SELECT hasAll(a, b), hasAny(a, b) FROM t")
    assert "(size(array_except(b, a)) = 0)" in out
    assert "arrays_overlap(a, b)" in out
    out = clickhouse_to_spark_sql("SELECT arrayZip(a, b) FROM t")
    assert "arrays_zip(a, b)" in out


def test_geohash_decode_roundtrip(spark):
    from substreams_sink_clickhouse_spark.functions.hashing import (
        geohash_decode_sql,
        geohash_sql,
    )

    cases = [(57.64911, 10.40744), (48.8566, 2.3522), (-33.8688, 151.2093)]
    for lat0, lng0 in cases:
        gh = geohash_sql(str(lat0), str(lng0), 11, "spark")
        dlat, dlng = geohash_decode_sql(gh, "spark")
        r = spark.sql(f"SELECT {dlat} AS la, {dlng} AS lo").collect()[0]
        # 11-char cell: lat step 180/2^27, lng step 360/2^28
        assert abs(r.la - lat0) <= 180 / 2**27
        assert abs(r.lo - lng0) <= 360 / 2**28


def test_date_arithmetic_family():
    out = clickhouse_to_spark_sql(
        "SELECT addDays(ts, 3), subtractHours(ts, n + 1), addMonths(ts, 2) FROM t"
    )
    assert "timestampadd(DAY, 3, ts)" in out
    assert "timestampadd(HOUR, -(n + 1), ts)" in out
    assert "timestampadd(MONTH, 2, ts)" in out
    out = clickhouse_to_spark_sql("SELECT toLastDayOfMonth(ts), now() FROM t")
    assert "last_day(ts)" in out and "current_timestamp()" in out


def test_age_function():
    out = clickhouse_to_spark_sql("SELECT age('month', a, b) FROM t")
    assert "timestampdiff(MONTH, a, b)" in out
    import pytest

    with pytest.raises(ValueError, match="age unit"):
        clickhouse_to_spark_sql("SELECT age('fortnight', a, b) FROM t")


def test_json_function_family():
    out = clickhouse_to_spark_sql("SELECT JSONExtractInt(p, 'a', 'b') FROM t")
    assert "CAST(get_json_object(p, concat('$', '.', 'a', '.', 'b')) AS BIGINT)" in out
    out = clickhouse_to_spark_sql("SELECT JSONExtractKeys(p), JSONLength(p) FROM t")
    assert "json_object_keys(p)" in out
    assert "coalesce(json_array_length(p), size(json_object_keys(p)))" in out
    out = clickhouse_to_spark_sql("SELECT isValidJSON(p) FROM t")
    assert "(get_json_object(p, '$') IS NOT NULL)" in out


def test_format_readable_edges_executed(spark):
    q = clickhouse_to_spark_sql(
        "SELECT formatReadableSize(0) AS z, formatReadableSize(1023) AS a,"
        " formatReadableSize(1024) AS b, formatReadableSize(-1536) AS n,"
        " formatReadableQuantity(999) AS q1, formatReadableQuantity(1000) AS q2"
    )
    r = spark.sql(q).collect()[0]
    assert r.z == "0.00 B" and r.a == "1023.00 B" and r.b == "1.00 KiB"
    assert r.n == "-1.50 KiB"
    assert r.q1 == "999.00" and r.q2 == "1.00 thousand"


def test_datetime_wraps_executed(spark):
    q = clickhouse_to_spark_sql(
        "SELECT toDayOfWeek(CAST('2024-01-01' AS TIMESTAMP)) AS mon,"  # a Monday
        " toDayOfWeek(CAST('2024-01-07' AS TIMESTAMP)) AS sun,"
        " toYYYYMMDD(CAST('2024-03-05' AS TIMESTAMP)) AS ymd,"
        " age('day', CAST('2024-01-01 23:00:00' AS TIMESTAMP),"
        "            CAST('2024-01-02 01:00:00' AS TIMESTAMP)) AS age_d,"
        " dateDiff('day', CAST('2024-01-01 23:00:00' AS TIMESTAMP),"
        "                 CAST('2024-01-02 01:00:00' AS TIMESTAMP)) AS diff_d"
    )
    r = spark.sql(q).collect()[0]
    assert (r.mon, r.sun) == (1, 7)
    assert r.ymd == 20240305
    # age counts COMPLETE days (0); dateDiff counts crossed boundaries (1)
    assert (r.age_d, r.diff_d) == (0, 1)


def test_url_batch2():
    out = clickhouse_to_spark_sql("SELECT cutQueryString(u), fragment(u) FROM t")
    assert "substring_index(u, '?', 1)" in out
    assert "coalesce(parse_url(u, 'REF'), '')" in out
    out = clickhouse_to_spark_sql("SELECT domainWithoutWWW(u), protocol(u) FROM t")
    assert "regexp_replace(coalesce(parse_url(u, 'HOST'), '')" in out
    assert "parse_url(u, 'PROTOCOL')" in out


def test_regex_tuple_batch():
    out = clickhouse_to_spark_sql("SELECT regexpExtract(s, 'p') FROM t")
    assert "regexp_extract(s, 'p', 1)" in out
    out = clickhouse_to_spark_sql("SELECT tupleElement(tuple(a, b + 1), 2) FROM t")
    assert "(named_struct('col1', a, 'col2', b + 1)).col2" in out
    import pytest

    with pytest.raises(ValueError, match="literal index"):
        clickhouse_to_spark_sql("SELECT tupleElement(t, n) FROM t")


@settings(max_examples=60, deadline=None)
@given(
    lat=st.floats(min_value=-85, max_value=85, allow_nan=False),
    lng=st.floats(min_value=-179.9, max_value=179.9, allow_nan=False),
)
def test_geohash_roundtrip_property(lat, lng):
    # encode -> decode stays within one cell, evaluated on DuckDB
    # (cross-engine equality is pinned by test_geohash_known_vectors)
    import duckdb

    from substreams_sink_clickhouse_spark.functions.hashing import (
        geohash_decode_sql,
        geohash_sql,
    )

    gh = geohash_sql(
        f"CAST({lat!r} AS DOUBLE)", f"CAST({lng!r} AS DOUBLE)", 11, "duckdb"
    )
    dlat, dlng = geohash_decode_sql(gh, "duckdb")
    la, lo = duckdb.sql(f"SELECT {dlat}, {dlng}").fetchone()
    assert abs(la - lat) <= 180 / 2**27
    assert abs(lo - lng) <= 360 / 2**28


def test_round6_string_batch():
    out = clickhouse_to_spark_sql("SELECT replaceAll(s, '-', '+') FROM t")
    assert "replace(s, '-', '+')" in out
    out = clickhouse_to_spark_sql("SELECT replaceOne(s, '-', '+') FROM t")
    assert "instr(s, '-')" in out and "CASE WHEN" in out
    # literal replacement backrefs convert \1 -> $1 (re2 -> Java),
    # both the raw and the SQL-escaped backslash spellings
    out = clickhouse_to_spark_sql(r"SELECT replaceRegexpAll(s, '(\\d+)', '<\\1>') FROM t")
    assert r"regexp_replace(s, '(\\d+)', '<$1>')" in out
    out = clickhouse_to_spark_sql("SELECT replaceRegexpAll(s, '(x)', '<\\1>') FROM t")
    assert "'<$1>'" in out
    # extractAll: group 1 when the literal pattern captures, else whole
    out = clickhouse_to_spark_sql(r"SELECT extractAll(s, '(\\d+)') FROM t")
    assert "regexp_extract_all(s, " in out and ", 1)" in out
    out = clickhouse_to_spark_sql(r"SELECT extractAll(s, '\\w+') FROM t")
    assert ", 0)" in out
    out = clickhouse_to_spark_sql("SELECT leftPad(s, 3, '0'), rightPad(s, 3, 'x') FROM t")
    assert "lpad(s, 3, '0')" in out and "rpad(s, 3, 'x')" in out
    out = clickhouse_to_spark_sql("SELECT base64Encode(s), base64Decode(s) FROM t")
    assert "base64(s)" in out and "CAST(unbase64(s) AS STRING)" in out


def test_round6_or_cast_family():
    out = clickhouse_to_spark_sql("SELECT toInt64OrNull(s), toInt64OrZero(s) FROM t")
    assert "TRY_CAST(s AS BIGINT)" in out
    assert "coalesce(TRY_CAST(s AS BIGINT), CAST(0 AS BIGINT))" in out
    out = clickhouse_to_spark_sql("SELECT toDateOrZero(s) FROM t")
    assert "coalesce(TRY_CAST(s AS DATE), DATE '1970-01-01')" in out
    out = clickhouse_to_spark_sql("SELECT toFloat64OrNull(s) FROM t")
    assert "TRY_CAST(s AS DOUBLE)" in out


def test_round6_array_and_float_classifiers():
    out = clickhouse_to_spark_sql("SELECT arraySlice(a, 2, 3), arraySlice(a, 2) FROM t")
    assert "slice(a, 2, 3)" in out and "slice(a, 2, size(a))" in out
    out = clickhouse_to_spark_sql("SELECT arrayEnumerate(a) FROM t")
    assert "sequence(1, size(a))" in out and "CASE WHEN size(a) = 0" in out
    out = clickhouse_to_spark_sql("SELECT isNaN(x), isFinite(x), isInfinite(x) FROM t")
    assert "CAST(isnan(x) AS INT)" in out
    assert "NOT isnan(x)" in out and out.count("AS INT") == 3


def test_round6_date_arith_executed(spark):
    out = clickhouse_to_spark_sql(
        "SELECT dateAdd('day', 3, toDate('2024-01-01')) AS a, "
        "dateSub(MONTH, 1, toDate('2024-03-15')) AS s, "
        "fromUnixTimestamp(86400) AS f"
    )
    r = spark.sql(out).collect()[0]
    assert str(r.a)[:10] == "2024-01-04"
    assert str(r.s)[:10] == "2024-02-15"
    assert str(r.f) == "1970-01-02 00:00:00"
    import pytest

    with pytest.raises(ValueError, match="unit"):
        clickhouse_to_spark_sql("SELECT dateAdd('fortnight', 1, d) FROM t")


def test_round6_group_bit_aggregates(spark):
    out = clickhouse_to_spark_sql(
        "SELECT groupBitAnd(x) AS a, groupBitOr(x) AS o, groupBitXor(x) AS x2 "
        "FROM (SELECT 12 AS x UNION ALL SELECT 10)"
    )
    r = spark.sql(out).collect()[0]
    assert (r.a, r.o, r.x2) == (8, 14, 6)


def test_round6_hof_first_last_family(spark):
    got = spark.sql(clickhouse_to_spark_sql(
        "SELECT arrayFirst(x -> x > 2, [1,2,3,4]) AS f, "
        "arrayLast(x -> x > 1, [1,2,3,4]) AS l, "
        "arrayFirstIndex(x -> x > 2, [1,2,3,4]) AS fi, "
        "arrayLastIndex(x -> x > 1, [1,2,3,4]) AS li, "
        "arrayFirst(x -> x > 9, [1,2,3]) AS f0, "
        "arrayFirstIndex(x -> x > 9, [1,2,3]) AS fi0, "
        "arrayLastIndex(x -> x > 9, [1,2,3]) AS li0"
    )).collect()[0]
    assert (got.f, got.l, got.fi, got.li) == (3, 4, 3, 4)
    # no match: NULL element (documented deviation from ClickHouse's
    # type default) but EXACT 0 for the index forms
    assert got.f0 is None and got.fi0 == 0 and got.li0 == 0


def test_round6_misc_scalars(spark):
    got = spark.sql(clickhouse_to_spark_sql(
        "SELECT splitByWhitespace('  a  b c ') AS s, "
        "ifNotFinite(CAST('Infinity' AS DOUBLE), -1.0) AS inf_repl, "
        "ifNotFinite(2.5, -1.0) AS kept, "
        "bitTest(5, 0) AS b0, bitTest(5, 1) AS b1, "
        "mapFromArrays(['a','b'], [1,2])['b'] AS mv"
    )).collect()[0]
    assert list(got.s) == ["a", "b", "c"]
    assert (got.inf_repl, got.kept, got.b0, got.b1, got.mv) == (-1.0, 2.5, 1, 0, 2)


def test_round6_array_reduce_and_reverse_sort(spark):
    got = spark.sql(clickhouse_to_spark_sql(
        "SELECT arrayReduce('max', [3,1,2]) AS mx, "
        "arrayReduce('sum', [1,2,3]) AS sm, "
        "arrayReduce('sum', [9007199254740993, 1]) AS sm_big, "
        "arrayReduce('sum', [1.5, 2.0]) AS sm_d, "
        "arrayReduce('sum', CAST(array() AS ARRAY<BIGINT>)) AS sm_empty, "
        "arrayReduce('avg', [1, 2]) AS av, "
        "arrayReduce('uniqExact', [1,1,2]) AS u, "
        "arrayReverseSort([2,3,1]) AS rs, "
        "toTypeName(1) AS tn"
    )).collect()[0]
    # integer arrays sum EXACTLY on a BIGINT accumulator (ClickHouse
    # returns Int64; a DOUBLE fold would round 2^53+1 — r6 advisory);
    # fractional arrays keep their float fold; avg is always Float64
    assert (got.mx, got.sm, got.u) == (3, 6, 2)
    assert isinstance(got.sm, int)
    assert got.sm_big == 9007199254740994  # exact above 2^53
    assert got.sm_d == 3.5
    assert got.sm_empty == 0
    assert got.av == 1.5
    assert list(got.rs) == [3, 2, 1]
    assert got.tn == "int"
    import pytest

    with pytest.raises(ValueError, match="arrayReduce supports"):
        clickhouse_to_spark_sql("SELECT arrayReduce('median', a) FROM t")
    # the keyed-lambda form is supported since round 7 (dialect_ext);
    # executed coverage lives in tests/test_dialect_ext.py
    out = clickhouse_to_spark_sql("SELECT arrayReverseSort(x -> -x, a) FROM t")
    assert "array_sort" in out


def test_round7_string_sim_batch(spark):
    from substreams_sink_clickhouse_spark.functions.dialect import (
        clickhouse_to_spark_sql,
    )

    got = spark.sql(clickhouse_to_spark_sql(
        "SELECT arrayJaccardIndex([1,2,3], [2,3,4]) AS jac, "
        "ngrams('abcd', 3) AS ng, ngrams('ab', 3) AS ng_short, "
        "tokens('foo, bar_9!baz') AS tok, "
        "multiSearchFirstIndex('hello world', ['world', 'hello']) AS msi, "
        "multiSearchFirstIndex('hello', ['x', 'y']) AS msi0, "
        "editDistance('kitten', 'sitting') AS ed, "
        "toDecimalString(3.14159, 2) AS ds"
    )).collect()[0]
    assert got.jac == 0.5
    assert list(got.ng) == ["abc", "bcd"]
    assert list(got.ng_short) == []
    assert list(got.tok) == ["foo", "bar_9", "baz"]
    # leftmost MATCH wins, not list order: 'hello' is at position 1
    assert (got.msi, got.msi0) == (2, 0)
    assert got.ed == 3
    assert got.ds == "3.14"


def test_round7_map_batch(spark):
    from substreams_sink_clickhouse_spark.functions.dialect import (
        clickhouse_to_spark_sql,
    )

    got = spark.sql(clickhouse_to_spark_sql(
        "SELECT mapFilter((k, v) -> v > 1, mapFromArrays(['a','b'], [1,2])) AS mf, "
        "mapApply((k, v) -> (upper(k), v * 2), mapFromArrays(['a'], [3])) AS ma, "
        "mapUpdate(mapFromArrays(['a','b'],[1,2]), mapFromArrays(['b'],[9])) AS mu"
    )).collect()[0]
    assert dict(got.mf) == {"b": 2}
    assert dict(got.ma) == {"A": 6}
    assert dict(got.mu) == {"a": 1, "b": 9}
    import pytest

    with pytest.raises(ValueError, match="mapApply"):
        clickhouse_to_spark_sql("SELECT mapApply(v -> v, m) FROM t")


def test_round7_array_and_stats_batch(spark):
    from substreams_sink_clickhouse_spark.functions.dialect import (
        clickhouse_to_spark_sql,
    )

    got = spark.sql(clickhouse_to_spark_sql(
        "SELECT arrayEnumerateUniq([10,10,20,10]) AS enu, "
        "arrayRotateLeft([1,2,3,4,5], 2) AS rl, "
        "arrayRotateRight([1,2,3,4,5], 1) AS rr, "
        "arrayRotateLeft([1,2,3], -1) AS rneg, "
        "arrayRotateLeft(CAST(array() AS ARRAY<INT>), 3) AS rempty, "
        "toUnixTimestamp64Milli(CAST('2020-01-01 00:00:00' AS TIMESTAMP)) AS ms"
    )).collect()[0]
    assert list(got.enu) == [1, 2, 1, 3]
    assert list(got.rl) == [3, 4, 5, 1, 2]
    assert list(got.rr) == [5, 1, 2, 3, 4]
    assert list(got.rneg) == [3, 1, 2]
    assert list(got.rempty) == []
    assert got.ms == 1577836800000


def test_round7_agg_batch(spark):
    from substreams_sink_clickhouse_spark.functions.dialect import (
        clickhouse_to_spark_sql,
    )

    got = spark.sql(clickhouse_to_spark_sql(
        "SELECT entropy(v) AS ent, "
        "tupleElement(simpleLinearRegression(x, y), 1) AS slope, "
        "tupleElement(simpleLinearRegression(x, y), 2) AS icept "
        "FROM (SELECT 1 AS v, 1.0 AS x, 3.0 AS y "
        "UNION ALL SELECT 1, 2.0, 5.0 "
        "UNION ALL SELECT 2, 3.0, 7.0 UNION ALL SELECT 2, 4.0, 9.0)"
    )).collect()[0]
    assert got.ent == 1.0  # two values, 50/50 -> 1 bit
    assert abs(got.slope - 2.0) < 1e-12 and abs(got.icept - 1.0) < 1e-12


def test_round7_partial_sort_and_nary_uniq(spark):
    from substreams_sink_clickhouse_spark.functions.dialect import (
        clickhouse_to_spark_sql,
    )

    got = spark.sql(clickhouse_to_spark_sql(
        "SELECT arrayUniq([1,2,1]) AS u1, "
        "arrayUniq([1,1,2], [1,2,2]) AS u2, "  # distinct TUPLES
        "arrayPartialSort(2, [3,1,2]) AS ps, "
        "arrayPartialReverseSort(1, [3,1,2]) AS prs"
    )).collect()[0]
    assert (got.u1, got.u2) == (2, 3)
    assert list(got.ps) == [1, 2, 3]
    assert list(got.prs) == [3, 2, 1]


def test_round7_regex_extract(spark):
    """ClickHouse's two-arg extract(haystack, pattern) is a regex
    first-match (capture group 1 when present); the SQL-standard
    EXTRACT(field FROM ts) form passes through untouched."""
    from substreams_sink_clickhouse_spark.functions.dialect import (
        clickhouse_to_spark_sql,
    )

    got = spark.sql(clickhouse_to_spark_sql(
        "SELECT extract('ab12cd', '\\\\d+') AS m, "
        "extract('key=val', 'key=(\\\\w+)') AS g, "
        "extract('no digits', '\\\\d+') AS miss, "
        "extract(YEAR FROM CAST('2020-03-04' AS TIMESTAMP)) AS y"
    )).collect()[0]
    assert (got.m, got.g, got.miss, got.y) == ("12", "val", "", 2020)


def test_round7_array_combinators(spark):
    """-Array aggregate combinators fold per row (map-side, no
    explode) then aggregate; -Distinct spellings map to DISTINCT."""
    from substreams_sink_clickhouse_spark.functions.dialect import (
        clickhouse_to_spark_sql,
    )

    got = spark.sql(clickhouse_to_spark_sql(
        "SELECT sumArray(a) AS s, minArray(a) AS mn, maxArray(a) AS mx, "
        "avgArray(a) AS av, countArray(a) AS c, "
        "arraySort(groupArrayArray(a)) AS g, "
        "sumDistinct(x) AS sd, avgDistinct(x) AS ad "
        "FROM (SELECT [1, 2] AS a, 5 AS x "
        "UNION ALL SELECT [3], 5 UNION ALL SELECT [], 7)"
    )).collect()[0]
    assert (got.s, got.mn, got.mx, got.av, got.c) == (6, 1, 3, 2.0, 3)
    assert isinstance(got.s, int)  # integer-exact fold
    assert list(got.g) == [1, 2, 3]
    assert (got.sd, got.ad) == (12, 6.0)


def test_round7_topk_weighted(spark):
    """topKWeighted(k)(x, w): k values with the largest weight sums,
    exact (superset of ClickHouse's sketch guarantee), value
    tie-break; integral weights fold on BIGINT."""
    from substreams_sink_clickhouse_spark.functions.dialect import (
        clickhouse_to_spark_sql,
    )

    got = spark.sql(clickhouse_to_spark_sql(
        "SELECT topKWeighted(2)(x, w) AS t, topKWeighted(x, w) AS t10 "
        "FROM (SELECT 'a' AS x, 1 AS w UNION ALL SELECT 'b', 5 "
        "UNION ALL SELECT 'a', 3 UNION ALL SELECT 'c', 4)"
    )).collect()[0]
    assert list(got.t) == ["b", "a"]  # weights: b=5, a=4, c=4 (a<c tie... )
    assert list(got.t10) == ["b", "a", "c"]


def test_round7_comma_cast_intervals_lag(spark):
    """ClickHouse's comma CAST(x, 'Type') resolves the type string
    through the DDL map; accurateCastOrNull is TRY_CAST; toInterval*
    builds calendar intervals; lagInFrame/leadInFrame are lag/lead."""
    from substreams_sink_clickhouse_spark.functions.dialect import (
        clickhouse_to_spark_sql,
    )

    got = spark.sql(clickhouse_to_spark_sql(
        "SELECT CAST('42', 'Int64') AS c, "
        "CAST(7 AS BIGINT) AS std, "
        "accurateCastOrNull('nope', 'Int64') AS tn, "
        "CAST('2020-01-10 00:00:00' AS TIMESTAMP) + toIntervalDay(3) AS d3, "
        "CAST('2020-01-10 00:00:00' AS TIMESTAMP) + toIntervalQuarter(1) AS q1"
    )).collect()[0]
    assert (got.c, got.std, got.tn) == (42, 7, None)
    assert str(got.d3).startswith("2020-01-13")
    assert str(got.q1).startswith("2020-04-10")
    got2 = spark.sql(clickhouse_to_spark_sql(
        "SELECT x, lagInFrame(x, 1, -1) OVER (ORDER BY x) AS lg, "
        "leadInFrame(x) OVER (ORDER BY x) AS ld "
        "FROM (SELECT 1 AS x UNION ALL SELECT 2) ORDER BY x"
    )).collect()
    assert [(r.lg, r.ld) for r in got2] == [(-1, 2), (1, None)]


def test_round7_folds_match_python_model(spark):
    """arrayReduce('sum'), sumArray/avgArray, arrayEnumerateUniq and
    arrayUniq agree with a Python model over 200 seeded-random integer
    arrays (incl. negatives, duplicates, empties, 2^53-boundary
    values) — ONE Spark job, values compared row-by-row."""
    import random

    rng = random.Random(7)
    big = 9007199254740993  # 2^53 + 1: breaks a DOUBLE fold
    arrays = [[]]
    for _ in range(199):
        n = rng.randrange(0, 8)
        arrays.append(
            [rng.choice([rng.randrange(-50, 50), big, -big]) for _ in range(n)]
        )
    from substreams_sink_clickhouse_spark.functions.dialect import (
        clickhouse_to_spark_sql,
    )

    df = spark.createDataFrame(
        [(i, a) for i, a in enumerate(arrays)], "i INT, a ARRAY<BIGINT>"
    )
    df.createOrReplaceTempView("fold_t")
    rows = spark.sql(clickhouse_to_spark_sql(
        "SELECT i, arrayReduce('sum', a) AS s, "
        "arrayEnumerateUniq(a) AS enu, arrayUniq(a) AS u "
        "FROM fold_t"
    )).collect()
    for r in rows:
        a = arrays[r.i]
        assert r.s == sum(a), (r.i, a)
        seen: dict = {}
        model = []
        for x in a:
            seen[x] = seen.get(x, 0) + 1
            model.append(seen[x])
        assert list(r.enu) == model, (r.i, a)
        assert r.u == len(set(a)), (r.i, a)


def test_round7_map_apply_rejects_rebinding():
    """A nested lambda that rebinds the outer (k, v) would be
    corrupted by the textual substitution — refused explicitly."""
    import pytest

    from substreams_sink_clickhouse_spark.functions.dialect import (
        clickhouse_to_spark_sql,
    )

    with pytest.raises(ValueError, match="rebinds"):
        clickhouse_to_spark_sql(
            "SELECT mapApply((k, v) -> (k, arrayMap(v -> v + 1, a)), m) FROM t"
        )
    # a nested lambda over a FRESH name is fine
    out = clickhouse_to_spark_sql(
        "SELECT mapApply((k, v) -> (k, arrayMap(z -> z + v, a)), m) FROM t"
    )
    assert "map_from_entries" in out and "__e.value" in out


def test_asof_join_rewrite():
    """ClickHouse ASOF JOIN translation shapes: the bounded
    union+last_value path for plain-column ON, the fan-out fallback
    for expression ON, the WHERE handling of each, and the raises."""
    import pytest

    # plain-column ON -> BOUNDED shape: union + running last_value,
    # no join operator anywhere in the rewritten text
    out = clickhouse_to_spark_sql(
        "SELECT a.x, b.y FROM t1 AS a ASOF JOIN t2 AS b "
        "ON a.k = b.k AND a.t >= b.t"
    )
    assert "UNION ALL" in out and "last_value(b, true)" in out
    assert "PARTITION BY __asof_k0" in out
    assert "ORDER BY __asof_ts ASC, __asof_side ASC" in out
    assert "AND b IS NOT NULL" in out  # inner join needs a match
    assert "JOIN" not in out.replace("UNION ALL", "")
    assert "__asof_rn" not in out
    # bare aliases + LEFT + reversed inequality (b-side on the left):
    # still bounded, WHERE stays untouched, LEFT keeps unmatched rows
    out = clickhouse_to_spark_sql(
        "SELECT a.x FROM t1 a ASOF LEFT JOIN t2 b "
        "ON a.k = b.k AND b.ts <= a.ts WHERE a.x > 0"
    )
    assert "last_value(b, true)" in out
    assert "ORDER BY __asof_ts ASC" in out  # b lower bound -> forward
    assert "WHERE __asof_side = 1)" in out  # no IS-NOT-NULL match gate
    assert "WHERE a.x > 0" in out
    # upper-bound direction: b >= a -> closest match is MIN -> walk
    # time backward; strict op -> left sorts first at equal ts
    out = clickhouse_to_spark_sql(
        "SELECT a.x FROM t1 a ASOF JOIN t2 b ON a.k = b.k AND b.ts > a.ts"
    )
    assert "ORDER BY __asof_ts DESC, __asof_side DESC" in out
    # expression ON -> FALLBACK shape: equi-join + top-1 window
    out = clickhouse_to_spark_sql(
        "SELECT a.x, b.y FROM t1 AS a ASOF JOIN t2 AS b "
        "ON a.k = b.k AND a.t >= b.t + 1"
    )
    assert (
        "row_number() OVER (PARTITION BY __asof_rid ORDER BY b.t + 1 DESC, b)"
        in out
    )
    assert "monotonically_increasing_id() AS __asof_rid" in out
    assert "WHERE __asof_rn = 1" in out
    assert "struct(*) AS a" in out and "struct(*) AS b" in out
    # fallback WHERE merge parenthesizes the original predicate: a
    # top-level OR must not leak non-top-1 fan-out rows (AND > OR)
    out = clickhouse_to_spark_sql(
        "SELECT a.x FROM t1 a ASOF JOIN t2 b "
        "ON a.k = b.k AND a.t >= b.t + 1 "
        "WHERE a.x = 1 OR a.x = 2 ORDER BY a.x"
    )
    assert "WHERE __asof_rn = 1 AND (a.x = 1 OR a.x = 2)" in out
    assert "ORDER BY a.x" in out
    with pytest.raises(ValueError, match="exactly ONE inequality"):
        clickhouse_to_spark_sql(
            "SELECT a.x FROM t1 a ASOF JOIN t2 b ON a.k = b.k"
        )
    with pytest.raises(ValueError, match="last join"):
        clickhouse_to_spark_sql(
            "SELECT a.x FROM t1 a ASOF JOIN t2 b ON a.k = b.k AND a.t >= b.t "
            "JOIN t3 c ON c.k = a.k"
        )
    # USING desugars (last column = the closest-match inequality) and
    # takes the bounded path
    out = clickhouse_to_spark_sql(
        "SELECT a.x FROM t1 a ASOF JOIN t2 b USING (k, t)"
    )
    assert "last_value(b, true)" in out and "PARTITION BY __asof_k0" in out
    with pytest.raises(ValueError, match="at least two columns"):
        clickhouse_to_spark_sql("SELECT a.x FROM t1 a ASOF JOIN t2 b USING (t)")
    with pytest.raises(ValueError, match="only join"):
        clickhouse_to_spark_sql(
            "SELECT * FROM t0 JOIN t1 k ON t0.k = k.k "
            "ASOF JOIN t2 b ON k.id = b.id AND k.ts >= b.ts"
        )


def test_asof_join_select_star_flattens():
    """A bare SELECT * over an ASOF join flattens to a.*, b.* (the
    ClickHouse column order) instead of exposing the rewrite's struct
    columns; DISTINCT and extra items survive; qualified stars and
    count(*) are left alone."""
    out = clickhouse_to_spark_sql(
        "SELECT * FROM t1 a ASOF JOIN t2 b ON a.k = b.k AND a.t >= b.t"
    )
    assert out.startswith("SELECT a.*, b.* FROM")
    out = clickhouse_to_spark_sql(
        "SELECT DISTINCT *, 1 AS one FROM t1 a ASOF LEFT JOIN t2 b "
        "ON a.k = b.k AND a.t >= b.t"
    )
    assert "SELECT DISTINCT a.*, b.*, 1 AS one" in out
    # count(*) is inside parens - not a select-list star item
    out = clickhouse_to_spark_sql(
        "SELECT count(*) AS n FROM t1 a ASOF JOIN t2 b "
        "ON a.k = b.k AND a.t >= b.t"
    )
    assert "count(*) AS n" in out and "a.*, b.*" not in out
    # a star in an unrelated subquery's select list is untouched
    out = clickhouse_to_spark_sql(
        "WITH c AS (SELECT * FROM src) "
        "SELECT a.x FROM c a ASOF JOIN t2 b ON a.k = b.k AND a.t >= b.t"
    )
    assert "(SELECT * FROM src)" in out


def test_asof_join_executes(spark):
    """End-to-end on a hand-computed fixture: inner pick, LEFT null
    leg, duplicate left rows each keep their own match, NULL keys /
    NULL asof values never match.  Plain-column ON takes the BOUNDED
    path: NO join operator in the physical plan (a hot key streams
    through the running window instead of fanning out)."""
    spark.createDataFrame(
        [(1, 10), (1, 20), (2, 30), (2, 30), (3, 7), (None, 5), (4, None)],
        "k int, t int",
    ).createOrReplaceTempView("asof_a")
    spark.createDataFrame(
        [(1, 5, "x"), (1, 15, "y"), (1, 25, "z"), (2, 1, "w"),
         (None, 1, "n"), (4, 1, "m")],
        "k int, t int, v string",
    ).createOrReplaceTempView("asof_b")
    out = spark.sql(clickhouse_to_spark_sql(
        "SELECT a.k AS k, a.t AS t, b.t AS bt, b.v AS v "
        "FROM asof_a a ASOF LEFT JOIN asof_b b "
        "ON a.k = b.k AND a.t >= b.t ORDER BY k, t"
    ))
    rows = [tuple(r) for r in out.collect()]
    assert rows == [
        (None, 5, None, None),
        (1, 10, 5, "x"),
        (1, 20, 15, "y"),
        (2, 30, 1, "w"),
        (2, 30, 1, "w"),
        (3, 7, None, None),
        (4, None, None, None),
    ], rows
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan[:2000]
    assert "Window" in plan
    # inner variant drops the unmatched rows
    inner = spark.sql(clickhouse_to_spark_sql(
        "SELECT a.k AS k, a.t AS t, b.t AS bt "
        "FROM asof_a a ASOF JOIN asof_b b "
        "ON a.k = b.k AND a.t >= b.t ORDER BY k, t"
    ))
    assert [tuple(r) for r in inner.collect()] == [
        (1, 10, 5), (1, 20, 15), (2, 30, 1), (2, 30, 1)
    ]
    # strict op excludes the equal-ts right row
    strict = spark.sql(clickhouse_to_spark_sql(
        "SELECT a.k AS k, a.t AS t, b.t AS bt "
        "FROM asof_a a ASOF JOIN asof_b b "
        "ON a.k = b.k AND a.t > b.t WHERE a.t = 15 OR a.k = 1 "
        "ORDER BY k, t"
    ))
    assert [tuple(r) for r in strict.collect()] == [(1, 10, 5), (1, 20, 15)]


def test_asof_join_multi_key_bounded(spark):
    """Several equality keys in ON all become window partition keys on
    the bounded path — rows only match within the FULL key tuple."""
    spark.createDataFrame(
        [(1, "x", 10), (1, "y", 10), (2, "x", 10)], "k int, g string, t int"
    ).createOrReplaceTempView("asof_ma")
    spark.createDataFrame(
        [(1, "x", 5, 100), (1, "y", 7, 200), (2, "z", 1, 300)],
        "k int, g string, t int, v int",
    ).createOrReplaceTempView("asof_mb")
    sql = clickhouse_to_spark_sql(
        "SELECT a.k AS k, a.g AS g, b.v AS v FROM asof_ma a "
        "ASOF LEFT JOIN asof_mb b "
        "ON a.k = b.k AND b.g = a.g AND a.t >= b.t ORDER BY k, g"
    )
    assert "PARTITION BY __asof_k0, __asof_k1" in sql
    assert "__asof_rn" not in sql  # bounded path
    out = spark.sql(sql)
    assert [tuple(r) for r in out.collect()] == [
        (1, "x", 100),
        (1, "y", 200),
        (2, "x", None),  # (2,'z') quote must not leak across g
    ]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan[:1500]


def test_any_join_multi_key(spark):
    """Multiple equality keys dedupe the right side per FULL key
    tuple; reversed-side equalities (b.g = a.g) parse fine."""
    spark.createDataFrame(
        [(1, "x", 10), (1, "y", 20), (3, "x", 30)], "k int, g string, a int"
    ).createOrReplaceTempView("any_ma")
    spark.createDataFrame(
        [(1, "x", 9), (1, "x", 3), (1, "y", 5)], "k int, g string, v int"
    ).createOrReplaceTempView("any_mb")
    sql = clickhouse_to_spark_sql(
        "SELECT a.a AS av, b.v AS bv FROM any_ma a "
        "ANY LEFT JOIN any_mb b ON a.k = b.k AND b.g = a.g ORDER BY av"
    )
    assert "GROUP BY __any_k0, __any_k1" in sql
    out = spark.sql(sql)
    assert [tuple(r) for r in out.collect()] == [
        (10, 3),  # min struct of (1,'x'): (1,'x',3)
        (20, 5),
        (30, None),
    ]


def test_asof_join_fallback_executes(spark):
    """Expression ON (not plain columns) takes the fan-out fallback:
    same answers, WindowGroupLimit top-1, no cartesian/BNLJ — and the
    parenthesized WHERE merge keeps OR predicates correct."""
    spark.createDataFrame(
        [(1, 10), (1, 20), (2, 30), (3, 7)], "k int, t int"
    ).createOrReplaceTempView("asof_fa")
    spark.createDataFrame(
        [(1, 4, "x"), (1, 14, "y"), (1, 24, "z"), (2, 0, "w")],
        "k int, t int, v string",
    ).createOrReplaceTempView("asof_fb")
    sql = clickhouse_to_spark_sql(
        "SELECT a.k AS k, a.t AS t, b.t AS bt, b.v AS v "
        "FROM asof_fa a ASOF LEFT JOIN asof_fb b "
        "ON a.k = b.k AND a.t >= b.t + 1 "
        "WHERE a.t = 10 OR a.t = 30 ORDER BY k, t"
    )
    assert "__asof_rn = 1 AND (a.t = 10 OR a.t = 30)" in sql
    out = spark.sql(sql)
    rows = [tuple(r) for r in out.collect()]
    assert rows == [(1, 10, 4, "x"), (2, 30, 0, "w")], rows
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "WindowGroupLimit" in plan


def test_full_any_join_select_star_flattens(spark):
    """Bare SELECT * over a FULL ANY JOIN flattens to a.*, b.* - both
    deduped sides expand their struct fields, NULL legs included."""
    spark.createDataFrame([(1, 10)], "k int, a int").createOrReplaceTempView("fs_a")
    spark.createDataFrame([(2, 5)], "k int, v int").createOrReplaceTempView("fs_b")
    out = spark.sql(clickhouse_to_spark_sql(
        "SELECT * FROM fs_a a FULL ANY JOIN fs_b b ON a.k = b.k"
    ))
    assert out.columns == ["k", "a", "k", "v"]
    rows = sorted([tuple(r) for r in out.collect()],
                  key=lambda r: tuple((x is None, x or 0) for x in r))
    assert rows == [(1, 10, None, None), (None, None, 2, 5)]


def test_join_strictness_fuzz(spark):
    """Random combinations of the translated join-strictness surface
    (ANY x {LEFT,INNER,RIGHT,FULL}, ASOF [LEFT]; ON vs USING; aliased
    or bare sides; 1-2 keys; bare SELECT * or explicit columns)
    either raise the curated guidance or translate to SQL that is
    paren-balanced, keyword-free, and ANALYZES in Spark."""
    import itertools
    import re

    spark.createDataFrame(
        [(1, 100, 7), (2, 200, 9)], "k int, t int, w int"
    ).createOrReplaceTempView("jf_a")
    spark.createDataFrame(
        [(1, 90, 7, 1.0), (1, 95, 9, 2.0), (2, 150, 9, 3.0)],
        "k int, t int, w int, v double",
    ).createOrReplaceTempView("jf_b")

    strictness = [
        "ANY LEFT JOIN", "LEFT ANY JOIN", "ANY JOIN", "INNER ANY JOIN",
        "RIGHT ANY JOIN", "FULL ANY JOIN", "ASOF JOIN", "ASOF LEFT JOIN",
    ]
    n_checked = 0
    for kw, using, aliased, two_keys, star in itertools.product(
        strictness, [False, True], [False, True], [False, True], [False, True]
    ):
        asof = "ASOF" in kw
        a = "a" if aliased else "jf_a"
        b = "b" if aliased else "jf_b"
        al = " a" if aliased else ""
        bl = " b" if aliased else ""
        if using:
            cols = "(k, w, t)" if two_keys and asof else (
                "(k, t)" if asof else ("(k, t)" if two_keys else "(k)")
            )
            join = f"jf_a{al} {kw} jf_b{bl} USING {cols}"
        else:
            conds = [f"{a}.k = {b}.k"]
            if two_keys and not asof:
                conds.append(f"{a}.t = {b}.t")
            if asof:
                if two_keys:
                    conds.append(f"{a}.w = {b}.v")
                conds.append(f"{a}.t >= {b}.t")
            join = f"jf_a{al} {kw} jf_b{bl} ON " + " AND ".join(conds)
        sel = "*" if star else f"{a}.k AS ak, {b}.t AS bt"
        q = f"SELECT {sel} FROM {join}"
        try:
            out = clickhouse_to_spark_sql(q)
        except ValueError:
            continue  # curated raise is a valid outcome
        code = re.sub(r"'(?:[^']|'')*'", "''", out)
        assert code.count("(") == code.count(")"), (q, out)
        assert not re.search(r"\b(ASOF|ANY|USING)\b", code, re.I), (q, out)
        # ASOF USING desugars against struct columns: unqualified
        # using-columns cannot resolve with bare table names, so only
        # analyze the cases the scope documents as supported
        if using and not aliased:
            continue
        spark.sql(out)  # must analyze
        n_checked += 1
    assert n_checked >= 40, n_checked
