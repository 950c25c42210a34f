"""ORDER BY ... WITH FILL: lexical strip + structural apply
(functions/fill.py) against a row-anchored Python reference of the
ClickHouse semantics, plus the Engine.sql integration."""

import datetime

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from substreams_sink_clickhouse_spark.functions.fill import (
    FillSpec,
    apply_with_fill,
    strip_with_fill,
)


# -- parsing -----------------------------------------------------------


def test_no_fill_passthrough():
    q = "SELECT a FROM t ORDER BY a"
    assert strip_with_fill(q) == (q, None)


def test_strip_from_to_step():
    q = "SELECT a, n FROM t ORDER BY a WITH FILL FROM 0 TO 10 STEP 2 LIMIT 5"
    stripped, spec = strip_with_fill(q)
    # ClickHouse limits AFTER the FillingTransform, so the LIMIT is
    # absorbed into the spec (applied to the filled grid) and both the
    # pre-fill sort and the pre-fill limit disappear from the query
    assert spec == FillSpec(column="a", from_="0", to="10", step="2", limit=5)
    assert "WITH FILL" not in stripped.upper()
    assert "LIMIT" not in stripped.upper()
    assert "ORDER BY" not in stripped.upper()


def test_interval_step_and_partial_bounds():
    _, spec = strip_with_fill(
        "SELECT h FROM t ORDER BY h WITH FILL STEP INTERVAL 1 HOUR"
    )
    assert spec == FillSpec(column="h", from_=None, to=None, step="INTERVAL 1 HOUR")


def test_fill_inside_string_literal_untouched():
    q = "SELECT 'ORDER BY x WITH FILL' AS s FROM t ORDER BY s"
    assert strip_with_fill(q) == (q, None)


def test_subquery_fill_falls_through_to_dialect_guard():
    # no depth-0 fill: strip is a no-op, and the dialect translator's
    # WITH FILL guard raises downstream with the Engine.sql pointer
    from substreams_sink_clickhouse_spark.functions.dialect import (
        clickhouse_to_spark_sql,
    )

    q = "SELECT * FROM (SELECT a FROM t ORDER BY a WITH FILL) x ORDER BY a"
    assert strip_with_fill(q) == (q, None)
    with pytest.raises(ValueError, match="WITH FILL"):
        clickhouse_to_spark_sql(q)


@pytest.mark.parametrize(
    "q,msg",
    [
        ("SELECT a, b FROM t ORDER BY a WITH FILL, b WITH FILL", "FINAL sort key"),
        ("SELECT a, b FROM t ORDER BY a WITH FILL, b", "FINAL sort key"),
        ("SELECT a + 1 FROM t ORDER BY a + 1 WITH FILL", "result column"),
        ("SELECT a FROM t WITH FILL", "ORDER BY"),
        ("SELECT a, b FROM t ORDER BY a + 1, b WITH FILL", "result columns"),
        (
            "SELECT a, c FROM t ORDER BY a WITH FILL INTERPOLATE (c AS c + 1)",
            "carry-forward",
        ),
    ],
)
def test_rejections(q, msg):
    with pytest.raises(ValueError, match=msg):
        strip_with_fill(q)


def test_strip_groups_desc_interpolate():
    q = ("SELECT g, k, c FROM t ORDER BY g DESC, k DESC "
         "WITH FILL FROM 9 TO 0 STEP -2 INTERPOLATE (c)")
    stripped, spec = strip_with_fill(q)
    assert spec.groups == (("g", False),)
    assert spec.descending and spec.step == "-2"
    assert spec.from_ == "9" and spec.to == "0"
    assert spec.interpolate == ("c",)
    assert "WITH FILL" not in stripped.upper()
    assert "INTERPOLATE" not in stripped.upper()
    # nothing follows the ORDER BY, so it drops entirely (the fill
    # operator re-sorts; keeping it would plan a useless exchange)
    assert "ORDER BY" not in stripped.upper()


# -- apply: reference semantics ---------------------------------------


def _reference_fill(values, counts, from_=None, to=None, step=1):
    """Row-anchored ClickHouse fill: prefix FROM..<first, each gap
    prev+step..<next, suffix last+step..<TO."""
    out = []
    ks = sorted(values)
    if ks and from_ is not None:
        x = from_
        while x < ks[0]:
            out.append((x, 0))
            x += step
    for i, k in enumerate(ks):
        out.append((k, counts[k]))
        nxt = ks[i + 1] if i + 1 < len(ks) else None
        x = k + step
        if nxt is not None:
            bound = nxt if to is None else min(nxt, to)
        else:
            bound = to
        while bound is not None and x < bound:
            out.append((x, 0))
            x += step
    return out


@settings(max_examples=12, deadline=None)
@given(
    vals=st.sets(st.integers(min_value=0, max_value=60), min_size=1, max_size=12),
    step=st.integers(min_value=1, max_value=5),
    bounds=st.booleans(),
)
def test_anchoring_matches_reference(spark, vals, step, bounds):
    df = spark.createDataFrame([(v, 1) for v in vals], "k long, n long")
    spec = FillSpec(
        column="k",
        from_="0" if bounds else None,
        to="70" if bounds else None,
        step=str(step),
    )
    got = [(r.k, r.n) for r in apply_with_fill(df, spec).collect()]
    ref = _reference_fill(
        sorted(vals),
        {v: 1 for v in vals},
        from_=0 if bounds else None,
        to=70 if bounds else None,
        step=step,
    )
    assert got == ref


def test_generated_rows_carry_type_defaults(spark):
    df = spark.createDataFrame(
        [(1, "a", 2.5, True), (4, "b", 1.0, False)],
        "k int, s string, x double, b boolean",
    )
    out = apply_with_fill(df, FillSpec(column="k")).collect()
    gen = [r for r in out if r.k in (2, 3)]
    assert len(gen) == 2
    for r in gen:
        assert (r.s, r.x, r.b) == ("", 0.0, False)


def test_single_value_both_bounds(spark):
    df = spark.createDataFrame([(5, 9)], "k int, n int")
    out = [(r.k, r.n) for r in apply_with_fill(
        df, FillSpec(column="k", from_="2", to="8")
    ).collect()]
    assert out == [(2, 0), (3, 0), (4, 0), (5, 9), (6, 0), (7, 0)]


def test_empty_input_stays_empty(spark):
    df = spark.createDataFrame([], "k int, n int")
    assert apply_with_fill(df, FillSpec(column="k", from_="0", to="5")).count() == 0


def test_timestamp_interval_fill(spark):
    t0 = datetime.datetime(2024, 1, 1, 0)
    df = spark.createDataFrame(
        [(t0, 1), (t0 + datetime.timedelta(hours=3), 1)], "h timestamp, n int"
    )
    out = apply_with_fill(
        df, FillSpec(column="h", step="INTERVAL 1 HOUR")
    ).collect()
    assert [r.h.hour for r in out] == [0, 1, 2, 3]
    assert [r.n for r in out] == [1, 0, 0, 1]


def test_unsupported_dtype_raises(spark):
    df = spark.createDataFrame([(1.5, 1)], "k double, n int")
    with pytest.raises(ValueError, match="integer, date, or timestamp"):
        apply_with_fill(df, FillSpec(column="k"))


def test_temporal_numeric_step_raises(spark):
    t0 = datetime.datetime(2024, 1, 1)
    df = spark.createDataFrame([(t0, 1)], "h timestamp, n int")
    with pytest.raises(ValueError, match="INTERVAL"):
        apply_with_fill(df, FillSpec(column="h", step="60"))


# -- Engine.sql integration -------------------------------------------


def test_engine_sql_with_fill(spark):
    from substreams_sink_clickhouse_spark.engine import Engine

    eng = Engine(spark)
    spark.createDataFrame([(1, 10), (4, 40)], "k int, v int").createOrReplaceTempView(
        "fill_t"
    )
    out = eng.sql(
        "SELECT k, sum(v) AS total FROM fill_t GROUP BY k "
        "ORDER BY k WITH FILL FROM 0 TO 6",
        dialect="clickhouse",
    ).collect()
    assert [(r.k, r.total) for r in out] == [
        (0, 0), (1, 10), (2, 0), (3, 0), (4, 40), (5, 0),
    ]
    # cache keys must distinguish fill bounds on the same stripped text
    a = eng.sql(
        "SELECT k, sum(v) AS total FROM fill_t GROUP BY k "
        "ORDER BY k WITH FILL FROM 0 TO 3",
        dialect="clickhouse",
        use_query_cache=True,
    )
    b = eng.sql(
        "SELECT k, sum(v) AS total FROM fill_t GROUP BY k "
        "ORDER BY k WITH FILL FROM 0 TO 6",
        dialect="clickhouse",
        use_query_cache=True,
    )
    # TO=3 clamps fills (0, 2) but the actual row k=4 is still emitted
    assert a.count() == 4 and b.count() == 6


def test_engine_sql_fill_limit_applies_to_filled_grid(spark):
    """ClickHouse applies the FillingTransform as part of ORDER BY,
    before LIMIT: `... WITH FILL FROM 0 TO 10 LIMIT 5` returns the
    first 5 rows of the FILLED grid, not the filled first-5 pre-fill
    rows (round-5 advisory)."""
    from substreams_sink_clickhouse_spark.engine import Engine

    eng = Engine(spark)
    spark.createDataFrame([(1, 10), (8, 80)], "k int, v int").createOrReplaceTempView(
        "fill_lim_t"
    )
    out = eng.sql(
        "SELECT k, sum(v) AS total FROM fill_lim_t GROUP BY k "
        "ORDER BY k WITH FILL FROM 0 TO 10 LIMIT 5",
        dialect="clickhouse",
    ).collect()
    # filled grid is 0..9 with actuals at 1 and 8; LIMIT 5 -> 0..4
    assert [(r.k, r.total) for r in out] == [
        (0, 0), (1, 10), (2, 0), (3, 0), (4, 0),
    ]


def test_fill_complex_limit_refused():
    with pytest.raises(ValueError, match="plain trailing"):
        strip_with_fill("SELECT k FROM t ORDER BY k WITH FILL LIMIT 5, 10")
    with pytest.raises(ValueError, match="plain trailing"):
        strip_with_fill("SELECT k FROM t ORDER BY k WITH FILL LIMIT 5 OFFSET 2")


def test_engine_sql_fill_dialect_bounds(spark):
    """FROM/TO/STEP bounds written in ClickHouse dialect (toDate,
    toIntervalDay) must be translated before F.expr evaluates them
    (round-5 advisory: they used to hit Spark raw and fail with an
    unresolved-function AnalysisException)."""
    from substreams_sink_clickhouse_spark.engine import Engine

    eng = Engine(spark)
    spark.createDataFrame(
        [(datetime.date(2024, 1, 2), 1), (datetime.date(2024, 1, 5), 2)],
        "d date, n int",
    ).createOrReplaceTempView("fill_date_t")
    out = eng.sql(
        "SELECT d, sum(n) AS total FROM fill_date_t GROUP BY d "
        "ORDER BY d WITH FILL FROM toDate('2024-01-01') TO toDate('2024-01-07')",
        dialect="clickhouse",
    ).collect()
    assert [r.d.day for r in out] == [1, 2, 3, 4, 5, 6]
    assert [r.total for r in out] == [0, 1, 0, 0, 2, 0]


def test_grouped_fill_inherits_group_values(spark):
    df = spark.createDataFrame(
        [("a", 1, 5), ("a", 4, 6), ("b", 2, 7)], "g string, k int, n int"
    )
    out = apply_with_fill(
        df, FillSpec(column="k", groups=(("g", True),))
    ).collect()
    assert [(r.g, r.k, r.n) for r in out] == [
        ("a", 1, 5), ("a", 2, 0), ("a", 3, 0), ("a", 4, 6), ("b", 2, 7),
    ]


def test_desc_fill_with_bounds(spark):
    df = spark.createDataFrame([(7, 1), (3, 1)], "k int, n int")
    out = [(r.k, r.n) for r in apply_with_fill(
        df, FillSpec(column="k", from_="9", to="1", descending=True)
    ).collect()]
    assert out == [(9, 0), (8, 0), (7, 1), (6, 0), (5, 0), (4, 0), (3, 1), (2, 0)]


def test_desc_step_sign_checked(spark):
    df = spark.createDataFrame([(7, 1)], "k int, n int")
    with pytest.raises(ValueError, match="does not move toward"):
        apply_with_fill(df, FillSpec(column="k", descending=True, step="2"))
    with pytest.raises(ValueError, match="does not move toward"):
        apply_with_fill(df, FillSpec(column="k", step="-1"))


def test_interpolate_carries_previous_actual_value(spark):
    df = spark.createDataFrame(
        [(1, "x", 10.0), (4, "y", 40.0)], "k int, s string, c double"
    )
    out = apply_with_fill(
        df, FillSpec(column="k", to="6", interpolate=("c",))
    ).collect()
    # fills 2,3 carry 10.0 (prev actual); 5 carries 40.0; s stays ''
    assert [(r.k, r.c, r.s) for r in out] == [
        (1, 10.0, "x"), (2, 10.0, ""), (3, 10.0, ""),
        (4, 40.0, "y"), (5, 40.0, ""),
    ]


def test_interpolate_prefix_gets_type_default(spark):
    df = spark.createDataFrame([(3, 30.0)], "k int, c double")
    out = apply_with_fill(
        df, FillSpec(column="k", from_="1", interpolate=("c",))
    ).collect()
    assert [(r.k, r.c) for r in out] == [(1, 0.0), (2, 0.0), (3, 30.0)]


def test_engine_sql_grouped_desc_interpolate(spark):
    from substreams_sink_clickhouse_spark.engine import Engine

    eng = Engine(spark)
    spark.createDataFrame(
        [("a", 1, 10.0), ("a", 3, 30.0), ("b", 2, 20.0)],
        "g string, k int, c double",
    ).createOrReplaceTempView("fill_g")
    out = eng.sql(
        "SELECT g, k, max(c) AS c FROM fill_g GROUP BY g, k "
        "ORDER BY g, k WITH FILL INTERPOLATE (c)",
        dialect="clickhouse",
    ).collect()
    assert [(r.g, r.k, r.c) for r in out] == [
        ("a", 1, 10.0), ("a", 2, 10.0), ("a", 3, 30.0), ("b", 2, 20.0),
    ]


def test_desc_temporal_default_step(spark):
    import datetime as _dt

    t0 = _dt.datetime(2024, 1, 1, 5)
    df = spark.createDataFrame(
        [(t0, 1), (t0 - _dt.timedelta(hours=2), 1)], "h timestamp, n int"
    )
    out = apply_with_fill(
        df, FillSpec(column="h", descending=True, step="INTERVAL -1 HOUR")
    ).collect()
    assert [r.h.hour for r in out] == [5, 4, 3]
    assert [r.n for r in out] == [1, 0, 1]


_IDENT = st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True).filter(
    lambda s: s.upper() not in {"ASC", "DESC", "BY", "TO", "FROM", "STEP", "FILL", "WITH", "ORDER", "LIMIT", "AS", "ON"}
)


@settings(max_examples=200, deadline=None)
@given(
    col=_IDENT,
    groups=st.lists(st.tuples(_IDENT, st.booleans()), max_size=2),
    desc=st.booleans(),
    frm=st.one_of(st.none(), st.integers(-50, 50)),
    to=st.one_of(st.none(), st.integers(-50, 50)),
    step=st.one_of(st.none(), st.integers(1, 9)),
    interp=st.lists(_IDENT, max_size=2),
    limit=st.one_of(st.none(), st.integers(1, 99)),
)
def test_strip_fuzz_roundtrip(col, groups, desc, frm, to, step, interp, limit):
    # distinct identifiers keep the assertion unambiguous
    names = [col] + [g for g, _ in groups] + list(interp)
    if len(set(names)) != len(names):
        return
    keys = "".join(
        f"{g}{'' if asc else ' DESC'}, " for g, asc in groups
    )
    clause = f"{keys}{col}{' DESC' if desc else ''} WITH FILL"
    if frm is not None:
        clause += f" FROM {frm}"
    if to is not None:
        clause += f" TO {to}"
    if step is not None:
        clause += f" STEP {step}"
    if interp:
        clause += f" INTERPOLATE ({', '.join(interp)})"
    q = f"SELECT * FROM t ORDER BY {clause}"
    if limit is not None:
        q += f" LIMIT {limit}"
    stripped, spec = strip_with_fill(q)
    assert spec is not None
    assert spec.column == col and spec.descending == desc
    assert spec.groups == tuple(groups)
    assert spec.interpolate == tuple(interp)
    assert (spec.from_ is None) == (frm is None)
    assert (spec.to is None) == (to is None)
    if frm is not None:
        assert spec.from_ == str(frm)
    if step is not None:
        assert spec.step == str(step)
    assert "WITH FILL" not in stripped.upper()
    assert "INTERPOLATE" not in stripped.upper()
    # a trailing LIMIT is absorbed into the spec (applied post-fill,
    # matching ClickHouse's FillingTransform-before-LIMIT ordering)
    assert spec.limit == limit
    assert "LIMIT" not in stripped.upper()
    # stripping is idempotent: the stripped text has no fill left
    again, spec2 = strip_with_fill(stripped)
    assert spec2 is None and again == stripped


def test_fill_limit_with_trailing_settings():
    # SETTINGS/FORMAT after the absorbed LIMIT survive for the
    # downstream dialect stripper
    stripped, spec = strip_with_fill(
        "SELECT k FROM t ORDER BY k WITH FILL TO 5 LIMIT 3 SETTINGS max_threads = 4"
    )
    assert spec.limit == 3
    assert "SETTINGS" in stripped and "LIMIT" not in stripped.upper().replace(
        "SETTINGS", ""
    )
