"""Merge-kernel semantic tests: the rules of
/root/reference/db/ops.go:11-122, including both error cases."""

import pytest
from pyspark.sql import types as T

from substreams_sink_clickhouse_spark.catalog import Catalog, TableInfo
from substreams_sink_clickhouse_spark.errors import MergeSemanticsError
from substreams_sink_clickhouse_spark.operators.merge import (
    merge_changes,
    reduce_changes,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("a", T.IntegerType(), True),
        T.StructField("b", T.StringType(), True),
    ]
)


@pytest.fixture()
def catalog():
    cat = Catalog()
    cat.register(TableInfo("t", SCHEMA, "id"))
    return cat


def _state(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _merge(spark, catalog, changes, state_rows=()):
    out = merge_changes(changes, {"t": _state(spark, list(state_rows))}, catalog)
    return {r["id"]: (r["a"], r["b"]) for r in out["t"].collect()}


def test_create_then_updates_merge_fieldwise(spark, changes_df, catalog):
    # N updates to the same pk merge per field, last writer wins
    # (db/ops.go:64-75, db/operations.go:64-73)
    changes = changes_df(
        [
            (1, "blk", 1, "t", "k1", "CREATE", {"a": "1", "b": "x"}),
            (1, "blk", 2, "t", "k1", "UPDATE", {"a": "2"}),
            (1, "blk", 3, "t", "k1", "UPDATE", {"b": "y"}),
        ]
    )
    assert _merge(spark, catalog, changes) == {"k1": (2, "y")}


def test_ordering_across_blocks(spark, changes_df, catalog):
    # ops fold in (block_num, ordinal) order even if rows arrive shuffled
    changes = changes_df(
        [
            (2, "blk2", 1, "t", "k1", "UPDATE", {"a": "3"}),
            (1, "blk1", 2, "t", "k1", "UPDATE", {"a": "2"}),
            (1, "blk1", 1, "t", "k1", "CREATE", {"a": "1"}),
        ]
    )
    assert _merge(spark, catalog, changes) == {"k1": (3, None)}


def test_delete_overwrites_pending(spark, changes_df, catalog):
    # DELETE replaces any pending op (db/ops.go:108-121)
    changes = changes_df(
        [
            (1, "blk", 1, "t", "k1", "CREATE", {"a": "1"}),
            (1, "blk", 2, "t", "k1", "DELETE", None),
        ]
    )
    assert _merge(spark, catalog, changes, [("k1", 9, "old")]) == {}


def test_duplicate_create_errors(spark, changes_df, catalog):
    # (db/ops.go:29-31)
    changes = changes_df(
        [
            (1, "blk", 1, "t", "k1", "CREATE", {"a": "1"}),
            (1, "blk", 2, "t", "k1", "CREATE", {"a": "2"}),
        ]
    )
    with pytest.raises(MergeSemanticsError, match="duplicate insert"):
        _merge(spark, catalog, changes)


def test_update_after_delete_errors(spark, changes_df, catalog):
    # (db/ops.go:65-67)
    changes = changes_df(
        [
            (1, "blk", 1, "t", "k1", "DELETE", None),
            (1, "blk", 2, "t", "k1", "UPDATE", {"a": "2"}),
        ]
    )
    with pytest.raises(MergeSemanticsError, match="update a deleted row"):
        _merge(spark, catalog, changes)


def test_duplicate_block_ordinal_errors(spark, changes_df, catalog):
    # The reference folds ops in ARRIVAL order, so two ops tied on
    # (block_num, ordinal) fold to whatever came off the wire last; a
    # distributed fold has no arrival order, so the kernel surfaces the
    # duplicate explicitly instead of silently tie-breaking (an
    # UPDATE/DELETE tie could otherwise invert the reference's result).
    # MIGRATION.md "Merge tie-break".
    changes = changes_df(
        [
            (1, "blk", 7, "t", "k1", "UPDATE", {"a": "1"}),
            (1, "blk", 7, "t", "k1", "DELETE", None),
        ]
    )
    with pytest.raises(MergeSemanticsError, match="duplicate \\(block_num, ordinal\\)"):
        _merge(spark, catalog, changes, [("k1", 9, "old")])


def test_byte_identical_replay_folds_harmlessly(spark, changes_df, catalog):
    # At-least-once delivery can redeliver the SAME wire op (same
    # (block_num, ordinal), same op, same fields).  The reference's
    # arrival-order fold absorbs that harmlessly (the second fold is a
    # no-op overwrite), so the kernel dedupes byte-identical events
    # before the tie guard and only errors on CONFLICTING ties
    # (round-6 advisory, merge.py array_distinct).
    changes = changes_df(
        [
            (1, "blk", 1, "t", "k1", "CREATE", {"a": "1", "b": "x"}),
            (1, "blk", 2, "t", "k1", "UPDATE", {"a": "2"}),
            (1, "blk", 2, "t", "k1", "UPDATE", {"a": "2"}),  # exact replay
            (1, "blk", 1, "t", "k1", "CREATE", {"a": "1", "b": "x"}),  # replay
        ]
    )
    assert _merge(spark, catalog, changes) == {"k1": (2, "x")}


def test_conflicting_tie_still_errors_after_replay_dedup(spark, changes_df, catalog):
    # same seq, DIFFERENT payload: a true conflict, must still error —
    # and an exact replay alongside it must not mask the conflict
    changes = changes_df(
        [
            (1, "blk", 7, "t", "k1", "UPDATE", {"a": "1"}),
            (1, "blk", 7, "t", "k1", "UPDATE", {"a": "1"}),  # exact replay
            (1, "blk", 7, "t", "k1", "UPDATE", {"a": "9"}),  # conflict
        ]
    )
    with pytest.raises(MergeSemanticsError, match="duplicate \\(block_num, ordinal\\)"):
        _merge(spark, catalog, changes)


def test_distinct_ordinals_same_block_still_fold(spark, changes_df, catalog):
    # the dup guard keys on (block_num, ordinal) — distinct ordinals in
    # one block are the normal case and must be untouched by it
    changes = changes_df(
        [
            (1, "blk", 1, "t", "k1", "UPDATE", {"a": "1"}),
            (1, "blk", 2, "t", "k1", "DELETE", None),
        ]
    )
    assert _merge(spark, catalog, changes, [("k1", 9, "old")]) == {}


def test_pk_injected_on_create(spark, changes_df, catalog):
    # pk is added to the row data (db/ops.go:37-39)
    changes = changes_df([(1, "blk", 1, "t", "k1", "CREATE", {"a": "5"})])
    assert _merge(spark, catalog, changes) == {"k1": (5, None)}


def test_create_replaces_existing_row(spark, changes_df, catalog):
    changes = changes_df([(1, "blk", 1, "t", "k1", "CREATE", {"a": "7"})])
    assert _merge(spark, catalog, changes, [("k1", 1, "old"), ("k2", 2, "keep")]) == {
        "k1": (7, None),
        "k2": (2, "keep"),
    }


def test_update_existing_row_partial(spark, changes_df, catalog):
    changes = changes_df([(1, "blk", 1, "t", "k1", "UPDATE", {"a": "8"})])
    assert _merge(spark, catalog, changes, [("k1", 1, "keep-b")]) == {"k1": (8, "keep-b")}


def test_update_missing_row_is_noop(spark, changes_df, catalog):
    # ClickHouse ALTER UPDATE on absent pk matches nothing
    changes = changes_df([(1, "blk", 1, "t", "ghost", "UPDATE", {"a": "8"})])
    assert _merge(spark, catalog, changes, [("k1", 1, "b")]) == {"k1": (1, "b")}


def test_unset_ops_skipped(spark, changes_df, catalog):
    # (sinker/sinker.go:169-171)
    changes = changes_df(
        [
            (1, "blk", 1, "t", "k1", "UNSET", {"a": "9"}),
            (1, "blk", 2, "t", "k2", "CREATE", {"a": "1"}),
        ]
    )
    assert _merge(spark, catalog, changes) == {"k2": (1, None)}


def test_reduce_is_distributed_no_collect(spark, changes_df):
    # many keys fold independently; ops per key stay <= 1
    rows = []
    for k in range(200):
        rows.append((1, "b", 2 * k, "t", f"k{k}", "CREATE", {"a": str(k)}))
        rows.append((1, "b", 2 * k + 1, "t", f"k{k}", "UPDATE", {"a": str(k + 1)}))
    reduced = reduce_changes(changes_df(rows), {"t": "id"})
    out = reduced.collect()
    assert len(out) == 200
    assert all(r["op"] == "CREATE" for r in out)
    assert all(r["err"] is None for r in out)


def test_inline_guard_raises_through_empty_target_fast_path(spark, changes_df, catalog):
    """check_errors='inline' + empty target takes the initial-load fast
    path (no reconcile join); semantic violations must STILL raise from
    inside the job."""
    changes = changes_df(
        [
            (1, "blk", 1, "t", "k1", "CREATE", {"a": "1"}),
            (1, "blk", 2, "t", "k1", "CREATE", {"a": "2"}),
        ]
    )
    out = merge_changes(changes, {"t": _state(spark, [])}, catalog, check_errors="inline")
    with pytest.raises(Exception, match="invalid change sequence"):
        out["t"].collect()


def test_inline_mode_happy_path_empty_target(spark, changes_df, catalog):
    changes = changes_df(
        [
            (1, "blk", 1, "t", "k1", "CREATE", {"a": "1", "b": "x"}),
            (1, "blk", 2, "t", "k1", "UPDATE", {"a": "5"}),
            (1, "blk", 3, "t", "k2", "DELETE", {}),
        ]
    )
    out = merge_changes(changes, {"t": _state(spark, [])}, catalog, check_errors="inline")
    rows = {r["id"]: (r["a"], r["b"]) for r in out["t"].collect()}
    assert rows == {"k1": (5, "x")}


def test_bucket_cap_drops_degenerate_buckets(spark):
    """MAX_BUCKET_SIZE guard: capped runs drop over-size LSH buckets
    (scale escape hatch); default None is the identity."""
    from pyspark.sql import functions as F

    import substreams_sink_clickhouse_spark.operators.dedup as dd

    buckets = spark.createDataFrame(
        [(1, list(range(3))), (2, list(range(10)))], "b: int, ids: array<int>"
    )
    assert dd._cap_buckets(buckets, "ids").count() == 2
    dd.MAX_BUCKET_SIZE = 5
    try:
        kept = dd._cap_buckets(buckets, "ids").collect()
        assert [r["b"] for r in kept] == [1]
    finally:
        dd.MAX_BUCKET_SIZE = None
