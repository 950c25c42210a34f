"""Keyed-upsert merge kernel — the reference's core operator (O5/O6).

Reference semantics (/root/reference/db/ops.go:11-122): between flushes
the sink buffers at most ONE pending operation per ``(table, pk)``:

* ``CREATE`` when *any* op is already pending       -> error
  ("insert already exists", db/ops.go:29-31)
* ``CREATE`` injects the pk into the row data        (db/ops.go:37-39)
* ``UPDATE`` after ``CREATE``/``UPDATE``: field-wise merge,
  last-writer-wins per field                         (db/ops.go:64-75,
  db/operations.go:64-73)
* ``UPDATE`` after ``DELETE``                        -> error
  ("update after delete", db/ops.go:65-67)
* ``DELETE`` overwrites any pending op               (db/ops.go:108-121)
* ``UNSET`` ops are skipped                          (sinker.go:169-171)

Spark-first design: the fold runs *distributively* — group the window's
changes by ``(table, pk)``, sort each group's ops by
``(block_num, ordinal)`` and fold them with a Catalyst higher-order
``aggregate`` lambda (pure JVM, whole-stage codegen; no Python in the
row path, no driver-side state).  Scale notes:

* the only shuffle is the groupBy on ``(table, pk)`` — exactly the key
  the downstream apply-join needs, so Catalyst reuses the partitioning;
* per-group state is one struct (op, fields-map, err): memory is O(keys
  per partition), never O(window);
* semantic violations surface as an ``err`` field folded through the
  lambda, checked with a cheap ``limit(1)`` probe instead of a collect.

A flat-aggregate rewrite (error flags from group scalars — ``n_create``
/ ``first_create_seq`` / ``first_delete_seq`` / ``last_update_seq`` —
plus per-field last-wins via exploded ``(pk, field)`` ``max_by`` and a
regroup) was prototyped and measured against this fold on the sf0.1
``cdc_merge`` replay: values match exactly, but the flat plan needs
three exchanges (group scalars, field-level, regroup) versus the fold's
one and ran 2.0x SLOWER (median 1.35 s vs 0.68 s, local[32]).  The
fold's collect_list is bounded by ops-per-pk-per-window (the
reference's own buffer bound, db/ops.go:11), so the single-shuffle
shape wins at cluster scale too; the rewrite is documented here as a
rejected alternative, not kept as code.

Applying the reduced ops to target-table state is a single full-outer
shuffle join on the pk — the Parquet-world replacement for ClickHouse
mutations (``ALTER TABLE .. UPDATE`` / ``DELETE``,
/root/reference/db/operations.go:93-111).  At 100 TB the target should
be bucketed/partitioned by pk so the join co-locates and only affected
partitions rewrite (merge-on-write).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from substreams_sink_clickhouse_spark.catalog import Catalog, TableInfo
from substreams_sink_clickhouse_spark.errors import MergeSemanticsError
from substreams_sink_clickhouse_spark.functions.coercion import coerce

#: Catalyst fold of one (table, pk) group's ordered ops.
#: State: struct(op: NONE|CREATE|UPDATE|DELETE, fields, err).
#: Field merges rely on ``spark.sql.mapKeyDedupPolicy=LAST_WIN``
#: (set by tune_session AND by reduce_changes itself): ``map_concat(a,
#: b)`` then IS last-writer-wins per key, with no per-step map_filter
#: scan.
#: The explicit comparator lambda sorts by (block_num, ordinal) — struct
#: elements containing maps are not naturally orderable; a comparator
#: sidesteps that and never touches the map.
#:
#: Single-op fast path: most keys in a flush window carry exactly one
#: change (57% in the sf0.1 replay; higher in steady-state CDC), and a
#: one-element group needs neither the comparator sort nor the
#: interpreted fold machinery — the direct CASE below is the fold's
#: provable result for each op kind (no error state is reachable from
#: one op).  Measured: −18% on the sf0.1 replay, values bit-identical
#: across all 128,571 output rows; the property suite
#: (tests/test_merge_property.py) pins equivalence against the Python
#: model for every path.
_SINGLE_OP_EXPR = """
CASE
  WHEN ops_sorted[0].op = 'CREATE' THEN named_struct(
    'op', 'CREATE',
    'fields', map_concat(
       coalesce(ops_sorted[0].fields, cast(map() as map<string,string>)),
       map(pk_name, pk)),
    'err', cast(null as string))
  WHEN ops_sorted[0].op = 'UPDATE' THEN named_struct(
    'op', 'UPDATE',
    'fields', coalesce(ops_sorted[0].fields, cast(map() as map<string,string>)),
    'err', cast(null as string))
  ELSE named_struct(
    'op', 'DELETE',
    'fields', cast(map() as map<string,string>),
    'err', cast(null as string))
END
"""

_FOLD_EXPR = """
aggregate(
  array_sort(
    ops_sorted,
    (l, r) -> CASE
      WHEN l.block_num < r.block_num THEN -1
      WHEN l.block_num > r.block_num THEN 1
      WHEN l.ordinal < r.ordinal THEN -1
      WHEN l.ordinal > r.ordinal THEN 1
      ELSE 0 END),
  named_struct(
    'op', 'NONE',
    'fields', cast(map() as map<string,string>),
    'err', cast(null as string)),
  (acc, x) -> CASE
    WHEN acc.err IS NOT NULL THEN acc
    WHEN x.op = 'CREATE' THEN
      CASE WHEN acc.op <> 'NONE' THEN
        named_struct('op', acc.op, 'fields', acc.fields,
                     'err', concat('duplicate insert: pk already has a pending ', acc.op))
      ELSE
        named_struct('op', 'CREATE',
                     'fields', map_concat(
                        coalesce(x.fields, cast(map() as map<string,string>)),
                        map(pk_name, pk)),
                     'err', cast(null as string))
      END
    WHEN x.op = 'UPDATE' THEN
      CASE
        WHEN acc.op = 'DELETE' THEN
          named_struct('op', acc.op, 'fields', acc.fields,
                       'err', 'update a deleted row')
        WHEN acc.op = 'NONE' THEN
          named_struct('op', 'UPDATE',
                       'fields', coalesce(x.fields, cast(map() as map<string,string>)),
                       'err', cast(null as string))
        ELSE
          named_struct('op', acc.op,
                       'fields', map_concat(
                          acc.fields,
                          coalesce(x.fields, cast(map() as map<string,string>))),
                       'err', cast(null as string))
      END
    WHEN x.op = 'DELETE' THEN
      named_struct('op', 'DELETE',
                   'fields', cast(map() as map<string,string>),
                   'err', cast(null as string))
    ELSE acc
  END
)
"""

#: Dispatch: one-op groups take the direct path, the rest fold.
_FOLD_EXPR = (
    "CASE WHEN size(ops_sorted) = 1 THEN "
    + _SINGLE_OP_EXPR
    + " ELSE "
    + _FOLD_EXPR
    + " END"
)


def reduce_changes(changes: DataFrame, primary_keys: dict[str, str]) -> DataFrame:
    """Collapse a window of changes to <=1 op per (table, pk).

    ``primary_keys`` maps table name -> pk column name (reference
    default ``id``, db/db.go:121-124).  Returns
    ``(table, pk, pk_name, op, fields, err)`` with ``op`` in
    CREATE|UPDATE|DELETE (NONE rows — all-UNSET groups — are dropped).
    """
    # The fold's map_concat depends on LAST_WIN dedup (see _FOLD_EXPR);
    # a stock session carries EXCEPTION and would throw on a re-updated
    # field.  Set it here so the kernel is correct standalone, not only
    # behind tune_session.
    changes.sparkSession.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    pk_map = F.create_map(
        *[F.lit(x) for pair in primary_keys.items() for x in pair]
    )
    grouped = (
        changes.withColumn("op", F.upper("op"))
        .filter(F.col("op").isin("CREATE", "UPDATE", "DELETE"))
        .groupBy("table", "pk")
        .agg(
            F.collect_list(
                F.struct(
                    F.col("block_num"),
                    F.col("ordinal"),
                    F.col("op"),
                    F.col("fields"),
                )
            ).alias("ops_sorted")
        )
        .withColumn("pk_name", F.coalesce(pk_map[F.col("table")], F.lit("id")))
    )
    # Generate barrier: ``explode(array(fold))`` materializes the folded
    # struct ONCE per group.  Without it, CollapseProject inlines the
    # whole fold lambda into every downstream reference — the apply
    # join's keep-filter (err + op checks) and the per-column projection
    # would each re-evaluate the entire aggregate, tripling the fold
    # cost (measured: 0.98s -> 0.62s on the sf0.1 cdc_merge replay).
    # Predicates on ``folded.*`` cannot push through a Generate, so the
    # single evaluation is preserved no matter what the caller stacks
    # on top.  NONE groups (all-UNSET) are rare and handled as no-ops
    # by ``apply_table_ops``.
    folded = grouped.select(
        "table",
        "pk",
        "pk_name",
        F.explode(F.array(F.expr(_FOLD_EXPR))).alias("folded"),
    )
    return folded.select(
        "table",
        "pk",
        "pk_name",
        F.col("folded.op").alias("op"),
        F.col("folded.fields").alias("fields"),
        F.col("folded.err").alias("err"),
    )


def check_merge_errors(reduced: DataFrame) -> None:
    """Raise if any group folded to an error state (reference errors at
    db/ops.go:30 and db/ops.go:66).  ``limit`` probe — no full collect.
    """
    bad = reduced.filter(F.col("err").isNotNull()).select("table", "pk", "err").limit(5).collect()
    if bad:
        details = "; ".join(f"{r['table']}/{r['pk']}: {r['err']}" for r in bad)
        raise MergeSemanticsError(f"invalid change sequence: {details}")


#: Executor-side guard: any errored group poisons its pk expression so
#: the FIRST action touching it raises — no separate probe job, no
#: cache.  ``raise_error`` is non-foldable, and pk feeds the apply join
#: key, so Catalyst cannot prune it.
_GUARD_PK = """
CASE WHEN err IS NOT NULL THEN
  raise_error(concat('invalid change sequence: ', table, '/', pk, ': ', err))
ELSE pk END
"""


def guard_merge_errors(reduced: DataFrame) -> DataFrame:
    """Inline equivalent of :func:`check_merge_errors`: rewrites ``pk``
    so evaluating an errored group raises inside the job itself.  Turns
    reduce+check+apply into ONE action (the fold is evaluated once)
    at the cost of the error surfacing as a ``SparkException`` at
    action time instead of a ``MergeSemanticsError`` eagerly."""
    return reduced.withColumn("pk", F.expr(_GUARD_PK))


def apply_table_ops(target: DataFrame, ops: DataFrame, info: TableInfo) -> DataFrame:
    """Reconcile one table's reduced ops with its current state.

    Full-outer join on pk, then per-column resolution:

    * no op                        -> keep target row
    * CREATE                       -> row built from coerced fields
      (upsert: replaces an existing row with the same pk)
    * UPDATE on existing row       -> per-field overwrite of present keys
    * UPDATE on missing row        -> no-op (ClickHouse ``ALTER UPDATE``
      on an absent pk matches nothing)
    * DELETE                       -> row removed
    """
    pk = info.primary_key
    ops_t = ops.select(
        F.col("pk").alias("__pk"), F.col("op").alias("__op"), F.col("fields").alias("__fields")
    )
    # Initial-load fast path: with no existing state (the reference's
    # main use case is a from-genesis sync) the full-outer reconcile is
    # provably CREATE-rows-only — UPDATE/DELETE on an absent pk match
    # nothing.  A one-row probe detects it; skipping the join removes a
    # sort+shuffle of the whole window.  The keep-predicate evaluates
    # the err column for EVERY row so inline-guarded windows still
    # raise even though non-CREATE rows are dropped.
    if not target.take(1):
        if "err" in ops.columns:
            keep = F.when(
                F.col("err").isNotNull(),
                F.expr(
                    "raise_error(concat('invalid change sequence: ', "
                    "coalesce(pk, '?'), ': ', coalesce(err, '?')))"
                ).cast("boolean"),
            ).otherwise(F.col("op") == "CREATE")
        else:
            keep = F.col("op") == "CREATE"
        created = ops.filter(keep)
        return created.select(
            *[
                coerce(F.col("fields").getItem(field.name), field.dataType).alias(field.name)
                for field in info.schema.fields
            ]
        )
    joined = target.alias("t").join(
        ops_t, F.col(f"t.{pk}").cast("string") == F.col("__pk"), "full_outer"
    )
    exists = F.col(f"t.{pk}").isNotNull()
    kept = joined.filter(
        (F.col("__op").isNull())
        | (F.col("__op") == "CREATE")
        | (F.col("__op").isin("UPDATE", "NONE") & exists)
    )
    out_cols = []
    for field in info.schema.fields:
        new_val = coerce(F.col("__fields").getItem(field.name), field.dataType)
        has_key = F.map_contains_key(F.col("__fields"), F.lit(field.name))
        out = (
            F.when(F.col("__op") == "CREATE", new_val)
            .when((F.col("__op") == "UPDATE") & has_key, new_val)
            .otherwise(F.col(f"t.{field.name}"))
            .alias(field.name)
        )
        out_cols.append(out)
    return kept.select(*out_cols)


def merge_changes(
    changes: DataFrame,
    targets: dict[str, DataFrame],
    catalog: Catalog,
    check_errors: bool = True,
    return_reduced: bool = False,
):
    """Full merge: reduce a changes window and apply it to every
    affected table's state.  Returns the new state per table.

    ``check_errors`` modes:

    * ``True`` (default) — eager: cache the reduced ops, probe for
      errors, raise ``MergeSemanticsError`` before anything is applied.
      The right mode when the caller must not write ANY table on a bad
      window (the streaming pipeline).
    * ``"inline"`` — single-pass: no cache, no probe job; errored
      groups raise from inside the apply job itself
      (:func:`guard_merge_errors`).  Halves the work for one-shot
      batch replays over a single table.
    * ``False`` — skip checking entirely.

    In the eager mode the reduced-ops DataFrame is cached (the probe,
    each table's apply join, and any downstream action would otherwise
    re-execute the whole fold); pass ``return_reduced=True`` to also
    receive the cached DF so a long-running caller (the streaming
    pipeline) can unpersist it after committing the epoch.
    """
    reduced = reduce_changes(changes, catalog.primary_keys())
    if check_errors == "inline":
        live = guard_merge_errors(reduced)
        if len(targets) > 1:
            live = live.cache()
    else:
        reduced = reduced.cache()
        if check_errors:
            check_merge_errors(reduced)
        live = reduced.filter(F.col("err").isNull())
    out: dict[str, DataFrame] = {}
    for name, target in targets.items():
        info = catalog.get(name)
        ops_t = live.filter(F.col("table") == name)
        out[name] = apply_table_ops(target, ops_t, info)
    if return_reduced:
        return out, reduced
    return out


def collapse_versions(df: DataFrame, primary_key: str, version_column: str) -> DataFrame:
    """ReplacingMergeTree ``SELECT ... FINAL`` semantics on a table
    DataFrame: keep the row with the highest version per primary key.

    ``max_by(struct(all columns), version)`` — an algebraic aggregate
    (map-side partials collapse versions before the shuffle, one row
    per key crosses the exchange, no window sort), the same shape as
    q51_replacing_final.  ClickHouse resolves equal versions by
    insertion order; distributed reads have no such order, so equal
    versions break deterministically on the full row ordering (the
    remaining struct fields).
    """
    cols = df.columns
    packed = F.struct(
        F.col(version_column).alias("__v"), *[F.col(c) for c in cols]
    )
    agg = df.groupBy(F.col(primary_key).alias("__pk")).agg(
        F.max(packed).alias("__row")
    )
    return agg.select(*[F.col(f"__row.{c}").alias(c) for c in cols])


def collapse_summing(
    df: DataFrame, primary_key: str, sum_columns: list[str] | None = None
) -> DataFrame:
    """SummingMergeTree ``SELECT ... FINAL`` semantics: per primary
    key, sum the declared columns (or every numeric non-key column,
    ClickHouse's default) and keep one value for the rest.

    All-algebraic single aggregation (map-side partials).  ClickHouse
    keeps an arbitrary merge-order value for non-summed columns; a
    distributed read has no merge order, so we take ``max`` for
    determinism (documented deviation).
    """
    numeric = {
        f.name
        for f in df.schema.fields
        if isinstance(
            f.dataType,
            (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
             T.FloatType, T.DoubleType, T.DecimalType),
        )
    }
    targets = (
        [c for c in sum_columns if c != primary_key]
        if sum_columns is not None
        else [c for c in df.columns if c in numeric and c != primary_key]
    )
    aggs = []
    for c in df.columns:
        if c == primary_key:
            continue
        fn = F.sum if c in targets else F.max
        aggs.append(fn(c).alias(c))
    return df.groupBy(primary_key).agg(*aggs).select(*df.columns)
