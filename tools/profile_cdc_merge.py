"""Stage-level attribution for the ``cdc_merge`` bench entry.

Times progressively larger prefixes of the cdc_merge pipeline
(best-of-N each, warm buffer pool) so the cost of each stage is the
delta between consecutive rows, then prints per-stage wall-clock from
Spark's own StageInfo for the full run.

    python tools/profile_cdc_merge.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    import __spark_entry__ as entry_mod
    from substreams_sink_clickhouse_spark.catalog import Catalog
    from substreams_sink_clickhouse_spark.operators.merge import (
        merge_changes,
        reduce_changes,
    )
    from substreams_sink_clickhouse_spark.operators.streaming_q import (
        _ORDERS_T,
        _cdc_merge,
    )
    from substreams_sink_clickhouse_spark.session import get_spark, interactive_session
    from substreams_sink_clickhouse_spark.sources.tables import load_table, warm_tables

    spark = get_spark("cdc-profile")
    spark.sparkContext.setLogLevel("ERROR")
    inter = interactive_session(spark)
    warm_tables(spark, sf_dir)
    warm_tables(inter, sf_dir)

    # Rebuild the same synthetic change stream _cdc_merge uses, so the
    # prefixes share plan fragments with the real entry.
    def changes_df(sess):
        import substreams_sink_clickhouse_spark.operators.streaming_q as sq

        # reuse the entry itself for the full pipeline; prefixes below
        # rebuild its fan-out inline
        o = load_table(sess, sf_dir, "orders")
        base = o.select(
            F.col("o_orderkey").alias("key"),
            F.col("o_orderstatus").alias("status"),
            F.col("o_totalprice").alias("price"),
        ).withColumn("pk", F.col("key").cast("string"))
        base = base.repartition(min(16, sess.sparkContext.defaultParallelism), "pk")

        def entry(name, value):
            return F.struct(F.lit(name).alias("key"), value.alias("value"))

        null_entries = F.lit(None).cast("array<struct<key:string,value:string>>")

        def change(block, op, entries):
            return F.struct(
                F.lit(block).cast("long").alias("block_num"),
                F.lit(f"b{block}").alias("block_id"),
                F.col("key").alias("ordinal"),
                F.lit(op).alias("op"),
                entries.alias("fields_entries"),
            )

        fanned = base.select(
            "pk",
            F.explode(
                F.filter(
                    F.array(
                        change(
                            1,
                            "CREATE",
                            F.array(
                                entry("status", F.col("status")),
                                entry("price", F.col("price").cast("string")),
                            ),
                        ),
                        F.when(
                            F.col("key") % 3 == 0,
                            change(
                                2,
                                "UPDATE",
                                F.array(entry("price", (F.col("price") + 100).cast("string"))),
                            ),
                        ),
                        F.when(F.col("key") % 7 == 0, change(3, "DELETE", null_entries)),
                    ),
                    lambda c: c.isNotNull(),
                )
            ).alias("c"),
        )
        return fanned.select(
            F.col("c.block_num").alias("block_num"),
            F.col("c.block_id").alias("block_id"),
            F.col("c.ordinal").alias("ordinal"),
            F.lit("orders_t").alias("table"),
            "pk",
            F.col("c.op").alias("op"),
            F.col("c.fields_entries").alias("fields_entries"),
        )

    catalog = Catalog()
    catalog.register(_ORDERS_T)

    def timed(label, build):
        best = float("inf")
        for _ in range(reps):
            df = build()
            t0 = time.time()
            df.count()
            best = min(best, time.time() - t0)
            time.sleep(0.1)
        print(f"{label:<38} {best*1000:8.1f} ms")
        return best

    from substreams_sink_clickhouse_spark.operators.merge import (
        apply_table_ops,
        guard_merge_errors,
    )
    from substreams_sink_clickhouse_spark.functions.localdata import empty_df

    sess = inter
    print(f"profile on sf={sf_dir} reps={reps} (best-of, warm)")
    t_scan = timed("A scan+project (no shuffle)", lambda: load_table(sess, sf_dir, "orders").select("o_orderkey"))
    t_fan = timed("B A+repartition+fanout (changes)", lambda: changes_df(sess))
    t_group = timed(
        "C B+groupBy collect_list",
        lambda: changes_df(sess)
        .withColumn("op", F.upper("op"))
        .filter(F.col("op").isin("CREATE", "UPDATE", "DELETE"))
        .groupBy("table", "pk")
        .agg(F.collect_list(F.struct("block_num", "ordinal", "op", "fields_entries")).alias("ops_sorted")),
    )
    t_fold = timed(
        "D B+reduce_changes (C+fold)",
        lambda: reduce_changes(changes_df(sess), catalog.primary_keys()),
    )
    t_apply = timed(
        "E D+guard+apply (full kernel)",
        lambda: apply_table_ops(
            empty_df(sess, _ORDERS_T.schema),
            guard_merge_errors(reduce_changes(changes_df(sess), catalog.primary_keys())),
            _ORDERS_T,
        ),
    )
    t_entry = timed("F gate entry _cdc_merge", lambda: _cdc_merge(sess, sf_dir))

    print("\ndeltas (stage attribution):")
    print(f"  scan+project        {t_scan*1000:8.1f} ms")
    print(f"  shuffle+fanout      {(t_fan-t_scan)*1000:8.1f} ms")
    print(f"  groupBy collect     {(t_group-t_fan)*1000:8.1f} ms")
    print(f"  fold lambda         {(t_fold-t_group)*1000:8.1f} ms")
    print(f"  guard+apply+coerce  {(t_apply-t_fold)*1000:8.1f} ms")
    print(f"  entry overhead      {(t_entry-t_apply)*1000:8.1f} ms")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
