"""Physical-plan inspection helpers.

At 100 TB the difference between a good and a bad plan is the job: a
scan that reads all columns for a 2-column projection, a dimension
join that shuffles the fact table, a filter evaluated after the
exchange — each is a 10–100× regression that unit tests on 60k rows
never catch.  These helpers make plan shape *testable*:

* ``scan_info``      — ReadSchema + PushedFilters of every parquet scan
* ``has_broadcast``  — did the dimension side actually broadcast?
* ``count_shuffles`` — number of exchanges in the plan
* ``codegen_spans``  — WholeStageCodegen coverage

``tests/test_plans.py`` pins the expected shape of the flagship
queries so a regression in pushdown/broadcast breaks CI, not the
cluster bill.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def scan_info(df: DataFrame) -> list[dict[str, str]]:
    """Per parquet scan: pushed filters + read schema."""
    text = formatted_plan(df)
    scans = []
    for block in re.split(r"\n\(\d+\) ", text):
        if not block.startswith("Scan parquet"):
            continue
        pushed = re.search(r"PushedFilters: \[(.*?)\]", block)
        schema = re.search(r"ReadSchema: struct<(.*?)>", block, re.DOTALL)
        location = re.search(r"Location: \S+ \[(.*?)\]", block)
        scans.append(
            {
                "location": location.group(1) if location else "",
                "pushed_filters": pushed.group(1) if pushed else "",
                "read_schema": schema.group(1).replace("\n", "") if schema else "",
            }
        )
    return scans


def has_broadcast(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in simple_plan(df) or "BroadcastExchange" in simple_plan(df)


def count_shuffles(df: DataFrame) -> int:
    return simple_plan(df).count("Exchange hashpartitioning") + simple_plan(df).count(
        "Exchange rangepartitioning"
    )


def codegen_spans(df: DataFrame, execute: bool = True) -> int:
    """Count whole-stage-codegen spans.  Under AQE the codegen stages
    only materialize in the *final* plan, so by default this executes
    the DataFrame first (cheap at test scale)."""
    if execute:
        # collect() executes THIS DataFrame's query execution (count()
        # would build a different one and leave this plan non-final)
        df.collect()
    plan = simple_plan(df)
    spans = set(re.findall(r"\*\((\d+)\)", plan))
    return len(spans) or len(re.findall(r"WholeStageCodegen", plan))


def read_columns(df: DataFrame, table_substring: str) -> set[str]:
    """Column names actually read from scans whose path matches."""
    cols: set[str] = set()
    for scan in scan_info(df):
        if table_substring in scan["location"] or table_substring in scan["read_schema"]:
            cols.update(
                part.split(":")[0].strip()
                for part in scan["read_schema"].split(",")
                if ":" in part
            )
    return cols
