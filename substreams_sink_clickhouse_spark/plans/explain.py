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


def _strip_cached_bodies(text: str) -> str:
    """Drop ``InMemoryRelation`` subtree printouts from a plan text.

    A cached shared intermediate (``dedup._shared_core``) re-prints
    its build plan under every ``InMemoryTableScan`` that references
    it; those exchanges execute at most ONCE per session, at
    materialization, and whether a given entry's plan happens to
    carry them depends on which entry ran first — session state, not
    the entry's topology.  Budgets/pins must be deterministic per
    entry, so the count covers the exchanges the entry's OWN topology
    executes; the cached builds' shapes are pinned where they are
    defined (their consumers' correctness gates + tests).  A subtree
    is the ``InMemoryRelation`` line plus following lines at deeper
    tree indentation."""
    def content_pos(line: str) -> int:
        # where the node text starts, past the tree-drawing prefix
        return len(line) - len(line.lstrip(" :+-"))

    lines = text.splitlines()
    out: list[str] = []
    i = 0
    while i < len(lines):
        line = lines[i]
        if "InMemoryRelation" not in line:
            out.append(line)
            i += 1
            continue
        base = content_pos(line)
        i += 1
        while i < len(lines) and content_pos(lines[i]) > base:
            i += 1
    return "\n".join(out)


def count_shuffles(df: DataFrame) -> int:
    """Number of DISTINCT shuffle exchanges the entry's own topology
    executes: unique ``plan_id``s (the same physical exchange can
    print several times when a subtree is referenced twice), with
    cached shared-core build plans excluded (see
    :func:`_strip_cached_bodies`).  Falls back to raw substring
    counts for plan texts that carry no plan_ids."""
    text = _strip_cached_bodies(simple_plan(df))
    ids = {
        m.group(2)
        for m in re.finditer(
            r"Exchange (hashpartitioning|rangepartitioning)"
            r"[^\n]*?plan_id=(\d+)",
            text,
        )
    }
    if ids:
        return len(ids)
    return text.count("Exchange hashpartitioning") + text.count(
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
