"""Introspection utilities: plan digests and schema drift.

``plan_digest`` condenses a DataFrame's physical plan into the
counters this repo's plan audits care about (PLANS.md /
tests/test_plans.py): shuffle exchanges, broadcast exchanges, join
strategies, scans, whether filters reached the parquet scan, and the
whole-stage-codegen span count.  It reads the SAME executed-plan
string the tests assert against, so an audit can log one dict instead
of regex-ing plans ad hoc.

``schema_drift`` compares two schemas (e.g. yesterday's snapshot vs
today's delivery) into added / removed / type-changed columns — the
first check before any `table_diff` of contents.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql.types import StructType


def plan_digest(df: DataFrame, *, execute: bool = False) -> dict:
    """``execute=True`` collects THIS DataFrame first so AQE's FINAL
    plan is digested — join-strategy re-picks and codegen spans
    (`*(N)`) only exist there.  (A ``count()`` would execute a
    DIFFERENT query execution and leave this one un-finalized.)  Dev
    tool: only pass execute=True on result-sized frames."""
    if execute:
        df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    return {
        "shuffle_exchanges": len(re.findall(r"Exchange (?:hash|range)partitioning", plan)),
        "broadcast_exchanges": plan.count("BroadcastExchange"),
        "broadcast_hash_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "nested_loop_joins": plan.count("BroadcastNestedLoopJoin")
        + plan.count("CartesianProduct"),
        "scans": plan.count("FileScan"),
        "scans_with_pushed_filters": sum(1 for p in pushed if p.strip()),
        # toString() renders codegen stages as "*(N) Operator"; the
        # formatted explain spells out "WholeStageCodegen (N)".
        "codegen_spans": len(
            set(re.findall(r"\*\((\d+)\)", plan))
            | set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
        ),
    }


def schema_drift(old: StructType, new: StructType) -> dict:
    """{added: [name], removed: [name], type_changed: [(name, old, new)]}."""
    o = {f.name: f.dataType.simpleString() for f in old.fields}
    n = {f.name: f.dataType.simpleString() for f in new.fields}
    return {
        "added": sorted(set(n) - set(o)),
        "removed": sorted(set(o) - set(n)),
        "type_changed": sorted(
            (c, o[c], n[c]) for c in set(o) & set(n) if o[c] != n[c]
        ),
    }
