"""Physical-plan inspection: assertions about HOW a query executes.

Correctness tests say what a query returns; these utilities let tests
pin the execution shape — filters reaching the scan, dimensions being
broadcast, the number of exchanges — so a regression that silently
turns a broadcast join into a sort-merge join (or drops pushdown) fails
CI even though results stay right. At 100 TB the plan shape IS the
product.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The final (AQE-resolved where possible) physical plan text."""
    return df._jdf.queryExecution().executedPlan().toString()


def explain_text(df: DataFrame, mode: str = "formatted") -> str:
    """Full explain output (untruncated — the tree form elides long
    ReadSchema/PushedFilters entries)."""
    jvm = df.sparkSession._jvm
    em = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(em)


def plan_summary(df: DataFrame) -> dict:
    """Operator census of the physical plan."""
    plan = executed_plan(df)
    return {
        "broadcast_hash_joins": len(re.findall(r"BroadcastHashJoin", plan)),
        "sort_merge_joins": len(re.findall(r"SortMergeJoin", plan)),
        "exchanges": len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)", plan)),
        "broadcast_exchanges": len(re.findall(r"BroadcastExchange", plan)),
        "scans": len(re.findall(r"FileScan parquet", plan)),
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", plan))),
    }


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every parquet scan in the plan."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", explain_text(df)):
        entry = m.group(1).strip()
        if entry:
            out.extend(s.strip() for s in entry.split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema (pruned projection) of every parquet scan."""
    return re.findall(r"ReadSchema: (struct<[^\n]*)", explain_text(df))
