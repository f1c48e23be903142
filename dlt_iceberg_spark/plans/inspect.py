"""Physical-plan parsing helpers (string-level, version-tolerant)."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The plan text ``df.explain(mode)`` would print, as a string."""
    jvm = df.sparkSession._jvm
    return jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Every predicate that reached a parquet scan, across all scans.

    Empty ⇒ the scan reads everything and filtering happens post-scan —
    at 100 TB that is the difference between reading a partition and
    reading the lake."""
    plan = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out += [p.strip() for p in _split_top_level(body)]
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema struct strings, one per scan (column-pruning evidence)."""
    return re.findall(r"ReadSchema: (struct<[^>]*>)", explain_str(df))


def scan_columns(df: DataFrame) -> list[set[str]]:
    """Column-name sets actually read from each scan."""
    cols = []
    for schema in read_schemas(df):
        inner = schema[len("struct<") : -1]
        cols.append({f.split(":")[0] for f in _split_top_level(inner) if f})
    return cols


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges (excludes broadcast exchanges)."""
    plan = explain_str(df, "simple")
    return len(re.findall(r"Exchange (?!SinglePartition)(?:hashpartitioning|rangepartitioning|RoundRobinPartitioning)", plan)) + len(
        re.findall(r"Exchange SinglePartition", plan)
    )


def broadcast_join_count(df: DataFrame) -> int:
    return explain_str(df, "simple").count("BroadcastHashJoin") + explain_str(
        df, "simple"
    ).count("BroadcastNestedLoopJoin")


def sort_merge_join_count(df: DataFrame) -> int:
    return explain_str(df, "simple").count("SortMergeJoin")


def assert_no_cartesian(df: DataFrame) -> None:
    plan = explain_str(df, "simple")
    assert "CartesianProduct" not in plan, f"cartesian product in plan:\n{plan}"


def _split_top_level(s: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` ignoring separators nested in (), <>, []."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch in "(<[":
            depth += 1
        elif ch in ")>]":
            depth -= 1
        if ch == sep and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur).strip())
    return parts
