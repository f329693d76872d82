"""Physical-plan inspection: the engine's scale-correctness instruments.

The reference has no optimizer or physical layer (SURVEY.md §4) — Catalyst
supplies both. What the engine owes its users instead is *evidence* that
the declarative plans hit the fast paths at 100 TB: filters pushed into
the parquet scan, columns pruned, small dimensions broadcast, partial
aggregation before shuffles, top-k fused into TakeOrderedAndProject.

These helpers parse ``df.explain()`` output into assertable facts; the
pushdown test-suite (tests/test_plans.py) pins every headline query to the
physical shape it must keep. If a refactor silently turns a broadcast join
into a cartesian product, that suite — not a 100 TB cluster bill — catches
it.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """Final physical plan string (AQE-resolved where already executed)."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    """`EXPLAIN FORMATTED` text — includes scan details (PushedFilters,
    ReadSchema) that the simple plan string elides."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters the parquet/orc scan accepted for row-group pruning."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters:\s*\[([^\]]*)\]", formatted_plan(df)):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schemas(df: DataFrame) -> list[list[str]]:
    """Column lists each file scan actually reads (column-pruning proof)."""
    schemas = []
    for m in re.finditer(r"ReadSchema:\s*struct<([^>]*)>", formatted_plan(df)):
        cols = [c.split(":")[0].strip()
                for c in m.group(1).split(",") if c.strip()]
        schemas.append(cols)
    return schemas


def _count(plan: str, token: str) -> int:
    return len(re.findall(re.escape(token), plan))


def plan_profile(df: DataFrame) -> dict[str, int]:
    """Operator census of the physical plan — the numbers that matter when
    deciding whether a plan survives a 100× scale-up."""
    plan = executed_plan(df)
    fmt = formatted_plan(df)
    return {
        "shuffles": _count(plan, "Exchange hashpartitioning")
        + _count(plan, "Exchange rangepartitioning")
        + _count(plan, "Exchange RoundRobinPartitioning")
        + _count(plan, "Exchange SinglePartition"),
        "broadcast_hash_joins": _count(plan, "BroadcastHashJoin"),
        "sort_merge_joins": _count(plan, "SortMergeJoin"),
        "broadcast_nested_loop_joins": _count(plan, "BroadcastNestedLoopJoin"),
        "cartesian_products": _count(plan, "CartesianProduct"),
        "hash_aggregates": _count(plan, "HashAggregate"),
        "sort_aggregates": _count(plan, "SortAggregate"),
        "object_hash_aggregates": _count(plan, "ObjectHashAggregate"),
        "top_k_sorts": _count(plan, "TakeOrderedAndProject"),
        "global_sorts": len(re.findall(r"Sort \[.*\], true", plan)),
        "python_evals": _count(plan, "BatchEvalPython")
        + _count(plan, "ArrowEvalPython")
        + _count(plan, "MapInPandas")
        + _count(plan, "FlatMapGroupsInPandas"),
        # codegen ids only render in the formatted explain (`*(n)` markers)
        "whole_stage_codegen_spans": len(
            set(re.findall(r"WholeStageCodegen \((\d+)\)", fmt))),
        # "FileScan parquet" contains "Scan parquet" — count the latter only
        "file_scans": _count(plan, "Scan parquet"),
    }


def uncached_plan(df: DataFrame) -> str:
    """Executed-plan text with every ``InMemoryRelation`` build subtree
    removed — i.e. only the operators that run DOWNSTREAM of persisted
    pins. The plan string prints a cached relation's full build plan
    beneath it, so asserting "no Python downstream of the pin" on the raw
    text would false-positive on the (legitimately Python) build side.
    Subtree extent is determined by indentation depth, matching how
    ``TreeNode.toString`` renders children."""

    def _indent(line: str) -> int:
        m = re.search(r"[+:]-", line)
        if m:
            return m.start()
        # A materialized (isFinalPlan=true) cached relation prints AQE
        # section lines with NO tree connector ("== Final Plan =="
        # headers, bare "ResultQueryStage n" roots). Falling back to 0
        # here used to END the skip early and leak the pin's (Python)
        # build operators into the "downstream" text; leading-whitespace
        # depth keeps those lines inside the stripped subtree (r12).
        return len(line) - len(line.lstrip())

    lines = executed_plan(df).splitlines()
    out: list[str] = []
    skip_deeper_than = None
    for line in lines:
        ind = _indent(line)
        if skip_deeper_than is not None:
            if ind > skip_deeper_than:
                continue
            skip_deeper_than = None
        if "InMemoryRelation" in line:
            skip_deeper_than = ind
            continue
        out.append(line)
    return "\n".join(out)


def single_partition_windows(df: DataFrame) -> int:
    """Count WindowExec nodes fed by an ``Exchange SinglePartition`` — the
    unpartitioned ``Window.orderBy(...)`` anti-pattern where one task sorts
    and scans the entire input. A global final aggregation also uses a
    SinglePartition exchange (1-row result — fine); only the Window-over-
    SinglePartition shape is the scale hazard, so match the parent/child
    pair, not the exchange alone."""
    lines = executed_plan(df).splitlines()
    hits = 0
    for i, line in enumerate(lines):
        if re.search(r"\bWindow(GroupLimit)? \[", line):
            # children render below, further indented; a global window's
            # subtree is Window <- Sort <- Exchange SinglePartition
            for nxt in lines[i + 1:i + 4]:
                if "Exchange SinglePartition" in nxt:
                    hits += 1
                    break
    return hits


def assert_no_python_in_plan(df: DataFrame) -> None:
    """Guard for JVM-only operators: raises if any Python evaluation node
    sneaked into the physical plan (breaking codegen on the hot path)."""
    prof = plan_profile(df)
    if prof["python_evals"]:
        raise AssertionError(
            f"plan contains {prof['python_evals']} Python eval node(s):\n"
            + executed_plan(df))
