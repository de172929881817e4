"""Physical-plan inspection helpers (the .explain discipline).

The engine is declared against Catalyst, so the optimizer guarantees we
care about are visible in the formatted plan:

- ``PushedFilters`` on parquet scans (predicate pushdown),
- ``ReadSchema`` listing only the projected columns (column pruning),
- ``BroadcastHashJoin`` for site/robots dimensions,
- wide ``WholeStageCodegen`` spans around JVM-side expressions,
- exactly two ``ArrowEvalPython``/``MapInPandas`` nodes per wave (the
  fetch stage and the sink unescape) — nothing else leaves the JVM.

:func:`plan_report` collects these assertions for a set of named
DataFrames, and scripts/dump_plans.py writes them to PLANS.md for review.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def _codegen_subtrees(df: DataFrame) -> int:
    """WholeStageCodegen span count. The formatted/simple explain of an
    un-executed AQE plan carries no codegen annotations at all (they are
    assigned at codegen time), so ask the codegen explain mode, whose
    header is authoritative: 'Found N WholeStageCodegen subtrees.'"""
    p = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "codegen"
    )
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", p)
    return int(m.group(1)) if m else 0


def plan_checks(df: DataFrame) -> dict:
    p = formatted_plan(df)
    return {
        "has_pushed_filters": "PushedFilters: [" in p and "PushedFilters: []" not in p,
        # hash for equi-joins, nested-loop for explicit broadcast cross
        # joins (e.g. query-side × broadcast corpus in brute-force topk)
        "has_broadcast_join": "BroadcastHashJoin" in p
        or "BroadcastNestedLoopJoin" in p,
        "n_codegen_spans": _codegen_subtrees(df),
        "n_python_stages": p.count("ArrowEvalPython") + p.count("MapInPandas"),
        # each scan appears once in the tree and once in the detail
        # section of a formatted plan — count the detail headers only
        "scans": len(re.findall(r"^\(\d+\) Scan parquet", p, re.M)),
    }


def plan_report(named: dict[str, DataFrame]) -> str:
    out = []
    for name, df in named.items():
        out.append(f"## {name}\n\n```\n{formatted_plan(df)}\n```\n")
    return "\n".join(out)
