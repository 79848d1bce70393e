"""Physical-plan linter: the repo's plan-shape review, automated.

Every operator in this engine carries a scale contract ("zero Exchange",
"no row-at-a-time Python", "the one unpartitioned window runs over <=
`groups` rows") that a dozen hand-written plan tests pin individually.
This module turns those checks into one reusable audit so new operators
(and user-composed pipelines) get the same review for free:

    findings = lint_plan(df)
    assert_clean(df, allow=("single_partition_funnel",))

Rules (matched against the executed physical plan of THIS Spark version
— the sandbox pins 4.1.x; markers are asserted in tests so a Spark
upgrade that renames a node fails loudly, not silently):

- ``cartesian`` (error): `CartesianProduct` / `BroadcastNestedLoopJoin`
  — an unkeyed join; at corpus scale this is never survivable unless
  one side is provably tiny (then: allow it explicitly).
- ``row_python_udf`` (error): `BatchEvalPython` — row-at-a-time Python
  in the hot path; the engine's contract is Arrow batches or JVM.
- ``single_partition_funnel`` (warn): `Exchange SinglePartition` — a
  global window / sort / repartition(1) collapsing onto one task. Legal
  only over provably bounded rows (sketch tables, manifests) — allow it
  where the operator documents that bound.
- ``global_window`` (warn): a Window node with no partition columns
  (the usual cause of the funnel above, reported separately so the
  offending operator is identifiable).
- ``unpushed_filter`` (warn): a Filter node above a columnar scan whose
  `PushedFilters` is empty — the predicate reads the whole input. Often
  a derived-column predicate; decide, then allow or re-express.
- ``arrow_udf`` (info): `ArrowEvalPython` / `MapInPandas` / pandas
  groupBy — the sanctioned Python boundary, surfaced for visibility.
- ``exchange_count`` (info): total Exchange nodes — the shuffle budget.

The reference has no plan surface at all; this audits the engine's own
promise that declarative plans stay scan-shaped at 100 TB.
"""

from __future__ import annotations

import re
from typing import Dict, Iterable, List

from pyspark.sql import DataFrame

Finding = Dict[str, str]

_ARROW_NODES = (
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "FlatMapGroupsInPandasWithState",
    "MapInArrow",
)


def _physical(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df: DataFrame) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def lint_plan(df: DataFrame) -> List[Finding]:
    """All findings for ``df``'s physical plan, most severe first.
    Pure inspection — triggers planning, never execution."""
    plan = _physical(df)
    out: List[Finding] = []

    for node in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        if node in plan:
            out.append(
                {
                    "rule": "cartesian",
                    "severity": "error",
                    "detail": f"{node} — unkeyed join; broadcast-tiny or re-key",
                }
            )
    if "BatchEvalPython" in plan:
        out.append(
            {
                "rule": "row_python_udf",
                "severity": "error",
                "detail": "BatchEvalPython — row-at-a-time Python UDF; "
                "use built-ins or a pandas UDF",
            }
        )
    n_single = plan.count("Exchange SinglePartition")
    if n_single:
        out.append(
            {
                "rule": "single_partition_funnel",
                "severity": "warn",
                "detail": f"{n_single}x Exchange SinglePartition — one-task "
                "stage; legal only over provably bounded rows",
            }
        )
    # a Window line carries top-level bracket groups [funcs], [partition],
    # [order]; the unpartitioned form has only [funcs], [order]
    n_global = 0
    for line in plan.splitlines():
        s = line.strip().lstrip("*+-: ")
        if s.startswith("Window ") and "windowspecdefinition" in s:
            groups = re.findall(r"\[(?:[^\[\]]|\[[^\]]*\])*\]", s)
            if len(groups) == 2:
                n_global += 1
    if n_global:
        out.append(
            {
                "rule": "global_window",
                "severity": "warn",
                "detail": f"{n_global}x Window with no partition columns",
            }
        )
    fmt = _formatted(df)
    pushed_lists = re.findall(r"PushedFilters: \[([^\]]*)\]", fmt)
    if pushed_lists and re.search(r"^\s*\S*\s*Filter", fmt, re.M):
        # IsNotNull is implied bookkeeping, not a value predicate; if no
        # scan received a real predicate while a Filter node exists, the
        # filter runs over the whole input
        def _has_value_pred(lst: str) -> bool:
            items = [s.strip() for s in lst.split(",") if s.strip()]
            return any(not i.startswith("IsNotNull(") for i in items)

        if not any(_has_value_pred(lst) for lst in pushed_lists):
            out.append(
                {
                    "rule": "unpushed_filter",
                    "severity": "warn",
                    "detail": "Filter present but no value predicate reached "
                    "any scan's PushedFilters — the filter reads the whole "
                    "input",
                }
            )
    arrow = [n for n in _ARROW_NODES if n in plan]
    if arrow:
        out.append(
            {
                "rule": "arrow_udf",
                "severity": "info",
                "detail": "Arrow-batched Python boundary: " + ", ".join(arrow),
            }
        )
    out.append(
        {
            "rule": "exchange_count",
            "severity": "info",
            "detail": str(plan.count("Exchange")),
        }
    )
    sev_rank = {"error": 0, "warn": 1, "info": 2}
    out.sort(key=lambda f: (sev_rank[f["severity"]], f["rule"]))
    return out


def assert_clean(
    df: DataFrame, allow: Iterable[str] = ()
) -> List[Finding]:
    """Raise ``AssertionError`` listing every error/warn finding whose
    rule is not in ``allow``; returns all findings otherwise (infos are
    always allowed). The plan-test one-liner."""
    allowed = set(allow)
    findings = lint_plan(df)
    bad = [
        f
        for f in findings
        if f["severity"] in ("error", "warn") and f["rule"] not in allowed
    ]
    if bad:
        raise AssertionError(
            "plan lint: "
            + "; ".join(f"[{f['severity']}] {f['rule']}: {f['detail']}" for f in bad)
        )
    return findings
