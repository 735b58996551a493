"""Plan linting: the 100-TB posture checks this repo pins in its own
test suite (tests/test_plans.py), packaged as a library so USERS can run
them against their own DataFrames before a query ships to a cluster.

A plan that is correct at fixture scale can still be a scale incident —
a Cartesian product that "worked" on 60k rows, a row-at-a-time Python
UDF in the hot path, a global single-partition sort. ``lint_plan``
inspects the physical (and analyzed) plan and returns findings;
``assert_scale_safe`` raises on the error-severity ones, so a unit test
over a query builder doubles as a plan gate.

Driver-side string inspection of Spark's own explain output — no
execution, no data read.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class Finding:
    check: str
    severity: str  # "error" | "warn" | "info"
    detail: str


def _plans(df: DataFrame) -> tuple[str, str, str]:
    jqe = df._jdf.queryExecution()
    executed = jqe.executedPlan().toString()
    analyzed = jqe.analyzed().toString()
    jmode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    formatted = jqe.explainString(jmode)
    return executed, analyzed, formatted


def lint_plan(df: DataFrame) -> list[Finding]:
    """Findings for ``df``'s physical plan, most severe first.

    - ``cartesian_product`` (error): the data-squared join no cluster
      survives — almost always a missing equi-condition.
    - ``python_row_udf`` (error): ``BatchEvalPython`` — a row-at-a-time
      Python UDF in the plan; 10-100× slower than the Arrow-batched
      ``pandas_udf`` equivalent and it breaks whole-stage codegen.
    - ``broadcast_nested_loop`` (warn): fine for a genuinely tiny
      broadcast side (a config relation), a scale incident when the
      side is data-proportional — verify which one it is.
    - ``single_partition_exchange`` (warn): a global sort/window/agg
      funneling everything through one task. A top-k should plan as
      ``TakeOrderedAndProject`` instead (noted when present).
    - ``unpushed_scan_filter`` (info): a file scan with an empty
      ``PushedFilters`` list while the query filters — pushdown may be
      inapplicable (e.g. a filter on a computed column), but at scale a
      scan that can't skip is worth a look.
    - ``broadcast_hint`` (info): explicit hints survive in the analyzed
      plan; the policy that has held up here is hints ONLY on
      genuinely fixed-size sides (config/dimension/k-row relations) —
      an sf-proportional hint becomes a multi-GB driver build at scale.
    - ``python_arrow_stage`` (info): Arrow-batched Python
      (mapInPandas / applyInPandas / pandas_udf) in the plan — the
      sanctioned slow path; listed so its presence is a decision, not
      an accident.
    """
    executed, analyzed, formatted = _plans(df)
    out: list[Finding] = []

    if "CartesianProduct" in executed:
        out.append(Finding(
            "cartesian_product", "error",
            "CartesianProduct in the physical plan — data² work; add an "
            "equi-join condition or pre-bucket the pair space",
        ))
    if "BatchEvalPython" in executed:
        out.append(Finding(
            "python_row_udf", "error",
            "BatchEvalPython (row-at-a-time Python UDF) — replace with a "
            "built-in expression or an Arrow-batched pandas_udf",
        ))
    if "BroadcastNestedLoopJoin" in executed:
        out.append(Finding(
            "broadcast_nested_loop", "warn",
            "BroadcastNestedLoopJoin — acceptable only when the broadcast "
            "side is genuinely fixed-size; data-proportional sides must "
            "become equi-joins",
        ))
    if "Exchange SinglePartition" in executed:
        note = (
            " (a TakeOrderedAndProject also in this plan suggests the "
            "top-k half is already safe)"
            if "TakeOrderedAndProject" in executed else ""
        )
        out.append(Finding(
            "single_partition_exchange", "warn",
            "Exchange SinglePartition — a global one-task funnel; bound "
            "the data first (pre-aggregate, limit) or keep a partitioned "
            "shape" + note,
        ))
    import re as _re

    pushed = _re.findall(r"PushedFilters: \[([^\]]*)\]", formatted)
    if "Filter (" in formatted and not any(p.strip() for p in pushed):
        out.append(Finding(
            "unpushed_scan_filter", "info",
            "the plan filters but NO predicate reached any file scan — "
            "check whether it could (plain column comparisons push; "
            "computed/coalesced expressions don't)",
        ))
    n_hints = analyzed.count("ResolvedHint")
    if n_hints:
        out.append(Finding(
            "broadcast_hint", "info",
            f"{n_hints} explicit join hint(s) in the analyzed plan — "
            "allowed for genuinely fixed-size sides only; an "
            "sf-proportional hint is a scale incident",
        ))
    for marker, name in (
        ("ArrowEvalPython", "pandas_udf"),
        ("MapInPandas", "mapInPandas"),
        ("FlatMapGroupsInPandas", "applyInPandas"),
    ):
        if marker in executed:
            out.append(Finding(
                "python_arrow_stage", "info",
                f"{marker} ({name}) — Arrow-batched Python stage; the "
                "sanctioned slow path, keep it off data-volume hot loops "
                "when a built-in expression exists",
            ))
    sev = {"error": 0, "warn": 1, "info": 2}
    out.sort(key=lambda f: sev[f.severity])
    return out


def assert_scale_safe(df: DataFrame, *, allow: set[str] = frozenset()) -> list[Finding]:
    """Raise ``AssertionError`` if ``df``'s plan has any error-severity
    finding not named in ``allow``; return all findings otherwise. Drop
    this into a unit test next to a query builder and the test suite
    becomes a plan gate — the pattern tests/test_plans.py uses for every
    registered query here."""
    findings = lint_plan(df)
    bad = [f for f in findings if f.severity == "error" and f.check not in allow]
    if bad:
        raise AssertionError(
            "plan is not scale-safe: "
            + "; ".join(f"{f.check}: {f.detail}" for f in bad)
        )
    return findings
