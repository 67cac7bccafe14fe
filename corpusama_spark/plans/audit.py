"""Physical-plan audits — the engine's optimizer contract, enforced.

The reference hand-codes its optimizations (SQL-string pushdown, chunked
streaming, drop lists — SURVEY.md §4); here Catalyst does them, and these
helpers make the *result* checkable in tests and ops tooling instead of
trusted blindly:

- filters/projection must reach the parquet scan (PushedFilters / ReadSchema),
- no row-at-a-time Python may appear (only Arrow exchanges),
- shuffle count must match the plan's design budget,
- whole-stage codegen must cover the JVM expression work.

Each check raises AssertionError with the offending plan text, so a failed
audit is directly debuggable.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


def _formatted(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def plan_text(df: DataFrame, mode: str = "formatted") -> str:
    """explain() output as a string (Spark only prints it)."""
    if mode == "formatted":
        return _formatted(df)
    return df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001


@dataclass
class PlanReport:
    n_exchanges: int
    n_broadcasts: int
    n_arrow_evals: int
    n_row_python: int
    n_codegen_spans: int
    pushed_filters: list[str]
    read_schemas: list[str]

    def assert_no_row_python(self) -> "PlanReport":
        assert self.n_row_python == 0, "BatchEvalPython (row-at-a-time UDF) in plan"
        return self

    def assert_max_shuffles(self, n: int) -> "PlanReport":
        assert self.n_exchanges <= n, (
            f"plan has {self.n_exchanges} shuffle exchanges, budget is {n}"
        )
        return self


def report(df: DataFrame) -> PlanReport:
    """Audit both explain surfaces: the formatted plan (scan details,
    exchanges, Python evals) and the executed plan, where whole-stage
    codegen shows as `*(N)` operator prefixes — under AQE the codegen ids
    only exist after the plan is finalized, so run an action first if
    `n_codegen_spans` matters."""
    text = plan_text(df)
    etext = plan_text(df, mode="executed")
    # formatted mode separates the node header "(N) Exchange" from its
    # "Arguments: hashpartitioning(...)" line; match both spellings
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange\s*$", text, re.M)) or len(
        re.findall(
            r"\bExchange (?:hash|range)partitioning|\bExchange RoundRobin", text
        )
    )
    # formatted mode prints each node twice (tree line + "(N) Node" details
    # header); count the numbered headers so the tally is exact node count
    n_arrow = len(re.findall(r"^\(\d+\) ArrowEvalPython", text, re.M)) or (
        text.count("ArrowEvalPython") // 2
    )
    return PlanReport(
        n_exchanges=n_exchanges,
        n_broadcasts=text.count("BroadcastExchange"),
        n_arrow_evals=n_arrow,
        n_row_python=text.count("BatchEvalPython") + etext.count("BatchEvalPython"),
        n_codegen_spans=len(set(re.findall(r"\*\((\d+)\)", etext))),
        pushed_filters=re.findall(r"PushedFilters: \[([^\]]*)\]", text),
        read_schemas=re.findall(r"ReadSchema: ([^\n]*)", text),
    )


def _first_spec_arg(node: str) -> str | None:
    """First argument of the first windowspecdefinition(...) in a plan
    line, split paren-aware (partition cols can be nested expressions
    like knownfloatingpointnormalized(...))."""
    i = node.find("windowspecdefinition(")
    if i < 0:
        return None
    j = i + len("windowspecdefinition(")
    depth, k = 0, j
    while k < len(node):
        ch = node[k]
        if ch == "(":
            depth += 1
        elif ch == ")":
            if depth == 0:
                break
            depth -= 1
        elif ch == "," and depth == 0:
            break
        k += 1
    return node[j:k].strip()


def unpartitioned_windows(df: DataFrame) -> list[str]:
    """Window/WindowInPandas nodes with NO partition spec — the shape
    that makes Spark move the entire input through one task (WindowExec
    warns "Moving all data to a single partition"). Inside a node's
    ``windowspecdefinition(partCols..., orderExprs..., frame)`` the
    partition columns print bare while order expressions carry an
    ``ASC|DESC NULLS`` suffix — so a spec whose FIRST argument is an
    order expression (or directly the frame) has an empty partition
    spec. Returns the offending plan lines (empty = clean). Bounded
    inputs (bin/stage/k-sized tables) are legitimate single-task sites
    and belong in the caller's whitelist — corpus-sized ones are the
    scale bug this audit exists to catch (see operators/prefixsum.py
    for the fix pattern)."""
    lines = plan_text(df, mode="executed").splitlines()
    bad = []
    for ln in lines:
        node = re.sub(r"^[\s:+*()\d-]*", "", ln)
        if not node.startswith(("Window ", "WindowInPandas ")):
            continue
        first = _first_spec_arg(node)
        if first is None:
            continue
        if first.startswith("specifiedwindowframe") or re.search(
            r"\s(ASC|DESC) NULLS (FIRST|LAST)$", first
        ):
            bad.append(ln.strip())
    return bad


def assert_no_unpartitioned_window(df: DataFrame) -> None:
    """Raise if any window in the plan has no partition spec."""
    bad = unpartitioned_windows(df)
    assert not bad, (
        "unpartitioned Window in plan (single-partition execution):\n"
        + "\n".join(bad)
    )


def assert_filter_pushed(df: DataFrame, column: str) -> None:
    """The scan must receive a pushed filter mentioning `column`."""
    rep = report(df)
    assert any(column in f for f in rep.pushed_filters), (
        f"no pushed filter on {column}; PushedFilters={rep.pushed_filters}"
    )


def assert_column_pruned(df: DataFrame, column: str) -> None:
    """`column` must NOT appear in any scan's ReadSchema (pruned away)."""
    rep = report(df)
    assert all(column not in s for s in rep.read_schemas), (
        f"column {column} read but unused; ReadSchema={rep.read_schemas}"
    )
