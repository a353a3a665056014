"""Physical-plan audit helpers — make 'would this survive 100×' checkable.

The reference has no plan layer at all (SURVEY.md §4); for us the plan IS
the performance contract, so tests assert on it: filters reached the
scan, joins aren't cartesian, hot paths stay inside WholeStageCodegen.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def has_pushed_filters(df: DataFrame) -> bool:
    """True if the formatted plan shows non-empty parquet PushedFilters."""
    plan = explain_str(df)
    return bool(re.search(r"PushedFilters: \[(?!\])", plan))


def read_schema_columns(df: DataFrame) -> list:
    """Columns the scan actually reads (column pruning check)."""
    plan = explain_str(df)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    if not m:
        return []
    return [c.split(":")[0] for c in m.group(1).split(",") if c]


def wholestage_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans in the plan (wider = fewer
    pipeline breaks). Simple mode marks codegen stages as ``*(n)``."""
    plan = explain_str(df, "simple")
    return len(set(re.findall(r"\*\((\d+)\)", plan)))


def assert_no_cartesian(df: DataFrame, allow_bnlj: bool = False) -> None:
    """Reject all-pairs join shapes. Spark spells a non-equi join two
    ways — CartesianProduct AND BroadcastNestedLoopJoin — and the latter
    is just as much an O(n·m) scan (round-1 blind spot: the all-pairs
    embedding join passed this check under its BNLJ name). A deliberate
    broadcast-stream shape (tiny broadcast side, e.g. brute-force ANN
    baseline) may opt in with allow_bnlj=True."""
    plan = explain_str(df)
    assert "CartesianProduct" not in plan, "unexpected cartesian product:\n" + plan
    if not allow_bnlj:
        assert "BroadcastNestedLoopJoin" not in plan, (
            "unexpected nested-loop join (all-pairs shape):\n" + plan
        )
