"""Physical-plan inspection helpers.

The scale contract of every operator in this engine ("filter reaches
the scan", "dimension joins broadcast", "top-k never global-sorts")
is checkable from ``explain("formatted")`` output.  These helpers
parse that text so tests/test_plans.py can assert plan *shape*, not
just result values — a correctness suite catches wrong answers, this
catches plans that would melt down at 100 TB while passing every
value check at sf0.01.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pushed_filters(plan: str) -> list[str]:
    """All parquet-pushed predicates across the plan's scans."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schemas(plan: str) -> list[list[str]]:
    """Column lists actually read by each scan (column pruning)."""
    out = []
    for m in re.finditer(r"ReadSchema: struct<(.*?)>", plan):
        body = m.group(1).strip()
        out.append([c.split(":")[0].strip() for c in body.split(",")] if body else [])
    return out


def shuffle_exchanges(plan: str) -> int:
    """Count of shuffle Exchange nodes — broadcast exchanges excluded
    (those move only the small side).  Matches the formatted-explain
    node list (``(5) Exchange``), not the tree header."""
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def has_wholestage_codegen(plan: str) -> bool:
    """Formatted explain marks fused operators with ``[codegen id : N]``."""
    return "codegen id" in plan


def has(plan: str, node: str) -> bool:
    return node in plan


def count(plan: str, node: str) -> int:
    return plan.count(node)
