"""Generate QUERIES.md — the registry index: every query, its oracle
status, and its one-line doc.  Usage: python tools/list_queries.py"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_s3_read_write_spark.queries import registry


def main() -> int:
    reg = registry()

    def sort_key(name: str):
        m = re.match(r"q(\d+)", name)
        return (int(m.group(1)) if m else 999, name)

    lines = [
        "# QUERIES — registry index",
        "",
        f"{len(reg)} queries; 'oracle' = exact DuckDB hash-compare at sf0.01 "
        "(`tools/check.py`), 'rows-only' = driver row-count check + targeted "
        "tests (see the doc column for where).",
        "",
        "| query | check | what it covers |",
        "|---|---|---|",
    ]
    n_oracle = 0
    for name in sorted(reg, key=sort_key):
        q = reg[name]
        kind = "oracle" if q.oracle else "rows-only"
        n_oracle += bool(q.oracle)
        doc = " ".join(q.doc.split())
        lines.append(f"| {name} | {kind} | {doc} |")
    lines += ["", f"Oracle-checked: {n_oracle}/{len(reg)}.", ""]
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "QUERIES.md")
    with open(path, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {path}: {len(reg)} queries, {n_oracle} with oracle")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
