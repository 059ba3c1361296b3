#!/usr/bin/env python
"""Regenerate docs/CATALOG.md from the query registry.

Usage: python tools/gen_catalog_doc.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tweets_spark_top_10_spark.queries import ORACLE, QUERIES  # noqa: E402


def first_line(fn) -> str:
    doc = (fn.__doc__ or "").strip()
    if not doc:
        return ""
    para = doc.split("\n\n")[0]
    text = " ".join(line.strip() for line in para.splitlines())
    return text if len(text) <= 140 else text[:137] + "..."


def main() -> None:
    rows = []
    for name in sorted(QUERIES):
        fn = QUERIES[name]
        gate = "oracle" if name in ORACLE else "rows-only"
        rows.append(
            f"| `{name}` | {fn.__module__.rsplit('.', 1)[-1]} | {gate} | "
            f"{first_line(fn)} |"
        )
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "docs", "CATALOG.md")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        f.write(
            "# Query catalog\n\n"
            "Auto-generated (`python tools/gen_catalog_doc.py`). "
            f"{len(QUERIES)} queries, {len(ORACLE)} with full DuckDB value "
            "oracles; the rest run under the driver's rows-only gate.\n\n"
            "| Query | Module | Gate | What it demonstrates |\n|---|---|---|---|\n"
        )
        f.write("\n".join(rows) + "\n")
    print(f"wrote {out} ({len(rows)} queries)")


if __name__ == "__main__":
    main()
