"""Regenerate ``_LAST_CHECKED`` in queries/catalog.py from driver artifacts.

The correctness driver writes ``CORRECTNESS_r{NN}.json`` at the repo
root each round, one key per checked query.  The stale-first rotation
in ``tweets_spark_top_10_spark/queries/catalog.py`` keys every query by
the LAST round a driver row exists for it; this tool recomputes that
mapping from the artifacts and rewrites the dict literal in place, so
the rotation never drifts from reality.

Usage (from the repo root, after a new CORRECTNESS file lands)::

    python tools/update_check_history.py          # rewrite catalog.py
    python tools/update_check_history.py --check  # exit 1 if stale
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
CATALOG = REPO / "tweets_spark_top_10_spark" / "queries" / "catalog.py"


def collect_last_checked() -> dict[str, int]:
    last: dict[str, int] = {}
    for path in sorted(REPO.glob("CORRECTNESS_r*.json")):
        m = re.match(r"CORRECTNESS_r(\d+)\.json", path.name)
        if not m:
            continue
        rnd = int(m.group(1))
        for name in json.loads(path.read_text()):
            last[name] = max(last.get(name, 0), rnd)
    return last


def render(last: dict[str, int]) -> str:
    by_round: dict[int, list[str]] = {}
    for name, rnd in last.items():
        by_round.setdefault(rnd, []).append(name)
    lines = ["_LAST_CHECKED: dict[str, int] = {"]
    for rnd in sorted(by_round):
        lines.append(f"    # --- last driver row: round {rnd} ---")
        for name in by_round[rnd]:
            lines.append(f'    "{name}": {rnd},')
    lines.append("}")
    return "\n".join(lines)


def main(argv: list[str]) -> int:
    src = CATALOG.read_text()
    block = re.compile(
        r"_LAST_CHECKED: dict\[str, int\] = \{.*?\n\}", re.DOTALL
    )
    if not block.search(src):
        print(f"no _LAST_CHECKED block found in {CATALOG}", file=sys.stderr)
        return 2
    new_src = block.sub(render(collect_last_checked()).replace("\\", r"\\"), src)
    if "--check" in argv:
        if new_src != src:
            print("_LAST_CHECKED is stale; run tools/update_check_history.py")
            return 1
        print("_LAST_CHECKED is up to date")
        return 0
    if new_src != src:
        CATALOG.write_text(new_src)
        print(f"rewrote _LAST_CHECKED in {CATALOG}")
    else:
        print("_LAST_CHECKED already up to date")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
