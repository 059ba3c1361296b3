#!/usr/bin/env python
"""Round-close checklist in one command: fold the newest driver
CORRECTNESS artifact into the catalog rotation, stage every driver
artifact, and commit — so a round never again ends with an
uncommitted working tree (the round-8 AND round-9 verdicts both
flagged exactly this leak).

Usage (last thing before the round ends, or first thing after the
driver writes its artifacts)::

    python tools/round_close.py            # fold + stage + commit
    python tools/round_close.py --dry-run  # show what would happen

The commit is skipped when nothing is staged (idempotent).  The
commit message lists which artifacts landed.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

ARTIFACTS = [
    "BENCH_HISTORY.jsonl",
    "BENCH_FULL.json",
    "tweets_spark_top_10_spark/queries/catalog.py",  # autofold target
]
GLOBS = ["BENCH_r*.json", "CORRECTNESS_r*.json"]


def _run(cmd: list[str], dry: bool, ok_codes: tuple[int, ...] = (0,)) -> str:
    if dry:
        print(f"DRY: {' '.join(cmd)}")
        return ""
    out = subprocess.run(
        cmd, cwd=REPO, capture_output=True, text=True, check=False
    )
    if out.returncode not in ok_codes:
        print(out.stderr, file=sys.stderr)
        raise SystemExit(out.returncode)
    return out.stdout


def main(argv: list[str]) -> int:
    dry = "--dry-run" in argv
    # The artifact commit is a plain `git commit`, so ANYTHING already
    # staged would be swept into it.  Refuse to run over a non-empty
    # index — commit or unstage the in-progress work first.
    pre_staged = subprocess.run(
        ["git", "diff", "--cached", "--name-only"],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=False,
    ).stdout.strip()
    if pre_staged:
        print(
            "index already has staged files; commit or unstage them "
            "before round_close so they are not swept into the "
            "artifact commit:\n  " + "\n  ".join(pre_staged.splitlines()),
            file=sys.stderr,
        )
        return 1
    # Remember whether catalog.py was already dirty BEFORE the fold so
    # unrelated in-progress edits are never swept into the artifact
    # commit (round-10 advice).
    catalog = "tweets_spark_top_10_spark/queries/catalog.py"
    # Diff against HEAD (not the index) so STAGED pre-existing edits
    # also count as dirty — `git diff --name-only` alone misses them,
    # and the artifact commit would sweep staged feature edits in.
    pre_dirty = bool(
        subprocess.run(
            ["git", "diff", "HEAD", "--name-only", "--", catalog],
            cwd=REPO,
            capture_output=True,
            text=True,
            check=False,
        ).stdout.strip()
    )
    # 1. fold the newest driver artifact into the rotation tables —
    # abort on failure so we never commit an unfolded catalog
    # (round-10 advice: a silently-failed fold still staged+committed).
    fold = subprocess.run(
        [sys.executable, "tools/update_check_history.py"]
        + (["--check"] if dry else []),
        cwd=REPO,
        capture_output=True,
        text=True,
        check=False,
    )
    print(fold.stdout.strip())
    if fold.returncode != 0 and not dry:
        # dry mode uses --check, whose nonzero just means "would fold" —
        # only a REAL fold failure must abort before stage/commit
        print(fold.stderr, file=sys.stderr)
        print("fold step failed; aborting before stage/commit", file=sys.stderr)
        return fold.returncode
    post_dirty = bool(
        subprocess.run(
            ["git", "diff", "HEAD", "--name-only", "--", catalog],
            cwd=REPO,
            capture_output=True,
            text=True,
            check=False,
        ).stdout.strip()
    )
    # 2. stage driver artifacts (explicit names; never add -A).  Stage
    # catalog.py only when the FOLD dirtied it: if it carried edits
    # before the fold ran, leave it to the feature commit that owns them.
    artifacts = [p for p in ARTIFACTS if p != catalog]
    if post_dirty and not pre_dirty:
        artifacts.append(catalog)
    elif pre_dirty:
        print(
            f"note: {catalog} had pre-existing edits; not staging it here"
        )
    paths = [p for p in artifacts if (REPO / p).exists()]
    for g in GLOBS:
        paths.extend(
            str(p.relative_to(REPO)) for p in sorted(REPO.glob(g))
        )
    _run(["git", "add", "--"] + paths, dry)
    # 3. commit iff something is staged (diff --cached exits 1 on diffs)
    staged = _run(
        ["git", "diff", "--cached", "--name-only"], dry, ok_codes=(0, 1)
    ).strip()
    # Soft reminder (never blocks or gates the artifact commit): the
    # standing 100x sentinel should have a recorded line for the round
    # being worked (round-11 verdict item 5) — print it even when
    # nothing is staged, so a no-op close still surfaces the gap.
    check = subprocess.run(
        [sys.executable, "tools/scale_sentinel.py", "--check"],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=False,
    )
    if check.stdout.strip():
        print(check.stdout.strip())
    if not staged:
        print("nothing staged; working tree already captures the round")
        return 0
    names = ", ".join(sorted(staged.splitlines()))
    _run(
        [
            "git",
            "commit",
            "-m",
            f"Record round-close driver artifacts\n\nStaged: {names}",
        ],
        dry,
    )
    print(f"committed: {names}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
