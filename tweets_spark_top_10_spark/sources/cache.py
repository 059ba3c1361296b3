"""Per-user on-disk cache locations for derived artifacts.

Derived artifacts (bucketed table copies, prebuilt ANN indexes) are
expensive to rebuild and cheap to store, so they live under a per-USER
cache root: ``$XDG_CACHE_HOME`` or ``~/.cache`` — NOT the shared system
temp dir, where another user could pre-create the predictable path and
every reader would silently serve attacker-controlled files (the
round-7 advisor finding that hardened the prebuilt-index cache in
``queries/similarity_queries.py``; this module is the shared, reusable
form of that contract for new artifact families).

Staleness is handled by FINGERPRINT, not mtime comparisons: the cache
key embeds a digest of the source files' (name, size, mtime_ns), so a
regenerated corpus at the same path gets a fresh artifact directory
instead of silently serving stale data.
"""

from __future__ import annotations

import hashlib
import os
from pathlib import Path


def user_cache_dir(namespace: str) -> Path:
    """Create-or-verify ``~/.cache/<namespace>`` (mode 0700, owned by us).

    Refuses a directory owned by another uid, and re-tightens group/
    world bits on a pre-existing dir (``mkdir(mode=...)`` only applies
    on CREATE — an old permissive-umask dir would re-open the
    pre-create attack the uid check alone misses).
    """
    base = Path(os.environ.get("XDG_CACHE_HOME", Path.home() / ".cache")) / namespace
    base.mkdir(mode=0o700, parents=True, exist_ok=True)
    st = os.stat(base)
    if st.st_uid != os.getuid():
        raise RuntimeError(
            f"cache dir {base} is owned by uid {st.st_uid}, not the "
            f"current user ({os.getuid()}) — refusing to serve derived "
            "artifacts from a directory another user controls"
        )
    if st.st_mode & 0o077:
        os.chmod(base, 0o700)
    return base


def fingerprint_paths(*paths: str | Path) -> str:
    """12-hex digest of the given files/dirs' (name, size, mtime_ns).

    A parquet "file" written by Spark is a directory of part files;
    both shapes hash the same way. A missing path hashes as a distinct
    constant so the caller still gets a deterministic (if useless) key
    instead of an exception during planning.
    """
    h = hashlib.md5()
    for p in paths:
        p = Path(p)
        try:
            targets = sorted(p.iterdir()) if p.is_dir() else [p]
            for t in targets:
                st = os.stat(t)
                h.update(f"{t.name}:{st.st_size}:{st.st_mtime_ns};".encode())
        except OSError:
            h.update(f"missing:{p.name};".encode())
    return h.hexdigest()[:12]
