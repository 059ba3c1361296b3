"""Table maintenance: TTL partition retirement + file-stats manifest.

Two jobs every file-lake table needs at 100 TB and the reference's
cron-driven hour layout (``App.java:43-63``) implicitly assumes
someone else does:

- **Retention**: hour partitions past the TTL watermark are retired
  by DIRECTORY, never by row — dropping a partition is a metadata
  operation (one rename + remove per dir), not a rewrite of the
  table.  The rename-aside-then-delete order means a concurrent
  reader that already listed the dir keeps reading its open files,
  and a crash mid-retire leaves an ``__retired`` dir to sweep, never
  a half-deleted live partition.
- **Stats manifest**: per-(file, column) row counts, null counts and
  min/max harvested from parquet FOOTERS only — the file list fans
  out over executors and each task reads a few KB of metadata, so
  the manifest costs O(files), not O(bytes).  The manifest is what
  pruning decisions (``write_clustered`` / ``write_zorder_clustered``
  / ``file_index``) can be audited against, and what an external
  optimizer would ingest as table statistics.
"""

from __future__ import annotations

import datetime
import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession

# both the reference's zero-padded convention (hour=07) and Spark's own
# partitioned-write form (hour=7) occur in the wild
_HOUR_RE = re.compile(
    r"year=(\d{4})/month=(\d{1,2})/day=(\d{1,2})/hour=(\d{1,2})$"
)


def list_hour_partitions(base_path: str) -> list[tuple[datetime.datetime, str]]:
    """All ``year=/month=/day=/hour=`` leaf dirs under ``base_path``,
    as (partition hour, absolute path), sorted ascending."""
    out = []
    for root, dirs, _files in os.walk(base_path):
        m = _HOUR_RE.search(root.replace(os.sep, "/"))
        if m:
            y, mo, d, h = map(int, m.groups())
            out.append((datetime.datetime(y, mo, d, h), root))
            dirs.clear()  # hour dirs are leaves
    return sorted(out)


def retire_hour_partitions(
    base_path: str, older_than: datetime.datetime
) -> list[str]:
    """Delete hour partitions strictly older than ``older_than``.

    Returns the retired partition paths.  Each dir is renamed aside
    (``<dir>__retired``) and then removed, so no live path ever
    contains a partially deleted partition; leftover ``__retired``
    dirs from a crashed run are swept first.
    """
    # sweep asides from a previous crashed run first (their live dir is
    # already gone, so the partition listing below won't see them)
    for root, dirs, _files in os.walk(base_path):
        for d in list(dirs):
            if d.endswith("__retired"):
                shutil.rmtree(os.path.join(root, d))
                dirs.remove(d)
    retired = []
    for hour, path in list_hour_partitions(base_path):
        if hour < older_than:
            aside = path + "__retired"
            os.rename(path, aside)
            shutil.rmtree(aside)
            retired.append(path)
    # prune now-empty parent dirs (day/month/year) so listings stay
    # clean; root itself is kept
    for root, _dirs, _files in os.walk(base_path, topdown=False):
        # re-listdir: the walk's snapshot still names children rmdir'd
        # earlier in this same bottom-up pass
        if root != base_path and not os.listdir(root):
            os.rmdir(root)
    return retired


def collect_file_stats(
    spark: SparkSession,
    data_path: str,
    columns: list[str] | None = None,
) -> DataFrame:
    """Distributed footer harvest → one row per (file, column):
    ``(file, column, n_rows, n_nulls, min_str, max_str)``.

    min/max are rendered to strings (type-generic manifest; consumers
    cast back by the table schema).  Only footers are read — each
    executor task opens the metadata tail of its files, never the
    column data.
    """
    import glob as _glob

    from pyspark.sql import functions as F

    files = sorted(
        _glob.glob(os.path.join(data_path, "**", "*.parquet"), recursive=True)
    )
    if not files:
        raise ValueError(f"no parquet files under {data_path}")

    def harvest(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for f in pdf["file"]:
                meta = pq.read_metadata(f)
                names = meta.schema.names
                wanted = [c for c in (columns or names) if c in names]
                agg = {
                    c: {"n_nulls": 0, "mn": None, "mx": None} for c in wanted
                }
                for rg in range(meta.num_row_groups):
                    g = meta.row_group(rg)
                    for ci in range(g.num_columns):
                        col = g.column(ci)
                        name = col.path_in_schema
                        if name not in agg:
                            continue
                        st = col.statistics
                        if st is None:
                            continue
                        a = agg[name]
                        a["n_nulls"] += st.null_count or 0
                        if st.has_min_max:
                            if a["mn"] is None or st.min < a["mn"]:
                                a["mn"] = st.min
                            if a["mx"] is None or st.max > a["mx"]:
                                a["mx"] = st.max
                for c, a in agg.items():
                    rows.append(
                        (
                            f,
                            c,
                            meta.num_rows,
                            a["n_nulls"],
                            None if a["mn"] is None else str(a["mn"]),
                            None if a["mx"] is None else str(a["mx"]),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["file", "column", "n_rows", "n_nulls", "min_str", "max_str"],
            )

    flist = spark.createDataFrame(
        [(f,) for f in files], "file string"
    ).repartition(min(len(files), 64))
    return flist.mapInPandas(
        harvest,
        schema=(
            "file string, column string, n_rows long, n_nulls long,"
            " min_str string, max_str string"
        ),
    )


def prune_files_by_range(
    stats: DataFrame, column: str, lo, hi, cast: str = "double"
) -> list[str]:
    """Files whose footer [min, max] box for ``column`` intersects
    [lo, hi] — the manifest-side replay of the pruning parquet scans
    do per row group, usable to hand a bounded file list to a reader
    (or to AUDIT that a clustered layout actually prunes: the z-order
    test math, as a library call).

    ``stats`` is ``collect_file_stats`` output; min/max strings are
    cast back via ``cast``.  Files with no stats for the column are
    KEPT (unknown never prunes — same no-false-negative contract as
    the Bloom sidecar).
    """
    from pyspark.sql import functions as F

    col_stats = stats.where(F.col("column") == column)
    mn = F.col("min_str").cast(cast)
    mx = F.col("max_str").cast(cast)
    hit = col_stats.where(
        mn.isNull() | mx.isNull() | ((mx >= F.lit(lo)) & (mn <= F.lit(hi)))
    )
    return [r["file"] for r in hit.select("file").distinct().collect()]
