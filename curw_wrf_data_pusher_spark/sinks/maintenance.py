"""Lake maintenance (SURVEY §2.9 K7/K9).

Reference: nightly ``tar -czf`` of rfield dirs to the bucket
(gen_rfields.py:216-218) and a 90-day retention sweep of raw .nc files
(flush_older_netcdfs.sh:1).  Both are driver-side filesystem jobs, not
Spark operators — kept that way.
"""

from __future__ import annotations

import os
import tarfile
import time


def archive_dir(src_dir: str, dest_tar_gz: str) -> str:
    """K7: package a directory as .tar.gz (tar -C parent -czf dest src)."""
    os.makedirs(os.path.dirname(dest_tar_gz) or ".", exist_ok=True)
    with tarfile.open(dest_tar_gz, "w:gz") as tar:
        tar.add(src_dir, arcname=os.path.basename(src_dir.rstrip("/")))
    return dest_tar_gz


def retention_delete(
    root: str,
    max_age_days: float,
    suffix: str = ".nc",
    dry_run: bool = False,
) -> list[str]:
    """K9: delete files older than ``max_age_days`` (mtime), returning
    the affected paths — `find -mtime +N -exec rm` semantics."""
    cutoff = time.time() - max_age_days * 86400
    removed = []
    for dirpath, _, names in os.walk(root):
        for name in names:
            if not name.endswith(suffix):
                continue
            p = os.path.join(dirpath, name)
            if os.path.getmtime(p) < cutoff:
                removed.append(p)
                if not dry_run:
                    os.remove(p)
    return removed


def compact_small_files(
    spark,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int = 2,
) -> dict:
    """Small-files compaction: rewrite a parquet directory so each file
    approaches ``target_file_bytes`` — the single most common lake
    maintenance job at scale (streaming sinks and per-batch commits
    leave thousands of KB-sized files; every downstream scan then pays
    a task + footer read per file).

    Bytes-preserving: rows are rewritten verbatim (no reorder promise —
    parquet row order is not part of the store contract; tests pin the
    full multiset of rows).  The rewrite goes to a staging directory
    and swaps in with two renames.  A crash between the two renames
    leaves ``path`` ABSENT with the data intact at
    ``path.__compact_old__`` — on the next call that leftover is
    auto-recovered (renamed back to ``path``) before compacting, so
    no manual intervention is needed and a mix of layouts can never
    exist.  Skips (returns a no-op report) when the directory already
    has fewer than ``min_files`` files.

    Target file count = ceil(total_bytes / target) on the DISK size —
    a deliberate underestimate of in-memory size (parquet is
    compressed), erring toward more files rather than giant tasks.
    For partitioned stores, run per partition directory (the caller
    knows the partition layout; compacting across partition dirs would
    destroy it)."""
    import glob
    import math
    import shutil

    old = path.rstrip("/") + ".__compact_old__"
    if os.path.exists(old) and not os.path.exists(path):
        # Crash between the two swap renames of a previous run: the
        # data is whole in the .__compact_old__ dir — restore it.
        os.rename(old, path)
    elif os.path.exists(old) and os.path.exists(path):
        # Crash after the second rename but before the cleanup rmtree:
        # the swap completed (``path`` is the compacted data), the old
        # dir is leftover garbage — finish the interrupted cleanup so
        # this run's own ``os.rename(path, old)`` can't collide.
        shutil.rmtree(old)
    files = [
        f for f in glob.glob(os.path.join(path, "*.parquet"))
        if os.path.isfile(f)
    ]
    if len(files) < min_files:
        return {"compacted": False, "n_files_before": len(files)}
    total = sum(os.path.getsize(f) for f in files)
    n_target = max(1, math.ceil(total / target_file_bytes))
    if n_target >= len(files):
        return {"compacted": False, "n_files_before": len(files)}
    df = spark.read.parquet(path)
    staging = path.rstrip("/") + ".__compact_staging__"
    if os.path.exists(staging):
        shutil.rmtree(staging)
    df.repartition(n_target).write.mode("overwrite").parquet(staging)
    os.rename(path, old)
    os.rename(staging, path)
    shutil.rmtree(old)
    n_after = len(glob.glob(os.path.join(path, "*.parquet")))
    return {
        "compacted": True,
        "n_files_before": len(files),
        "n_files_after": n_after,
        "bytes": total,
    }


def plan_compaction(
    root: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int = 2,
) -> list[dict]:
    """Compaction PLANNER: walk a (possibly partitioned) parquet store
    and report, per leaf directory, whether ``compact_small_files``
    would help — using pure filesystem metadata (file count + on-disk
    bytes), no data scan and no Spark job.  The health probe a nightly
    maintenance job runs before deciding what to rewrite; the
    row-count twin (footer-verified `_metadata` counts) is the
    registered p17_file_stats row.

    Returns one dict per leaf parquet directory:
    (path, n_files, total_bytes, target_files, needs_compaction) —
    sorted worst-first by wasted file count."""
    import glob
    import math

    reports = []
    for dirpath, _dirnames, filenames in os.walk(root):
        files = [
            f for f in filenames
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        ]
        if not files:
            continue
        sizes = [os.path.getsize(os.path.join(dirpath, f)) for f in files]
        total = sum(sizes)
        target = max(1, math.ceil(total / target_file_bytes))
        reports.append({
            "path": dirpath,
            "n_files": len(files),
            "total_bytes": total,
            "target_files": target,
            "needs_compaction": len(files) >= min_files
            and len(files) > target,
        })
    reports.sort(
        key=lambda r: r["n_files"] - r["target_files"], reverse=True
    )
    return reports
