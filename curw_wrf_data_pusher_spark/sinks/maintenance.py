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
