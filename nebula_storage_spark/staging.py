"""Per-process staging roots for query-local disk artifacts.

Several gated queries stage artifacts under /tmp and read them back in
the same call (persisted indexes, snapshot/op-log catch-up, CSV/ORC/JSON
round-trips, store save/load). Keying those directories only by the
sf_dir basename lets CONCURRENT drives at the same sf_dir — the driver
gate, bench.py, and pytest routinely overlap on this host — interleave
one process's reads with another's overwrites: dynamic-partition
overwrite can corrupt bucket dirs mid-catch-up (the r5-advice
ft_index_incremental hazard), and even deterministic write-once dirs
delete files mid-read during mode("overwrite"), throwing
FileNotFoundException into the other process's scan.

`pid_staging_root` isolates every such artifact per process
({base}/{tag}_{pid}) and reaps siblings whose owning process is gone,
so /tmp stays bounded across runs. A live pid's directory is never
touched. Within one process, repeated calls reuse the same directory —
the same idempotent-overwrite semantics the queries already had.

At 100 TB these artifacts live on a shared object store keyed by job id
with atomic rename/commit protocols; the per-pid key is the local-mode
equivalent of that job-scoped isolation.
"""

from __future__ import annotations

import glob
import os
import shutil


def pid_staging_root(base: str, tag: str) -> str:
    """Return {base}/{tag}_{pid}, reaping dead-pid sibling dirs."""
    for d in glob.glob(f"{base}/*_*"):
        pid = d.rsplit("_", 1)[-1]
        if pid.isdigit() and not os.path.exists(f"/proc/{pid}"):
            shutil.rmtree(d, ignore_errors=True)
    return f"{base}/{tag}_{os.getpid()}"


def sf_tag(sf_dir: str) -> str:
    """The sf_dir basename used as the staging key."""
    return os.path.basename(sf_dir.rstrip("/"))
