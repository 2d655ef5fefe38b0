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
touched; a dir written to in the last REAP_GRACE_SECS is also skipped,
which closes the narrow race where a dead dir's pid is recycled to a
NEW process that has just started writing the same path (the /proc
check would see the recycled pid as live anyway, but the mtime guard
also protects the symmetric window where the check ran just before the
recycling). The reap runs ONCE per (process, base) — queries call this
several times per bench iteration and the glob + /proc sweep is pure
overhead after the first call. Legacy pre-pid-layout dirs (no _<pid>
suffix, e.g. {base}/sf0.01) are reaped in the same pass.

Within one process, repeated calls reuse the same directory — the same
idempotent-overwrite semantics the queries already had.

At 100 TB these artifacts live on a shared object store keyed by job id
with atomic rename/commit protocols; the per-pid key is the local-mode
equivalent of that job-scoped isolation.
"""

from __future__ import annotations

import glob
import os
import shutil
import time

# Skip reaping any dir whose mtime is this recent: it may belong to a
# process that inherited a recycled pid mid-sweep and is actively
# writing. One hour dwarfs any single query's staging window while
# still bounding /tmp growth to one host-session of garbage.
REAP_GRACE_SECS = 3600.0

_reaped_bases: set[str] = set()


def _reap_dead_siblings(base: str) -> None:
    now = time.time()
    for d in glob.glob(f"{base}/*"):
        if not os.path.isdir(d):
            continue
        try:
            if now - os.path.getmtime(d) < REAP_GRACE_SECS:
                continue
        except OSError:
            continue  # vanished under a concurrent reaper
        pid = d.rsplit("_", 1)[-1]
        if pid.isdigit():
            if not os.path.exists(f"/proc/{pid}"):
                shutil.rmtree(d, ignore_errors=True)
        else:
            # legacy pre-pid layout ({base}/sf0.01): no owner to check,
            # stale by construction once past the grace period
            shutil.rmtree(d, ignore_errors=True)


def pid_staging_root(base: str, tag: str) -> str:
    """Return {base}/{tag}_{pid}, reaping stale sibling dirs once per
    (process, base)."""
    if base not in _reaped_bases:
        _reaped_bases.add(base)
        _reap_dead_siblings(base)
    return f"{base}/{tag}_{os.getpid()}"


def sf_tag(sf_dir: str) -> str:
    """The sf_dir basename used as the staging key."""
    return os.path.basename(sf_dir.rstrip("/"))
