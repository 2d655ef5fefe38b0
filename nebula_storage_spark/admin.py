"""Admin task lifecycle: async long-job control for maintenance work.

Re-expresses the reference's admin-task machinery
(`/root/reference/src/storage/admin/AdminTaskManager.h:22-51`,
`AdminTask.h:64-131`, `StopAdminTaskProcessor.cpp:14-25`) for a Spark
deployment: a manager accepts named tasks (index rebuild, stats,
compaction, checkpoint), fans each into sub-tasks run on a bounded
thread pool, tracks per-task status, and supports cooperative *and*
hard cancellation.

Spark-first mapping of the semantics:

- A "sub-task" is a Spark action (the reference's per-part scan). Each
  sub-task thread tags itself with a job group
  (``sc.setJobGroup(handle, ..., interruptOnCancel=True)``) before
  running, so ``cancel_job`` does not merely flip a flag — it calls
  ``sc.cancelJobGroup`` and the in-flight Spark jobs themselves are
  killed. PySpark pins Python threads to JVM threads (Spark 3.2+
  default), which is what makes the job group per-sub-task-thread.
- Status transitions mirror ``AdminTask::subTaskFinish`` /
  ``cancel`` (`AdminTask.h:120-129`): the task result starts
  SUCCEEDED and the FIRST non-success outcome wins
  (compare-exchange); user cancel only overrides a still-successful
  task.
- ``cancel_job`` cancels every task of a job, matching
  ``StopAdminTaskProcessor::process`` which stops by job id.

At 100 TB these maintenance jobs (rebuild an index table, compact a
skewed store directory) run for hours — kill-ability and first-error
status are the operational contract, not a nicety.
"""

from __future__ import annotations

import os
import threading
import uuid
from concurrent.futures import ThreadPoolExecutor, wait
from dataclasses import dataclass, field
from typing import Callable, Optional

# Status codes mirror nebula::cpp2::ErrorCode values used by AdminTask
# (SUCCEEDED / E_USER_CANCEL / generic failure) plus queue states.
QUEUED = "QUEUED"
RUNNING = "RUNNING"
SUCCEEDED = "SUCCEEDED"
FAILED = "FAILED"
USER_CANCEL = "USER_CANCEL"


@dataclass
class AdminTask:
    """One admin task = an ordered list of sub-task callables.

    ``gen_sub_tasks`` mirrors ``AdminTask::genSubTasks``
    (`AdminTask.h:74-75`): it is called on the worker side (not at
    submit time) so a task that cannot even enumerate its work reports
    FAILED through the same path as a sub-task error.
    """

    job_id: int
    task_id: int
    gen_sub_tasks: Callable[[], list[Callable[[], object]]]
    concurrency: int = 4  # AdminTask::setConcurrentReq (AdminTask.h:107-111)

    # runtime state
    status: str = QUEUED
    error: Optional[str] = None
    results: list = field(default_factory=list)
    _rc_lock: threading.Lock = field(default_factory=threading.Lock,
                                     repr=False)
    _cancelled: threading.Event = field(default_factory=threading.Event,
                                        repr=False)
    _done: threading.Event = field(default_factory=threading.Event,
                                   repr=False)
    _n_subs: int = 0

    def _sub_task_finish(self, rc: str, err: Optional[str] = None) -> None:
        # first non-success wins (AdminTask.h:120-123 compare_exchange)
        with self._rc_lock:
            if self.status in (QUEUED, RUNNING, SUCCEEDED):
                if rc != SUCCEEDED:
                    self.status = rc
                    self.error = err

    @property
    def handle(self) -> tuple[int, int]:
        return (self.job_id, self.task_id)


class AdminTaskManager:
    """Bounded-pool async runner with per-task status and cancellation
    (`AdminTaskManager.h:22-51`). One manager per SparkSession; create
    in tests/apps rather than as a process singleton so sessions stay
    isolated.
    """

    def __init__(self, spark, pool_size: int = 8):
        self._spark = spark
        self._pool = ThreadPoolExecutor(max_workers=pool_size,
                                        thread_name_prefix="admin-task")
        self._tasks: dict[tuple[int, int], AdminTask] = {}
        self._futures: dict[tuple[int, int], object] = {}
        self._lock = threading.Lock()
        self._shut = False

    # -- submission ----------------------------------------------------
    def add_async_task(self, task: AdminTask) -> tuple[int, int]:
        """AdminTaskManager::addAsyncTask — enqueue and return handle."""
        with self._lock:
            if self._shut:
                raise RuntimeError("manager is shut down")
            if task.handle in self._tasks:
                raise ValueError(f"duplicate task handle {task.handle}")
            self._tasks[task.handle] = task
            self._futures[task.handle] = self._pool.submit(self._run, task)
        return task.handle

    def _job_group(self, task: AdminTask, idx: int) -> str:
        return f"admin-{task.job_id}-{task.task_id}-{idx}"

    def _run(self, task: AdminTask) -> None:
        if task._cancelled.is_set():
            task._sub_task_finish(USER_CANCEL)
            task._done.set()
            return
        with task._rc_lock:
            if task.status == QUEUED:
                task.status = RUNNING
        try:
            subs = task.gen_sub_tasks()
            task._n_subs = len(subs)
        except Exception as e:  # genSubTasks failed → task FAILED
            task._sub_task_finish(FAILED, f"gen_sub_tasks: {e}")
            task._done.set()
            return

        sc = self._spark.sparkContext

        def run_sub(idx_fn):
            idx, fn = idx_fn
            if task._cancelled.is_set():
                task._sub_task_finish(USER_CANCEL)
                return
            group = self._job_group(task, idx)
            sc.setJobGroup(group, f"admin task {task.handle}",
                           interruptOnCancel=True)
            try:
                out = fn()
                task.results.append((idx, out))
                task._sub_task_finish(SUCCEEDED)
            except Exception as e:
                if task._cancelled.is_set():
                    task._sub_task_finish(USER_CANCEL)
                else:
                    task._sub_task_finish(FAILED, f"sub_task[{idx}]: {e}")
            finally:
                sc.setJobGroup(None, None)

        # bounded per-task concurrency (AdminTask::getConcurrentReq)
        width = max(1, min(task.concurrency, len(subs) or 1))
        with ThreadPoolExecutor(max_workers=width,
                                thread_name_prefix="admin-sub") as sub_pool:
            futs = [sub_pool.submit(run_sub, (i, fn))
                    for i, fn in enumerate(subs)]
            wait(futs)
        with task._rc_lock:
            if task.status == RUNNING:
                task.status = SUCCEEDED
        task._done.set()

    # -- control -------------------------------------------------------
    def cancel_task(self, job_id: int, task_id: int) -> bool:
        """AdminTaskManager::cancelTask — flag + kill in-flight Spark
        jobs for that task's job groups.

        ``cancelJobGroup`` only affects jobs that are ALREADY running —
        a sub-task whose job is still in planning when the cancel
        arrives would slip through a one-shot kill. A short-lived
        reaper thread therefore re-issues the group cancel until the
        task's worker acknowledges (sets ``_done``), which is the
        operational contract: cancellation must eventually take
        effect, not merely be requested."""
        task = self._tasks.get((job_id, task_id))
        if task is None:
            return False
        task._cancelled.set()
        task._sub_task_finish(USER_CANCEL)
        sc = self._spark.sparkContext

        def reap():
            deadline = 30.0
            step = 0.25
            waited = 0.0
            while not task._done.is_set() and waited < deadline:
                for idx in range(task._n_subs or 64):
                    sc.cancelJobGroup(self._job_group(task, idx))
                task._done.wait(step)
                waited += step

        threading.Thread(target=reap, name="admin-reaper",
                         daemon=True).start()
        return True

    def cancel_job(self, job_id: int) -> int:
        """StopAdminTaskProcessor semantics: stop ALL tasks of a job
        (`StopAdminTaskProcessor.cpp:14-25`). Returns #tasks signalled."""
        n = 0
        for (j, t) in list(self._tasks):
            if j == job_id:
                n += int(self.cancel_task(j, t))
        return n

    # -- introspection -------------------------------------------------
    def is_finished(self, job_id: int, task_id: int) -> bool:
        task = self._tasks.get((job_id, task_id))
        return bool(task and task._done.is_set())

    def wait(self, job_id: int, task_id: int, timeout: float = 120.0) -> str:
        task = self._tasks[(job_id, task_id)]
        if not task._done.wait(timeout):
            raise TimeoutError(f"task {(job_id, task_id)} still running")
        return task.status

    def status(self, job_id: int, task_id: int) -> str:
        return self._tasks[(job_id, task_id)].status

    def shutdown(self) -> None:
        with self._lock:
            self._shut = True
        for (j, t) in list(self._tasks):
            if not self.is_finished(j, t):
                self.cancel_task(j, t)
        self._pool.shutdown(wait=True)


# -- built-in maintenance tasks (factories over existing operators) ----

def make_stats_task(spark, sf_dir: str, job_id: int,
                    task_id: int = 0) -> AdminTask:
    """StatisTask analog (`admin/StatisTask.cpp`): one sub-task per
    logical part — here per table family — each an independent Spark
    action whose results land in ``task.results``."""
    from nebula_storage_spark.graph import tpch_graph
    from nebula_storage_spark.operators.agg import stats_task

    def gen():
        g = tpch_graph(spark, sf_dir)
        return [lambda: stats_task(g).collect()]

    return AdminTask(job_id=job_id, task_id=task_id, gen_sub_tasks=gen)


def make_compact_task(spark, table_dir: str, job_id: int, task_id: int = 0,
                      target_files: int = 8,
                      key: str | None = None) -> AdminTask:
    """CompactTask analog (`admin/CompactTask.cpp:23-43`): RocksDB
    compaction's Spark equivalent is small-file compaction — rewrite a
    parquet directory at a controlled file count so scans stop paying
    per-file open cost. At 100 TB this is the difference between a scan
    reading 1e6 tiny files and 1e4 right-sized ones. With `key` set the
    rewrite range-partitions on it (store_io.compact_small_files), so
    the compaction also yields disjoint per-file min/max stats — the
    data-skipping layout; without a key it is a pure coalesce (no
    shuffle)."""
    def gen():
        def compact():
            df = spark.read.parquet(table_dir)
            tmp = table_dir.rstrip("/") + f".compact-{uuid.uuid4().hex[:8]}"
            w = (df.repartitionByRange(target_files, key)
                 if key else df.coalesce(target_files))
            w.write.mode("overwrite").parquet(tmp)
            n_new = spark.read.parquet(tmp).count()
            import shutil
            shutil.rmtree(table_dir)
            os.rename(tmp, table_dir)
            return n_new
        return [compact]

    return AdminTask(job_id=job_id, task_id=task_id, gen_sub_tasks=gen)


def make_rebuild_index_task(spark, sf_dir: str, out_dir: str, job_id: int,
                            task_id: int = 0) -> AdminTask:
    """RebuildTagIndexTask / RebuildEdgeIndexTask analog
    (`admin/RebuildTagIndexTask.cpp`, `RebuildEdgeIndexTask.cpp`): two
    sub-tasks (tag index, edge index) that run concurrently under one
    task handle, like the reference's one-sub-task-per-part fan-out."""
    from nebula_storage_spark.graph import DST, SRC, VID, tpch_graph
    from nebula_storage_spark.operators.index_rebuild import rebuild_index

    def gen():
        g = tpch_graph(spark, sf_dir)

        def tag():
            return rebuild_index(g.tag_df("customer"), ["c_mktsegment"],
                                 f"{out_dir}/tag_index",
                                 include_cols=[VID]).count()

        def edge():
            return rebuild_index(g.edge_df("placed"), ["o_orderpriority"],
                                 f"{out_dir}/edge_index",
                                 include_cols=[SRC, DST]).count()

        return [tag, edge]

    return AdminTask(job_id=job_id, task_id=task_id, gen_sub_tasks=gen,
                     concurrency=2)
