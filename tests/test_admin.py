"""Admin task lifecycle tests — mirrors the reference's
TaskManagerTest (`/root/reference/src/storage/admin/AdminTaskManager.h:23-24`
names `happy_path` and `gen_sub_task_failed`) plus a hard-cancel check
that proves in-flight Spark jobs actually die.
"""

from __future__ import annotations

import time

import pytest

from nebula_storage_spark.admin import (
    FAILED, SUCCEEDED, USER_CANCEL, AdminTask, AdminTaskManager,
    make_compact_task, make_rebuild_index_task, make_stats_task)


@pytest.fixture()
def mgr(spark):
    m = AdminTaskManager(spark, pool_size=4)
    yield m
    m.shutdown()


def test_happy_path(mgr, spark):
    task = AdminTask(
        job_id=1, task_id=0,
        gen_sub_tasks=lambda: [
            lambda: spark.range(100).count(),
            lambda: spark.range(50).count(),
        ])
    mgr.add_async_task(task)
    assert mgr.wait(1, 0) == SUCCEEDED
    assert mgr.is_finished(1, 0)
    assert sorted(r for _, r in task.results) == [50, 100]


def test_gen_sub_task_failed(mgr):
    def boom():
        raise RuntimeError("cannot enumerate parts")
    task = AdminTask(job_id=2, task_id=0, gen_sub_tasks=boom)
    mgr.add_async_task(task)
    assert mgr.wait(2, 0) == FAILED
    assert "cannot enumerate parts" in task.error


def test_first_error_wins(mgr, spark):
    def gen():
        def ok():
            return spark.range(10).count()

        def bad():
            raise ValueError("sub failure")
        return [ok, bad, ok]
    task = AdminTask(job_id=3, task_id=0, gen_sub_tasks=gen, concurrency=1)
    mgr.add_async_task(task)
    assert mgr.wait(3, 0) == FAILED
    assert "sub failure" in task.error
    # successful sub-tasks before the failure still recorded results
    assert any(r == 10 for _, r in task.results)


def test_cancel_kills_running_spark_job(mgr, spark):
    # a deliberately heavy action: wide range join that would run for
    # many seconds on its own — cancel must cut it short
    def gen():
        def heavy():
            # ~1e11 generated pairs — minutes of work if not cancelled
            a = spark.range(0, 1_000_000)
            b = spark.range(0, 100_000).withColumnRenamed("id", "j")
            return a.crossJoin(b).selectExpr("sum(id + j) s").collect()
        return [heavy]
    task = AdminTask(job_id=4, task_id=0, gen_sub_tasks=gen)
    mgr.add_async_task(task)
    # let the Spark job actually start
    time.sleep(1.5)
    t0 = time.perf_counter()
    assert mgr.cancel_job(4) == 1
    status = mgr.wait(4, 0, timeout=30)
    assert status == USER_CANCEL
    assert time.perf_counter() - t0 < 20


def test_stats_task_factory(mgr, spark, sf_dir):
    task = make_stats_task(spark, sf_dir, job_id=5)
    mgr.add_async_task(task)
    assert mgr.wait(5, 0) == SUCCEEDED
    rows = task.results[0][1]
    assert {(r["kind"], r["name"]) for r in rows} >= {
        ("tag", "customer"), ("edge", "placed")}


def test_rebuild_index_task_factory(mgr, spark, sf_dir, tmp_path):
    task = make_rebuild_index_task(spark, sf_dir, str(tmp_path / "idx"),
                                   job_id=6)
    mgr.add_async_task(task)
    assert mgr.wait(6, 0) == SUCCEEDED
    counts = {i: r for i, r in task.results}
    assert counts[0] > 0 and counts[1] > 0


def test_compact_task_factory(mgr, spark, tmp_path):
    src = str(tmp_path / "frag")
    spark.range(10_000).repartition(64).write.parquet(src)
    import glob
    assert len(glob.glob(f"{src}/*.parquet")) > 30
    task = make_compact_task(spark, src, job_id=7, target_files=4)
    mgr.add_async_task(task)
    assert mgr.wait(7, 0) == SUCCEEDED
    assert len(glob.glob(f"{src}/*.parquet")) <= 4
    assert spark.read.parquet(src).count() == 10_000
