"""Executor-JVM crash parity under local-cluster (round 9, VERDICT r8
stretch item 7).

The reference crash app kills the whole WORKER PROCESS mid-task
(``src/mrapps/crash.go:20-32``: ``os.Exit(1)``), not just the task.
``tests/test_mr_compat.test_retry_determinism`` covers the task-level
analogue (an injected exception) because plain local mode runs executors
as threads in the driver JVM — nothing to kill. This test runs the real
thing: ``local-cluster[2,1,1024]`` starts two separate executor JVMs, a
map task on its first attempt SIGKILLs its own executor JVM (the
grandparent of the Python worker: worker -> pyspark daemon -> executor
backend), the standalone worker replaces the executor, and the retried
job must produce byte-identical wc output vs the sequential oracle —
the reference's determinism-under-worker-death contract.

Runs in a SUBPROCESS: a second SparkContext cannot coexist with the
session fixture's, and an executor kill must never destabilize the
battery's shared session. ~40 s wall (cluster spin-up dominates).
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r'''
import os, sys, tempfile
sys.path.insert(0, %(repo)r)
from mit_6_5840_mapreduce_spark.mr.api import collect_output, mr_run
from mit_6_5840_mapreduce_spark.mr.apps import APPS
from mit_6_5840_mapreduce_spark.mr.sequential import mr_sequential
from mit_6_5840_mapreduce_spark.session import get_spark

import duckdb
rows = duckdb.connect().execute(
    "SELECT doc_id, text FROM '%(sf_dir)s/documents.parquet' "
    "ORDER BY doc_id LIMIT 80").fetchall()
documents = [(str(d), t) for d, t in rows]

marker = os.path.join(tempfile.mkdtemp(prefix="lc_crash_"), "killed_once")
mapf, reducef = APPS["wc"]

def crashing_map(name, contents):
    if name.endswith("7") and not os.path.exists(marker):
        open(marker, "w").close()
        def ppid_of(pid):
            with open(f"/proc/{pid}/stat") as f:
                return int(f.read().rsplit(")", 1)[1].split()[1])
        # python worker -> pyspark daemon -> executor JVM
        os.kill(ppid_of(ppid_of(os.getpid())), 9)
        import time; time.sleep(30)   # die before emitting anything
    return mapf(name, contents)

spark = get_spark(
    "lc-crash", shuffle_partitions=4,
    extra_conf={"spark.master": "local-cluster[2,1,1024]",
                "spark.executor.memory": "1g",
                "spark.task.maxFailures": "4"})
got = collect_output(mr_run(spark, crashing_map, reducef,
                            documents, n_reduce=5))
want = sorted(mr_sequential(mapf, reducef, documents))
assert os.path.exists(marker), "kill branch never executed"
assert got == want, "output diverged after executor death"
print("LC_CRASH_OK", len(got))
spark.stop()
'''


def test_wc_survives_executor_jvm_death(sf_dir):
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    proc = subprocess.run(
        [sys.executable, "-c",
         _SCRIPT % {"repo": REPO, "sf_dir": sf_dir}],
        capture_output=True, text=True, timeout=300, env=env, cwd="/tmp")
    assert "LC_CRASH_OK" in proc.stdout, (
        f"stdout tail: {proc.stdout[-2000:]}\n"
        f"stderr tail: {proc.stderr[-2000:]}")
    # the kill must actually have taken an executor JVM down (r9
    # review): if the grandparent walk lands on the wrong process the
    # task would just sleep, emit on its FIRST attempt, and match the
    # oracle trivially — demand the scheduler's executor-loss evidence
    assert "Lost executor" in proc.stderr, (
        f"no executor death observed; stderr tail: {proc.stderr[-2000:]}")


# ---- reduce-stage kill (round 10, VERDICT r9 item 5) --------------------
# The reference crashes in BOTH phases (src/mrapps/crash.go:34-55 —
# Reduce has the same maybeCrash() as Map). Killing an executor DURING
# the reduce stage exercises the one recovery path the map-stage kill
# does not: the dead executor's already-written map outputs vanish with
# it (no external shuffle service), so surviving reduce tasks hit
# FetchFailed and the DAGScheduler must RESUBMIT the map stage for the
# missing partitions before re-running the reduce — Spark's analogue of
# the coordinator re-queueing completed map tasks of a dead worker.

_REDUCE_SCRIPT = r'''
import os, sys, tempfile
sys.path.insert(0, %(repo)r)
from mit_6_5840_mapreduce_spark.mr.api import collect_output, mr_run
from mit_6_5840_mapreduce_spark.mr.apps import APPS
from mit_6_5840_mapreduce_spark.mr.sequential import mr_sequential
from mit_6_5840_mapreduce_spark.session import get_spark

import duckdb
rows = duckdb.connect().execute(
    "SELECT doc_id, text FROM '%(sf_dir)s/documents.parquet' "
    "ORDER BY doc_id LIMIT 80").fetchall()
documents = [(str(d), t) for d, t in rows]

mapf, reducef = APPS["wc"]
want = sorted(mr_sequential(mapf, reducef, documents))
# exactly ONE reduce key triggers the kill (a mid-list key, so other
# reduce work is plausibly in flight when the executor dies)
keys = sorted({ln.split(" ", 1)[0] for ln in want})
crash_key = keys[len(keys) // 2]

marker = os.path.join(tempfile.mkdtemp(prefix="lc_rcrash_"), "killed_once")

def crashing_reduce(key, values):
    if key == crash_key and not os.path.exists(marker):
        open(marker, "w").close()
        def ppid_of(pid):
            with open(f"/proc/{pid}/stat") as f:
                return int(f.read().rsplit(")", 1)[1].split()[1])
        # python worker -> pyspark daemon -> executor JVM
        os.kill(ppid_of(ppid_of(os.getpid())), 9)
        import time; time.sleep(30)   # die before emitting anything
    return reducef(key, values)

spark = get_spark(
    "lc-rcrash", shuffle_partitions=4,
    extra_conf={"spark.master": "local-cluster[2,1,1024]",
                "spark.executor.memory": "1g",
                "spark.task.maxFailures": "4"})
got = collect_output(mr_run(spark, mapf, crashing_reduce,
                            documents, n_reduce=5))
assert os.path.exists(marker), "kill branch never executed"
assert got == want, "output diverged after reduce-stage executor death"
print("LC_RCRASH_OK", len(got))
spark.stop()
'''


def test_wc_survives_executor_death_during_reduce(sf_dir):
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    proc = subprocess.run(
        [sys.executable, "-c",
         _REDUCE_SCRIPT % {"repo": REPO, "sf_dir": sf_dir}],
        capture_output=True, text=True, timeout=300, env=env, cwd="/tmp")
    assert "LC_RCRASH_OK" in proc.stdout, (
        f"stdout tail: {proc.stdout[-2000:]}\n"
        f"stderr tail: {proc.stderr[-2000:]}")
    assert "Lost executor" in proc.stderr, (
        f"no executor death observed; stderr tail: {proc.stderr[-2000:]}")
    # the defining evidence of THIS scenario: the death happened after
    # the shuffle write, so a reduce attempt must have failed to fetch
    # the dead executor's map output and forced a map-stage resubmit
    assert ("FetchFailed" in proc.stderr
            or "Resubmit" in proc.stderr), (
        f"no shuffle-fetch failure observed — the kill landed before "
        f"the reduce stage consumed shuffle output; stderr tail: "
        f"{proc.stderr[-2000:]}")
