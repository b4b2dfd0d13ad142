"""Streaming mid-micro-batch failure recovery under local-cluster
(round 11, VERDICT r10 item 5).

The batch engine has both-phase executor-kill parity tests
(tests/test_mr_crash_cluster.py — the reference's crash-vs-nocrash
diff, ``src/main/test-mr.sh:284-330``); streaming only had CLEAN
checkpoint resume (test_checkpoint_resume_processes_nothing_new).
This is the missing case: an executor JVM dies IN THE MIDDLE of a
micro-batch of the stateful ``user_running_totals`` pipeline, the
query fails (task.maxFailures=1 makes the loss fatal, so recovery must
come from the CHECKPOINT, not in-flight task retry), a restarted query
resumes from the write-ahead log, and the final per-user state must
equal an uninterrupted run byte for byte.

Construction: the events table is split into four source files with
ascending mtimes and maxFilesPerTrigger=1, so the availableNow run is
four micro-batches; the kill sentinel is an event_id from the THIRD
file — two micro-batches of state are already committed when the
executor dies, so the restart proves state RECOVERY, not just source
replay. The sink is an append-parquet foreachBatch (idempotent final
selection: n_events strictly increases per user across update-mode
emissions, so max/max_by tolerates a replayed batch's duplicate rows —
the same selection rule as the stream_user_totals gate query).

Runs in a SUBPROCESS like the MR crash tests: a second SparkContext
cannot coexist with the session fixture's, and an executor kill must
never destabilize the battery's shared session.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r'''
import os, sys, tempfile, time
sys.path.insert(0, %(repo)r)
import duckdb
import pyspark.sql.functions as F
from pyspark.errors import StreamingQueryException
from mit_6_5840_mapreduce_spark.session import get_spark
from mit_6_5840_mapreduce_spark.sources.tables import normalize_event_ts

work = tempfile.mkdtemp(prefix="stream_crash_")
srcdir = os.path.join(work, "events_src")
os.makedirs(srcdir)

# four source files with ascending mtimes -> four availableNow
# micro-batches under maxFilesPerTrigger=1 (FileStreamSource orders by
# modification time); remember a sentinel event_id from file 2 so the
# kill lands in the THIRD micro-batch, after two state commits
con = duckdb.connect()
n = con.execute("SELECT count(*) FROM '%(sf_dir)s/events.parquet'"
                ).fetchone()[0]
step = n // 4
sentinel = None
for i in range(4):
    lim = step if i < 3 else n - 3 * step
    con.execute(
        f"COPY (SELECT * FROM '%(sf_dir)s/events.parquet' "
        f"ORDER BY event_id LIMIT {lim} OFFSET {i * step}) TO "
        f"'{srcdir}/ev_{i}.parquet' (FORMAT PARQUET)")
    os.utime(f"{srcdir}/ev_{i}.parquet", (1000000 + i, 1000000 + i))
    if i == 2:
        sentinel = con.execute(
            f"SELECT min(event_id) FROM '{srcdir}/ev_2.parquet'"
        ).fetchone()[0]
assert sentinel is not None

marker = os.path.join(work, "killed_once")

def crash_once(event_id):
    if event_id == %(sentinel_expr)s and not os.path.exists(marker):
        open(marker, "w").close()
        def ppid_of(pid):
            with open(f"/proc/{pid}/stat") as f:
                return int(f.read().rsplit(")", 1)[1].split()[1])
        # python worker -> pyspark daemon -> executor JVM
        os.kill(ppid_of(ppid_of(os.getpid())), 9)
        time.sleep(30)          # die before emitting anything
    return True

spark = get_spark(
    "stream-crash", shuffle_partitions=4,
    extra_conf={"spark.master": "local-cluster[2,1,1024]",
                "spark.executor.memory": "1g",
                # an executor loss must be FATAL to the query so
                # recovery exercises the checkpoint path, not
                # in-flight task retry
                "spark.task.maxFailures": "1"})
from mit_6_5840_mapreduce_spark.session import attach_package
attach_package(spark)      # executor Python workers import the package
crash_udf = F.udf(crash_once, "boolean")

from mit_6_5840_mapreduce_spark.streaming.jobs import (
    _STATE_SCHEMA, _TOTALS_SCHEMA, _update_totals,
)
from pyspark.sql.streaming.state import GroupStateTimeout

raw_schema = spark.read.parquet(f"{srcdir}/ev_0.parquet").schema

def totals_stream(with_crash):
    stream = (spark.readStream.schema(raw_schema)
              .option("maxFilesPerTrigger", 1).parquet(srcdir))
    ev = normalize_event_ts(stream, target="timestamp")
    if with_crash:
        ev = ev.where(crash_udf(F.col("event_id")))
    return (ev.select("user_id", "ts", "value")
            .groupBy("user_id")
            .applyInPandasWithState(
                _update_totals, outputStructType=_TOTALS_SCHEMA,
                stateStructType=_STATE_SCHEMA, outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))

def run(tag, with_crash):
    out = os.path.join(work, f"out_{tag}")
    ckpt = os.path.join(work, f"ckpt_{tag}")
    def sink(batch_df, batch_id):
        (batch_df.withColumn("batch_id", F.lit(batch_id))
         .write.mode("append").parquet(out))
    q = (totals_stream(with_crash).writeStream
         .outputMode("update").foreachBatch(sink)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    try:
        assert q.awaitTermination(240), f"stream run {tag} timed out"
        return None
    except StreamingQueryException as e:
        return e

def final_state(tag):
    out = os.path.join(work, f"out_{tag}")
    return sorted(
        (r.user_id, r.n_events, r.total_value_cents)
        for r in spark.read.parquet(out).groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"),
             F.max_by("total_value_cents", "n_events")
             .alias("total_value_cents")).collect())

# uninterrupted reference run
err = run("clean", with_crash=False)
assert err is None, f"clean run failed: {err}"
want = final_state("clean")
assert want, "clean run produced no state rows"

# crash run: attempt 1 must DIE mid-micro-batch ...
err = run("crash", with_crash=True)
assert os.path.exists(marker), "kill branch never executed"
assert err is not None, (
    "query survived the executor kill - task.maxFailures=1 should "
    "have made the loss fatal")
print("QUERY_FAILED_AS_EXPECTED", flush=True)
# ... and attempt 2 resumes from the checkpoint (same out/ckpt dirs)
err = run("crash", with_crash=True)
assert err is None, f"restarted query failed: {err}"
got = final_state("crash")
assert got == want, (
    f"state diverged after mid-batch executor death:\n"
    f"got {got[:5]} ...\nwant {want[:5]} ...")
print("STREAM_CRASH_OK", len(got))
spark.stop()
'''


def test_stateful_stream_survives_midbatch_executor_death(sf_dir):
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    proc = subprocess.run(
        [sys.executable, "-c",
         _SCRIPT % {"repo": REPO, "sf_dir": sf_dir,
                    "sentinel_expr": "sentinel"}],
        capture_output=True, text=True, timeout=600, env=env, cwd="/tmp")
    assert "STREAM_CRASH_OK" in proc.stdout, (
        f"stdout tail: {proc.stdout[-2000:]}\n"
        f"stderr tail: {proc.stderr[-2000:]}")
    # the first attempt must actually have failed (checkpoint recovery,
    # not in-flight retry) ...
    assert "QUERY_FAILED_AS_EXPECTED" in proc.stdout
    # ... because an executor JVM genuinely died (same evidence demand
    # as the MR crash tests: a wrong grandparent walk would just sleep)
    assert "Lost executor" in proc.stderr, (
        f"no executor death observed; stderr tail: {proc.stderr[-2000:]}")
