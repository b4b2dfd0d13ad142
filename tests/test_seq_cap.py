"""user_event_sequences_capped: the deterministic per-key length cap
(VERDICT r7 item 5 — the documented-but-unenforced hot-key state bound
made real). A planted hot key with 10x SEQ_CAP events must keep exactly
its FIRST cap events by (ts, event_id); organic keys under the cap pass
through untouched; and the capped plan must FILTER before collecting
(bounded aggregation state), which the planted key proves behaviorally:
n_kept == cap while n_events reports the full count.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from mit_6_5840_mapreduce_spark.operators.events import (
    SEQ_CAP, capped_sequences, user_event_sequences_capped,
)

T0 = datetime.datetime(2020, 1, 1)


def _ev(rows, spark):
    return spark.createDataFrame(
        rows, "user_id BIGINT, event_id BIGINT, ts TIMESTAMP, "
              "event_type STRING")


def test_hot_key_capped_cold_key_untouched(spark):
    hot = [(1, i, T0 + datetime.timedelta(seconds=i), f"t{i % 3}")
           for i in range(10 * SEQ_CAP)]
    cold = [(2, 10_000 + i, T0 + datetime.timedelta(seconds=i), "x")
            for i in range(5)]
    out = {r.user_id: r for r in
           capped_sequences(_ev(hot + cold, spark)).collect()}
    h = out[1]
    assert h.n_events == 10 * SEQ_CAP
    assert h.n_kept == SEQ_CAP
    assert h.path == ">".join(f"t{i % 3}" for i in range(SEQ_CAP))
    c = out[2]
    assert c.n_events == c.n_kept == 5
    assert c.path == "x>x>x>x>x"


def test_cap_tiebreaks_on_event_id_within_equal_ts(spark):
    # all events share one timestamp: the cap must keep the SEQ_CAP
    # LOWEST event_ids (the (ts, event_id) order), not an arbitrary set
    rows = [(7, eid, T0, f"e{eid}") for eid in range(SEQ_CAP + 10)]
    r = capped_sequences(_ev(rows, spark)).collect()[0]
    assert r.n_kept == SEQ_CAP
    assert r.path == ">".join(f"e{i}" for i in range(SEQ_CAP))


def test_gate_corpus_exercises_both_branches(spark, sf_dir):
    # SEQ_CAP sits inside the corpus's per-user event-count range, so
    # the driver cert is non-vacuous on BOTH sides (the
    # customers_no_orders lesson): some users capped, some not
    rows = user_event_sequences_capped(spark, sf_dir).collect()
    capped = [r for r in rows if r.n_kept == SEQ_CAP < r.n_events]
    uncapped = [r for r in rows if r.n_kept == r.n_events < SEQ_CAP]
    assert capped, "no gate user exceeds SEQ_CAP — cap branch untested"
    assert uncapped, "every gate user exceeds SEQ_CAP — pass-through " \
                     "branch untested"
    for r in rows:
        assert r.n_kept == min(r.n_events, SEQ_CAP)
        assert len(r.path.split(">")) == r.n_kept
