"""Kafka wire-contract tests (no broker in this container — the staged
file log stands in for the topic; these pin the CONTRACT):

- producer side: keyed partitioning (all of a key's records in exactly one
  partition), per-partition offsets gap-free from 0, value round-trips the
  envelope parser;
- consumer side: a checkpointed replay stopped mid-log and resumed from
  the same checkpoint loses nothing, duplicates nothing, and preserves
  per-key offset order across the restart (phase-1 offsets all precede
  phase-2 offsets for every key).

Reference parity: the reference's ingress FIFO is the per-socket send
sequence (lib/util.js:186-196); its resume story is the offline queue
(SURVEY.md §2.A #25). Both map onto the consumer-group resume contract
demonstrated here.
"""

from __future__ import annotations

from quty_server_spark.operators import pubsub
from quty_server_spark.streaming import ops
from tests.conftest import SF_DIR


def test_keyed_partitioning_and_gapfree_offsets(spark):
    rec = pubsub.kafka_records(spark, SF_DIR).toPandas()
    # every key maps to exactly one partition
    assert (rec.groupby("key")["partition"].nunique() == 1).all()
    # per-partition offsets are exactly 0..n-1 (monotone, gap-free)
    for _, g in rec.groupby("partition"):
        offs = sorted(g["offset"])
        assert offs == list(range(len(g)))
    # offset order within a partition == (ts, event_id) arrival order
    for _, g in rec.groupby("partition"):
        by_offset = g.sort_values("offset")[["ts", "event_id"]].values.tolist()
        assert by_offset == sorted(by_offset)


def test_replay_resumes_without_loss_or_dupes(spark):
    out = ops.kafka_replay_run(spark, SF_DIR)
    res = out["result"].toPandas()
    truth = pubsub.kafka_records(spark, SF_DIR).toPandas()
    # exactly-once: same multiset of (partition, offset) as the batch truth
    assert sorted(map(tuple, res[["partition", "offset"]].values.tolist())) == sorted(
        map(tuple, truth[["partition", "offset"]].values.tolist())
    )
    # the restart really was a restart: phase 1 committed at least one
    # epoch, and the resumed query added new epochs (not re-runs)
    assert out["epochs_phase1"]
    assert set(out["epochs_all"]) > set(out["epochs_phase1"])


def test_replay_preserves_per_key_order_across_restart(spark):
    out = ops.kafka_replay_run(spark, SF_DIR)
    res = out["result"].toPandas()
    phase1 = set(out["epochs_phase1"])
    res["phase"] = res["epoch"].map(lambda e: 1 if e in phase1 else 2)
    for key, g in res.groupby("key"):
        p1 = g.loc[g["phase"] == 1, "offset"]
        p2 = g.loc[g["phase"] == 2, "offset"]
        if len(p1) and len(p2):
            # every offset consumed before the stop precedes every offset
            # consumed after the resume — per-key FIFO across restart
            assert p1.max() < p2.min(), f"key {key} reordered across restart"
