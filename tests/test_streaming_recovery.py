"""Checkpoint-recovery and watermark-drop proofs (the "Kafka semantics"
half of BASELINE.json's stated approach).

These are the behaviors an oracle row-compare alone cannot pin down:
that the watermark really DISCARDS late rows (not vacuously "drops
nothing"), and that a stopped query restarted on the same checkpoint
resumes from committed offsets — no loss, no duplicates, epoch numbering
continuing — into an idempotent epoch-keyed sink.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from quty_server_spark.operators._helpers import load_table
from quty_server_spark.streaming import ops
from tests.conftest import SF_DIR


def test_watermark_drop_is_nonempty(spark):
    # The final state must be missing exactly the earliest-hour rows —
    # i.e. the watermark dropped a NON-EMPTY set (the round-2 bug was a
    # choreography where no row was ever late and the check was vacuous).
    result = ops.stream_watermark_late_drop(spark, SF_DIR)
    kept = sum(r.n for r in result.collect())
    ev = load_table(spark, SF_DIR, "events")
    total = ev.count()
    lo = ev.agg(F.min("ts")).first()[0]
    import datetime as dtm

    n_late = ev.filter(F.col("ts") < F.lit(lo + dtm.timedelta(hours=1))).count()
    assert n_late > 0, "fixture has no earliest-hour rows; choreography broken"
    assert kept == total - n_late
    assert kept < total  # something was genuinely dropped


def test_checkpoint_resume_no_loss_no_dupes(spark):
    info = ops.checkpoint_recovery_run(spark, SF_DIR)
    res = info["result"]
    rows = res.collect()
    ids = [r.event_id for r in rows]
    truth = load_table(spark, SF_DIR, "events").filter(
        F.col("event_type") == "purchase"
    )
    truth_ids = {r.event_id for r in truth.select("event_id").collect()}
    # Exactly-once across the restart: every purchase exactly once.
    assert len(ids) == len(set(ids)), "duplicates: file 1 was re-processed"
    assert set(ids) == truth_ids, "loss: restart skipped committed-but-unread data"

    # The second query RESUMED (offsets from the checkpoint): it appended
    # strictly-later epochs instead of restarting the numbering at 0.
    p1 = info["epochs_phase1"]
    new = sorted(set(info["epochs_all"]) - set(p1))
    assert p1, "phase 1 wrote no epochs"
    assert new, "phase 2 wrote no new epochs"
    assert min(new) > max(p1)

    # And the new epochs contain only file-2 rows: nothing re-read.
    file1_ids = {
        r.event_id
        for r in truth.filter(F.col("ts") < F.lit(info["cut"]))
        .select("event_id")
        .collect()
    }
    for e in new:
        edf = spark.read.parquet(os.path.join(info["outdir"], f"epoch={e}"))
        got = {r.event_id for r in edf.select("event_id").collect()}
        assert got.isdisjoint(file1_ids), f"epoch {e} re-delivered phase-1 rows"


def test_epoch_sink_idempotent_on_retry(spark):
    # The sink half of exactly-once: re-executing a batch (Spark retries
    # the last uncommitted batch after a crash) overwrites its own epoch
    # directory, so the replay is a no-op rather than a duplication.
    import tempfile

    outdir = os.path.join(tempfile.gettempdir(), "quty_epoch_retry_test")
    import shutil

    shutil.rmtree(outdir, ignore_errors=True)
    os.makedirs(outdir)
    writer = ops._epoch_writer(outdir)
    batch = spark.range(100).select(F.col("id").alias("event_id"))
    writer(batch, 7)
    writer(batch, 7)  # the crash-retry replay
    back = spark.read.option("basePath", outdir).parquet(
        os.path.join(outdir, "epoch=*")
    )
    assert back.count() == 100
