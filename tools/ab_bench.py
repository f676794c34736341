"""Interleaved same-host A/B bench for two checkouts of this repo.

Round-4 verdict flagged three sub-second queries >2x slower than round 3
with unchanged plans; BASELINE.md attributes the round to a uniform host
slowdown, but cross-round comparisons can't separate host drift from a
code regression. This harness can: it runs the SAME queries from two
checkouts ALTERNATELY on one host (A B A B ...), so both sides see the
same noise distribution, and reports per-query min across rounds.

Usage:
    python tools/ab_bench.py A_PATH B_PATH [--sf SF_DIR] [--rounds N] q1 q2 ...

Each round spawns one subprocess per side (fresh JVM — no warm-cache
bias toward either side); within a process each query is warmed once
and timed best-of-3 against the noop sink, mirroring bench.py.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, sys.argv[1])
os.chdir(sys.argv[1])
import __spark_entry__ as se
from quty_server_spark.session import get_spark
sf_dir = sys.argv[2]
names = sys.argv[3:]
spark = get_spark("ab-bench")
# Older checkouts predate the NTZ-inference conf (fixtures drifted from
# TIMESTAMP(NANOS) to naive timestamp[us] in round 4); pin it here so
# both sides scan identically.
spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
qs = se.queries()
out = {}
for name in names:
    fn = qs.get(name)
    if fn is None:
        continue  # query doesn't exist in this checkout (older round)
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    best = float("inf")
    for _ in range(3):
        if name == "dedup_cluster":
            # Same convention as bench.py: time the COLD labeling pass
            # (checkouts with the per-session label memo would otherwise
            # serve cached labels here, unlike pre-memo checkouts).
            getattr(spark, "_quty_cluster_labels", {}).clear()
        if name == "dedup_cluster_incremental":
            # r12 convention: COLD contracted-graph BSP per timing.
            getattr(spark, "_quty_incremental_cluster_labels", {}).clear()
        if "bpe" in name:
            # r17 (r16 ADVICE #1): clear the BPE training-state memo
            # before EVERY BPE-family timing — trainer and consumers
            # alike. bench.py can rely on HEADLINE ordering asserts to
            # keep the trainer cold and the consumers warm, but this
            # harness takes an arbitrary query list, so a memo-bearing
            # checkout timing a consumer without (or before) the
            # trainer would report warm best-of-N numbers against a
            # cold pre-memo arm. Clearing per timing makes every BPE
            # number cold-inclusive and symmetric across checkouts.
            getattr(spark, "_quty_bpe_state", {}).clear()
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    out[name] = round(best, 3)
print("ABRESULT " + json.dumps(out))
spark.stop()
"""


def run_side(path: str, sf_dir: str, names: list[str]) -> dict[str, float]:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    p = subprocess.run(
        [sys.executable, "-c", RUNNER, path, sf_dir, *names],
        capture_output=True,
        text=True,
        env=env,
    )
    for line in p.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(f"side {path} produced no result:\n{p.stderr[-2000:]}")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.1"
    rounds = 2
    argv = sys.argv[1:]
    if "--sf" in argv:
        sf_dir = argv[argv.index("--sf") + 1]
        args.remove(sf_dir)
    if "--rounds" in argv:
        r = argv[argv.index("--rounds") + 1]
        rounds = int(r)
        args.remove(r)
    a_path, b_path, *names = args
    best: dict[str, dict[str, float]] = {"A": {}, "B": {}}
    for rnd in range(rounds):
        for side, path in (("A", a_path), ("B", b_path)):
            got = run_side(os.path.abspath(path), sf_dir, names)
            for k, v in got.items():
                best[side][k] = min(best[side].get(k, float("inf")), v)
            print(f"round {rnd} side {side}: {got}", file=sys.stderr)
    report = {
        q: {
            "A": best["A"].get(q),
            "B": best["B"].get(q),
            "B_over_A": round(best["B"][q] / best["A"][q], 3)
            if best["A"].get(q) and best["B"].get(q)
            else None,
        }
        for q in names
    }
    print(json.dumps({"sf_dir": sf_dir, "rounds": rounds, "queries": report}))


if __name__ == "__main__":
    main()
