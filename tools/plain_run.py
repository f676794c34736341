"""Run every registered query on a BARE SparkSession — the driver
simulation sweep.

Every local gate goes through ``get_spark()`` (RUNTIME_CONFS applied),
so a builder that silently depends on a session conf passes every local
check and fails only in the external driver, which builds its own
unconfigured session. This sweep caught exactly that in round 7: the
pushFilters Python data source reader hard-errors unless
``spark.sql.python.filterPushdown.enabled`` is set, and two connector
builders relied on it being preset.

Run in a FRESH process (Python data source writes only resolve on a
process's primary session):

    python tools/plain_run.py [sf_dir]

Prints one line per failure and a final ok/fail count; exit code 1 on
any failure. Execution only — value correctness is check_oracle.py's
job; this proves every builder is self-sufficient on a driver-shaped
session.
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
# chdir BEFORE the session starts: in local mode executor python workers
# resolve `quty_server_spark` (cloudpickle references module functions
# by name) through the driver's cwd — from a foreign cwd every
# pandas-UDF / stateful-streaming query would fail in the workers even
# though the driver-side import succeeded via sys.path.
os.chdir(_REPO)

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as se  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .getOrCreate()
    )
    fails: list[tuple[str, str]] = []
    n_ok = 0
    for name, fn in se.queries().items():
        try:
            fn(spark, sf_dir).collect()
            n_ok += 1
        except Exception as e:  # noqa: BLE001 — report and continue
            fails.append((name, str(e).splitlines()[0][:200]))
            print(f"FAIL  {name}: {fails[-1][1]}")
    print(f"{n_ok} ok, {len(fails)} fail (bare session, {sf_dir})")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
