"""Dump ``explain("formatted")`` for named queries to plans/<round>/.

Usage:
    python tools/dump_plans.py <tag> [sf_dir] <query> [query ...]

Writes ``plans/<round>/<query>_<tag>.txt`` (round dir from $PLANS_DIR,
default plans/r17). ``tag`` is usually ``before`` or ``after``. For sink
queries whose cost lives in side-effect jobs, the dumped plan covers the
returned (read-back/summary) frame; the optimization notes cite the
builder code for the side-effect half.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as se  # noqa: E402
from quty_server_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    args = sys.argv[2:]
    if args and os.path.isdir(args[0]):
        sf_dir, names = args[0], args[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", args
    out_dir = os.environ.get("PLANS_DIR", "plans/r17")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("quty-plan-dump")
    qs = se.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt.splitlines())} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
