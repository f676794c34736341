"""Static hygiene gate: no driver-side materialization in engine code.

A registered query that calls ``.collect()`` / ``.toPandas()`` /
``.toLocalIterator()`` isn't distributed — at 100 TB it pulls the data
set through the driver. This AST walk pins the invariant over every
non-test engine module, so a future operator can't quietly regress it.
``localCheckpoint``/``cache`` are allowed (cluster-side materialization).
"""

from __future__ import annotations

import ast
import pathlib

ROOT = pathlib.Path(__file__).resolve().parents[1] / "quty_server_spark"

FORBIDDEN = {"collect", "toPandas", "toLocalIterator", "head", "take"}

# foreachBatch sinks may inspect tiny per-epoch frames; none do today, so
# no exemptions are registered. Add (filename, funcname) pairs here only
# with a comment justifying why the materialized set is O(1).
EXEMPT: set[tuple[str, str]] = set()


def test_no_driver_side_materialization():
    hits = []
    for path in sorted(ROOT.rglob("*.py")):
        tree = ast.parse(path.read_text(), filename=str(path))
        # map line -> enclosing function name for exemption checks
        for node in ast.walk(tree):
            if (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr in FORBIDDEN
            ):
                hits.append(f"{path.relative_to(ROOT.parent)}:{node.lineno}"
                            f" .{node.func.attr}()")
    assert not hits, "driver-side materialization in engine code:\n" + "\n".join(hits)
