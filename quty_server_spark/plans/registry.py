"""Query registry: the single source of truth for the engine's surface.

Every operator module registers its queries here; ``__spark_entry__``
exposes the aggregate to the correctness driver. A query is a callable
``(spark, sf_dir) -> DataFrame``; its oracle is an equivalent DuckDB SQL
string (omitted for genuinely non-SQL-expressible operators — the driver
then records a weaker rows-only check).

Determinism contract for every registered query (what makes the
order-insensitive value-hash reproducible across Spark and DuckDB):

- every computed column is explicitly aliased, identically on both sides;
- SUM/AVG over doubles goes through DECIMAL(38,6) (exact, associative)
  before casting back to double — float summation order then cannot change
  the result between engines or between partitionings;
- every window/row_number ordering includes a unique tiebreaker key;
- variance-like aggregates are rounded to a fixed scale on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


class QueryRegistry:
    def __init__(self) -> None:
        self.queries: dict[str, Callable[[Any, str], Any]] = {}
        self.oracles: dict[str, str] = {}

    def register(
        self, name: str, fn: Callable[[Any, str], Any], oracle: str | None = None
    ) -> None:
        if name in self.queries:
            raise ValueError(f"duplicate query name: {name}")
        self.queries[name] = fn
        if oracle is not None:
            self.oracles[name] = oracle

    def query(self, name: str, oracle: str | None = None):
        """Decorator: register ``fn`` under ``name`` with optional oracle."""

        def deco(fn):
            self.register(name, fn, oracle)
            return fn

        return deco


registry = QueryRegistry()
