"""Cross-engine deterministic hashing primitives.

Spark's builtin ``hash``/``xxhash64`` and DuckDB's ``hash`` use different
algorithms, so every hash that participates in an oracle-checked result is
derived from **md5** (identical in both engines): take a fixed-width hex
prefix and parse it as an integer.

- ``hash60``: 15 hex chars → 60-bit non-negative int64 (fingerprints,
  simhash bit source).
- ``hash28``: 7 hex chars → 28-bit int (MinHash base hash: keeps
  ``a*h + b`` within int64 for a < 2^31).

These run JVM-side in Spark (md5/conv/substring are codegen'd builtins) —
no Python UDF on the hot path, so the same expressions hold at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE31 = 2147483647  # 2^31 - 1, modulus for MinHash permutations

# 16 fixed (a, b) permutation parameters for MinHash — odd multipliers,
# generated once from a fixed seed and frozen as literals so Spark and
# DuckDB compute identical signatures.
MINHASH_PARAMS: list[tuple[int, int]] = [
    (1103515245, 12345),
    (1229782938, 2891336453),
    (747796405, 2147483587),
    (22695477, 1),
    (69069, 362437),
    (1664525, 1013904223),
    (134775813, 1),
    (214013, 2531011),
    (16807, 0),
    (48271, 399268537),
    (65539, 838041641),
    (1094795585, 282475249),
    (1588635695, 1117695901),
    (1744537409, 1447809965),
    (999999937, 2038074743),
    (630360016, 1952607213),
]
# b values must stay < 2^31 so (a*h + b) fits comfortably in int64.
MINHASH_PARAMS = [(a, b % MERSENNE31) for a, b in MINHASH_PARAMS]


def hash60(col: Column) -> Column:
    """60-bit md5-derived hash (Spark side)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def sql_hash60(expr: str) -> str:
    """60-bit md5-derived hash (DuckDB side)."""
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def hash28(col: Column) -> Column:
    """28-bit md5-derived hash (Spark side)."""
    return F.conv(F.substring(F.md5(col), 1, 7), 16, 10).cast("bigint")


def sql_hash28(expr: str) -> str:
    """28-bit md5-derived hash (DuckDB side)."""
    return f"CAST('0x' || substr(md5({expr}), 1, 7) AS BIGINT)"


def minhash_expr(i: int, h: str = "h") -> str:
    """SQL fragment for MinHash permutation i over base-hash column ``h``
    (identical text works in Spark SQL and DuckDB)."""
    a, b = MINHASH_PARAMS[i]
    return f"(({a} * {h} + {b}) % {MERSENNE31})"
