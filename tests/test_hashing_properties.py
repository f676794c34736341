"""Hypothesis property tests for the cross-engine hashing primitives.

Every oracle-checked signature (MinHash, SimHash, sampling bands, LSH
buckets) rests on hash28/hash60 producing the SAME integer in Spark and
DuckDB for the SAME string — these tests pin that contract over
arbitrary inputs, plus the arithmetic preconditions the MinHash
permutations rely on (range bounds that keep a*h + b inside int64).
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from quty_server_spark.functions.hashing import (
    MERSENNE31,
    MINHASH_PARAMS,
    hash28,
    hash60,
    sql_hash28,
    sql_hash60,
)

# Text the fixtures can actually contain (tokens, shingles, salted keys):
# printable ASCII without the quote chars that would need SQL escaping.
_token = st.text(
    alphabet=st.characters(min_codepoint=35, max_codepoint=126),
    min_size=0,
    max_size=64,
).filter(lambda s: "\\" not in s)


def _duck_hash(expr_sql: str, value: str) -> int:
    con = duckdb.connect()
    quoted = "'" + value.replace("'", "''") + "'"
    return con.execute(f"SELECT {expr_sql.replace('token', quoted)}").fetchone()[0]


@pytest.fixture(scope="module")
def hash_eval(spark):
    from pyspark.sql import functions as F

    def go(value: str) -> tuple[int, int]:
        row = (
            spark.range(1)
            .select(
                hash28(F.lit(value)).alias("h28"),
                hash60(F.lit(value)).alias("h60"),
            )
            .first()
        )
        return row.h28, row.h60

    return go


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(_token)
def test_spark_and_duckdb_hashes_agree(hash_eval, s):
    h28, h60 = hash_eval(s)
    assert h28 == _duck_hash(sql_hash28("token"), s)
    assert h60 == _duck_hash(sql_hash60("token"), s)
    # Range contracts the MinHash/SimHash derivations rely on.
    assert 0 <= h28 < 2**28
    assert 0 <= h60 < 2**60


def test_minhash_params_keep_int64_arithmetic_safe():
    # a*h + b with h < 2^28 must stay far inside int64 for every frozen
    # permutation, and b < MERSENNE31 by construction.
    hmax = 2**28 - 1
    for a, b in MINHASH_PARAMS:
        assert 0 < a < 2**31
        assert 0 <= b < MERSENNE31
        assert a * hmax + b < 2**62  # two bits of headroom
    # Frozen parameter list is exactly the 16 signatures the oracles use.
    assert len(MINHASH_PARAMS) == 16
    assert len(set(MINHASH_PARAMS)) == 16
