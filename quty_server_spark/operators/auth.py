"""Auth / admission operator (SURVEY.md §2.A #22).

The reference authorizes every incoming socket by verifying a signed
token from the upgrade URL, then branches node vs publisher on the token
type (/root/reference/lib/QutyCluster.js:339-373, lib/token.js:58-99).

Here the full pipeline runs in-engine: tokens are minted (HMAC-SHA256,
reference wire shape) and verified by Arrow-batched pandas UDFs; the
DuckDB oracle replicates the admission *decision* (corrupt signature /
expiry / type rules are deterministic functions of the fixture keys), so
the crypto path is end-to-end checked by its observable outcome.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from quty_server_spark.functions.token import (
    TYPE_CLUSTER,
    TYPE_CLUSTER_CLIENT,
    sign_token,
    verify_token_udf,
)
from quty_server_spark.operators._helpers import load_table
from quty_server_spark.plans.registry import registry

# Fixed "now" so expiry decisions are deterministic on both engines.
NOW_MS = 1_700_000_000_000
TTL_MS = 3_600_000


def _mint_udf():
    # Built lazily: pandas_udf construction requires an active Spark context.
    @pandas_udf("string")
    def _mint(principal: pd.Series, ttype: pd.Series, expires: pd.Series) -> pd.Series:
        return pd.Series(
            [
                sign_token(p, int(t), int(e))
                for p, t, e in zip(principal, ttype, expires)
            ],
            index=principal.index,
        )

    return _mint


def token_requests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize one admission request per event: a minted token that is
    deterministically corrupted (bad signature) for event_id % 7 == 0 and
    expired for event_id % 5 == 0; token type cycles HUB/CLUSTER/CLIENT."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    req = ev.select(
        "event_id",
        "user_id",
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("principal"),
        (F.col("user_id") % 3 + 1).cast("int").alias("ttype"),
        F.when(F.col("event_id") % 5 == 0, F.lit(NOW_MS - 1000))
        .otherwise(F.lit(NOW_MS + TTL_MS))
        .cast("long")
        .alias("expires"),
    )
    token = _mint_udf()("principal", "ttype", "expires")
    # Corrupt the signature tail for event_id % 7 == 0 (tamper simulation).
    return req.withColumn(
        "token",
        F.when(F.col("event_id") % 7 == 0, F.concat(token, F.lit("x"))).otherwise(
            token
        ),
    )


@registry.query(
    "auth_admission",
    oracle=f"""
    SELECT event_id,
           'u' || CAST(user_id AS VARCHAR) AS principal,
           CAST(user_id % 3 + 1 AS INTEGER) AS verified_type,
           CASE CAST(user_id % 3 + 1 AS INTEGER)
                WHEN {TYPE_CLUSTER} THEN 'node' ELSE 'publisher' END AS kind
    FROM events
    WHERE event_id % 7 <> 0        -- signature verifies
      AND event_id % 5 <> 0        -- not expired
      AND user_id % 3 + 1 IN ({TYPE_CLUSTER}, {TYPE_CLUSTER_CLIENT})
    """,
)
def auth_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingress admission filter: verify HMAC + expiry + version, admit only
    CLUSTER (node) and CLUSTER_CLIENT (publisher) token types, classify the
    socket kind — the reference's authorizeClient as a columnar filter.
    Tampered and expired tokens are rejected by the real verifier."""
    req = token_requests(spark, sf_dir)
    verified = req.withColumn("verified_type", verify_token_udf(NOW_MS)("token"))
    return (
        verified.filter(
            F.col("verified_type").isin(TYPE_CLUSTER, TYPE_CLUSTER_CLIENT)
        )
        .select(
            "event_id",
            "principal",
            "verified_type",
            F.when(F.col("verified_type") == TYPE_CLUSTER, "node")
            .otherwise("publisher")
            .alias("kind"),
        )
    )
