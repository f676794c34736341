"""Auth-token signing and verification (control plane).

The reference admits sockets with a compact signed token:
``"{base64(json)}-{base64(hmac_sha256(json_b64))}"`` — PLAIN base64
(``Buffer.toString('base64')``, /root/reference/lib/util.js:29-31) joined
and split on ``'-'`` (lib/token.js:55,73), which is safe there because the
standard base64 alphabet (``A-Za-z0-9+/=``) never contains ``-``. The JSON
payload carries ``_e`` expiry epoch-ms, ``_v`` version, ``_t`` type
(HUB=1, CLUSTER=2, CLUSTER_CLIENT=3) and ``_i`` principal id
(/root/reference/lib/token.js:4-10,35-56,70-99; admission filter
/root/reference/lib/QutyCluster.js:339-373).

Deliberate wire-shape deviation: we emit unpadded base64url joined with
``'.'`` (JWS-style). base64url's alphabet contains ``-``, so the
reference's separator would be ambiguous here; and base64url survives
URLs/filenames, which matters when tokens ride in query strings. The
admission DECISION (parse → verify HMAC → check expiry/type) is
semantically identical; only the encoding of the two segments differs.

Spark has no HMAC builtin, so verification is an Arrow-batched pandas UDF
(hashlib/hmac, vectorized per batch). This is deliberately the ONLY Python
UDF in the engine, and it sits on the control plane (admission), never in
a per-message hot path — at 100 TB the admission stream is tiny compared
to the data plane.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json

import pandas as pd

from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf

TOKEN_VERSION = 1
TYPE_HUB = 1
TYPE_CLUSTER = 2
TYPE_CLUSTER_CLIENT = 3

# Fixture-wide signing secret: fixed so tokens are deterministic and the
# DuckDB oracle can replicate the admission *decision* (not the crypto).
FIXTURE_SECRET = "quty-fixture-secret"


def _b64(data: bytes) -> str:
    return base64.urlsafe_b64encode(data).rstrip(b"=").decode("ascii")


def sign_token(
    principal_id: str,
    token_type: int,
    expires_ms: int,
    secret: str = FIXTURE_SECRET,
    version: int = TOKEN_VERSION,
) -> str:
    """Mint a token as payload-b64url '.' sig-b64url — a deliberate
    deviation from the reference's '-' separator (see module docstring:
    '-' is part of the base64url alphabet, so splitting on it is
    ambiguous)."""
    payload = _b64(
        json.dumps(
            {"_e": expires_ms, "_v": version, "_t": token_type, "_i": principal_id},
            separators=(",", ":"),
            sort_keys=True,
        ).encode()
    )
    sig = _b64(hmac.new(secret.encode(), payload.encode(), hashlib.sha256).digest())
    # '.' separator (JWT-style) instead of the reference's '-': '-' is part
    # of the base64url alphabet, so splitting on it is ambiguous.
    return f"{payload}.{sig}"


def verify_token(
    token: str, now_ms: int, secret: str = FIXTURE_SECRET
) -> dict | None:
    """Verify signature + version + expiry; return the payload or None.

    Mirrors /root/reference/lib/token.js:58-99: reject on malformed shape,
    signature mismatch, version mismatch, or expiry in the past.
    """
    try:
        payload_b64, sig_b64 = token.rsplit(".", 1)
    except (ValueError, AttributeError):
        return None
    expect = _b64(
        hmac.new(secret.encode(), payload_b64.encode(), hashlib.sha256).digest()
    )
    if not hmac.compare_digest(expect, sig_b64):
        return None
    try:
        pad = "=" * (-len(payload_b64) % 4)
        payload = json.loads(base64.urlsafe_b64decode(payload_b64 + pad))
    except (ValueError, json.JSONDecodeError):
        return None
    if payload.get("_v") != TOKEN_VERSION:
        return None
    if not isinstance(payload.get("_e"), int) or payload["_e"] <= now_ms:
        return None
    return payload


def verify_token_udf(now_ms: int, secret: str = FIXTURE_SECRET) -> Column:
    """Columnar verifier: token string -> admitted token type (int) or None.

    Returns the ``_t`` field when the token verifies, null otherwise, so
    callers filter with ``IS NOT NULL`` and branch on type — the same
    node/publisher dispatch the reference does at admission
    (/root/reference/lib/QutyCluster.js:352-371).
    """

    @pandas_udf("int")
    def _verify(tokens: pd.Series) -> pd.Series:
        def one(t):
            p = verify_token(t, now_ms, secret)
            return p["_t"] if p else None

        return tokens.map(one).astype("Int32")

    return _verify
