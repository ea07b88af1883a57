"""The engine's UDF surface — exactly one family: HMAC-SHA256 JWT
handling (SURVEY.md §2b "UDF surface").

HMAC has no Spark built-in, so this is the single place the engine
drops out of whole-stage codegen — implemented as vectorized
``pandas_udf``\\s (Arrow batch transfer, one Python call per ~10k rows)
rather than row-at-a-time UDFs. Everything else in the engine is pure
built-in expressions.

Semantics mirror the reference authorizer (``/root/reference/src/
handlers.py:35-47``) under PyJWT 1.7.1: a structurally valid token with
a good signature but expired ``exp`` still yields a principal via
unverified decode ('Expired token'); any signature/structure failure
yields ``unknown_user`` ('Invalid token').
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import time

import pandas as pd
from pyspark.sql import functions as F

# Fixed engine secret — the analog of the reference's SSM-fetched
# THOR_API_SECRET_KEY (serverless.core.yml:95).
JWT_SECRET = b"etl-8x8-engine-secret"

_HEADER_B64 = (
    base64.urlsafe_b64encode(b'{"alg":"HS256","typ":"JWT"}').rstrip(b"=").decode()
)

# exp values: far future (token valid until 2100) vs far past.
_EXP_FUTURE = 4102444800  # 2100-01-01
_EXP_PAST = 946684800  # 2000-01-01


def _b64url(data: bytes) -> str:
    return base64.urlsafe_b64encode(data).rstrip(b"=").decode()


def _b64url_decode(s: str) -> bytes:
    return base64.urlsafe_b64decode(s + "=" * (-len(s) % 4))


def _sign(signing_input: bytes) -> str:
    # hmac.digest is the one-shot C fast path (no HMAC object per row)
    return _b64url(hmac.digest(JWT_SECRET, signing_input, "sha256"))


def _build_token_batch(user_id: pd.Series, event_id: pd.Series) -> pd.Series:
    """Deterministic token synthesis: ``event_id % 3`` selects
    valid (0) / expired (1) / bad-signature (2). The signature on
    branches 0-1 is a real HMAC-SHA256 over header.payload."""
    out = []
    for uid, eid in zip(user_id, event_id):
        branch = int(eid) % 3
        exp = _EXP_PAST if branch == 1 else _EXP_FUTURE
        # fixed key order == json.dumps(..., separators=(",", ":"))
        payload = (
            f'{{"exp":{exp},"user_id":{int(uid)},'
            f'"first_name":"First","last_name":"Last"}}'
        )
        signing_input = f"{_HEADER_B64}.{_b64url(payload.encode())}".encode()
        sig = _sign(signing_input) if branch != 2 else "tampered-signature"
        out.append(f"{signing_input.decode()}.{sig}")
    return pd.Series(out)


def _verify_token_batch(token: pd.Series) -> pd.DataFrame:
    """Three-way verdict by actually recomputing the HMAC and checking
    ``exp`` — not by inspecting how the token was built.

    - good signature + unexpired -> ('valid', user_id, NULL)
    - good signature + expired   -> ('expired', user_id, 'Expired token')
      (principal via unverified decode, PyJWT 1.7.1 ``verify=False``)
    - bad signature / malformed  -> ('invalid', 'unknown_user',
      'Invalid token')
    """
    now = time.time()
    verdicts, principals, messages = [], [], []
    for tok in token:
        verdict, principal, message = "invalid", "unknown_user", "Invalid token"
        try:
            header_b64, payload_b64, sig = str(tok).split(".")
            claims = json.loads(_b64url_decode(payload_b64))
            expected = _sign(f"{header_b64}.{payload_b64}".encode())
            if hmac.compare_digest(expected, sig):
                if float(claims.get("exp", 0)) < now:
                    verdict = "expired"
                    # unverified decode still yields the principal
                    principal = str(claims.get("user_id", "unknown_user"))
                    message = "Expired token"
                else:
                    verdict = "valid"
                    principal = str(claims["user_id"])
                    message = None
        except (ValueError, KeyError, json.JSONDecodeError):
            pass
        verdicts.append(verdict)
        principals.append(principal)
        messages.append(message)
    return pd.DataFrame(
        {"verdict": verdicts, "principal_id": principals, "message": messages}
    )


# pandas_udf parses its DDL return type against the active session, so
# the udfs must be constructed lazily (builders run under the driver's
# session, which doesn't exist at import time).
_UDF_CACHE: dict[str, object] = {}


def jwt_build_token(user_id, event_id):
    if "build" not in _UDF_CACHE:
        _UDF_CACHE["build"] = F.pandas_udf(_build_token_batch, "string")
    return _UDF_CACHE["build"](user_id, event_id)


def jwt_verify_token(token):
    if "verify" not in _UDF_CACHE:
        _UDF_CACHE["verify"] = F.pandas_udf(
            _verify_token_batch, "verdict string, principal_id string, message string"
        )
    return _UDF_CACHE["verify"](token)


def widen_for_python(df):
    """Raise map-stage parallelism to cluster width before an expensive
    per-row stage (Arrow-batched Python, or heavy JVM array math like
    MinHash signatures — anything whose per-row cost dwarfs row bytes).

    A small or heavily-filtered input can arrive in fewer partitions
    than the cluster has cores (a single-row-group parquet file is a
    one-task scan), and then a ``pandas_udf`` / ``mapInPandas`` chain
    runs serially no matter how wide the cluster is — per-row Python
    cost, unlike codegen'd expressions, dwarfs the row's byte size, so
    partition count IS the throughput. A round-robin repartition to
    ``defaultParallelism`` pays one tiny shuffle of the raw input and
    buys cores× on the Python stage. No-op when the input is already
    at least that wide (the common case at 100 TB, where the scan
    itself yields thousands of tasks). AQE never coalesces an explicit
    ``repartition(n)``, so the width survives adaptive re-planning.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
