"""Unit tests for the record-ops family — mirrors the reference's case
tables: greeting branches (tests/src/test_handlers.py:112-135), JWT
three-way verdict (:46-109), error-class table
(tests/common/aws_utils/test_api_gateway.py:99-143), malformed-JSON 415
(:171-178)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from etl_8x8_spark.functions.udfs import (
    JWT_SECRET,
    _b64url_decode,
    jwt_build_token,
    jwt_verify_token,
)
from etl_8x8_spark.registry import all_queries


@pytest.fixture(scope="module")
def queries():
    return all_queries()


def _rows(spark, sf_dir, name, queries):
    return queries[name].builder(spark, sf_dir).collect()


class TestGreetingTransform:
    """Branch semantics of src/handlers.py:67-88."""

    def test_branches(self, spark, sf_dir, queries):
        rows = _rows(spark, sf_dir, "greeting_transform", queries)
        by_phrase = {}
        for r in rows:
            by_phrase.setdefault(
                (r.phrase is None, r.is_personalized, r.status), 0
            )
            by_phrase[(r.phrase is None, r.is_personalized, r.status)] += 1
        # numeric person -> 400 with no phrase
        assert (True, False, 400) in by_phrase
        # absent person -> default greeting
        assert (False, False, 200) in by_phrase
        # named person -> personalized
        assert (False, True, 200) in by_phrase
        # no other combinations exist
        assert set(by_phrase) == {
            (True, False, 400),
            (False, False, 200),
            (False, True, 200),
        }

    def test_personalized_phrase_shape(self, spark, sf_dir, queries):
        rows = _rows(spark, sf_dir, "greeting_transform", queries)
        for r in rows:
            if r.is_personalized:
                assert r.phrase.startswith("Hello, user_")
                assert r.phrase.endswith("!")
            elif r.status == 200:
                assert r.phrase == "Hello!"


class TestJsonBodyParse:
    """415 routing of api_gateway.py:126-137."""

    def test_corrupt_routed_not_dropped(self, spark, sf_dir, queries):
        rows = _rows(spark, sf_dir, "json_body_parse", queries)
        ok = [r for r in rows if r.status == 200]
        bad = [r for r in rows if r.status == 415]
        assert len(ok) + len(bad) == len(rows)
        assert bad, "synthesized corrupt rows must exist"
        for r in bad:
            assert r.k_val is None
            assert r.error == "Request payload must be formatted JSON"
        for r in ok:
            assert r.k_val is not None


class TestErrorRoute:
    """Class table of common/exceptions.py:1-32 via api_gateway.py:99-123."""

    STATUS_BY_DESC = {
        "Resource not found": 404,
        "Bad request due to missing or malformed parameters": 400,
        "Internal Server Error": 500,
        "Unauthorized": 401,
        "Unsupported Media Type": 415,
    }

    def test_class_table_and_union(self, spark, sf_dir, queries):
        rows = _rows(spark, sf_dir, "error_route", queries)
        statuses = {r.status for r in rows}
        assert statuses == {200, 400, 401, 404, 415, 500}
        for r in rows:
            if r.status == 200:
                assert r.description is None and r.error is None
            else:
                assert self.STATUS_BY_DESC[r.description] == r.status
                assert r.error.startswith("handled ")


class TestJwtVerify:
    """Three-way verdict of src/handlers.py:35-47 (PyJWT 1.7.1
    semantics: expired tokens still yield a principal)."""

    def _verdicts(self, spark, uid_eid_rows):
        df = spark.createDataFrame(uid_eid_rows, "user_id long, event_id long")
        out = df.select(
            "user_id",
            "event_id",
            jwt_verify_token(
                jwt_build_token(F.col("user_id"), F.col("event_id"))
            ).alias("v"),
        ).select("user_id", "event_id", "v.*")
        return out.collect()

    def test_three_way(self, spark):
        rows = self._verdicts(spark, [(7, 0), (7, 1), (7, 2)])
        by_eid = {r.event_id: r for r in rows}
        assert by_eid[0].verdict == "valid"
        assert by_eid[0].principal_id == "7"
        assert by_eid[0].message is None
        assert by_eid[1].verdict == "expired"
        assert by_eid[1].principal_id == "7"  # unverified decode
        assert by_eid[1].message == "Expired token"
        assert by_eid[2].verdict == "invalid"
        assert by_eid[2].principal_id == "unknown_user"
        assert by_eid[2].message == "Invalid token"

    def test_signature_is_real_hmac(self, spark):
        import hashlib
        import hmac as hmac_mod

        df = spark.createDataFrame([(42, 0)], "user_id long, event_id long")
        token = df.select(
            jwt_build_token(F.col("user_id"), F.col("event_id")).alias("t")
        ).collect()[0].t
        header_b64, payload_b64, sig = token.split(".")
        claims = json.loads(_b64url_decode(payload_b64))
        assert claims["user_id"] == 42
        expected = (
            hmac_mod.new(
                JWT_SECRET, f"{header_b64}.{payload_b64}".encode(), hashlib.sha256
            ).digest()
        )
        import base64

        assert sig == base64.urlsafe_b64encode(expected).rstrip(b"=").decode()

    def test_tampered_payload_invalid(self, spark):
        from etl_8x8_spark.functions.udfs import _b64url

        df = spark.createDataFrame([(42, 0)], "user_id long, event_id long")
        token = df.select(
            jwt_build_token(F.col("user_id"), F.col("event_id")).alias("t")
        ).collect()[0].t
        header_b64, payload_b64, sig = token.split(".")
        forged_payload = _b64url(
            json.dumps(
                {"exp": 4102444800, "user_id": 999}, separators=(",", ":")
            ).encode()
        )
        forged = f"{header_b64}.{forged_payload}.{sig}"
        tdf = spark.createDataFrame([(forged,)], "t string")
        v = tdf.select(jwt_verify_token(F.col("t")).alias("v")).select(
            "v.*"
        ).collect()[0]
        assert v.verdict == "invalid"
        assert v.principal_id == "unknown_user"


class TestEnvDerive:
    """Suffix filter + rename + lookup join of ssm.py:10-43."""

    def test_rows(self, spark, sf_dir, queries):
        rows = {r.name: r for r in _rows(spark, sf_dir, "env_derive", queries)}
        assert set(rows) == {"THOR_API_SECRET_KEY", "DB_PASSWORD", "API_TOKEN"}
        assert rows["THOR_API_SECRET_KEY"].value == "thor-secret"
        # missing path silently absent, plain vars never considered
        assert "MISSING" not in rows
        assert "PLAIN_VAR" not in rows


class TestArnPolicy:
    def test_arn_roundtrip(self, spark, sf_dir, queries):
        rows = _rows(spark, sf_dir, "arn_parse", queries)
        for r in rows[:50]:
            assert r.region.startswith("us-east-")
            assert r.api_id.startswith("api")
            assert r.stage in ("prod", "sandbox")

    def test_policy_json_shape(self, spark, sf_dir, queries):
        rows = _rows(spark, sf_dir, "policy_build", queries)
        seen_effects = set()
        for r in rows[:100]:
            doc = json.loads(r.policy_json)
            assert doc["principalId"] == r.principal_id
            stmt = doc["policyDocument"]["Statement"][0]
            assert stmt["Action"] == "execute-api:Invoke"
            assert stmt["Resource"].endswith("/*")
            seen_effects.add(stmt["Effect"])
        assert seen_effects <= {"Allow", "Deny"}
