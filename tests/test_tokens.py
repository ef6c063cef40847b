"""F12 secure-token functions: signature verification (RFC-2104 HMAC as
column expressions) plus the round-6 expiry check (ref
Services/DownloadService.cs:122 — ``DateTime.UtcNow > tokenData.ExpiresAt``
rejects a correctly-signed but stale token)."""

import base64
import hashlib
import hmac

from pyspark.sql import functions as F

SECRET = b"unit-test-secret"
NOW = 1_755_000_000


def _stdlib_token(payload: str, secret: bytes = SECRET) -> str:
    sig = base64.b64encode(
        hmac.new(secret, payload.encode(), hashlib.sha256).digest()
    ).decode()
    return base64.b64encode(payload.encode()).decode() + "." + sig


def test_validate_token_expiry_matrix(spark):
    """validate_token = signature AND exp >= now; fail-closed on a
    missing/unparsable exp; boundary exp == now accepted (the reference
    rejects strictly-greater now)."""
    from driftmind_spark.functions.tokens import validate_token, verify_token

    cases = [
        ("fresh", _stdlib_token(f'{{"doc_id":1,"exp":{NOW + 3600}}}')),
        ("boundary", _stdlib_token(f'{{"doc_id":2,"exp":{NOW}}}')),
        ("expired", _stdlib_token(f'{{"doc_id":3,"exp":{NOW - 1}}}')),
        ("no_exp", _stdlib_token('{"doc_id":4}')),
        ("bad_sig", _stdlib_token(f'{{"doc_id":5,"exp":{NOW + 3600}}}') + "x"),
        ("malformed", "not-a-token"),
    ]
    df = spark.createDataFrame(cases, "name string, token string")
    got = {
        r["name"]: (r["sig_ok"], r["ok"])
        for r in df.select(
            "name",
            verify_token(F.col("token"), SECRET).alias("sig_ok"),
            validate_token(F.col("token"), SECRET, NOW).alias("ok"),
        ).collect()
    }
    assert got["fresh"] == (True, True)
    assert got["boundary"] == (True, True)
    # THE round-6 case: signature verifies, expiry must still reject
    assert got["expired"] == (True, False)
    assert got["no_exp"] == (True, False)  # fail closed without exp
    assert got["bad_sig"] == (False, False)
    assert got["malformed"] == (False, False)


def test_validate_token_matches_stdlib_hmac(spark):
    """The Spark column expression and python's stdlib hmac agree on the
    same token bytes (independent implementations of RFC-2104)."""
    from driftmind_spark.functions.tokens import sign_token

    payload = '{"doc_id":7,"exp":1767225600}'
    df = spark.range(1).select(
        sign_token(F.lit(payload), SECRET).alias("token")
    )
    assert df.collect()[0]["token"] == _stdlib_token(payload)
