"""F12: HMAC-SHA256 download-token sign/verify as pure column
expressions (ref Services/DownloadService.cs:338-430: token =
base64(json) + "." + base64(HMACSHA256(secret, json_bytes)); validate =
split, recompute, ordinal-compare).

HMAC-SHA256(key, msg) = SHA256((key ^ opad) || SHA256((key ^ ipad) || msg))
with the key zero-padded to the 64-byte block.  The key is a driver-side
config constant, so ``key ^ ipad`` / ``key ^ opad`` are precomputed in
Python and embedded as binary literals — everything per-row stays inside
whole-stage codegen (sha2/unhex/concat), no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_BLOCK = 64


def _pad_key(secret: bytes) -> bytes:
    import hashlib

    if len(secret) > _BLOCK:
        secret = hashlib.sha256(secret).digest()
    return secret.ljust(_BLOCK, b"\x00")


def hmac_sha256(msg: Column, secret: bytes) -> Column:
    """Raw HMAC-SHA256 digest (binary column) of a binary/string column."""
    key = _pad_key(secret)
    k_ipad = bytes(b ^ 0x36 for b in key)
    k_opad = bytes(b ^ 0x5C for b in key)
    msg_bin = msg.cast("binary")
    inner = F.unhex(F.sha2(F.concat(F.lit(k_ipad), msg_bin), 256))
    return F.unhex(F.sha2(F.concat(F.lit(k_opad), inner), 256))


def sign_token(payload_json: Column, secret: bytes) -> Column:
    """``base64(payload) || '.' || base64(hmac)`` — the reference's
    secure-token wire format (DownloadService.cs:347-357)."""
    return F.concat(
        F.base64(payload_json.cast("binary")),
        F.lit("."),
        F.base64(hmac_sha256(payload_json, secret)),
    )


def verify_token(token: Column, secret: bytes) -> Column:
    """True iff the token's signature matches its payload (ordinal
    compare of the recomputed base64 signature,
    DownloadService.cs:373-425).  Malformed tokens verify false.

    This is the SIGNATURE check only; the reference additionally rejects
    expired tokens (DownloadService.cs:122) — use :func:`validate_token`
    for the full accept/reject decision.

    ``try_to_binary`` (not ``unbase64``) decodes the payload: under
    Spark 4 ANSI mode ``unbase64`` THROWS on a malformed token, which
    would let one garbage token kill a whole scan — a non-base64 payload
    must instead decode to NULL and verify false."""
    parts = F.split(token, r"\.")
    payload = F.try_to_binary(F.element_at(parts, 1), F.lit("base64"))
    expected = F.base64(hmac_sha256(payload, secret))
    return F.coalesce(
        (F.size(parts) == 2) & (F.element_at(parts, 2) == expected),
        F.lit(False),
    ).alias("valid")


def validate_token(token: Column, secret: bytes, now_epoch: Column | int) -> Column:
    """Full token validation: signature match AND not expired — the
    reference's accept path (``DownloadService.cs:122``:
    ``DateTime.UtcNow > tokenData.ExpiresAt`` rejects).  The payload's
    ``exp`` field is unix seconds; a token with no parsable ``exp`` is
    rejected (fail closed), matching the reference's deserialization
    guard.  ``now_epoch`` is caller-supplied (pass a literal for
    deterministic/oracle-checked plans; ``F.unix_timestamp()`` in
    production)."""
    parts = F.split(token, r"\.")
    payload = F.try_to_binary(F.element_at(parts, 1), F.lit("base64")).cast(
        "string"
    )
    # try_cast: a non-numeric exp value must fail validation, not throw
    # the whole scan under ANSI
    exp = F.get_json_object(payload, "$.exp").try_cast("long")
    now = F.lit(now_epoch) if isinstance(now_epoch, int) else now_epoch
    return F.coalesce(
        verify_token(token, secret) & (exp >= now), F.lit(False)
    ).alias("valid_now")
