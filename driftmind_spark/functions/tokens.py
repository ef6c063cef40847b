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
    DownloadService.cs:373-425).  Malformed tokens verify false."""
    parts = F.split(token, r"\.")
    payload = F.unbase64(F.element_at(parts, 1))
    expected = F.base64(hmac_sha256(payload, secret))
    return (
        (F.size(parts) == 2) & (F.element_at(parts, 2) == expected)
    ).alias("valid")
