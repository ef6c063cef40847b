"""Adversarial-input hardening for the pure-python media codecs: random
and mutated bytes must ALWAYS raise one of the narrow exception types
the Spark UDFs map to NULL — any other exception type (KeyError,
ZeroDivisionError, OverflowError, ...) would crash a crawl-scale job on
one corrupt blob."""

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from driftmind_spark.kernels.imagecodec import decode_jpeg_pixels
from driftmind_spark.operators.multimodal import (
    decode_avi_mjpeg_frames,
    decode_gif_pixels,
    decode_png_pixels,
    decode_wav_samples,
    media_metadata,
    phash64,
)
from tests.test_jpeg_codec import _encode_jpeg
from tests.test_streaming_multimodal import (
    _encode_avi_mjpeg,
    _encode_gif,
    _encode_png,
    _encode_wav,
    _tone_mix,
)

OK = (NotImplementedError, ValueError, struct.error, IndexError, EOFError)

DECODERS = [
    decode_png_pixels,
    decode_gif_pixels,
    decode_jpeg_pixels,
    decode_wav_samples,
    decode_avi_mjpeg_frames,
]


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_random_bytes_never_crash(data):
    for dec in DECODERS:
        try:
            dec(data)
        except OK:
            pass


def _valid_blobs():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(8, 10, 3)).astype(np.uint8)
    idx = rng.randint(0, 4, size=(6, 6)).astype(np.uint8)
    pal = list(rng.randint(0, 256, size=12))
    jpeg = _encode_jpeg(img)
    img16 = rng.randint(0, 65536, size=(9, 7, 3)).astype(np.uint16)
    return {
        "png": _encode_png(img, filters=[0, 1, 2, 3, 4]),
        "png_i7": _encode_png(img, filters=[4, 3, 2, 1, 0], interlace=True),
        "png_16": _encode_png(img16, filters=[0, 2, 4], depth=16),
        "png_g2": _encode_png(
            (img[:, :, 0] >> 6).astype(np.uint8), filters=[0, 1, 2, 3, 4],
            color_type=0, depth=2),
        "gif": _encode_gif(idx, pal),
        "jpeg": jpeg,
        "wav": _encode_wav(_tone_mix(1, n=2000), 8000),
        "avi": _encode_avi_mjpeg([jpeg], 10, 8),
    }


_BLOBS = _valid_blobs()
_BY_FMT = {
    "png": decode_png_pixels,
    "png_i7": decode_png_pixels,
    "png_16": decode_png_pixels,
    "png_g2": decode_png_pixels,
    "gif": decode_gif_pixels,
    "jpeg": decode_jpeg_pixels,
    "wav": decode_wav_samples,
    "avi": decode_avi_mjpeg_frames,
}


@settings(max_examples=300, deadline=None)
@given(
    fmt=st.sampled_from(sorted(_BLOBS)),
    pos=st.integers(min_value=0, max_value=10 ** 6),
    val=st.integers(min_value=0, max_value=255),
    trunc=st.integers(min_value=1, max_value=10 ** 6),
)
def test_mutated_valid_blobs_decode_or_raise_cleanly(fmt, pos, val, trunc):
    """Flip one byte and/or truncate a VALID file: the decoder must
    either still decode or raise a clean, expected error."""
    blob = bytearray(_BLOBS[fmt])
    blob[pos % len(blob)] = val
    data = bytes(blob)[: max(1, trunc % (len(blob) + 1))]
    try:
        _BY_FMT[fmt](data)
    except OK:
        pass


def test_media_metadata_on_hostile_blobs_yields_rows(spark):
    """The metadata op itself (narrower catch list than sample_frames)
    must produce a row per input on hostile bytes, never crash."""
    rng = np.random.RandomState(9)
    rows = []
    for i in range(20):
        blob = bytearray(_BLOBS[["png", "gif", "jpeg", "wav", "avi"][i % 5]])
        for _ in range(3):  # heavier corruption
            blob[rng.randint(0, len(blob))] = rng.randint(0, 256)
        rows.append((f"x{i}", bytearray(bytes(blob)[: rng.randint(8, len(blob))])))
    df = spark.createDataFrame(rows, "media_id string, blob binary")
    out = media_metadata(df).collect()
    assert len(out) == 20


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=0, max_size=200))
def test_phash_on_garbage_pixel_shapes(data):
    """phash64 gets arrays, not bytes — but degenerate shapes must raise
    cleanly too."""
    arr = np.frombuffer(data, dtype=np.uint8)
    try:
        phash64(arr.reshape(-1, 1) if len(arr) else arr.reshape(0, 1))
    except OK:
        pass


# ---- the MAIN pipeline path: extraction over hostile crawl bytes ----------

from driftmind_spark.kernels.extract import extract_any, extract_text
from driftmind_spark.kernels.fileformats import render_docx, render_pdf


@settings(max_examples=300, deadline=None)
@given(
    data=st.binary(min_size=0, max_size=400),
    ext=st.sampled_from(["", ".html", ".txt", ".md", ".pdf", ".docx", ".bin"]),
)
def test_extract_any_never_crashes_on_random_bytes(data, ext):
    """extract_any is the stage-0 kernel over 100 TB of crawl bytes: it
    must return a string for ANY payload, never raise."""
    out = extract_any(f"https://h.example/x{ext}", data)
    assert isinstance(out, str)


_PDF = render_pdf(["hello pdf world"], {"Title": "t"})
_DOCX = render_docx(["hello docx world"], [])
_HTML = (b"<html><head><title>t</title></head><body><nav>n</nav>"
         b"<main><p>Real content sentence.</p></main>"
         b"<footer>f</footer></body></html>")


@settings(max_examples=300, deadline=None)
@given(
    kind=st.sampled_from(["pdf", "docx", "html"]),
    pos=st.integers(min_value=0, max_value=10 ** 6),
    val=st.integers(min_value=0, max_value=255),
    trunc=st.integers(min_value=1, max_value=10 ** 6),
)
def test_extract_mutated_valid_files_never_crash(kind, pos, val, trunc):
    blob, url = {
        "pdf": (_PDF, "https://h.example/a.pdf"),
        "docx": (_DOCX, "https://h.example/a.docx"),
        "html": (_HTML, "https://h.example/a.html"),
    }[kind]
    b = bytearray(blob)
    b[pos % len(b)] = val
    data = bytes(b)[: max(1, trunc % (len(b) + 1))]
    out = extract_any(url, data)
    assert isinstance(out, str)
    ok, text, err = extract_text(url, data)
    assert isinstance(text, str) and isinstance(err, str)


# ---- pinned regressions from the round-4 self-review ----------------------

def test_wav_zero_channels_raises_cleanly():
    """fmt declaring channels=0 must be a ValueError, never a
    ZeroDivisionError crashing the Spark task."""
    fmt = struct.pack("<HHIIHH", 1, 0, 8000, 0, 0, 16)
    data = (b"RIFF" + struct.pack("<I", 36) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 8) + b"\x00" * 8)
    with pytest.raises(ValueError, match="zero channels"):
        decode_wav_samples(data)


def test_jpeg_corrupt_dc_size_raises_cleanly():
    """A DHT assigning a DC magnitude category > 15 must be a
    ValueError, never an OverflowError from a 200-bit integer."""
    def chunk(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    dht_dc = bytes([0x00]) + bytes([1] + [0] * 15) + bytes([200])  # sym=200
    dht_ac = bytes([0x10]) + bytes([1] + [0] * 15) + bytes([0x00])
    sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    data = (b"\xff\xd8"
            + chunk(0xDB, bytes([0]) + bytes([1] * 64))
            + chunk(0xC0, sof) + chunk(0xC4, dht_dc) + chunk(0xC4, dht_ac)
            + chunk(0xDA, sos) + b"\x00" * 40 + b"\xff\xd9")
    with pytest.raises(ValueError):
        decode_jpeg_pixels(data)
