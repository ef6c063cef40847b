"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

Header-level metadata is decoded FOR REAL with pure struct (no media
library): PNG IHDR, GIF logical screen descriptor, JPEG SOF marker scan
(width/height), RIFF/WAVE fmt+data chunks (duration/rate/channels), and
ISO-BMFF moov/mvhd (mp4 duration).  PIXEL decode is real for every
image format here (round 4), with no image library: PNG via stdlib-zlib
IDAT inflate + full five-filter unfilter + palette expansion
(``decode_png_pixels``), GIF via a pure-python variable-width LZW with
interlace reorder (``decode_gif_pixels``), and baseline JPEG via
huffman entropy decode + dequantize + float IDCT + chroma upsampling
(``kernels/imagecodec.decode_jpeg_pixels``) — so ``sample_frames``
emits genuine pixel bands for all three.  PCM WAV samples
(``decode_wav_samples``) and MJPEG-in-AVI video frames
(``decode_avi_mjpeg_frames``, RIFF walk + the JPEG kernel per frame)
are real too, and the JPEG kernel covers BOTH baseline and progressive
(SOF2: spectral selection + successive approximation) frames.  The
remaining stubs, honestly marked: arithmetic-coded JPEG, compressed
audio, and inter-frame video codecs (H.264 etc.) — those need
entropy/motion decoders this container doesn't ship.
Everything Spark-side is real and tested: schemas, Arrow batch shapes,
mapInPandas iteration, partition sizing.  Swapping the stub for
Pillow/ffmpeg is a one-function change that does not touch the plan.

Design notes for 100 TB of media:
- media bytes ride in their own column family (Parquet: separate column
  chunk), so metadata-only queries never read the blobs (column pruning);
- ``mapInPandas`` processes Arrow record batches — per-batch decode
  amortizes Python call overhead; batch size bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` to keep decoded
  frames in executor memory;
- frame sampling / resizing emits a new binary column, never mutates.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("format", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        # audio/video stream properties (NULL for still images)
        StructField("duration_ms", LongType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("channels", IntegerType(), True),
        StructField("sha", StringType(), False),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("frame_index", IntegerType(), False),
        StructField("frame", BinaryType(), False),
        # Self-describing payload kind so byte-range stand-ins can never be
        # consumed as decoded media: "pixels" (uint8 image band), "audio"
        # (int16 sample band), or "bytes" (raw file byte-range fallback).
        StructField("kind", StringType(), False),
    ]
)

_MAGIC = {
    b"\xff\xd8\xff": "jpeg",
    b"\x89PNG": "png",
    b"GIF8": "gif",
}


def _sniff_format(data: bytes) -> str | None:
    for magic, fmt in _MAGIC.items():
        if data[: len(magic)] == magic:
            return fmt
    if data[:4] == b"RIFF":
        if data[8:12] == b"WAVE":
            return "wav"
        if data[8:12] == b"AVI ":
            return "avi"
        return "riff"
    if data[4:8] == b"ftyp":
        return "mp4"
    if data[:3] == b"ID3":
        return "mp3"
    if len(data) >= 4:
        frame = _mp3_frame(data, 0)
        if frame is not None:
            # One plausible header is weak evidence — arbitrary binary hits
            # the 0xFF 0xEx sync + valid bitrate/rate bits surprisingly
            # often.  Require a SECOND consecutive valid frame (jump by the
            # first frame's size and re-check the sync), or a stream that
            # is exactly one complete frame.
            size = frame[0]
            if size == len(data) or _mp3_frame(data, size) is not None:
                return "mp3"
    return None


def _jpeg_dimensions(data: bytes) -> tuple[int, int]:
    """Pure-stdlib JPEG dimension scan: walk the marker segments to the
    first SOF frame header (SOF0-SOF15 except the DHT/DAC/RST family)
    and read (height, width) from it — no decoder needed."""
    i = 2  # past SOI
    n = len(data)
    while i + 9 < n:
        if data[i] != 0xFF:
            i += 1  # entropy padding / fill bytes
            continue
        marker = data[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2  # standalone markers carry no length
            continue
        seg_len = struct.unpack(">H", data[i + 2:i + 4])[0]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h, w = struct.unpack(">HH", data[i + 5:i + 9])
            return int(w), int(h)
        i += 2 + seg_len
    raise ValueError("no SOF marker found")


def _wav_properties(data: bytes) -> tuple[int | None, int | None, int | None]:
    """(duration_ms, sample_rate, channels) from a RIFF/WAVE header:
    walk the chunk list to 'fmt ' (rate/channels/byte-rate) and 'data'
    (payload size) — pure struct, no audio library."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, n = 12, len(data)
    rate = channels = byte_rate = data_size = None
    while pos + 8 <= n:
        cid = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        if cid == b"fmt " and pos + 16 <= n:
            channels, rate, byte_rate = struct.unpack(
                "<HII", data[pos + 10:pos + 20]
            )
        elif cid == b"data":
            data_size = size
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None:
        raise ValueError("no fmt chunk")
    dur = (
        int(data_size * 1000 / byte_rate)
        if (data_size is not None and byte_rate) else None
    )
    return dur, int(rate), int(channels)


def _mp4_duration_ms(data: bytes) -> int:
    """Duration from the ISO-BMFF 'moov/mvhd' box (version 0 or 1):
    scan top-level boxes to 'moov', then its children to 'mvhd', read
    (timescale, duration) — pure struct, no video library."""

    def walk(lo: int, hi: int, name: bytes):
        pos = lo
        while pos + 8 <= hi:
            size = struct.unpack(">I", data[pos:pos + 4])[0]
            box = data[pos + 4:pos + 8]
            hdr = 8
            if size == 1:  # 64-bit largesize
                size = struct.unpack(">Q", data[pos + 8:pos + 16])[0]
                hdr = 16
            if size < hdr or pos + size > hi:
                break
            if box == name:
                return pos + hdr, pos + size
            pos += size
        return None

    moov = walk(0, len(data), b"moov")
    if moov is None:
        raise ValueError("no moov box")
    mvhd = walk(moov[0], moov[1], b"mvhd")
    if mvhd is None:
        raise ValueError("no mvhd box")
    lo, _ = mvhd
    version = data[lo]
    if version == 1:
        timescale, duration = struct.unpack(">IQ", data[lo + 20:lo + 32])
    else:
        timescale, duration = struct.unpack(">II", data[lo + 12:lo + 20])
    if not timescale:
        raise ValueError("zero timescale")
    return int(duration * 1000 / timescale)


def _g711_tables():
    """256-entry mu-law and A-law expansion tables (ITU-T G.711),
    computed once from the closed forms — the same expansions CPython's
    audioop implements (the test cross-checks against it)."""
    import numpy as np

    ul = np.zeros(256, dtype=np.int16)
    for b in range(256):
        u = ~b & 0xFF
        sign = u & 0x80
        exp = (u >> 4) & 7
        mant = u & 0x0F
        v = (((mant << 3) + 0x84) << exp) - 0x84
        ul[b] = -v if sign else v
    al = np.zeros(256, dtype=np.int16)
    for b in range(256):
        a = b ^ 0x55
        sign = a & 0x80
        exp = (a >> 4) & 7
        mant = a & 0x0F
        if exp:
            v = ((mant << 4) + 0x108) << (exp - 1)
        else:
            v = (mant << 4) + 8
        al[b] = v if sign else -v  # A-law: set sign bit = positive
    return ul, al


_G711_ULAW, _G711_ALAW = _g711_tables()

_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_IMA_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8]


def _ima_step(pred: int, index: int, nibble: int) -> tuple[int, int]:
    """One IMA-ADPCM state transition (the DVI/IMA quantizer both WAV
    and CPython's audioop implement)."""
    step = _IMA_STEPS[index]
    diff = step >> 3
    if nibble & 4:
        diff += step
    if nibble & 2:
        diff += step >> 1
    if nibble & 1:
        diff += step >> 2
    if nibble & 8:
        diff = -diff
    pred = max(-32768, min(32767, pred + diff))
    index = max(0, min(88, index + _IMA_INDEX[nibble]))
    return pred, index


def _ima_adpcm_decode(payload: bytes, channels: int, block_align: int,
                      samples_per_block: int):
    """WAV IMA-ADPCM (format tag 0x11) block decode: per block and
    channel a 4-byte header (int16 predictor = first output sample,
    step index), then 4-byte nibble words interleaved across channels,
    LOW nibble first."""
    import numpy as np

    if channels < 1 or block_align < 4 * channels:
        raise ValueError("bad IMA-ADPCM framing")
    chans: list[list[int]] = [[] for _ in range(channels)]
    for boff in range(0, len(payload) - block_align + 1, block_align):
        block = payload[boff:boff + block_align]
        preds, idxs = [], []
        want = [len(ch) + samples_per_block for ch in chans]
        for c in range(channels):
            pred, idx, _res = struct.unpack_from("<hBB", block, 4 * c)
            if idx > 88:
                raise ValueError("IMA step index out of range")
            preds.append(pred)
            idxs.append(idx)
            chans[c].append(pred)
        data = block[4 * channels:]
        for w in range(0, len(data) - 4 * channels + 1, 4 * channels):
            for c in range(channels):
                for byte in data[w + 4 * c:w + 4 * c + 4]:
                    for nib in (byte & 0xF, byte >> 4):
                        preds[c], idxs[c] = _ima_step(preds[c], idxs[c], nib)
                        chans[c].append(preds[c])
        for c in range(channels):  # trim per-block padding nibbles
            del chans[c][want[c]:]
    n = min(len(ch) for ch in chans)
    out = np.empty((n, channels), dtype=np.int16)
    for c in range(channels):
        out[:, c] = chans[c][:n]
    return out


_MS_COEF1 = [256, 512, 0, 192, 240, 460, 392]
_MS_COEF2 = [0, -256, 0, 64, 0, -208, -232]
_MS_ADAPT = [230, 230, 230, 230, 307, 409, 512, 614,
             768, 614, 512, 409, 307, 230, 230, 230]


def _ms_adpcm_decode(payload: bytes, channels: int, block_align: int,
                     samples_per_block: int):
    """WAV MS-ADPCM (format tag 2) block decode: per block, per-channel
    headers (predictor index into the 7-entry coefficient table, int16
    initial delta, int16 samp1/samp2 — samp2 is emitted FIRST), then
    4-bit signed prediction errors, HIGH nibble first, channel-
    interleaved per nibble."""
    import numpy as np

    if channels < 1 or block_align < 7 * channels:
        raise ValueError("bad MS-ADPCM framing")
    chans: list[list[int]] = [[] for _ in range(channels)]
    for boff in range(0, len(payload) - block_align + 1, block_align):
        block = payload[boff:boff + block_align]
        pred_i, delta, s1, s2 = [], [], [], []
        want = [len(ch) + samples_per_block for ch in chans]
        for c in range(channels):
            p = block[c]
            if p > 6:
                raise ValueError("MS-ADPCM predictor index out of range")
            pred_i.append(p)
        off = channels
        for dest in (delta, s1, s2):
            for c in range(channels):
                dest.append(struct.unpack_from("<h", block, off)[0])
                off += 2
        for c in range(channels):
            chans[c].append(s2[c])
            chans[c].append(s1[c])
        nib_chan = 0
        for byte in block[off:]:
            for nib in (byte >> 4, byte & 0xF):
                c = nib_chan % channels
                nib_chan += 1
                err = nib - 16 if nib >= 8 else nib
                # the spec's C `/ 256` truncates TOWARD ZERO; a floor
                # shift is off by one for negative non-multiple sums and
                # the error feeds back through s1/s2 within the block
                q = (s1[c] * _MS_COEF1[pred_i[c]]
                     + s2[c] * _MS_COEF2[pred_i[c]])
                pred = q >> 8 if q >= 0 else -((-q) >> 8)
                samp = max(-32768, min(32767, pred + err * delta[c]))
                s2[c], s1[c] = s1[c], samp
                delta[c] = max(16, (_MS_ADAPT[nib] * delta[c]) >> 8)
                chans[c].append(samp)
        for c in range(channels):  # trim per-block padding nibbles
            del chans[c][want[c]:]
    n = min(len(ch) for ch in chans)
    out = np.empty((n, channels), dtype=np.int16)
    for c in range(channels):
        out[:, c] = chans[c][:n]
    return out


def decode_wav_samples(data: bytes):
    """REAL WAV sample decode, pure struct + numpy (round 4): returns
    (samples int16[n_frames, channels], sample_rate).  Supports the
    uncompressed profiles — format tag 1 (integer PCM) at 8/16/24/32
    bits and tag 3 (float32) — plus the G.711 telephony codecs (tag 7
    mu-law, tag 6 A-law, table expansion) and both block-structured
    ADPCM families: IMA (tag 0x11, per-block predictor headers,
    channel-interleaved LOW-first nibble words) and MS-ADPCM (tag 2,
    round 5 — 7-coefficient linear predictor, adaptive delta, HIGH-first
    nibbles), everything normalized to int16.  Remaining compressed WAV
    (mp3-in-wav) raises ``NotImplementedError``."""
    import numpy as np

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, n = 12, len(data)
    fmt = None
    payload = None
    while pos + 8 <= n:
        cid = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        body = data[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            tag, channels, rate = struct.unpack("<HHI", body[:8])
            block_align, bits = struct.unpack("<HH", body[12:16])
            extra = (struct.unpack("<H", body[18:20])[0]
                     if len(body) >= 20 else None)
            fmt = (tag, channels, rate, bits, block_align, extra)
        elif cid == b"data":
            payload = body
        pos += 8 + size + (size & 1)
    if fmt is None or payload is None:
        raise ValueError("missing fmt/data chunk")
    tag, channels, rate, bits, block_align, extra = fmt
    if channels < 1:  # corrupt fmt: avoid ZeroDivisionError downstream
        raise ValueError("fmt chunk declares zero channels")
    if tag == 1 and bits == 16:
        samples = np.frombuffer(payload, dtype="<i2")
    elif tag == 1 and bits == 8:  # unsigned 8-bit
        samples = ((np.frombuffer(payload, dtype=np.uint8).astype(np.int32)
                    - 128) << 8).astype(np.int16)
    elif tag == 1 and bits == 24:
        raw = np.frombuffer(payload, dtype=np.uint8)
        raw = raw[: len(raw) - len(raw) % 3].reshape(-1, 3)
        vals = (raw[:, 0].astype(np.int32)
                | (raw[:, 1].astype(np.int32) << 8)
                | (raw[:, 2].astype(np.int32) << 16))
        vals = np.where(vals >= 1 << 23, vals - (1 << 24), vals)
        samples = (vals >> 8).astype(np.int16)
    elif tag == 1 and bits == 32:
        samples = (np.frombuffer(payload, dtype="<i4") >> 16).astype(np.int16)
    elif tag == 3 and bits == 32:
        f = np.frombuffer(payload, dtype="<f4").astype(np.float64)
        samples = np.clip(np.round(f * 32767.0), -32768, 32767).astype(np.int16)
    elif tag == 7 and bits == 8:   # G.711 mu-law (round 4)
        samples = _G711_ULAW[np.frombuffer(payload, dtype=np.uint8)]
    elif tag == 6 and bits == 8:   # G.711 A-law (round 4)
        samples = _G711_ALAW[np.frombuffer(payload, dtype=np.uint8)]
    elif tag == 0x11 and bits == 4:  # IMA ADPCM (round 4)
        spb = extra if extra else (block_align - 4 * channels) * 2 // channels + 1
        return _ima_adpcm_decode(payload, channels, block_align, spb), int(rate)
    elif tag == 2 and bits == 4:  # MS ADPCM (round 5)
        spb = extra if extra else (
            (block_align - 7 * channels) * 2 // channels + 2
        )
        return _ms_adpcm_decode(payload, channels, block_align, spb), int(rate)
    else:
        raise NotImplementedError(
            f"compressed/unsupported WAV (format tag {tag}, {bits}-bit)"
        )
    frames = len(samples) // channels
    return samples[: frames * channels].reshape(frames, channels), int(rate)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


# Adam7 interlace pass geometry: (x0, y0, dx, dy) per pass.
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_unfilter(raw: bytes, h: int, w: int, bpp: int):
    """Reverse the five PNG scanline filters over one (sub-)image whose
    scanlines are ``w`` pixels of ``bpp`` BYTES each (the spec defines
    filtering on bytes-per-pixel, so 16-bit images reuse this with
    doubled ``bpp``).  Returns a (h, w*bpp) uint8 array.

    Filters Sub/Up are vectorized (per-byte-lane cumsum mod 256 is exact
    because byte addition is associative); Average/Paeth carry a true
    sequential left-dependency, so they run a per-pixel loop vectorized
    across byte lanes."""
    import numpy as np

    stride = w * bpp
    if len(raw) != h * (stride + 1):
        raise ValueError("decompressed size does not match dimensions")
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    zero_row = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f = int(arr[y, 0])
        cur = arr[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else zero_row
        if f == 0:                                   # None
            rec = cur
        elif f == 1:                                 # Sub
            rec = np.cumsum(
                cur.reshape(w, bpp), axis=0, dtype=np.int64
            ).reshape(stride) & 0xFF
        elif f == 2:                                 # Up
            rec = (cur + prev) & 0xFF
        elif f == 3:                                 # Average
            rec2 = cur.reshape(w, bpp)
            pr2 = prev.reshape(w, bpp)
            acc = np.zeros((w, bpp), dtype=np.int32)
            left = np.zeros(bpp, dtype=np.int32)
            for x in range(w):
                left = (rec2[x] + ((left + pr2[x]) >> 1)) & 0xFF
                acc[x] = left
            rec = acc.reshape(stride)
        elif f == 4:                                 # Paeth
            rec2 = cur.reshape(w, bpp)
            pr2 = prev.reshape(w, bpp)
            acc = np.zeros((w, bpp), dtype=np.int32)
            left = np.zeros(bpp, dtype=np.int32)
            ul = np.zeros(bpp, dtype=np.int32)
            for x in range(w):
                b = pr2[x]
                p = left + b - ul
                pa, pb, pc = abs(p - left), abs(p - b), abs(p - ul)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, b, ul)
                )
                left = (rec2[x] + pred) & 0xFF
                acc[x] = left
                ul = b
            rec = acc.reshape(stride)
        else:
            raise ValueError(f"bad scanline filter {f}")
        out[y] = rec.astype(np.uint8)
    return out


def decode_png_pixels(data: bytes):
    """REAL PNG pixel decode with nothing but stdlib ``zlib`` + numpy:
    chunk walk -> IDAT inflate -> per-scanline unfilter (all five PNG
    filter types: None/Sub/Up/Average/Paeth) -> palette expansion.

    Round 5 made PNG support COMPLETE for every legal depth/color
    combination: color types 0 (gray), 2 (RGB), 3 (palette), 4
    (gray+alpha), 6 (RGBA); depths 8, 16 (big-endian samples
    downsampled to their high byte, the standard 16->8 conversion) and
    1/2/4 (MSB-first packed gray/palette samples, byte-granularity
    filtering, gray levels scaled to 8-bit); interlace methods 0 and 1
    (each Adam7 pass is an independently filtered sub-image scattered
    into the full frame via strided assignment).  Illegal combinations
    (sub-byte RGB, 16-bit palette) raise ``ValueError``.  Returns a
    ``uint8`` array of shape (height, width, channels) — palette images
    come back expanded to RGB."""
    import zlib

    import numpy as np

    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG stream")
    pos, n = 8, len(data)
    ihdr = None
    plte = None
    idat: list[bytes] = []
    while pos + 8 <= n:
        length = struct.unpack(">I", data[pos:pos + 4])[0]
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            plte = body
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + crc32
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("nonstandard compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"bad interlace method {interlace}")
    if depth not in (1, 2, 4, 8, 16):
        raise ValueError(f"bad bit depth {depth}")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if channels is None:
        raise ValueError(f"bad color type {color}")
    if depth < 8 and color not in (0, 3):
        raise ValueError("sub-byte depths are gray/palette only")
    if color == 3 and depth == 16:
        raise ValueError("palette images must be 1/2/4/8-bit, not 16")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:  # surface as the callers' undecodable case
        raise ValueError(f"corrupt IDAT stream: {e}") from e

    if depth >= 8:
        bps = depth // 8  # bytes per sample
        fbpp = channels * bps  # filter bytes-per-pixel

        def _rowbytes(pw):
            return pw * channels * bps

        def _to_samples(bytes2d, ph, pw):
            # (ph, rowbytes) filtered bytes -> (ph, pw, channels) uint8;
            # for 16-bit take the big-endian high byte (== value >> 8)
            return bytes2d.reshape(ph, pw, channels, bps)[..., 0]
    else:
        # Sub-byte depths (round 5 — the last PNG seam): samples are
        # packed MSB-first; the spec filters on BYTES with bpp = 1.
        # Unpack per (sub-)image after unfiltering, then scale gray
        # levels to 8-bit (palette indices are used as-is).
        fbpp = 1
        scale = (255 // ((1 << depth) - 1)) if color == 0 else 1
        weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint16)

        def _rowbytes(pw):
            return -(-pw * depth // 8)

        def _to_samples(bytes2d, ph, pw):
            bits = np.unpackbits(
                np.ascontiguousarray(bytes2d), axis=1
            )[:, : pw * depth].reshape(ph, pw, depth)
            vals = (bits * weights).sum(axis=2) * scale
            return vals.astype(np.uint8)[..., None]

    if interlace == 0:
        px = _to_samples(_png_unfilter(raw, h, _rowbytes(w) // fbpp, fbpp), h, w)
    else:
        px = np.zeros((h, w, channels), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue  # empty pass has no scanlines at all
            need = ph * (_rowbytes(pw) + 1)
            sub = _png_unfilter(
                raw[off:off + need], ph, _rowbytes(pw) // fbpp, fbpp
            )
            off += need
            px[y0::dy, x0::dx] = _to_samples(sub, ph, pw)
        if off != len(raw):
            raise ValueError("decompressed size does not match dimensions")
    if color == 3:
        if plte is None:
            raise ValueError("palette image without PLTE chunk")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        return pal[px.reshape(h, w)]
    return px


def _gif_lzw_decode(stream: bytes, min_code: int, expected: int) -> bytearray:
    """GIF-flavor LZW (LSB-first variable-width codes, 12-bit cap,
    clear/end codes) — pure python, no compression library exists for
    LZW in the stdlib.  Stops after ``expected`` output bytes."""
    clear = 1 << min_code
    end = clear + 1
    init_width = min_code + 1
    base_table = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base_table)
    width = init_width
    out = bytearray()
    prev: bytes | None = None
    bitpos = 0
    total_bits = len(stream) * 8
    while bitpos + width <= total_bits and len(out) < expected:
        byte_i = bitpos >> 3
        window = int.from_bytes(stream[byte_i:byte_i + 4], "little")
        code = (window >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        if code == clear:
            table = list(base_table)
            width = init_width
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("bad first LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("LZW code beyond table")
        out += entry
        prev = entry
        if len(table) >= (1 << width) and width < 12:
            width += 1
    return out


def _gif_stream(data: bytes):
    """Iterate the GIF data stream: yields ``('gce', disposal,
    transparent_idx, delay_cs)`` for graphic-control extensions and
    ``('img', x0, y0, idx2d, pal)`` for rendered image descriptors
    (LZW-decoded, interlace-reordered indices + their effective color
    table)."""
    import numpy as np

    if data[:4] != b"GIF8" or len(data) < 13:
        raise ValueError("not a GIF stream")
    flags = data[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = data[pos:pos + 3 * n]
        pos += 3 * n
    while pos < len(data):
        b0 = data[pos]
        if b0 == 0x21:  # extension block: label byte + sub-blocks
            label = data[pos + 1] if pos + 1 < len(data) else 0
            pos += 2
            first = True
            while pos < len(data) and data[pos] != 0:
                sz = data[pos]
                if label == 0xF9 and first and sz >= 4:
                    packed = data[pos + 1]
                    disposal = (packed >> 2) & 7
                    delay_cs = struct.unpack_from("<H", data, pos + 2)[0]
                    trans = data[pos + 4] if (packed & 1) else None
                    yield ("gce", disposal, trans, delay_cs)
                first = False
                pos += 1 + sz
            pos += 1
        elif b0 == 0x2C:  # image descriptor
            x0, y0, w, h = struct.unpack("<HHHH", data[pos + 1:pos + 9])
            iflags = data[pos + 9]
            pos += 10
            ct = gct
            if iflags & 0x80:  # local color table wins
                n = 2 << (iflags & 7)
                ct = data[pos:pos + 3 * n]
                pos += 3 * n
            if ct is None:
                raise ValueError("no color table")
            min_code = data[pos]
            pos += 1
            chunks = []
            while pos < len(data) and data[pos] != 0:
                sz = data[pos]
                chunks.append(data[pos + 1:pos + 1 + sz])
                pos += 1 + sz
            pos += 1  # block terminator
            idx = _gif_lzw_decode(b"".join(chunks), min_code, w * h)
            if len(idx) < w * h:
                raise ValueError("truncated LZW pixel stream")
            arr = np.frombuffer(bytes(idx[:w * h]), dtype=np.uint8).reshape(h, w)
            if iflags & 0x40:  # interlaced: rows arrive in 4-pass order
                order = np.array(
                    [*range(0, h, 8), *range(4, h, 8),
                     *range(2, h, 4), *range(1, h, 2)],
                    dtype=np.int64,
                )
                out = np.zeros_like(arr)
                out[order] = arr
                arr = out
            pal = np.frombuffer(ct, dtype=np.uint8).reshape(-1, 3)
            if int(arr.max(initial=0)) >= len(pal):
                raise ValueError("pixel index beyond color table")
            yield ("img", x0, y0, arr, pal)
        elif b0 == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b0:02x}")


def _gif_scan_meta(data: bytes):
    """(n_images, total_delay_cs) by a STRUCTURAL block walk — skips
    image data sub-blocks by their length bytes, never LZW-decodes
    (metadata over a crawl must not pay pixel-decode cost)."""
    if data[:4] != b"GIF8" or len(data) < 13:
        raise ValueError("not a GIF stream")
    flags = data[10]
    pos = 13
    if flags & 0x80:
        pos += 3 * (2 << (flags & 7))
    n_imgs, delay_cs = 0, 0
    while pos < len(data):
        b0 = data[pos]
        if b0 == 0x21:
            label = data[pos + 1] if pos + 1 < len(data) else 0
            pos += 2
            first = True
            while pos < len(data) and data[pos] != 0:
                sz = data[pos]
                if label == 0xF9 and first and sz >= 4:
                    delay_cs += struct.unpack_from("<H", data, pos + 2)[0]
                first = False
                pos += 1 + sz
            pos += 1
        elif b0 == 0x2C:
            iflags = data[pos + 9]
            pos += 10
            if iflags & 0x80:
                pos += 3 * (2 << (iflags & 7))
            pos += 1  # LZW min code size
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            n_imgs += 1
        elif b0 == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b0:02x}")
    return n_imgs, delay_cs


def decode_gif_pixels(data: bytes):
    """REAL first-frame GIF decode, pure python + numpy (round 4):
    logical-screen/image descriptors, global/local color tables, the
    full variable-width LZW stream, 4-pass interlace reorder, palette
    expansion to RGB uint8[h, w, 3] at the DESCRIPTOR's size (use
    ``decode_gif_frames`` for composed animation canvases)."""
    for blk in _gif_stream(data):
        if blk[0] == "img":
            _, _x0, _y0, arr, pal = blk
            return pal[arr]
    raise ValueError("no image descriptor")


def decode_gif_frames(data: bytes, max_frames: int = 4):
    """REAL animated-GIF frame decode (round 5): compose each rendered
    image onto the logical-screen canvas honoring graphic-control
    transparency and disposal methods 0/1 (leave), 2 (restore to
    background color), 3 (restore previous); returns up to
    ``max_frames`` full-canvas uint8[H, W, 3] frames."""
    import numpy as np

    if data[:4] != b"GIF8" or len(data) < 13:
        raise ValueError("not a GIF stream")
    W, H = struct.unpack("<HH", data[6:10])
    flags, bg_idx = data[10], data[11]
    bg_rgb = (0, 0, 0)
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = data[13:13 + 3 * n]
        if bg_idx < n:
            bg_rgb = tuple(gct[3 * bg_idx:3 * bg_idx + 3])
    canvas = np.zeros((H, W, 3), dtype=np.uint8)
    canvas[:] = bg_rgb
    frames: list = []
    disposal, trans = 0, None
    for blk in _gif_stream(data):
        if blk[0] == "gce":
            _, disposal, trans, _delay = blk
            continue
        _, x0, y0, arr, pal = blk
        h, w = arr.shape
        # clamp hostile descriptors to the logical screen
        h = min(h, max(0, H - y0))
        w = min(w, max(0, W - x0))
        if h == 0 or w == 0:
            continue
        sub = arr[:h, :w]
        before = canvas.copy() if disposal == 3 else None
        region = canvas[y0:y0 + h, x0:x0 + w]
        rgb = pal[sub]
        if trans is not None:
            mask = sub != trans
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        if len(frames) >= max_frames:
            break
        if disposal == 2:
            canvas[y0:y0 + h, x0:x0 + w] = bg_rgb
        elif disposal == 3:
            canvas = before
        disposal, trans = 0, None  # a GCE governs one rendering block
    if not frames:
        raise ValueError("no image descriptor")
    return frames


def _riff_chunks(data: bytes, lo: int, hi: int):
    """Iterate (chunk_id, body_lo, body_hi) over a RIFF chunk range
    (word-aligned, truncated chunks clamped)."""
    pos = lo
    while pos + 8 <= hi:
        cid = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        yield cid, pos + 8, min(pos + 8 + size, hi)
        pos += 8 + size + (size & 1)


def _avi_properties(data: bytes):
    """(duration_ms, width, height) from the avih main header inside
    LIST hdrl — pure struct."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI stream")
    for cid, lo, hi in _riff_chunks(data, 12, len(data)):
        if cid == b"LIST" and data[lo:lo + 4] == b"hdrl":
            for sid, slo, shi in _riff_chunks(data, lo + 4, hi):
                if sid == b"avih" and shi - slo >= 40:
                    us_per_frame, _, _, _, total_frames = struct.unpack(
                        "<IIIII", data[slo:slo + 20]
                    )
                    w, h = struct.unpack("<II", data[slo + 32:slo + 40])
                    dur = (
                        int(us_per_frame * total_frames / 1000)
                        if us_per_frame else None
                    )
                    return dur, int(w), int(h)
    raise ValueError("no avih header")


def decode_avi_mjpeg_frames(data: bytes, max_frames: int = 4):
    """REAL video frame decode for MJPEG-in-AVI (round 4): walk the
    RIFF tree to LIST 'movi', decode each video chunk ('##dc'/'##db')
    whose payload is a JPEG through the baseline JPEG kernel.  Returns
    up to ``max_frames`` uint8[h, w, c] arrays.  Non-MJPEG codecs
    (H.264 etc.) yield no decodable chunks and raise — those need
    ffmpeg, the remaining honest seam."""
    from ..kernels.imagecodec import decode_jpeg_pixels

    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI stream")
    frames = []
    def _scan(lo: int, hi: int) -> bool:
        for fid, flo, fhi in _riff_chunks(data, lo, hi):
            # Interleaved AVIs commonly wrap each frame group in a nested
            # LIST 'rec ' inside 'movi'; recurse one level so those files
            # decode instead of falling through to the byte-range stand-in.
            if fid == b"LIST" and data[flo:flo + 4] == b"rec ":
                if _scan(flo + 4, fhi):
                    return True
            elif fid[2:4] in (b"dc", b"db"):
                payload = data[flo:fhi]
                if payload[:3] == b"\xff\xd8\xff":
                    frames.append(decode_jpeg_pixels(payload))
                    if len(frames) >= max_frames:
                        return True
        return False

    for cid, lo, hi in _riff_chunks(data, 12, len(data)):
        if cid == b"LIST" and data[lo:lo + 4] == b"movi":
            if _scan(lo + 4, hi):
                return frames
    if not frames:
        raise ValueError("no MJPEG frames found")
    return frames


def _decode_dimensions(data: bytes) -> tuple[int | None, int | None]:
    """PNG (IHDR), GIF (logical screen descriptor), and JPEG (SOF scan)
    headers are parsed for real with pure struct — no image library.
    Full pixel decode (resize/feature-extract) still needs Pillow/ffmpeg
    and raises; the UDF maps that to NULL dimensions."""
    if data[:4] == b"\x89PNG" and len(data) >= 24:
        w, h = struct.unpack(">II", data[16:24])
        return int(w), int(h)
    if data[:4] == b"GIF8" and len(data) >= 10:
        w, h = struct.unpack("<HH", data[6:10])
        return int(w), int(h)
    if data[:3] == b"\xff\xd8\xff":
        return _jpeg_dimensions(data)
    raise NotImplementedError(
        "media decode requires an image library not present in this "
        "container; plug Pillow/ffmpeg in here"
    )


def decode_image_pixels(data: bytes):
    """Dispatch to the real decoder for any supported image format
    (PNG / GIF / baseline JPEG); raises on anything else."""
    if data[:8] == _PNG_SIG:
        return decode_png_pixels(data)
    if data[:4] == b"GIF8":
        return decode_gif_pixels(data)
    if data[:3] == b"\xff\xd8\xff":
        from ..kernels.imagecodec import decode_jpeg_pixels

        return decode_jpeg_pixels(data)
    raise ValueError("no pixel decoder for this format")


def phash64(pixels) -> int:
    """64-bit perceptual hash over DECODED pixels (round 4 — possible
    because the image decoders are real now): grayscale -> 32x32
    resample -> 2D orthonormal DCT -> low-frequency 8x8 corner
    thresholded at the median of its AC coefficients.  Two encodings of
    the same picture (PNG vs JPEG re-encode, mild noise) land within a
    few bits; unrelated pictures land ~32 bits apart."""
    import numpy as np

    from ..kernels.imagecodec import _C  # 8x8 orthonormal DCT basis

    px = np.asarray(pixels, dtype=np.float64)
    if px.ndim == 3:
        px = px.mean(axis=2)
    h, w = px.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    ys = (np.arange(32) * h) // 32
    xs = (np.arange(32) * w) // 32
    small = px[ys[:, None], xs[None, :]]
    n = 32
    k = np.arange(n)[:, None]
    m = np.arange(n)[None, :]
    c32 = np.cos(np.pi * k * (2 * m + 1) / (2 * n)) * np.where(
        k == 0, np.sqrt(1 / n), np.sqrt(2 / n)
    )
    coef = c32 @ small @ c32.T
    # 64 AC coefficients only: DC (32x mean brightness) is virtually always
    # above the AC median, so including it would pin one hash bit constant
    # across all images (~63 effective bits).  Standard pHash excludes DC;
    # we take the 63 remaining low-frequency coefficients of the 8x8 corner
    # plus coef[0, 8], the next purely-horizontal frequency, to stay at 64.
    block = np.concatenate([coef[:8, :8].reshape(64)[1:], coef[0:1, 8]])
    med = np.median(block)
    bits = block > med
    val = 0
    for i in range(64):
        if bits[i]:
            val |= 1 << i
    return val


def image_phash(df: DataFrame, id_col: str = "media_id",
                blob_col: str = "blob") -> DataFrame:
    """(media_id, phash) over an image-blob column via mapInPandas;
    undecodable blobs yield NULL (observable, never a crash).  The hash
    is emitted as int64 (the uint64 bit pattern, sign-irrelevant) so it
    plugs straight into the SimHash Hamming machinery."""
    out_schema = StructType(
        [
            StructField("media_id", StringType(), False),
            StructField("phash", LongType(), True),
        ]
    )

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[blob_col]):
                try:
                    v = phash64(decode_image_pixels(bytes(blob)))
                    v = int(np.int64(np.uint64(v)))
                except (NotImplementedError, ValueError, struct.error,
                        IndexError, EOFError):
                    v = None
                rows.append({"media_id": str(mid), "phash": v})
            yield pd.DataFrame(rows, columns=["media_id", "phash"])

    return df.mapInPandas(_hash, out_schema)


def image_near_dups(df: DataFrame, max_hamming: int = 6,
                    id_col: str = "media_id", blob_col: str = "blob",
                    max_bucket_size: int | None = 1024) -> DataFrame:
    """Perceptual near-duplicate image pairs: pHash + the SAME Manku
    bit-block scheme the text SimHash dedup uses (max_hamming+1 disjoint
    blocks -> pigeonhole recall 1.0 at <= max_hamming, hot-bucket cap,
    exact bit_count verify).  Returns (media_a, media_b, hamming).

    Scale shape inherited from simhash_pairs_from_hashes: one decode
    pass per blob (Arrow-batched), an equi-join on block values — never
    a pairwise image comparison."""
    from .dedup import simhash_pairs_from_hashes

    hashed = (
        image_phash(df, id_col, blob_col)
        .filter(F.col("phash").isNotNull())
        .select(F.col("media_id").alias("doc_id"),
                F.col("phash").alias("simhash"))
    )
    pairs = simhash_pairs_from_hashes(
        hashed, max_hamming=max_hamming, max_bucket_size=max_bucket_size
    )
    return pairs.select(
        F.col("doc_a").alias("media_a"),
        F.col("doc_b").alias("media_b"),
        "hamming",
    )


def audio_fingerprint64(samples, rate: int) -> int:
    """64-bit fingerprint over DECODED PCM (round 4 — possible because
    WAV decode is real): mono-mix -> 32 equal time slices -> per slice,
    one ENERGY bit (sum of squares above the median energy) and one
    SPECTRAL bit (zero-crossing count above the median count — the
    classic cheap proxy for dominant frequency).  Volume-invariant by
    construction (median thresholds).

    DETERMINISM IS LOAD-BEARING: every feature is computed in EXACT
    integer arithmetic (int64 sums of int32 squares, integer crossing
    counts).  A first cut used FFT band energies — float sums whose
    last-ulp value depends on numpy's SIMD/summation path, which varies
    with allocation context; near-median slices then hash differently
    between the driver and an executor evaluating the SAME bytes.
    Integer features cannot flip: equal inputs give equal bits
    everywhere, and re-evaluations of a Spark lineage are stable."""
    import numpy as np

    arr = np.asarray(samples)
    if arr.ndim == 2:
        arr = arr.astype(np.int64).sum(axis=1)  # exact mono mix (sum)
    else:
        arr = arr.astype(np.int64)
    n = len(arr)
    if n < 64:
        raise ValueError("audio too short to fingerprint")
    slices = 32
    cut = (n // slices) * slices
    mat = arr[:cut].reshape(slices, -1)
    energy = (mat * mat).sum(axis=1)                       # exact int64
    crossings = (np.diff(np.signbit(mat), axis=1) != 0).sum(axis=1)
    val = 0
    for b, band in enumerate((energy, crossings)):
        med = np.median(band)
        for i in range(slices):
            if band[i] > med:
                val |= 1 << (b * slices + i)
    return val


def audio_phash(df: DataFrame, id_col: str = "media_id",
                blob_col: str = "blob") -> DataFrame:
    """(media_id, afp) over WAV blobs via mapInPandas; undecodable or
    too-short audio yields NULL."""
    out_schema = StructType(
        [
            StructField("media_id", StringType(), False),
            StructField("afp", LongType(), True),
        ]
    )

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[blob_col]):
                try:
                    samples, rate = decode_wav_samples(bytes(blob))
                    v = audio_fingerprint64(samples, rate)
                    v = int(np.int64(np.uint64(v)))
                except (NotImplementedError, ValueError, struct.error,
                        IndexError, EOFError):
                    v = None
                rows.append({"media_id": str(mid), "afp": v})
            yield pd.DataFrame(rows, columns=["media_id", "afp"])

    return df.mapInPandas(_hash, out_schema)


def audio_near_dups(df: DataFrame, max_hamming: int = 6,
                    id_col: str = "media_id", blob_col: str = "blob",
                    max_bucket_size: int | None = 1024) -> DataFrame:
    """Near-duplicate audio pairs: spectral fingerprint + the shared
    Manku bit-block scheme (same scale shape as image_near_dups)."""
    from .dedup import simhash_pairs_from_hashes

    hashed = (
        audio_phash(df, id_col, blob_col)
        .filter(F.col("afp").isNotNull())
        .select(F.col("media_id").alias("doc_id"),
                F.col("afp").alias("simhash"))
    )
    return simhash_pairs_from_hashes(
        hashed, max_hamming=max_hamming, max_bucket_size=max_bucket_size
    ).select(
        F.col("doc_a").alias("media_a"),
        F.col("doc_b").alias("media_b"),
        "hamming",
    )


# MPEG audio frame-header tables: bitrates (kbps) per (version-group,
# layer), sample rates per version, samples-per-frame per (version, layer).
_MP3_BITRATES = {
    (1, 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    (1, 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    (1, 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    (2, 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    (2, 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (2, 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_MP3_RATES = {3: [44100, 48000, 32000],   # MPEG1
              2: [22050, 24000, 16000],   # MPEG2
              0: [11025, 12000, 8000]}    # MPEG2.5


def _mp3_frame(data: bytes, pos: int):
    """Parse one MPEG audio frame header at ``pos``; returns
    (frame_bytes, samples, rate, channels) or None if not a valid
    header."""
    if pos + 4 > len(data):
        return None
    b1, b2, b3, b4 = data[pos:pos + 4]
    if b1 != 0xFF or (b2 & 0xE0) != 0xE0:
        return None
    ver = (b2 >> 3) & 3          # 3=MPEG1, 2=MPEG2, 0=MPEG2.5, 1=reserved
    layer = 4 - ((b2 >> 1) & 3)  # 1..3; (b2>>1)&3 == 0 is reserved
    if ver == 1 or ((b2 >> 1) & 3) == 0:
        return None
    br_idx = (b3 >> 4) & 0xF
    sr_idx = (b3 >> 2) & 3
    if br_idx in (0, 0xF) or sr_idx == 3:  # free-form/bad bitrate, bad rate
        return None
    pad = (b3 >> 1) & 1
    vgroup = 1 if ver == 3 else 2
    bitrate = _MP3_BITRATES[(vgroup, layer)][br_idx] * 1000
    rate = _MP3_RATES[ver][sr_idx]
    channels = 1 if ((b4 >> 6) & 3) == 3 else 2
    if layer == 1:
        samples = 384
        size = (12 * bitrate // rate + pad) * 4
    else:
        samples = 1152 if (layer == 2 or ver == 3) else 576
        size = samples // 8 * bitrate // rate + pad
    if size < 4:
        return None
    return size, samples, rate, channels


def _mp3_properties(data: bytes):
    """(duration_ms, sample_rate, channels) by walking MPEG audio frame
    headers — REAL header parsing (ID3v2 skip, per-frame size from the
    bitrate/rate/padding fields, so VBR durations are exact).  Sample
    DECODE (huffman + IMDCT) stays the honest compressed-audio seam."""
    pos = 0
    if data[:3] == b"ID3" and len(data) >= 10:
        # syncsafe 28-bit tag size
        sz = ((data[6] & 0x7F) << 21) | ((data[7] & 0x7F) << 14) \
            | ((data[8] & 0x7F) << 7) | (data[9] & 0x7F)
        pos = 10 + sz
    total_samples = 0
    rate = chans = None
    n = len(data)
    while pos + 4 <= n:
        frame = _mp3_frame(data, pos)
        if frame is None:
            if total_samples:
                break  # trailing garbage / ID3v1 after the last frame
            pos += 1   # resync: scan for the first valid header
            continue
        size, samples, r, c = frame
        total_samples += samples
        rate, chans = r, c
        pos += size
    if not total_samples or not rate:
        raise ValueError("no MPEG audio frames found")
    return int(total_samples * 1000 / rate), rate, chans


def media_metadata(df: DataFrame, id_col: str = "media_id",
                   blob_col: str = "blob") -> DataFrame:
    """binary column -> typed metadata rows (mapInPandas, Arrow batches)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[blob_col]):
                data = bytes(blob)
                fmt = _sniff_format(data)
                w = h = dur = rate = chans = None
                try:
                    if fmt == "wav":
                        dur, rate, chans = _wav_properties(data)
                    elif fmt == "mp3":
                        dur, rate, chans = _mp3_properties(data)
                    elif fmt == "gif":
                        w, h = _decode_dimensions(data)
                        # animated GIFs: duration from summed GCE frame
                        # delays (centiseconds); stills keep NULL.
                        # Structural walk only — metadata must never pay
                        # for an LZW decode of every frame.
                        n_imgs, delay_cs = _gif_scan_meta(data)
                        if n_imgs > 1:
                            dur = delay_cs * 10
                    elif fmt == "mp4":
                        dur = _mp4_duration_ms(data)
                    elif fmt == "avi":
                        dur, w, h = _avi_properties(data)
                    else:
                        w, h = _decode_dimensions(data)
                except (NotImplementedError, ValueError, struct.error,
                        IndexError, EOFError):
                    pass  # undecodable/truncated header -> NULL columns
                rows.append(
                    {
                        "media_id": str(mid),
                        "n_bytes": len(data),
                        "format": fmt,
                        "width": w,
                        "height": h,
                        "duration_ms": dur,
                        "sample_rate": rate,
                        "channels": chans,
                        "sha": hashlib.sha256(data).hexdigest(),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_META_SCHEMA])

    return df.mapInPandas(_extract, MEDIA_META_SCHEMA)


def sample_frames(df: DataFrame, every_n_bytes: int = 1024,
                  max_frames: int = 4, id_col: str = "media_id",
                  blob_col: str = "blob") -> DataFrame:
    """Frame sampling over media blobs, one input row -> up to K frame
    rows (binary payloads through Arrow).

    Round 4: PNG, GIF, and baseline-JPEG blobs are decoded FOR REAL
    (``decode_png_pixels`` / ``decode_gif_pixels`` /
    ``kernels/imagecodec.decode_jpeg_pixels``) and the frames are raw
    pixel bands — up to ``max_frames`` equal-height horizontal strips
    of the decoded ``uint8`` image, each ``rows x width x channels``
    bytes.  Undecodable blobs and formats without an in-container
    decoder (video) keep the deterministic byte-range stand-in so the
    Spark-side plumbing stays testable — replace ``_fake_frame`` with
    ffmpeg when available (the remaining marked seam).

    Round 5: every frame row carries a ``kind`` column ("pixels" /
    "audio" / "bytes") so the byte-range stand-ins are self-describing —
    a downstream consumer filters ``kind = 'pixels'`` instead of
    re-sniffing the blob to tell decoded bands from raw bytes."""

    def _fake_frame(data: bytes, i: int) -> bytes:
        start = i * every_n_bytes
        return data[start:start + every_n_bytes]

    def _frames(data: bytes) -> tuple[str, list[bytes]]:
        if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
            try:
                return "pixels", [
                    px.tobytes()
                    for px in decode_avi_mjpeg_frames(data, max_frames)
                ]
            except (NotImplementedError, ValueError, struct.error,
                    IndexError, EOFError):
                pass  # non-MJPEG codec -> byte-range stand-in below
        if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
            try:
                samples, _ = decode_wav_samples(data)
            except (NotImplementedError, ValueError, struct.error,
                    IndexError, EOFError):
                samples = None
            if samples is not None and len(samples):
                k = min(max_frames, len(samples))
                band = -(-len(samples) // k)
                return "audio", [
                    samples[i * band:(i + 1) * band].tobytes()
                    for i in range(k)
                    if samples[i * band:(i + 1) * band].size
                ]
        if data[:4] == b"GIF8":
            # animated GIF: temporal full-canvas frames (round 5); a
            # single-image GIF falls through to spatial bands below
            try:
                gframes = decode_gif_frames(data, max_frames)
            except (NotImplementedError, ValueError, struct.error,
                    IndexError, EOFError):
                gframes = []
            if len(gframes) > 1:
                return "pixels", [px.tobytes() for px in gframes]
        if (data[:8] == _PNG_SIG or data[:4] == b"GIF8"
                or data[:3] == b"\xff\xd8\xff"):
            try:
                px = decode_image_pixels(data)  # shared format dispatch
            except (NotImplementedError, ValueError, struct.error,
                    IndexError, EOFError):
                px = None
            if px is not None:
                h = px.shape[0]
                k = min(max_frames, h)
                band = -(-h // k)
                return "pixels", [
                    px[i * band:(i + 1) * band].tobytes()
                    for i in range(k)
                    if px[i * band:(i + 1) * band].size
                ]
        n = min(max_frames, max(1, len(data) // every_n_bytes))
        return "bytes", [_fake_frame(data, i) for i in range(n)]

    def _expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[blob_col]):
                data = bytes(blob)
                kind, frames = _frames(data)
                for i, frame in enumerate(frames):
                    rows.append(
                        {"media_id": str(mid), "frame_index": i,
                         "frame": frame, "kind": kind}
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA])

    return df.mapInPandas(_expand, FRAME_SCHEMA)
