"""Baseline JPEG decoder — pure python + numpy, no image library.

Round 4: closes the JPEG leg of the multimodal pixel seam
(operators/multimodal.py).  Scope: baseline sequential DCT JPEGs
(SOF0), the overwhelming web majority — huffman entropy decode,
dequantize, float IDCT, chroma upsampling for arbitrary sampling
factors (4:4:4 / 4:2:2 / 4:2:0), restart markers, JFIF YCbCr -> RGB.
Progressive (SOF2) and arithmetic-coded JPEGs raise
``NotImplementedError`` — the honest remaining seam, marked where the
frame type is dispatched.

No reference counterpart: the reference processes documents only
(Services/FileProcessingService.cs:28-37 allowlists .txt/.md/.pdf/
.docx); this is builder's-brief multimodal surface.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# orthonormal DCT-II basis: IDCT(B) = C.T @ B @ C
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * _k * (2 * _n + 1) / 16) * (
            np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8)
        )


class _HuffTable:
    """Canonical JPEG huffman table as a flat (code -> symbol) dict
    keyed by (length, code) — simple and fast enough for a kernel."""

    def __init__(self, bits: list[int], vals: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    byte-unstuffing; stops at any real marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # restart marker: caller resyncs
                raise _RestartMarker()
            else:
                raise EOFError("marker inside entropy stream")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table: _HuffTable) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid huffman code")

    def resync(self) -> None:
        """Skip to just past the next restart marker, drop partial bits."""
        self.acc = 0
        self.nbits = 0
        while True:
            if (self.data[self.pos] == 0xFF
                    and 0xD0 <= self.data[self.pos + 1] <= 0xD7):
                self.pos += 2
                return
            self.pos += 1


class _RestartMarker(Exception):
    pass


def _extend(v: int, size: int) -> int:
    """JPEG sign extension (F.2.2.1): ``size``-bit magnitude to value."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg_pixels(data: bytes):
    """Decode a baseline JPEG to uint8[h, w, 3] RGB (or [h, w, 1] for
    grayscale scans)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    frame = None
    restart_interval = 0
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        seg_len = struct.unpack(">H", data[pos + 2:pos + 4])[0]
        body = data[pos + 4:pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                i += 1
                if pq:
                    tbl = np.frombuffer(body[i:i + 128], dtype=">u2").astype(np.float64)
                    i += 128
                else:
                    tbl = np.frombuffer(body[i:i + 64], dtype=np.uint8).astype(np.float64)
                    i += 64
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 15
                bits = list(body[i + 1:i + 17])
                nv = sum(bits)
                vals = body[i + 17:i + 17 + nv]
                (huff_ac if tc else huff_dc)[th] = _HuffTable(bits, vals)
                i += 17 + nv
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1: baseline/extended seq
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit precision supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential JPEG (SOF0/1) supported"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows the header
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                comp = next(
                    (x for x in frame["comps"] if x["id"] == cs), None
                )
                if comp is None:  # corrupt SOS: unknown component id
                    raise ValueError(f"scan references component {cs}")
                scan.append((comp, tt >> 4, tt & 15))
            return _decode_scan(
                data, pos + 2 + seg_len, frame, scan, qt,
                huff_dc, huff_ac, restart_interval,
            )
        elif marker == 0xD9:
            break
        pos += 2 + seg_len
    raise ValueError("no scan found")


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac, restart):
    for comp, tdc, tac in scan:  # corrupt streams reference ghost tables
        if tdc not in huff_dc or tac not in huff_ac or comp["tq"] not in qt:
            raise ValueError("scan references an undeclared table")
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = {}
    for comp, _, _ in scan:
        planes[comp["id"]] = np.zeros(
            (mcus_y * comp["v"] * 8, mcus_x * comp["h"] * 8)
        )
    reader = _BitReader(data, pos)
    pred = {comp["id"]: 0 for comp, _, _ in scan}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and mcu_count and mcu_count % restart == 0:
                reader.resync()
                pred = {k: 0 for k in pred}
            try:
                for comp, tdc, tac in scan:
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            blk = _decode_block(
                                reader, huff_dc[tdc], huff_ac[tac],
                                qt[comp["tq"]], pred, comp["id"],
                            )
                            y0 = (my * comp["v"] + by) * 8
                            x0 = (mx * comp["h"] + bx) * 8
                            planes[comp["id"]][y0:y0 + 8, x0:x0 + 8] = blk
            except _RestartMarker:
                raise ValueError("unexpected restart marker") from None
            mcu_count += 1
    # upsample each plane to full resolution, crop, color-convert
    out = []
    for comp, _, _ in scan:
        p = planes[comp["id"]]
        if comp["h"] != hmax or comp["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // comp["v"], axis=0),
                          hmax // comp["h"], axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        y = np.clip(out[0] + 128.0, 0, 255)
        return y.astype(np.uint8)[:, :, None]
    y, cb, cr = out[0] + 128.0, out[1], out[2]
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _decode_block(reader, dc_tbl, ac_tbl, q, pred, cid):
    coef = np.zeros(64)
    size = reader.huff(dc_tbl)
    diff = _extend(reader.bits(size), size) if size else 0
    pred[cid] += diff
    coef[0] = pred[cid]
    k = 1
    while k < 64:
        rs = reader.huff(ac_tbl)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:
                k += 16  # ZRL
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC index out of range")
        coef[k] = _extend(reader.bits(s), s)
        k += 1
    block = np.zeros(64)
    block[ZIGZAG] = coef * q
    return _C.T @ block.reshape(8, 8) @ _C
