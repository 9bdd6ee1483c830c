"""Pure-stdlib baseline JPEG codec (numpy only) — the dominant real-corpus
image format, decodable without PIL just like png.py.

Decoder: baseline sequential DCT (SOF0), 8-bit, grayscale or YCbCr with
arbitrary sampling factors (4:4:4 / 4:2:0 / 4:2:2 all handled by the
generic MCU layout), restart markers, byte unstuffing, Huffman tables
from the stream's own DHT segments. Progressive (SOF2) and arithmetic
coding raise ValueError — fail loudly, never garbage pixels.

Encoder: baseline 4:4:4 (or single-component grayscale) with
quality-scaled quantization and standard-shaped Huffman tables. The
tables are EMITTED in DQT/DHT, so round-trip correctness depends only on
the marker/entropy-coding logic, not on matching Annex K constants
bit-for-bit; the decoder is additionally validated against real JPEGs
produced by external encoders (tests/test_jpeg.py).

Reference analog: the PIL ingest boundary (``utils.py:30-46``) accepted
any PIL-decodable format; png.decode_image_rgb dispatches PNG/JPEG by
magic bytes so ``decode="real"`` covers both.

Scale note: decode runs inside Arrow-batched ``mapInPandas`` workers
(multimodal.py). The entropy decode is a per-symbol Python loop (Huffman
is inherently sequential); the DCT/color math is vectorized numpy. For
10^12-image corpora the per-image cost is the irreducible codec work and
parallelism is per-row.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])

# orthonormal 1-D DCT-II matrix; IDCT(B) = A.T @ B @ A, DCT(b) = A @ b @ A.T
_A = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _A[_k, _n] = 0.5 * np.cos((2 * _n + 1) * _k * np.pi / 16.0)
_A[0, :] = 1.0 / (2.0 * np.sqrt(2.0))

# base luminance/chrominance quant tables (the widely-published JPEG
# example tables; emitted in DQT, so exact values are a quality choice,
# not a compatibility requirement)
_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32)
_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32)


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((q * s + 50) // 100, 1, 255).astype(np.int32)


# ---------------------------------------------------------------------------
# Huffman
# ---------------------------------------------------------------------------

def _build_codes(bits: list[int], vals: list[int]) -> dict:
    """(length, code) -> symbol, canonical JPEG assignment."""
    codes = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[(ln, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return codes


class _BitReader:
    """MSB-first reader over the entropy-coded segment with 0xFF00
    unstuffing; stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bit = 0
        self.marker = None          # set when a marker terminates the scan

    def _next_byte(self) -> int | None:
        d = self.data
        while True:
            if self.pos >= len(d):
                return None
            b = d[self.pos]
            if b != 0xFF:
                self.pos += 1
                return b
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
                return 0xFF
            self.marker = 0xFF00 | nxt
            return None

    def read_bit(self) -> int:
        if self.bit == 0:
            b = self._next_byte()
            if b is None:
                # past the marker: JPEG pads with 1-bits
                self.cur = 0xFF if self.marker else 0
                if self.marker is None:
                    raise ValueError("truncated entropy data")
            else:
                self.cur = b
            self.bit = 8
        self.bit -= 1
        return (self.cur >> self.bit) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode(self, codes: dict) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = codes.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy stream")

    def align_and_expect_rst(self, n: int) -> None:
        """Byte-align and consume the RSTn marker between restart
        intervals — the modulo-8 sequence number is VALIDATED (a dropped
        or extra restart must fail loudly, not resync the remaining MCUs
        to the wrong offset)."""
        self.bit = 0
        d = self.data
        p = self.pos
        if p < len(d) and d[p] != 0xFF:
            raise ValueError("expected restart marker, found entropy data")
        while p + 1 < len(d) and d[p] == 0xFF and d[p + 1] == 0xFF:
            p += 1                               # legal fill bytes
        if p + 1 >= len(d) or d[p] != 0xFF:
            raise ValueError("missing restart marker")
        expect = 0xD0 + (n % 8)
        if d[p + 1] != expect:
            raise ValueError(
                f"restart marker out of sequence: expected "
                f"0xFF{expect:02X}, found 0xFF{d[p + 1]:02X}")
        self.pos = p + 2
        self.marker = None


def _extend(v: int, t: int) -> int:
    """RECEIVE/EXTEND: map t raw bits to the signed coefficient."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG bytes -> (H, W, C) uint8, C = 1 (gray) or 3 (RGB)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}     # (class, id) -> codes
    frame = None
    restart_interval = 0
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        # any number of 0xFF fill bytes may precede a marker (T.81 B.1.1.2)
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        if marker == 0xD9:                      # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:   # TEM/RSTn: standalone
            pos += 2
            continue
        (seg_len,) = struct.unpack(">H", data[pos + 2:pos + 4])
        body = data[pos + 4:pos + 2 + seg_len]
        pos_next = pos + 2 + seg_len
        if marker == 0xDB:                      # DQT
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0x0F
                i += 1
                if prec == 0:
                    tbl = np.frombuffer(body[i:i + 64], dtype=np.uint8) \
                        .astype(np.int32)
                    i += 64
                else:
                    tbl = np.frombuffer(body[i:i + 128], dtype=">u2") \
                        .astype(np.int32)
                    i += 128
                qt[tid] = tbl
        elif marker in (0xC0, 0xC1):            # SOF0/SOF1 baseline
            prec, h, w, nc = body[0], *struct.unpack(">HH", body[1:5]), body[5]
            if prec != 8:
                raise ValueError(f"unsupported sample precision {prec}")
            if nc not in (1, 3):
                raise ValueError(
                    f"unsupported component count {nc} (grayscale or "
                    f"YCbCr only — CMYK/YCCK would decode as garbage)")
            comps = []
            for c in range(nc):
                cid, samp, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0x0F,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline sequential JPEG (SOF0/SOF1) is supported "
                f"(got SOF marker 0xFF{marker:02X} — progressive/arithmetic)")
        elif marker == 0xC4:                    # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1:i + 17])
                n = sum(bits)
                vals = list(body[i + 17:i + 17 + n])
                huff[(tc, th)] = _build_codes(bits, vals)
                i += 17 + n
        elif marker == 0xDD:                    # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:                    # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            if ns != len(frame["comps"]):
                raise ValueError(
                    f"non-interleaved scan ({ns} of {len(frame['comps'])} "
                    f"components) not supported — the single-scan "
                    f"interleaved MCU layout is assumed")
            scan = []
            for c in range(ns):
                cs, tds = body[1 + 2 * c], body[2 + 2 * c]
                comp = next((x for x in frame["comps"] if x["id"] == cs),
                            None)
                if comp is None:
                    raise ValueError(
                        f"SOS references component id {cs} absent from SOF")
                scan.append({**comp, "dc": tds >> 4, "ac": tds & 0x0F})
            return _decode_scan(data, pos_next, frame, scan, qt, huff,
                                restart_interval)
        pos = pos_next
    raise ValueError("no SOS marker found")


def _decode_scan(data, pos, frame, scan, qt, huff, restart_interval):
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    for c in scan:
        c["plane"] = np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8))
        c["pred"] = 0
        if c["tq"] not in qt:
            raise ValueError(f"missing quant table {c['tq']}")

    rd = _BitReader(data, pos)
    n_mcu = mcus_x * mcus_y
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            rd.align_and_expect_rst(m // restart_interval - 1)
            for c in scan:
                c["pred"] = 0
        my, mx = divmod(m, mcus_x)
        for c in scan:
            dq = qt[c["tq"]]
            dc_codes = huff.get((0, c["dc"]))
            ac_codes = huff.get((1, c["ac"]))
            if dc_codes is None or ac_codes is None:
                raise ValueError("missing Huffman table for scan component")
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    zz = np.zeros(64, dtype=np.int32)
                    t = rd.decode(dc_codes)
                    diff = _extend(rd.read_bits(t), t)
                    c["pred"] += diff
                    zz[0] = c["pred"]
                    k = 1
                    while k < 64:
                        rs = rd.decode(ac_codes)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:         # ZRL: 16 zeros
                                k += 16
                                continue
                            break               # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC run past block end")
                        zz[k] = _extend(rd.read_bits(s), s)
                        k += 1
                    block = np.zeros(64)
                    block[ZIGZAG] = zz * dq
                    px = _A.T @ block.reshape(8, 8) @ _A + 128.0
                    y0 = (my * c["v"] + by) * 8
                    x0 = (mx * c["h"] + bx) * 8
                    c["plane"][y0:y0 + 8, x0:x0 + 8] = px

    planes = []
    for c in scan:
        p = c["plane"]
        if c["h"] < hmax or c["v"] < vmax:      # chroma upsample (replicate)
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        planes.append(p[:h, :w])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)[:, :, None]
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encode (baseline, 4:4:4 / grayscale)
# ---------------------------------------------------------------------------

def _default_huff(component: str, kind: str) -> tuple[list[int], list[int]]:
    """Simple complete Huffman tables. DC: symbols 0..11 at fixed lengths;
    AC: all 256 run/size symbols enumerated. Not optimal-length coding —
    emitted in DHT, so any complete prefix code is valid JPEG."""
    if kind == "dc":
        bits = [0] * 16
        vals = list(range(12))
        bits[3] = 12         # 12 DC size symbols, all code length 4 (2^4>=12)
        return bits, vals
    # AC: every (run 0-15, size 1-10) symbol plus EOB (0x00) and ZRL
    # (0xF0) = 162 symbols, all code length 9 (2^9 = 512 >= 162)
    vals = []
    for r in range(16):
        for s in range(11):
            if s == 0 and r not in (0, 15):
                continue
            vals.append((r << 4) | s)
    bits = [0] * 16
    bits[8] = len(vals)
    return bits, vals


def encode_jpeg(arr: np.ndarray, quality: int = 90) -> bytes:
    """(H, W), (H, W, 1) or (H, W, 3) uint8 -> baseline JPEG bytes
    (4:4:4, restart-free). Lossy: round-trip PSNR, not equality."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, nc = a.shape
    if nc not in (1, 3):
        raise ValueError("encode_jpeg expects 1 or 3 channels")
    if not (1 <= h <= 65535 and 1 <= w <= 65535):
        raise ValueError(
            f"image dimensions {h}x{w} outside JPEG's 1..65535 range")
    ql = _quality_scale(_Q_LUMA, quality)
    qc = _quality_scale(_Q_CHROMA, quality)

    if nc == 3:
        rf = a[:, :, 0].astype(np.float64)
        gf = a[:, :, 1].astype(np.float64)
        bf = a[:, :, 2].astype(np.float64)
        y = 0.299 * rf + 0.587 * gf + 0.114 * bf
        cb = -0.168736 * rf - 0.331264 * gf + 0.5 * bf + 128.0
        cr = 0.5 * rf - 0.418688 * gf - 0.081312 * bf + 128.0
        comps = [(y, 0, ql), (cb, 1, qc), (cr, 1, qc)]
    else:
        comps = [(a[:, :, 0].astype(np.float64), 0, ql)]

    dc_bits, dc_vals = _default_huff("luma", "dc")
    ac_bits, ac_vals = _default_huff("luma", "ac")
    dc_codes = {v: k for k, v in _build_codes(dc_bits, dc_vals).items()}
    ac_codes = {v: k for k, v in _build_codes(ac_bits, ac_vals).items()}

    # pad planes to multiples of 8 (edge replicate)
    bh, bw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    out_bits: list[tuple[int, int]] = []   # (length, code)

    def emit(ln, code):
        out_bits.append((ln, code))

    def emit_coef(v):
        t = 0 if v == 0 else int(v if v > 0 else -v).bit_length()
        raw = v if v >= 0 else v + (1 << t) - 1
        return t, raw

    padded = []
    for plane, _tq, q in comps:
        p = np.empty((bh, bw))
        p[:h, :w] = plane
        p[h:, :w] = plane[-1:, :]
        p[:h, w:] = p[:h, w - 1:w]
        p[h:, w:] = p[h - 1, w - 1]
        padded.append((p, q.astype(np.float64).reshape(8, 8)))

    # baseline multi-component scans are INTERLEAVED: each MCU (one 8x8
    # block per component at 4:4:4) carries Y, Cb, Cr in order; DC
    # predictors are per component
    preds = [0] * len(comps)
    for y0 in range(0, bh, 8):
        for x0 in range(0, bw, 8):
            for ci, (p, qm) in enumerate(padded):
                blk = p[y0:y0 + 8, x0:x0 + 8] - 128.0
                coef = _A @ blk @ _A.T
                zq = np.round(coef / qm).astype(np.int32)
                zz = zq.reshape(-1)[ZIGZAG]
                diff = int(zz[0]) - preds[ci]
                preds[ci] = int(zz[0])
                t, raw = emit_coef(diff)
                ln, code = dc_codes[t]
                emit(ln, code)
                if t:
                    emit(t, raw)
                nz = np.nonzero(zz[1:])[0]
                k = 1
                for idx in nz:
                    pos_ = int(idx) + 1
                    run = pos_ - k
                    while run > 15:
                        ln, code = ac_codes[0xF0]
                        emit(ln, code)
                        run -= 16
                    v = int(zz[pos_])
                    t, raw = emit_coef(v)
                    ln, code = ac_codes[(run << 4) | t]
                    emit(ln, code)
                    emit(t, raw)
                    k = pos_ + 1
                if k < 64:
                    ln, code = ac_codes[0x00]   # EOB
                    emit(ln, code)

    # pack bits with 0xFF stuffing
    buf = bytearray()
    acc = 0
    nb = 0
    for ln, code in out_bits:
        acc = (acc << ln) | (code & ((1 << ln) - 1))
        nb += ln
        while nb >= 8:
            nb -= 8
            byte = (acc >> nb) & 0xFF
            buf.append(byte)
            if byte == 0xFF:
                buf.append(0x00)
        # keep only the undrained low bits: without this mask acc grows
        # into an O(output-size) bigint and packing turns quadratic
        acc &= (1 << nb) - 1
    if nb:
        byte = ((acc << (8 - nb)) | ((1 << (8 - nb)) - 1)) & 0xFF
        buf.append(byte)
        if byte == 0xFF:
            buf.append(0x00)

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def dqt(tid, q):
        # DQT stores the 64 values in ZIGZAG order (the base tables here
        # are raster matrices)
        return seg(0xDB, bytes([tid])
                   + bytes(int(q[ZIGZAG[i]]) for i in range(64)))

    def dht(tc, th, bits, vals):
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    sof_comps = b""
    sos_comps = b""
    for ci, (_p, tq, _q) in enumerate(comps):
        sof_comps += bytes([ci + 1, 0x11, tq])          # 4:4:4
        sos_comps += bytes([ci + 1, 0x00])              # dc/ac table 0
    sof = seg(0xC0, bytes([8]) + struct.pack(">HH", h, w)
              + bytes([len(comps)]) + sof_comps)
    sos = seg(0xDA, bytes([len(comps)]) + sos_comps + bytes([0, 63, 0]))
    out = (b"\xff\xd8" + dqt(0, ql)
           + (dqt(1, qc) if nc == 3 else b"")
           + sof + dht(0, 0, dc_bits, dc_vals) + dht(1, 0, ac_bits, ac_vals)
           + sos + bytes(buf) + b"\xff\xd9")
    return out


def decode_rgb(data: bytes) -> dict:
    """JPEG bytes -> planar float RGB in [0,1] (pil_image_to_image_rgb
    contract, same shape as png.decode_rgb)."""
    px = decode_jpeg(data)
    if px.shape[2] == 1:
        r = g = b = px[:, :, 0]
    else:
        r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
    scale = 1.0 / 255.0
    return {"r": r.astype(np.float64) * scale,
            "g": g.astype(np.float64) * scale,
            "b": b.astype(np.float64) * scale,
            "height": px.shape[0], "width": px.shape[1]}
