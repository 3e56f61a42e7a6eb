"""Baseline JPEG codec for the multimodal plane — pure numpy + stdlib,
no PIL. The second compressed-format seam closed (PNG was DEFLATE +
filter prediction; JPEG adds entropy coding + transform coding):
ITU T.81 baseline sequential DCT, the format the bulk of a web-scraped
image corpus actually arrives in.

Supported profile: 8-bit baseline (SOF0), greyscale (1 component) or
YCbCr 4:4:4 (3 components, all sampling factors 1x1), standard Huffman
entropy coding with byte stuffing. Refused explicitly rather than
misread: progressive (SOF2), arithmetic coding, 12-bit precision,
subsampled chroma (2x1/2x2), restart markers.

Pipeline (encode): level shift -> 8x8 orthonormal FDCT (the matrix
form of T.81's Annex A equations) -> quantize -> zigzag -> DC DPCM +
AC run/size Huffman (Annex K.3 standard tables) -> stuffed entropy
stream inside SOI/APP0/DQT/SOF0/DHT/SOS/EOI markers. Decode is the
exact inverse.

Exactness note for the oracle-gated query: a greyscale image whose 8x8
blocks are each CONSTANT survives the round trip bit-for-bit when the
DC quantizer is 8 — FDCT of a flat block is DC-only with DC = 8*(v-128)
(orthonormal scaling), quantization divides by exactly 8, and the
IDCT reconstructs the flat block with zero error. So the gated decode
exercises the full marker/Huffman/dequant/IDCT path while the decoded
mean stays analytically derivable from the raster bytes.
"""

from __future__ import annotations

import struct

import numpy as np

# ---- constants: zigzag order and Annex K.3 standard Huffman tables ---------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# (BITS counts per code length 1..16, HUFFVAL symbol list) — T.81 K.3.1/K.3.2
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# flat quant table: DC step 8 (bit-exact flat blocks, see module doc),
# AC step 16 (mild) — a quality knob is out of scope, determinism is in
DEFAULT_QUANT = np.full(64, 16, dtype=np.int64)
DEFAULT_QUANT[0] = 8

_DCT = None


def _dct_matrix() -> np.ndarray:
    global _DCT
    if _DCT is None:
        k, n = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
        m = np.cos((2 * n + 1) * k * np.pi / 16) * np.sqrt(2 / 8)
        m[0, :] = np.sqrt(1 / 8)
        _DCT = m
    return _DCT


def _build_codes(bits, vals):
    """(BITS, HUFFVAL) -> {symbol: (code, length)} per T.81 C.2."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decode(bits, vals):
    """(BITS, HUFFVAL) -> {(length, code): symbol}."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.n -= 8

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # 1-pad per spec
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("entropy stream truncated")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                raise ValueError("unexpected marker inside entropy stream")
            self.pos += 1  # skip the stuffed 0x00
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (size, raw bits) per T.81 F.1.2.1 (negatives use
    one's-complement of the absolute value)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    raw = v if v >= 0 else v + (1 << size) - 1
    return size, raw


def _extend(raw: int, size: int) -> int:
    if size == 0:
        return 0
    if raw < (1 << (size - 1)):
        return raw - (1 << size) + 1
    return raw


def _quantize_blocks(plane: np.ndarray, quant: np.ndarray) -> np.ndarray:
    """All of a channel's 8x8 blocks FDCT'd + quantized in one
    vectorized pass: (bh, bw_, 8, 8) float plane -> (bh*bw_, 64) int64
    zigzag coefficients (row-major block order)."""
    m = _dct_matrix()
    bh, bw_ = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = (
        plane.reshape(bh, 8, bw_, 8).transpose(0, 2, 1, 3) - 128.0
    )  # (bh, bw_, 8, 8)
    coef = np.einsum("ij,xyjk,lk->xyil", m, blocks, m, optimize=True)
    zz = coef.reshape(bh * bw_, 64)[:, ZIGZAG]
    return np.round(zz / quant).astype(np.int64)


def _encode_block(q: np.ndarray, bw: _BitWriter, dc_codes, ac_codes,
                  pred: int) -> int:
    """Entropy-encode one quantized 64-coefficient block; returns the
    updated DC predictor."""
    size, raw = _magnitude(int(q[0]) - pred)
    pred = int(q[0])
    c, ln = dc_codes[size]
    bw.write(c, ln)
    if size:
        bw.write(raw, size)
    run = 0
    nz = np.nonzero(q[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for i in range(1, last + 1):
        v = int(q[i])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            c, ln = ac_codes[0xF0]  # ZRL
            bw.write(c, ln)
            run -= 16
        size, raw = _magnitude(v)
        c, ln = ac_codes[(run << 4) | size]
        bw.write(c, ln)
        bw.write(raw, size)
        run = 0
    if last < 63:
        c, ln = ac_codes[0x00]  # EOB
        bw.write(c, ln)
    return pred


def encode_jpeg(pixels: np.ndarray, quant: np.ndarray | None = None) -> bytes:
    """uint8 (H, W) -> greyscale baseline JPEG; (H, W, 3) RGB ->
    YCbCr 4:4:4 baseline JPEG. Dimensions are padded to block size by
    edge replication (decoder crops back via SOF dims)."""
    a = np.asarray(pixels, dtype=np.uint8)
    quant = DEFAULT_QUANT if quant is None else np.asarray(quant, np.int64)
    if a.ndim == 2:
        channels = [a.astype(np.float64)]
    elif a.ndim == 3 and a.shape[2] == 3:
        r, g, b = (a[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        channels = [y, cb, cr]
    else:
        raise ValueError(f"expected (H,W) or (H,W,3) uint8, got {a.shape}")
    h, w = a.shape[:2]
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8

    dc_codes = _build_codes(DC_BITS, DC_VALS)
    ac_codes = _build_codes(AC_BITS, AC_VALS)
    bw = _BitWriter()
    # FDCT + quantization vectorized over every block per channel; the
    # sequential part (DPCM + Huffman bit emission) is the only loop
    quantized = [
        _quantize_blocks(np.pad(ch, ((0, ph - h), (0, pw - w)), mode="edge"),
                         quant)
        for ch in channels
    ]
    # interleaved MCU = one 8x8 block per component (all factors 1x1)
    n_bx = pw // 8
    preds = [0] * len(channels)
    for by in range(ph // 8):
        for bx in range(n_bx):
            for ci, qblocks in enumerate(quantized):
                preds[ci] = _encode_block(
                    qblocks[by * n_bx + bx], bw, dc_codes, ac_codes, preds[ci]
                )
    entropy = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    ncomp = len(channels)
    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, bytes([0]) + bytes(int(quant[i]) for i in range(64)))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0])  # id, 1x1 sampling, quant table 0
    out += seg(0xFFC0, sof)
    out += seg(0xFFC4, bytes([0x00] + DC_BITS) + bytes(DC_VALS))
    out += seg(0xFFC4, bytes([0x10] + AC_BITS) + bytes(AC_VALS))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])  # DC table 0 / AC table 0
    sos += bytes([0, 63, 0])
    out += seg(0xFFDA, sos)
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG -> (H, W) uint8 or (H, W, 3) uint8 RGB. Raises
    ``ValueError`` outside the supported profile."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError(f"not a JPEG: no SOI ({payload[:2]!r})")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    dc_dec: dict[int, dict] = {}
    ac_dec: dict[int, dict] = {}
    sof = None
    comps = None
    scan = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI without SOS
            break
        (length,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + length]
        if len(body) != length - 2:
            raise ValueError("truncated segment")
        pos += 2 + length
        if marker == 0xDB:  # DQT (8-bit tables only)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                quant[tq] = np.frombuffer(
                    body[i + 1 : i + 65], np.uint8
                ).astype(np.int64)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                (dc_dec if tc == 0 else ac_dec)[th] = _build_decode(bits, vals)
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError(f"{prec}-bit precision unsupported")
            comps = []
            for ci in range(nc):
                cid, samp, tq = body[6 + 3 * ci : 9 + 3 * ci]
                if samp != 0x11:
                    raise ValueError(
                        "subsampled chroma unsupported (4:4:4 only)"
                    )
                comps.append((cid, tq))
            sof = (h, w, nc)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"only baseline SOF0 supported (got SOF marker {marker:#x})"
            )
        elif marker == 0xDD:
            raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            scan = [(body[1 + 2 * i], body[2 + 2 * i]) for i in range(ns)]
            break
        # APPn / COM / others: skipped
    if sof is None or scan is None:
        raise ValueError("missing SOF0/SOS")
    h, w, nc = sof
    # entropy data runs until the EOI marker (stuffed FF00 stays)
    end = payload.rfind(b"\xff\xd9")
    if end < 0:
        raise ValueError("missing EOI")
    br = _BitReader(payload[pos:end])
    m = _dct_matrix()
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    planes = [np.zeros((ph, pw), np.float64) for _ in range(nc)]
    preds = [0] * nc

    def huff(table) -> int:
        code, length = 0, 0
        for _ in range(16):
            code = (code << 1) | br.bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    for by in range(ph // 8):
        for bx in range(pw // 8):
            for ci in range(nc):
                _cid, dcid_acid = scan[ci]
                dct_t = dc_dec[dcid_acid >> 4]
                act = ac_dec[dcid_acid & 0xF]
                q = quant[comps[ci][1]]
                zz = np.zeros(64, np.int64)
                size = huff(dct_t)
                preds[ci] += _extend(br.bits(size), size)
                zz[0] = preds[ci]
                k = 1
                while k < 64:
                    rs = huff(act)
                    if rs == 0x00:  # EOB
                        break
                    run, size = rs >> 4, rs & 0xF
                    if size == 0:
                        if run != 15:
                            raise ValueError("bad AC run/size")
                        k += 16  # ZRL
                        continue
                    k += run
                    if k > 63:
                        raise ValueError("AC coefficient index overflow")
                    zz[k] = _extend(br.bits(size), size)
                    k += 1
                coef = np.zeros(64, np.float64)
                coef[ZIGZAG] = zz * q
                blk = m.T @ coef.reshape(8, 8) @ m + 128.0
                planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = blk
    planes = [p[:h, :w] for p in planes]
    if nc == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    if nc == 3:
        y, cb, cr = planes
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgb = np.stack([r, g, b], axis=-1)
        return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    raise ValueError(f"{nc}-component scans unsupported")


def jpeg_image_decoder(payload: bytes) -> dict:
    """Drop-in ``decoder`` for
    :func:`levi_spark.operators.multimodal.decode_image_features`."""
    a = decode_jpeg(payload)
    h, w = a.shape[:2]
    px = a.astype(np.float64)
    mean = float(px.mean())
    return {
        "width": w,
        "height": h,
        "mean_pixel": mean,
        "mean_abs_dev": float(np.abs(px - mean).mean()),
    }
