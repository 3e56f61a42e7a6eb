"""Baseline JPEG codec for the multimodal plane — pure numpy + stdlib,
no PIL. The second compressed-format seam closed (PNG was DEFLATE +
filter prediction; JPEG adds entropy coding + transform coding):
ITU T.81 baseline sequential DCT, the format the bulk of a web-scraped
image corpus actually arrives in.

Supported profile: 8-bit baseline (SOF0), greyscale (1 component) or
YCbCr with per-component sampling factors 1 or 2 — 4:4:4, 4:2:2,
4:4:0 and 4:2:0 all decode through the generic interleaved-MCU loop
(chroma upsampled by replication); the encoder emits 4:4:4 or 4:2:0
(2x2-mean downsampled chroma). Standard Huffman entropy coding with
byte stuffing; DRI/RST0-7 restart intervals (per-segment DC reset, the
error-resilience structure camera JPEGs carry) on both encode and
decode. Progressive (SOF2) decodes both spectral selection and
successive approximation. Refused explicitly rather than misread:
arithmetic coding, 12-bit precision, sampling factors above 2,
restarts inside progressive scans.

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

    def restart(self, n: int) -> None:
        """Close the current entropy segment (1-pad to the byte edge)
        and emit the RSTn marker — raw, never byte-stuffed."""
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)
        self.out += bytes([0xFF, 0xD0 + n])

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

    def sync_restart(self, expected: int) -> None:
        """Consume an RSTn marker at an MCU-row restart boundary:
        discard pad bits to the byte edge, check FF D0+expected."""
        self.acc = 0
        self.n = 0
        if self.pos + 2 > len(self.data):
            raise ValueError("entropy stream ends before restart marker")
        m0, m1 = self.data[self.pos], self.data[self.pos + 1]
        if m0 != 0xFF or m1 != 0xD0 + expected:
            raise ValueError(
                f"expected restart marker RST{expected} at byte {self.pos}, "
                f"got {m0:#04x}{m1:02x}"
            )
        self.pos += 2

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


def encode_jpeg(
    pixels: np.ndarray,
    quant: np.ndarray | None = None,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """uint8 (H, W) -> greyscale baseline JPEG; (H, W, 3) RGB ->
    YCbCr baseline JPEG, 4:4:4 or (``subsampling="420"``) 4:2:0 with
    2x2-mean chroma downsampling. Dimensions are padded to MCU size by
    edge replication (decoder crops back via SOF dims).
    ``restart_interval > 0`` emits a DRI segment and RST0-7 markers
    every that many MCUs (DC predictors reset per segment) — the
    error-resilience structure camera JPEGs carry."""
    a = np.asarray(pixels, dtype=np.uint8)
    quant = DEFAULT_QUANT if quant is None else np.asarray(quant, np.int64)
    # luma (h, v) sampling factors per mode; chroma is always 1x1
    luma_samp = {"444": (1, 1), "420": (2, 2), "422": (2, 1), "440": (1, 2)}
    if subsampling not in luma_samp:
        raise ValueError(
            f"subsampling must be one of {sorted(luma_samp)}, got {subsampling}"
        )
    if a.ndim == 2:
        channels = [a.astype(np.float64)]
        samps = [(1, 1)]  # greyscale has nothing to subsample
    elif a.ndim == 3 and a.shape[2] == 3:
        r, g, b = (a[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        channels = [y, cb, cr]
        samps = [luma_samp[subsampling], (1, 1), (1, 1)]
    else:
        raise ValueError(f"expected (H,W) or (H,W,3) uint8, got {a.shape}")
    h, w = a.shape[:2]
    return _encode_baseline(channels, samps, h, w, quant,
                            restart_interval=restart_interval)


def encode_jpeg_ycbcr(
    planes: np.ndarray,
    quant: np.ndarray | None = None,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """(H, W, 3) float64 **pre-separated Y/Cb/Cr planes at full
    resolution** -> baseline JPEG. Same pipeline as :func:`encode_jpeg`
    minus the RGB color transform — the encoder still does the
    2x2-mean chroma downsample, FDCT, quantization and entropy coding.
    Exists because integer-RGB inputs cannot hit exact chroma-plane
    targets through the float color transform: an analytic fixture
    that wants a chroma AC coefficient to survive quantization exactly
    (the nonzero-chroma 4:2:0 gate) must author Cb/Cr directly, like
    any libjpeg user passing JCS_YCbCr raw data."""
    a = np.asarray(planes, dtype=np.float64)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected (H,W,3) Y/Cb/Cr planes, got {a.shape}")
    quant = DEFAULT_QUANT if quant is None else np.asarray(quant, np.int64)
    luma_samp = {"444": (1, 1), "420": (2, 2), "422": (2, 1), "440": (1, 2)}
    if subsampling not in luma_samp:
        raise ValueError(
            f"subsampling must be one of {sorted(luma_samp)}, got {subsampling}"
        )
    channels = [a[..., 0], a[..., 1], a[..., 2]]
    samps = [luma_samp[subsampling], (1, 1), (1, 1)]
    h, w = a.shape[:2]
    return _encode_baseline(channels, samps, h, w, quant,
                            restart_interval=restart_interval)


def _encode_baseline(channels, samps, h, w, quant,
                     restart_interval: int = 0) -> bytes:
    """Shared baseline-JPEG body: pad/downsample/FDCT/quantize each
    channel, interleave MCUs, wrap in markers."""
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mx, my = -(-w // mcu_w), -(-h // mcu_h)

    dc_codes = _build_codes(DC_BITS, DC_VALS)
    ac_codes = _build_codes(AC_BITS, AC_VALS)
    bw = _BitWriter()
    # per component: pad to MCU grid at full res, downsample by block
    # mean to its sampling resolution, FDCT+quantize every block
    quantized = []
    comp_bx = []
    for ch, (sh, sv) in zip(channels, samps):
        full = np.pad(ch, ((0, my * mcu_h - h), (0, mx * mcu_w - w)),
                      mode="edge")
        fy, fx = vmax // sv, hmax // sh  # downsample factors
        if fy > 1 or fx > 1:
            plane = full.reshape(
                full.shape[0] // fy, fy, full.shape[1] // fx, fx
            ).mean(axis=(1, 3))
        else:
            plane = full
        quantized.append(_quantize_blocks(plane, quant))
        comp_bx.append(plane.shape[1] // 8)
    # interleaved MCUs: per component, sv x sh blocks in raster order
    preds = [0] * len(channels)
    mcu_i = 0
    for myi in range(my):
        for mxi in range(mx):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                bw.restart((mcu_i // restart_interval - 1) % 8)
                preds = [0] * len(channels)  # DC DPCM resets per segment
            mcu_i += 1
            for ci, qblocks in enumerate(quantized):
                sh, sv = samps[ci]
                for dy in range(sv):
                    for dx in range(sh):
                        bi = (myi * sv + dy) * comp_bx[ci] + (mxi * sh + dx)
                        preds[ci] = _encode_block(
                            qblocks[bi], bw, dc_codes, ac_codes, preds[ci]
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
        sh, sv = samps[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, 0])  # id, sampling, quant 0
    out += seg(0xFFC0, sof)
    out += seg(0xFFC4, bytes([0x00] + DC_BITS) + bytes(DC_VALS))
    out += seg(0xFFC4, bytes([0x10] + AC_BITS) + bytes(AC_VALS))
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
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
    restart_interval = 0
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
                sh, sv = samp >> 4, samp & 0xF
                if not (1 <= sh <= 2 and 1 <= sv <= 2):
                    raise ValueError(
                        f"sampling factors above 2 unsupported ({sh}x{sv})"
                    )
                comps.append((cid, tq, sh, sv))
            sof = (h, w, nc)
        elif marker == 0xC2:  # SOF2 progressive
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError(f"{prec}-bit precision unsupported")
            if nc != 1:
                raise ValueError(
                    "multi-component progressive unsupported (greyscale only)"
                )
            comps = [(body[6], body[8], 1, 1)]
            return _decode_progressive(payload, pos, (h, w), comps, quant,
                                       dc_dec, ac_dec)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"only baseline SOF0 / progressive SOF2 supported "
                f"(got SOF marker {marker:#x})"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
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
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mx, my = -(-w // mcu_w), -(-h // mcu_h)
    # per-component plane at ITS sampling resolution, padded to the
    # MCU grid; upsampled by replication after entropy decode
    planes = [
        np.zeros((my * comps[ci][3] * 8, mx * comps[ci][2] * 8), np.float64)
        for ci in range(nc)
    ]
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

    def read_block(ci: int) -> np.ndarray:
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
        return m.T @ coef.reshape(8, 8) @ m + 128.0

    mcu_i = 0
    for myi in range(my):
        for mxi in range(mx):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                br.sync_restart((mcu_i // restart_interval - 1) % 8)
                for ci in range(nc):
                    preds[ci] = 0  # DC DPCM resets per restart segment
            mcu_i += 1
            for ci in range(nc):
                sh, sv = comps[ci][2], comps[ci][3]
                for dy in range(sv):
                    for dx in range(sh):
                        by, bx = myi * sv + dy, mxi * sh + dx
                        planes[ci][
                            by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8
                        ] = read_block(ci)
    # replication upsample to full resolution, then crop to SOF dims
    up = []
    for ci in range(nc):
        sh, sv = comps[ci][2], comps[ci][3]
        p = planes[ci]
        if sv < vmax:
            p = np.repeat(p, vmax // sv, axis=0)
        if sh < hmax:
            p = np.repeat(p, hmax // sh, axis=1)
        up.append(p[:h, :w])
    planes = up
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


# custom AC Huffman table for progressive scans: the Annex-K baseline
# AC table has no EOBn (n>=1) symbols, so progressive streams need
# their own DHT. All plausible symbols at a flat 8-bit code length —
# canonical, prefix-free (176 < 256 codes), decoder-agnostic.
PROG_AC_VALS = sorted(
    [(n << 4) for n in range(15)]  # EOB0..EOB14
    + [0xF0]  # ZRL
    + [(run << 4) | size for run in range(16) for size in range(1, 11)]
)
PROG_AC_BITS = [0] * 16
PROG_AC_BITS[7] = len(PROG_AC_VALS)  # every symbol at length 8


def _decode_progressive(payload, pos, hw, comps, quant, dc_dec, ac_dec):
    """Progressive decode (greyscale): accumulate zigzag coefficients
    across scans, then dequant + IDCT once. Handles both progressive
    dimensions of T.81 Annex G — spectral selection (per-scan Ss..Se
    bands) AND successive approximation (Ah/Al bit-plane refinement:
    first scans carry coefficients at reduced precision ``>> Al``,
    refinement scans add one magnitude bit each via raw DC bits and
    the G.2 AC correction-bit algorithm with EOBRUN spans)."""
    h, w = hw
    bh, bw_ = -(-h // 8), -(-w // 8)
    nblocks = bh * bw_
    zz = np.zeros((nblocks, 64), np.int64)
    seen_dc = False

    def entropy_end(p: int) -> int:
        while True:
            nxt = payload.index(b"\xff", p)
            m = payload[nxt + 1]
            if m == 0x00:
                p = nxt + 2
                continue
            if 0xD0 <= m <= 0xD7:
                raise ValueError("restart markers unsupported")
            return nxt

    while True:
        if payload[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        (length,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + length]
        if len(body) != length - 2:
            raise ValueError("truncated segment")
        pos += 2 + length
        if marker == 0xC4:
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                (dc_dec if tc == 0 else ac_dec)[th] = _build_decode(bits, vals)
                i += 17 + n
        elif marker == 0xDB:
            i = 0
            while i < len(body):
                if body[i] >> 4:
                    raise ValueError("16-bit quant tables unsupported")
                quant[body[i] & 0xF] = np.frombuffer(
                    body[i + 1 : i + 65], np.uint8
                ).astype(np.int64)
                i += 65
        elif marker == 0xDA:
            ns = body[0]
            if ns != 1:
                raise ValueError(
                    "multi-component progressive scans unsupported"
                )
            dcid_acid = body[2]
            ss, se, ahal = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            if ah and ah != al + 1:
                raise ValueError(
                    f"refinement scan must have Ah = Al + 1 (got {ah}/{al})"
                )
            end = entropy_end(pos)
            br = _BitReader(payload[pos:end])
            pos = end

            def huff(table) -> int:
                code, ln = 0, 0
                for _ in range(16):
                    code = (code << 1) | br.bit()
                    ln += 1
                    sym = table.get((ln, code))
                    if sym is not None:
                        return sym
                raise ValueError("invalid Huffman code")

            if ss == 0:  # DC scan
                if se != 0:
                    raise ValueError("DC scan must have Se = 0")
                if ah == 0:  # first DC scan: DPCM of DC >> Al
                    table = dc_dec[dcid_acid >> 4]
                    pred = 0
                    for b in range(nblocks):
                        size = huff(table)
                        pred += _extend(br.bits(size), size)
                        zz[b, 0] = pred << al
                    seen_dc = True
                else:  # DC refinement: one raw bit per block
                    p1 = 1 << al
                    for b in range(nblocks):
                        if br.bit():
                            zz[b, 0] |= p1
            elif ah == 0:  # first AC band scan (values at >> Al)
                table = ac_dec[dcid_acid & 0xF]
                eobrun = 0
                for b in range(nblocks):
                    if eobrun:
                        eobrun -= 1
                        continue
                    k = ss
                    while k <= se:
                        rs = huff(table)
                        run, size = rs >> 4, rs & 0xF
                        if size == 0:
                            if run == 15:
                                k += 16  # ZRL
                                continue
                            eobrun = (1 << run) + (br.bits(run) if run else 0)
                            eobrun -= 1  # covers THIS block's remainder
                            break
                        k += run
                        if k > se:
                            raise ValueError("AC index overflows the band")
                        zz[b, k] = _extend(br.bits(size), size) << al
                        k += 1
            else:  # AC refinement scan — T.81 G.2 correction bits
                table = ac_dec[dcid_acid & 0xF]
                p1 = 1 << al
                eobrun = 0

                def refine_run(b, k0, k1):
                    """Read a correction bit for every nonzero-history
                    coefficient in [k0, k1]; add +/- p1 on a set bit
                    unless the coefficient was already touched this
                    scan (its p1 bit is set)."""
                    for kk in range(k0, k1 + 1):
                        c = int(zz[b, kk])
                        if c and br.bit() and (c & p1) == 0:
                            zz[b, kk] = c + (p1 if c >= 0 else -p1)

                for b in range(nblocks):
                    if eobrun:
                        refine_run(b, ss, se)
                        eobrun -= 1
                        continue
                    k = ss
                    while k <= se:
                        rs = huff(table)
                        run, size = rs >> 4, rs & 0xF
                        if size == 0 and run != 15:  # EOBn
                            eobrun = (1 << run) + (br.bits(run) if run else 0)
                            break
                        newval = 0
                        if size:
                            if size != 1:
                                raise ValueError(
                                    "refinement scan carries size > 1"
                                )
                            newval = p1 if br.bit() else -p1
                        # advance over `run` zero-history positions,
                        # refining nonzero-history ones along the way
                        while k <= se:
                            c = int(zz[b, k])
                            if c:
                                if br.bit() and (c & p1) == 0:
                                    zz[b, k] = c + (p1 if c >= 0 else -p1)
                            else:
                                run -= 1
                                if run < 0:
                                    break
                            k += 1
                        if newval and k <= se:
                            zz[b, k] = newval
                        k += 1
                    if eobrun:
                        refine_run(b, k, se)
                        eobrun -= 1
    if not seen_dc:
        raise ValueError("progressive stream has no DC scan")
    q = quant[comps[0][1]]
    m = _dct_matrix()
    plane = np.zeros((bh * 8, bw_ * 8), np.float64)
    for b in range(nblocks):
        coef = np.zeros(64, np.float64)
        coef[ZIGZAG] = zz[b] * q
        by, bx = divmod(b, bw_)
        plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
            m.T @ coef.reshape(8, 8) @ m + 128.0
        )
    return np.clip(np.round(plane[:h, :w]), 0, 255).astype(np.uint8)


def _encode_dc_first(qblocks: np.ndarray, al: int, dc_codes) -> bytes:
    """First DC scan: DPCM over ``DC >> al`` (arithmetic shift — the
    T.81 G.1.2.1 DC point transform)."""
    bw = _BitWriter()
    pred = 0
    for b in range(len(qblocks)):
        v = int(qblocks[b, 0]) >> al
        size, raw = _magnitude(v - pred)
        pred = v
        c, ln = dc_codes[size]
        bw.write(c, ln)
        if size:
            bw.write(raw, size)
    return bw.flush()


def _encode_dc_refine(qblocks: np.ndarray, al: int) -> bytes:
    """DC refinement scan: one raw bit (``(DC >> al) & 1``) per block,
    no entropy coding."""
    bw = _BitWriter()
    for b in range(len(qblocks)):
        bw.write((int(qblocks[b, 0]) >> al) & 1, 1)
    return bw.flush()


def _encode_ac_first(qblocks: np.ndarray, al: int, ac_codes) -> bytes:
    """First AC band scan (Ss=1..Se=63): run/size coding of
    ``sign * (|coef| >> al)`` (the AC point transform rounds the
    magnitude toward zero, G.1.2.2) with accumulated EOBRUN."""
    bw = _BitWriter()
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        while eobrun > 0:
            chunk = min(eobrun, 32767)
            n = chunk.bit_length() - 1
            c, ln = ac_codes[n << 4]
            bw.write(c, ln)
            if n:
                bw.write(chunk - (1 << n), n)
            eobrun -= chunk

    for b in range(len(qblocks)):
        q = qblocks[b]
        t = np.sign(q) * (np.abs(q) >> al)
        nz = np.nonzero(t[1:])[0]
        if not len(nz):
            eobrun += 1
            continue
        flush_eob()
        last = nz[-1] + 1
        run = 0
        for i in range(1, last + 1):
            v = int(t[i])
            if v == 0:
                run += 1
                continue
            while run >= 16:
                c, ln = ac_codes[0xF0]
                bw.write(c, ln)
                run -= 16
            size, raw = _magnitude(v)
            c, ln = ac_codes[(run << 4) | size]
            bw.write(c, ln)
            bw.write(raw, size)
            run = 0
        if last < 63:
            eobrun += 1  # this block's end-of-band starts a run
    flush_eob()
    return bw.flush()


def _encode_ac_refine(qblocks: np.ndarray, al: int, ac_codes) -> bytes:
    """AC refinement scan — the G.1.2.3 correction-bit algorithm:
    newly-nonzero coefficients (``|coef| >> al == 1``) are coded as
    run/1 symbols with a sign bit, already-nonzero ones contribute one
    buffered correction bit (``(|coef| >> al) & 1``) appended after
    the next emitted symbol, and all-handled blocks accumulate into
    EOBRUN whose correction bits ride behind the EOBn symbol."""
    bw = _BitWriter()
    eobrun = 0
    ebits: list[int] = []  # correction bits attached to pending EOBRUN

    def flush_eob():
        nonlocal eobrun, ebits
        while eobrun > 0:
            chunk = min(eobrun, 32767)
            n = chunk.bit_length() - 1
            c, ln = ac_codes[n << 4]
            bw.write(c, ln)
            if n:
                bw.write(chunk - (1 << n), n)
            eobrun -= chunk
        for bit in ebits:
            bw.write(bit, 1)
        ebits = []

    for blk in range(len(qblocks)):
        q = qblocks[blk]
        absv = np.abs(q) >> al
        ones = np.nonzero(absv[1:] == 1)[0]
        eob = ones[-1] + 1 if len(ones) else 0  # last newly-nonzero index
        run = 0
        br: list[int] = []  # correction bits pending within this block
        for k in range(1, 64):
            t = int(absv[k])
            if t == 0:
                run += 1
                continue
            while run > 15 and k <= eob:
                flush_eob()
                c, ln = ac_codes[0xF0]  # ZRL
                bw.write(c, ln)
                run -= 16
                for bit in br:
                    bw.write(bit, 1)
                br = []
            if t > 1:  # already nonzero at the previous precision
                br.append(t & 1)
                continue
            # newly nonzero: run/1 + sign bit + pending correction bits
            flush_eob()
            c, ln = ac_codes[(run << 4) | 1]
            bw.write(c, ln)
            bw.write(1 if int(q[k]) >= 0 else 0, 1)
            for bit in br:
                bw.write(bit, 1)
            br = []
            run = 0
        if run > 0 or br:
            eobrun += 1
            ebits.extend(br)
            if eobrun == 32767:
                flush_eob()
    flush_eob()
    return bw.flush()


def encode_jpeg_progressive(
    pixels: np.ndarray,
    quant: np.ndarray | None = None,
    successive: bool = False,
) -> bytes:
    """uint8 (H, W) -> PROGRESSIVE (SOF2) greyscale JPEG.

    Default: a DC scan (Ss=0, Se=0) then one AC spectral-selection
    scan (Ss=1, Se=63) with real EOBRUN coding — the minimal legal
    progressive structure. With ``successive=True`` the stream
    interleaves BOTH progressive dimensions the way real encoders do:
    DC first at Al=1, AC band first at Al=1, then DC and AC
    refinement scans (Ah=1, Al=0) carrying the final magnitude bit
    via raw DC bits and G.1.2.3 correction-bit coding. Successive
    approximation is lossless once every bit plane lands, so the
    quantized coefficients equal the baseline encoder's and content
    that is bit-exact under `encode_jpeg` is bit-exact here too."""
    a = np.asarray(pixels, dtype=np.uint8)
    if a.ndim != 2:
        raise ValueError("progressive encoder is greyscale-only (H, W)")
    quant = DEFAULT_QUANT if quant is None else np.asarray(quant, np.int64)
    h, w = a.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    qblocks = _quantize_blocks(
        np.pad(a.astype(np.float64), ((0, ph - h), (0, pw - w)), mode="edge"),
        quant,
    )
    dc_codes = _build_codes(DC_BITS, DC_VALS)
    ac_codes = _build_codes(PROG_AC_BITS, PROG_AC_VALS)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def sos(ss: int, se: int, ahal: int) -> bytes:
        return seg(0xFFDA, bytes([1, 1, 0x00, ss, se, ahal]))

    out = bytearray(b"\xff\xd8")
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, bytes([0]) + bytes(int(quant[i]) for i in range(64)))
    out += seg(0xFFC2, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    out += seg(0xFFC4, bytes([0x00] + DC_BITS) + bytes(DC_VALS))
    out += seg(0xFFC4, bytes([0x10] + PROG_AC_BITS) + bytes(PROG_AC_VALS))
    if successive:
        out += sos(0, 0, 0x01) + _encode_dc_first(qblocks, 1, dc_codes)
        out += sos(1, 63, 0x01) + _encode_ac_first(qblocks, 1, ac_codes)
        out += sos(0, 0, 0x10) + _encode_dc_refine(qblocks, 0)
        out += sos(1, 63, 0x10) + _encode_ac_refine(qblocks, 0, ac_codes)
    else:
        out += sos(0, 0, 0x00) + _encode_dc_first(qblocks, 0, dc_codes)
        out += sos(1, 63, 0x00) + _encode_ac_first(qblocks, 0, ac_codes)
    out += b"\xff\xd9"
    return bytes(out)


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
