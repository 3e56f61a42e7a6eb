"""FLAC-subset codec for the multimodal plane — pure numpy + stdlib,
no external audio libraries. Closes the COMPRESSED-audio half of the
codec seam (the WAV path proved container parsing only; this one
proves real entropy decoding): the format is the public FLAC
specification (RFC 9639 / xiph.org), restricted to the pieces a
deterministic data-pipeline codec needs.

Supported profile: 16-bit PCM, 1-8 independent channels, stereo
decorrelation on both sides (left-side / right-side / mid-side channel
assignments — the shape nearly every real-world stereo FLAC uses, with
the side channel's extra sample bit), CONSTANT / VERBATIM / FIXED
(orders 0-4) / LPC (orders 1-32, quantized coefficients with signed
shift — what real encoders emit for nearly all music content)
subframes, Rice residual methods 0 and 1 (4- and 5-bit parameters)
with any partition order, escaped (raw) partitions, wasted-bits
shifting, and both CRCs verified (CRC-8 frame header, CRC-16 whole
frame). Refused explicitly rather than misread: negative LPC shifts,
sample sizes other than 16 bits.

Pipeline (encode): fixed blocksize frames; per block, per channel, the
encoder picks CONSTANT when flat, else the FIXED predictor order 0-2
minimizing the summed residual magnitude, Rice-codes the residual in a
single partition, and emits STREAMINFO with the MD5 of the unencoded
stream (which decode re-verifies end-to-end). Decode is a strict
superset of what encode emits (all five FIXED orders, multi-partition
residuals, escapes).

Lossless-ness note for the oracle-gated query: unlike JPEG there is no
exactness carve-out to engineer — FLAC is lossless by construction, so
ANY samples round-trip bit-for-bit and the gate's RMS law holds on the
same md5-derived int16 raster the WAV gate uses. What the gate proves
is the decode side: Rice/unary entropy decoding, fixed-predictor
reconstruction, CRC and MD5 verification against analytically known
samples.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

FLAC_MAGIC = b"fLaC"

# fixed-predictor coefficients by order: residual = sum(c_k * s[i-k])
_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _crc8(data: bytes) -> int:
    """CRC-8 poly 0x07, init 0 (frame-header CRC per the spec)."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07 if crc & 0x80 else crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16 poly 0x8005, init 0 (whole-frame CRC per the spec)."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005 if crc & 0x8000 else crc << 1) & 0xFFFF
    return crc


def _utf8_number(n: int) -> bytes:
    """Frame-number coding: UTF-8-style variable length over raw ints
    (the spec's 'UTF-8 coded' field, extended to 36 bits)."""
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    while n >= (1 << (1 + 5 * nbytes)) and nbytes < 7:
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (n >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _read_utf8_number(data: bytes, pos: int) -> tuple[int, int]:
    b0 = data[pos]
    if b0 < 0x80:
        return b0, pos + 1
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("bad UTF-8 coded frame number")
    val = b0 & (0xFF >> (nbytes + 1))
    for i in range(1, nbytes):
        c = data[pos + i]
        if (c & 0xC0) != 0x80:
            raise ValueError("bad UTF-8 continuation in frame number")
        val = (val << 6) | (c & 0x3F)
    return val, pos + nbytes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            self.out.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zero bits then a one

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)

    def bytes(self) -> bytes:
        assert self.n == 0
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.bitpos = pos * 8

    @property
    def bytepos(self) -> int:
        return (self.bitpos + 7) // 8

    def read(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            byte = self.data[self.bitpos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.bitpos & 7))) & 1)
            self.bitpos += 1
        return v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self.bitpos = (self.bitpos + 7) & ~7


def _rice_encode(bw: _BitWriter, residual: np.ndarray, param: int) -> None:
    for r in residual.tolist():
        u = (r << 1) ^ (r >> 63) if r < 0 else r << 1  # zigzag fold
        bw.write_unary(u >> param)
        bw.write(u, param)


def _rice_decode(br: _BitReader, n: int, param: int) -> np.ndarray:
    out = np.empty(n, np.int64)
    for i in range(n):
        u = (br.read_unary() << param) | br.read(param)
        out[i] = (u >> 1) ^ -(u & 1)  # zigzag unfold
    return out


def _best_rice_param(residual: np.ndarray) -> int:
    """~log2(mean(zigzag)) — the classic Rice parameter estimate.
    UNCAPPED past the 4-bit field's 14 (r08): a value > 14 tells
    ``_write_residual`` to take the ESCAPE (raw) partition instead of
    grinding out multi-thousand-bit unary quotients with p=14, which
    the old cap silently did (and which made the escape branch — and
    its width guard — unreachable)."""
    if not len(residual):
        return 0
    u = np.abs(residual.astype(np.int64)) * 2
    mean = float(u.mean())
    p = 0
    while (1 << (p + 1)) < mean + 1 and p < 30:
        p += 1
    return p


def _write_residual(bw: _BitWriter, residual: np.ndarray, eff: int) -> None:
    """Single-partition Rice residual, escaping to raw when that is
    CHEAPER than Rice at the 4-bit field's cap (raw width sized to the
    data): when the estimate exceeds 14, compare the exact bit cost of
    p=14 against the escape — full-scale noise stays Rice (15+q bits a
    sample beats the 19-bit raw), while pathological wide residuals
    escape instead of grinding out huge unary quotients."""
    param = _best_rice_param(residual)
    if param > 14:
        u = np.abs(residual.astype(np.int64) * 2) - (residual < 0)
        rice14_bits = int(len(residual)) * 15 + int((u >> 14).sum())
        nb_raw = max(
            eff + 3,
            max((int(abs(r)).bit_length() + 1 for r in residual.tolist()),
                default=1),
        )
        if rice14_bits <= len(residual) * nb_raw + 5:
            param = 14
    if param <= 14:
        bw.write(0b00, 2)  # Rice method 0 (4-bit params)
        bw.write(0, 4)  # partition order 0
        bw.write(param, 4)
        _rice_encode(bw, residual, param)
    else:
        nb = max(
            eff + 3,
            max((int(abs(r)).bit_length() + 1 for r in residual.tolist()),
                default=1),
        )
        if nb > 31:
            # the escaped-partition width field is 5 bits; a width that
            # doesn't fit would silently wrap and emit a corrupt stream
            raise ValueError(
                f"escaped residual needs {nb}-bit samples; the 5-bit "
                "escape width caps at 31 — refuse instead of wrapping"
            )
        bw.write(0b00, 2)
        bw.write(0, 4)
        bw.write(0b1111, 4)
        bw.write(nb, 5)
        for r in residual.tolist():
            bw.write(int(r), nb)


def _encode_subframe(
    bw: _BitWriter, s: np.ndarray, eff: int, lpc_order: int = 0
) -> None:
    """One CONSTANT / FIXED / LPC subframe at ``eff`` sample bits (17
    for a decorrelated side channel, else 16). ``lpc_order > 0``
    requests a quantized-LPC subframe (Levinson-Durbin coefficients);
    degenerate blocks fall back to CONSTANT/FIXED."""
    bs = len(s)
    if bs and (s == s[0]).all():
        bw.write(0, 1)  # reserved
        bw.write(0b000000, 6)  # CONSTANT
        bw.write(0, 1)  # no wasted bits
        bw.write(int(s[0]), eff)
        return
    if lpc_order:
        fit = _lpc_coeffs(s, min(lpc_order, bs - 1))
        if fit is not None:
            qc, shift = fit
            order = len(qc)
            qrev = qc[::-1].copy()
            pred = np.array(
                [
                    int(np.dot(qrev, s[i - order : i])) >> shift
                    for i in range(order, bs)
                ],
                dtype=np.int64,
            )
            residual = s[order:] - pred
            bw.write(0, 1)
            bw.write(0b100000 | (order - 1), 6)  # LPC, order
            bw.write(0, 1)  # no wasted bits
            for w in s[:order].tolist():
                bw.write(int(w), eff)
            bw.write(15 - 1, 4)  # coefficient precision 15
            bw.write(shift, 5)
            for c in qc.tolist():
                bw.write(int(c), 15)
            _write_residual(bw, residual, eff)
            return
    best = None
    for order in range(min(3, bs)):
        res = s
        for _ in range(order):
            res = np.diff(res)
        cost = int(np.abs(res).sum())
        if best is None or cost < best[1]:
            best = (order, cost, res)
    order, _cost, residual = best
    bw.write(0, 1)
    bw.write(0b001000 | order, 6)  # FIXED, order
    bw.write(0, 1)
    for w in s[:order].tolist():
        bw.write(int(w), eff)  # warm-up
    _write_residual(bw, residual, eff)


# stereo decorrelation modes -> (frame channel code, which subframe
# carries the side channel)
_STEREO_MODES = {"left-side": (0b1000, 1), "right-side": (0b1001, 0),
                 "mid-side": (0b1010, 1)}


def encode_flac(
    samples: np.ndarray,
    sample_rate: int,
    block_size: int = 4096,
    stereo: str | None = None,
    lpc_order: int = 0,
) -> bytes:
    """int16 (n,) mono or (n, ch) -> FLAC bytes (fixed blocksize,
    single-partition Rice). ``stereo`` selects a decorrelated channel
    assignment for 2-channel input: ``"left-side"`` (left + side),
    ``"right-side"`` (side + right) or ``"mid-side"`` (mid + side),
    with ``side = left - right`` carried at 17 bits per the spec;
    ``None`` keeps independent channels. ``lpc_order > 0`` emits
    quantized-LPC subframes of that order (Levinson-Durbin fit,
    precision-15 coefficients, non-negative shift — the subframe type
    real encoders use for music); 0 keeps CONSTANT/FIXED."""
    a = np.asarray(samples, dtype=np.int16)
    if a.ndim == 1:
        a = a[:, None]
    n, nch = a.shape
    if not 1 <= nch <= 8:
        raise ValueError(f"1-8 channels supported, got {nch}")
    if stereo is not None:
        if stereo not in _STEREO_MODES:
            raise ValueError(
                f"stereo must be one of {sorted(_STEREO_MODES)}, got {stereo}"
            )
        if nch != 2:
            raise ValueError("stereo decorrelation needs exactly 2 channels")
    raw_md5 = hashlib.md5(
        a.astype("<i2").tobytes()
    ).digest()  # interleaved LE, per spec

    frames = bytearray()
    for fi, start in enumerate(range(0, n, block_size)):
        blk = a[start : start + block_size]
        bs = len(blk)
        # ---- frame header ----
        hdr = bytearray()
        hdr += bytes([0xFF, 0xF8])  # sync + fixed blocksize strategy
        bs_code = 0b0111  # 16-bit blocksize-1 follows header
        sr_code = 0b0000  # sample rate from STREAMINFO
        hdr.append((bs_code << 4) | sr_code)
        if stereo is None:
            ch_code = nch - 1  # independent channels
        else:
            ch_code = _STEREO_MODES[stereo][0]
        hdr.append((ch_code << 4) | (0b100 << 1))  # 16-bit sample size
        hdr += _utf8_number(fi)
        hdr += struct.pack(">H", bs - 1)
        hdr.append(_crc8(bytes(hdr)))
        bw = _BitWriter()
        for byte in hdr:
            bw.write(byte, 8)
        # ---- one subframe per channel ----
        if stereo is None:
            subs = [blk[:, ch].astype(np.int64) for ch in range(nch)]
            side_at = -1
        else:
            left = blk[:, 0].astype(np.int64)
            right = blk[:, 1].astype(np.int64)
            side = left - right
            if stereo == "left-side":
                subs = [left, side]
            elif stereo == "right-side":
                subs = [side, right]
            else:  # mid-side
                subs = [(left + right) >> 1, side]
            side_at = _STEREO_MODES[stereo][1]
        for ci, s in enumerate(subs):
            _encode_subframe(
                bw, s, 17 if ci == side_at else 16, lpc_order=lpc_order
            )
        bw.align()
        body = bw.bytes()
        frames += body + struct.pack(">H", _crc16(body))

    # ---- STREAMINFO ----
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size if n else 0, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(nch - 1, 3)
    si.write(15, 5)  # bits per sample - 1
    si.write(n, 36)
    streaminfo = si.bytes() + raw_md5
    out = bytearray(FLAC_MAGIC)
    out += bytes([0x80]) + len(streaminfo).to_bytes(3, "big")  # last block
    out += streaminfo
    out += frames
    return bytes(out)


def decode_flac(payload: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes -> (int16 (n,) or (n, ch) samples, sample_rate).
    Verifies frame CRCs and the STREAMINFO MD5. Raises ``ValueError``
    outside the supported profile."""
    if payload[:4] != FLAC_MAGIC:
        raise ValueError(f"not a FLAC stream: {payload[:4]!r}")
    pos = 4
    streaminfo = None
    while True:
        hdr = payload[pos]
        btype, last = hdr & 0x7F, bool(hdr & 0x80)
        length = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + length]
        pos += 4 + length
        if btype == 0:
            streaminfo = body
        if last:
            break
    if streaminfo is None or len(streaminfo) < 34:
        raise ValueError("missing STREAMINFO")
    br = _BitReader(streaminfo)
    br.read(16)  # min blocksize
    br.read(16)
    br.read(24)
    br.read(24)
    sample_rate = br.read(20)
    nch = br.read(3) + 1
    bps = br.read(5) + 1
    total = br.read(36)
    want_md5 = streaminfo[18:34]
    if bps != 16:
        raise ValueError(f"only 16-bit samples supported, got {bps}")

    chans = [np.empty(0, np.int64) for _ in range(nch)]
    got = 0
    while got < total:
        frame_start = pos
        if pos + 4 > len(payload):
            raise ValueError(
                f"stream truncated: {got}/{total} samples decoded"
            )
        if payload[pos] != 0xFF or (payload[pos + 1] & 0xFC) != 0xF8:
            raise ValueError(f"frame sync expected at byte {pos}")
        variable = bool(payload[pos + 1] & 0x01)
        bs_code = payload[pos + 2] >> 4
        sr_code = payload[pos + 2] & 0xF
        ch_code = payload[pos + 3] >> 4
        ss_code = (payload[pos + 3] >> 1) & 0x7
        if ch_code > 0b1010:
            raise ValueError(f"reserved channel assignment {ch_code:#06b}")
        stereo = None  # (mode, side-subframe index) for decorrelated frames
        if ch_code >= 8:
            stereo = (ch_code, 1 if ch_code != 0b1001 else 0)
            if nch != 2:
                raise ValueError(
                    "decorrelated frame in a non-stereo stream"
                )
        elif ch_code != nch - 1:
            raise ValueError("frame channel count disagrees with STREAMINFO")
        if ss_code != 0b100:
            raise ValueError("frame sample size must be 16-bit")
        _num, p = _read_utf8_number(payload, pos + 4)
        if bs_code == 0b0110:
            bs = payload[p] + 1
            p += 1
        elif bs_code == 0b0111:
            bs = struct.unpack(">H", payload[p : p + 2])[0] + 1
            p += 2
        elif bs_code == 0b0001:
            bs = 192
        elif 0b0010 <= bs_code <= 0b0101:
            bs = 576 << (bs_code - 2)
        elif bs_code >= 0b1000:
            bs = 256 << (bs_code - 8)
        else:
            raise ValueError(f"reserved blocksize code {bs_code}")
        if sr_code in (0b1100, 0b1101, 0b1110):  # inline sample rate
            p += 1 if sr_code == 0b1100 else 2
        elif sr_code == 0b1111:
            raise ValueError("invalid sample rate code")
        if _crc8(payload[frame_start:p]) != payload[p]:
            raise ValueError("frame header CRC-8 mismatch")
        p += 1
        br = _BitReader(payload, p)
        subs = []
        for ch in range(nch):
            if br.read(1):
                raise ValueError("subframe reserved bit set")
            sft = br.read(6)
            wasted = 0
            if br.read(1):
                wasted = 1 + br.read_unary()
            # a decorrelated side channel carries one extra sample bit
            extra = 1 if (stereo and ch == stereo[1]) else 0
            eff = 16 + extra - wasted
            if sft == 0b000000:  # CONSTANT
                v = br.read(eff)
                v -= (v >> (eff - 1)) << eff  # sign-extend
                s = np.full(bs, v, np.int64)
            elif sft == 0b000001:  # VERBATIM
                s = np.empty(bs, np.int64)
                for i in range(bs):
                    v = br.read(eff)
                    s[i] = v - ((v >> (eff - 1)) << eff)
            elif 0b001000 <= sft <= 0b001100:  # FIXED order 0-4
                order = sft - 0b001000
                warm = np.empty(order, np.int64)
                for i in range(order):
                    v = br.read(eff)
                    warm[i] = v - ((v >> (eff - 1)) << eff)
                res = _read_residual(br, bs, order)
                s = _fixed_restore(warm, res, order)
            elif sft >= 0b100000:  # LPC, order 1-32
                order = (sft & 0x1F) + 1
                warm = np.empty(order, np.int64)
                for i in range(order):
                    v = br.read(eff)
                    warm[i] = v - ((v >> (eff - 1)) << eff)
                prec = br.read(4) + 1
                if prec == 16:
                    raise ValueError("invalid LPC precision code 0b1111")
                shift_raw = br.read(5)
                shift = shift_raw - ((shift_raw >> 4) << 5)  # signed
                if shift < 0:
                    raise ValueError(
                        "negative LPC shift unsupported (spec reserves it)"
                    )
                qc = np.empty(order, np.int64)
                for i in range(order):
                    v = br.read(prec)
                    qc[i] = v - ((v >> (prec - 1)) << prec)
                res = _read_residual(br, bs, order)
                s = _lpc_restore(warm, res, qc, shift)
            else:
                raise ValueError(f"reserved subframe type {sft:#08b}")
            subs.append(s << wasted)
        if stereo:
            code = stereo[0]
            if code == 0b1000:  # left-side: right = left - side
                left, side = subs
                subs = [left, left - side]
            elif code == 0b1001:  # right-side: left = side + right
                side, right = subs
                subs = [side + right, right]
            else:  # mid-side (spec reconstruction, odd sums exact)
                mid, side = subs
                mid2 = (mid << 1) | (side & 1)
                subs = [(mid2 + side) >> 1, (mid2 - side) >> 1]
        for ch in range(nch):
            chans[ch] = np.concatenate([chans[ch], subs[ch]])
        br.align()
        p = br.bytepos
        if _crc16(payload[frame_start:p]) != struct.unpack(
            ">H", payload[p : p + 2]
        )[0]:
            raise ValueError("frame CRC-16 mismatch")
        pos = p + 2
        got += bs
        if variable:
            raise ValueError("variable-blocksize streams unsupported")
    out = np.stack([c[:total] for c in chans], axis=1).astype(np.int16)
    if hashlib.md5(out.astype("<i2").tobytes()).digest() != want_md5:
        raise ValueError("decoded stream MD5 mismatch vs STREAMINFO")
    return (out[:, 0] if nch == 1 else out), sample_rate


def _read_residual(br: _BitReader, bs: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError(f"reserved residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if bs % nparts:
        raise ValueError("block size not divisible by partition count")
    parts = []
    for pi in range(nparts):
        cnt = bs // nparts - (order if pi == 0 else 0)
        param = br.read(pbits)
        if param == escape:
            nb = br.read(5)
            raw = np.empty(cnt, np.int64)
            for i in range(cnt):
                v = br.read(nb)
                raw[i] = v - ((v >> (nb - 1)) << nb) if nb else 0
            parts.append(raw)
        else:
            parts.append(_rice_decode(br, cnt, param))
    return np.concatenate(parts) if parts else np.empty(0, np.int64)


def _lpc_restore(
    warm: np.ndarray, res: np.ndarray, qc: np.ndarray, shift: int
) -> np.ndarray:
    """Invert LPC prediction: ``s[i] = res[i] + ((sum_j qc[j] *
    s[i-1-j]) >> shift)`` — integer arithmetic with the spec's
    arithmetic right shift, sequentially dependent so a plain loop
    (the per-sample cost matches the Rice decode next to it)."""
    order = len(qc)
    n = order + len(res)
    s = np.empty(n, np.int64)
    s[:order] = warm
    qrev = qc[::-1].copy()  # dot against s[i-order:i] in natural order
    for i in range(order, n):
        acc = int(np.dot(qrev, s[i - order : i]))
        s[i] = res[i - order] + (acc >> shift)
    return s


def _lpc_coeffs(s: np.ndarray, order: int) -> tuple[np.ndarray, int] | None:
    """Levinson-Durbin on the block's autocorrelation -> quantized
    integer coefficients (precision <= 15 bits incl. sign) and a
    non-negative shift. Returns None when the block is degenerate
    (constant / too short) — callers fall back to FIXED. Losslessness
    never depends on coefficient quality: the encoder computes the
    residual with the same integer prediction the decoder inverts."""
    n = len(s)
    if n <= order or order < 1 or order > 32:
        return None
    x = s.astype(np.float64)
    ac = np.array(
        [float(np.dot(x[: n - k], x[k:])) for k in range(order + 1)]
    )
    if ac[0] == 0.0:
        return None  # silence: CONSTANT/FIXED handles it
    err = ac[0]
    a = np.zeros(order)
    for i in range(order):
        acc = ac[i + 1] - np.dot(a[:i], ac[i:0:-1][:i])
        if err <= 0:
            return None
        k = acc / err
        a[: i + 1] = np.concatenate([a[:i] - k * a[:i][::-1], [k]])
        err *= 1 - k * k
    peak = float(np.abs(a).max())
    if not np.isfinite(peak) or peak == 0.0:
        return None
    # largest shift keeping every coefficient within 15 signed bits
    shift = 14 - max(0, int(np.ceil(np.log2(peak + 1e-9))) + 1)
    shift = max(0, min(15, shift))
    qc = np.round(a * (1 << shift)).astype(np.int64)
    qc = np.clip(qc, -(1 << 14), (1 << 14) - 1)
    if not qc.any():
        return None
    return qc, shift


def _fixed_restore(warm: np.ndarray, res: np.ndarray, order: int) -> np.ndarray:
    """Invert the k-th finite difference: integration level j needs the
    FIRST ELEMENT OF diff^j(s) as its cumsum seed — that's diff^j of
    the warm-up samples, not the raw warm-up value."""
    firsts = []
    w = warm
    for _ in range(order):
        firsts.append(int(w[0]))
        w = np.diff(w)
    s = res
    for j in range(order - 1, -1, -1):
        s = np.concatenate([[firsts[j]], s]).cumsum()
    return s.astype(np.int64)


def flac_audio_decoder(payload: bytes) -> dict:
    """Drop-in ``decoder`` for
    :func:`levi_spark.operators.multimodal.decode_audio_features`."""
    samples, rate = decode_flac(payload)
    mono = samples if samples.ndim == 1 else samples[:, 0]
    x = mono.astype(np.float64)
    return {
        "sample_rate": rate,
        "n_samples": int(len(mono)),
        "rms": float(np.sqrt((x * x).mean())) if len(mono) else 0.0,
    }
