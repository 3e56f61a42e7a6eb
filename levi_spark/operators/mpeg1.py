"""MPEG-1 Audio Layer I (ISO/IEC 11172-3) — bitstream layer in pure
stdlib + numpy. Narrows the MPEG-audio seam
(:mod:`levi_spark.operators.multimodal` refuses MP3/AAC/Opus): this
module implements the REAL Layer I frame structure — the 32-bit
header (12-bit syncword, ID/layer/protection, bitrate and
sample-rate indices, padding, mode), optional CRC-16 protection,
4-bit-per-subband bit allocation, 6-bit scale-factor indices, and the
12-granule x 32-subband MSB-first sample block — plus the spec's
requantization to fractional subband values:

    s'' = (2^nb / (2^nb - 1)) * (raw / 2^(nb-1) - 1 + 2^(1-nb))
    s   = scalefactor(idx) * s'',  scalefactor(idx) = 2^(1 - idx/3)

Requantization here is EXACT-RATIONAL: decode returns integer
numerators against a per-(nb, idx) dyadic denominator, so results
hash identically across engines (when idx % 3 == 0 the scale factor
is a power of two and the value is an exact dyadic rational; other
indices carry the irrational 2^(-idx/3) factor symbolically in the
returned exponent fields).

What is NOT here, refused loudly rather than approximated: the
polyphase synthesis filterbank to PCM. Its 512-tap window (Annex B
Table 3-B.3) is a numerically optimized prototype filter that exists
only as a table in the spec — there is no first-principles derivation
to reimplement from, and shipping wrong coefficients would decode
real files into plausible-looking noise. Layer II/III add the
grouped-quantization allocation tables and Huffman layers on top and
are refused for the same reason.

The reference engine has no media surface; this is north-star
extension surface like :mod:`levi_spark.operators.flac`.
"""

from __future__ import annotations

import struct

import numpy as np

# Layer I bitrate table, kbit/s, index 1-14 (0 = free format, refused)
BITRATES_L1 = (
    None, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448,
)
SAMPLE_RATES = (44100, 48000, 32000)


def _crc16_mpeg(data_bits: list[int]) -> int:
    """CRC-16 over the protected header/allocation bits (polynomial
    x^16 + x^15 + x^2 + 1, init 0xFFFF), bit-serial per the spec."""
    crc = 0xFFFF
    for b in data_bits:
        hi = (crc >> 15) & 1
        crc = ((crc << 1) & 0xFFFF)
        if hi ^ b:
            crc ^= 0x8005
    return crc


class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def to_bytes(self) -> bytes:
        bits = self.bits + [0] * (-len(self.bits) % 8)
        out = bytearray()
        for i in range(0, len(bits), 8):
            byte = 0
            for b in bits[i : i + 8]:
                byte = (byte << 1) | b
            out.append(byte)
        return bytes(out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, n: int) -> int:
        out = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            out = (out << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return out


def encode_mpeg1_layer1(
    alloc: np.ndarray,
    scf_idx: np.ndarray,
    samples: np.ndarray,
    bitrate_index: int = 14,
    sample_rate_index: int = 0,
    protection: bool = True,
) -> bytes:
    """Mono Layer I frame from already-quantized content: ``alloc``
    (32 allocation codes, 0 or 2..15 bits via code+1... code in
    [0, 14]), ``scf_idx`` (32 scale-factor indices, used where
    alloc > 0) and ``samples`` (12 x 32 raw codes, each in
    [0, 2^nb - 1] with the spec's all-ones-MSB-inverted convention
    left to the caller — raw codes are written verbatim). The frame
    pads with zero bits to the slot length implied by the bitrate."""
    alloc = np.asarray(alloc, dtype=np.int64)
    scf_idx = np.asarray(scf_idx, dtype=np.int64)
    samples = np.asarray(samples, dtype=np.int64)
    if alloc.shape != (32,) or scf_idx.shape != (32,):
        raise ValueError("alloc and scf_idx must be shape (32,)")
    if samples.shape != (12, 32):
        raise ValueError("samples must be shape (12, 32)")
    if alloc.min() < 0 or alloc.max() > 14:
        raise ValueError("Layer I allocation codes are 0..14 (15 forbidden)")
    if not 1 <= bitrate_index <= 14:
        raise ValueError("free-format bitrate refused")

    bw = _BitWriter()
    # header
    bw.write(0xFFF, 12)  # syncword
    bw.write(1, 1)  # ID: MPEG-1
    bw.write(0b11, 2)  # layer I
    bw.write(0 if protection else 1, 1)  # protection_bit (0 = CRC present)
    bw.write(bitrate_index, 4)
    bw.write(sample_rate_index, 2)
    bw.write(0, 1)  # padding
    bw.write(0, 1)  # private
    bw.write(0b11, 2)  # mode: single_channel
    bw.write(0, 2)  # mode_extension
    bw.write(0, 1)  # copyright
    bw.write(1, 1)  # original
    bw.write(0, 2)  # emphasis

    # audio_data bits that CRC protects in Layer I: the allocation block
    side = _BitWriter()
    for sb in range(32):
        side.write(int(alloc[sb]), 4)
    if protection:
        crc = _crc16_mpeg(bw.bits[16:] + side.bits)
        bw.write(crc, 16)
    bw.bits.extend(side.bits)

    for sb in range(32):
        if alloc[sb] > 0:
            bw.write(int(scf_idx[sb]), 6)
    for s in range(12):
        for sb in range(32):
            if alloc[sb] > 0:
                nb = int(alloc[sb]) + 1
                code = int(samples[s, sb])
                if not 0 <= code < (1 << nb):
                    raise ValueError(f"sample code {code} exceeds {nb} bits")
                bw.write(code, nb)

    br = BITRATES_L1[bitrate_index] * 1000
    sr = SAMPLE_RATES[sample_rate_index]
    slots = (12 * br) // sr  # Layer I slots are 4 bytes
    frame_len = slots * 4
    if len(bw.bits) > frame_len * 8:
        raise ValueError(
            f"content needs {len(bw.bits)} bits, frame carries {frame_len * 8}"
        )
    out = bytearray(bw.to_bytes())
    out.extend(b"\x00" * (frame_len - len(out)))
    return bytes(out)


def decode_mpeg1_layer1(payload: bytes) -> dict:
    """Parse + validate one mono Layer I frame; requantize to
    EXACT-RATIONAL subband values.

    Returns ``{"sample_rate", "bitrate_kbps", "alloc", "scf_idx",
    "raw", "numerators", "denominators", "scale_log2_num3"}`` where
    for each granule s and subband sb with nb allocated bits and scale
    index idx::

        value = numerators[s, sb] / denominators[sb]
                * 2^(scale_log2_num3[sb] / 3)

    with ``numerators[s, sb] = 2*raw[s, sb] - 2^nb + 2`` and
    ``denominators[sb] = 2^nb - 1`` — the spec's
    ``(2^nb/(2^nb-1)) * ((2*raw - 2^nb + 2) / 2^nb)`` requantization
    with the ``2^nb`` factors cancelled exactly, all integers — and
    ``scale_log2_num3[sb] = 3 - idx`` so the Table B.1 scale factor
    ``2^(1 - idx/3)`` is exactly ``2^(scale_log2_num3/3)`` (idx % 3
    == 0 gives an exact power of two). Raises ValueError on bad sync,
    reserved indices, CRC mismatch, or truncation.
    """
    if len(payload) < 4:
        raise ValueError("frame shorter than header")
    br_ = _BitReader(payload)
    if br_.read(12) != 0xFFF:
        raise ValueError("bad syncword")
    if br_.read(1) != 1:
        raise ValueError("MPEG-2 extension unsupported")
    if br_.read(2) != 0b11:
        raise ValueError("not Layer I")
    protection = br_.read(1) == 0
    bitrate_index = br_.read(4)
    if bitrate_index in (0, 15):
        raise ValueError(f"bitrate index {bitrate_index} refused")
    sr_index = br_.read(2)
    if sr_index == 3:
        raise ValueError("reserved sample-rate index")
    _padding = br_.read(1)
    _private = br_.read(1)
    mode = br_.read(2)
    if mode != 0b11:
        raise NotImplementedError("only single_channel Layer I supported")
    br_.read(2 + 1 + 1 + 2)  # mode_ext, copyright, original, emphasis
    crc_stored = br_.read(16) if protection else None

    header_tail_bits = []
    if protection:
        rdr = _BitReader(payload)
        rdr.pos = 16
        header_tail_bits = [rdr.read(1) for _ in range(16)]

    alloc = np.zeros(32, dtype=np.int64)
    alloc_bits = []
    for sb in range(32):
        a = br_.read(4)
        if a == 15:
            raise ValueError(f"forbidden allocation 15 in subband {sb}")
        alloc[sb] = a
        for i in range(3, -1, -1):
            alloc_bits.append((a >> i) & 1)
    if protection:
        crc_calc = _crc16_mpeg(header_tail_bits + alloc_bits)
        if crc_calc != crc_stored:
            raise ValueError(
                f"CRC mismatch: stored {crc_stored:#06x}, "
                f"computed {crc_calc:#06x}"
            )

    scf_idx = np.zeros(32, dtype=np.int64)
    for sb in range(32):
        if alloc[sb] > 0:
            idx = br_.read(6)
            if idx == 63:
                raise ValueError("reserved scale-factor index 63")
            scf_idx[sb] = idx

    raw = np.zeros((12, 32), dtype=np.int64)
    for s in range(12):
        for sb in range(32):
            if alloc[sb] > 0:
                raw[s, sb] = br_.read(int(alloc[sb]) + 1)

    # exact-rational requantization:
    # s'' = (2^nb/(2^nb-1)) * ((2*raw - 2^nb + 2) / 2^nb)
    #     = (2*raw - 2^nb + 2) / (2^nb - 1)
    # value = s'' * 2^(1 - idx/3)
    # numerators below are (2*raw - 2^nb + 2); the caller divides by
    # (2^nb - 1) and applies the scale exponent.
    numer = np.zeros((12, 32), dtype=np.int64)
    denom = np.zeros(32, dtype=np.int64)  # = 2^nb - 1 where allocated
    for sb in range(32):
        if alloc[sb] > 0:
            nb = int(alloc[sb]) + 1
            denom[sb] = (1 << nb) - 1
            numer[:, sb] = 2 * raw[:, sb] - (1 << nb) + 2
    return {
        "sample_rate": SAMPLE_RATES[sr_index],
        "bitrate_kbps": BITRATES_L1[bitrate_index],
        "alloc": alloc,
        "scf_idx": scf_idx,
        "raw": raw,
        "numerators": numer,
        "denominators": denom,
        "scale_log2_num3": 3 - scf_idx,  # scale = 2^(scale_log2_num3/3)
    }


def synthesize_pcm(subband_values: np.ndarray) -> np.ndarray:
    raise NotImplementedError(
        "Layer I PCM synthesis needs the spec's 512-tap polyphase window "
        "(ISO 11172-3 Table 3-B.3) — a numerically optimized prototype "
        "that exists only as a table; decoding through guessed "
        "coefficients would produce plausible-looking noise, so this "
        "engine exposes the exact subband layer and refuses synthesis"
    )
