"""Round-7 ADVICE regression pins (the TIFF per-sample predictor and
collation writer-feature items are pinned in test_tiff.py /
test_protocol_guard.py next to their existing suites; this file pins
the remaining three):

* archive.py — tar.gz with trailing bytes after the gzip trailer
  (concatenated second member or garbage) must refuse, matching the
  module's strict single-stream contract;
* flac.py — an escaped residual partition whose raw width exceeds the
  5-bit escape field (31) must raise at encode time instead of
  silently wrapping into a corrupt stream;
* mpeg1.py — the decode dict's actual keys must match the documented
  requantization law (the docstring used to promise `denom_log2`).
"""

from __future__ import annotations

import numpy as np
import pytest


def test_targz_trailing_garbage_refuses():
    from levi_spark.operators.archive import decode_archive, encode_tar

    good = encode_tar([("a.txt", b"alpha")], gzip_stream=True)
    assert decode_archive(good)[0]["data"] == b"alpha"
    with pytest.raises(ValueError, match="after the gzip trailer"):
        decode_archive(good + b"JUNK")
    # a second concatenated gzip member is equally not a single stream
    with pytest.raises(ValueError, match="after the gzip trailer"):
        decode_archive(good + good)


def test_flac_escape_width_over_31_refuses():
    from levi_spark.operators.flac import _BitWriter, _write_residual

    bw = _BitWriter()
    # residuals needing > 31 raw bits: |r| = 2^33 -> bit_length+1 = 35
    huge = np.array([1 << 33, -(1 << 33)] * 8, dtype=np.int64)
    with pytest.raises(ValueError, match="escape width caps at 31"):
        _write_residual(bw, huge, eff=16)
    # a legal escape (raw width <= 31) still writes
    bw2 = _BitWriter()
    big_but_legal = np.array([1 << 24, -(1 << 24)] * 8, dtype=np.int64)
    _write_residual(bw2, big_but_legal, eff=16)
    assert len(bw2.out) > 0 or bw2.n > 0


def test_mpeg1_returns_documented_keys():
    from levi_spark.operators.mpeg1 import (
        decode_mpeg1_layer1,
        encode_mpeg1_layer1,
    )

    alloc = np.zeros(32, dtype=np.int64)
    alloc[0], alloc[5] = 2, 7
    scf = np.zeros(32, dtype=np.int64)
    scf[0], scf[5] = 6, 21
    raw = np.zeros((12, 32), dtype=np.int64)
    raw[:, 0] = np.arange(12) % 7
    raw[:, 5] = (3 * np.arange(12) + 1) % 255
    frame = encode_mpeg1_layer1(alloc, scf, raw)
    out = decode_mpeg1_layer1(frame)
    # exactly the documented surface — consumers following the
    # docstring's formula find every key it names
    for key in ("sample_rate", "bitrate_kbps", "alloc", "scf_idx",
                "raw", "numerators", "denominators", "scale_log2_num3"):
        assert key in out, key
    assert "denom_log2" not in out
    # and the law: denominators = 2^nb - 1, numerators = 2*raw-2^nb+2
    nb = int(alloc[5]) + 1
    assert out["denominators"][5] == (1 << nb) - 1
    assert (out["numerators"][:, 5]
            == 2 * raw[:, 5] - (1 << nb) + 2).all()
    assert out["scale_log2_num3"][5] == 3 - 21
