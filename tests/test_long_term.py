"""Long-term reference pictures: encode-side signalling + decode.

The long_term_idr mode keeps the IDR alive as a long-term picture and
predicts every P frame from it (empty short-term RPS, one slice-signalled
lt entry).  Parity: spec 7.3.6.1/8.3.2 long-term RPS; HM TComSlice
long-term machinery, TDecCAVLC lt slice-header parse.
"""

import os
import subprocess

import numpy as np
import pytest

from test_intra_codec import HM_DECODER
from test_inter_codec import moving_clip
from video_codecs_tpu.models.hevc import decoder, headers, inter_codec
from video_codecs_tpu.utils import yuv


def _encode_lt(w, h, n, qp=30):
    cfg = headers.HevcConfig(width=w, height=h, qp=qp, long_term_idr=True)
    enc = inter_codec.LowDelayEncoder(cfg)
    frames = moving_clip(w, h, n)
    stream, recons = enc.encode_sequence_ldp(frames)
    return stream, recons


def test_lt_roundtrip_twin_decoder():
    stream, recons = _encode_lt(64, 48, 4)
    dec = inter_codec.LowDelayDecoder()
    out = dec.decode(stream)
    assert len(out) == 4
    assert dec.hash_status == [True] * 4
    for rec, got in zip(recons, out):
        for a, b in zip(rec, got):
            np.testing.assert_array_equal(a, b)


def test_lt_roundtrip_general_decoder():
    stream, recons = _encode_lt(64, 48, 4)
    dec = decoder.GeneralDecoder()
    out = dec.decode(stream)
    assert len(out) == 4
    assert dec.hash_status == [True] * 4
    # the slice headers really did signal a long-term pic
    sps = dec.sps
    assert sps.lt_present
    for rec, got in zip(recons, out):
        for a, b in zip(rec, got):
            np.testing.assert_array_equal(a, b)


def test_lt_survives_deep_dpb():
    # 12 P frames: the lt IDR outlives the twin decoder's 8-pic st window
    stream, recons = _encode_lt(64, 48, 12)
    dec = inter_codec.LowDelayDecoder()
    out = dec.decode(stream)
    assert dec.hash_status == [True] * 12
    np.testing.assert_array_equal(recons[-1][0], out[-1][0])


@pytest.mark.skipif(not os.path.exists(HM_DECODER),
                    reason="HM reference decoder not built")
def test_lt_hm_conformance(tmp_path):
    w, h = 64, 48
    stream, recons = _encode_lt(w, h, 5, qp=32)
    bin_path = tmp_path / "lt.bin"
    rec_path = tmp_path / "lt_rec.yuv"
    bin_path.write_bytes(stream)
    r = subprocess.run([HM_DECODER, "-b", str(bin_path), "-o", str(rec_path)],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stdout + r.stderr
    assert r.stdout.count("(OK)") == 5 and "ERROR" not in r.stdout, r.stdout
    ry, ru, rv = yuv.read_frames(str(rec_path), w, h)
    for i, (ey, eu, ev) in enumerate(recons):
        np.testing.assert_array_equal(ry[i], ey.astype(np.uint8))
        np.testing.assert_array_equal(ru[i], eu.astype(np.uint8))
        np.testing.assert_array_equal(rv[i], ev.astype(np.uint8))


def test_lt_msb_arithmetic():
    """Slice-header lt parse: msb-present entries resolve by arithmetic,
    chained delta cycles per TDecCAVLC."""
    h = decoder.SliceHeader()
    h.poc = 300
    h.lt_entries = [(44, True, True, 1), (10, True, False, 0)]
    d = decoder.GeneralDecoder()
    d.sps = type("S", (), {"log2_max_poc_lsb": 8})()
    d.dpb = {10: None, 299: None}
    pocs = d._lt_pocs(h)
    # entry 0: 300 - 1*256 - (300&255) + 44 = 300-256-44+44 = 44
    assert pocs[0] == 44
    # entry 1: lsb match against DPB -> poc 10 (unique match in a
    # conformant stream, spec 8.3.2)
    assert pocs[1] == 10
