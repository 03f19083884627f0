"""VUI timing/HRD + buffering-period & pic-timing SEI emission.

Parity: spec E.2.1/E.2.2 VUI+HRD syntax, D.2.2/D.2.3 SEI payloads;
HM TEncCavlc codeVUI/codeHrdParameters, TEncGOP buffering-period and
pic-timing SEI wiring.
"""

import os
import subprocess

import numpy as np
import pytest

from test_intra_codec import HM_DECODER
from test_inter_codec import moving_clip
from video_codecs_tpu.entropy import bitstream as bs
from video_codecs_tpu.models.hevc import decoder, headers, inter_codec, sei


def _encode(w=64, h=48, n=3):
    cfg = headers.HevcConfig(width=w, height=h, qp=30, timing_sei=True,
                             frame_rate=25.0, hrd_bitrate_bps=512_000)
    enc = inter_codec.LowDelayEncoder(cfg)
    return enc.encode_sequence_ldp(moving_clip(w, h, n))


def _prefix_sei_messages(stream):
    out = []
    for nal in bs.split_annexb(stream):
        nal_type = (nal[0] >> 1) & 0x3F
        if nal_type == bs.NAL_PREFIX_SEI:
            out.append(sei.parse_sei_rbsp(
                bs.strip_emulation_prevention(nal[2:])))
    return out


def test_timing_sei_emitted_and_parses():
    stream, _ = _encode()
    aus = _prefix_sei_messages(stream)
    assert len(aus) == 3                       # one prefix SEI per AU
    first = aus[0]
    bp = [m for m in first if isinstance(m, sei.BufferingPeriod)]
    pt = [m for m in first if isinstance(m, sei.PictureTiming)]
    assert len(bp) == 1 and len(pt) == 1
    assert bp[0].initial_cpb_removal_delay == 90000
    assert pt[0].pic_struct == 0 and pt[0].source_scan_type == 1
    assert pt[0].au_cpb_removal_delay_minus1 == 0
    # later AUs: pic timing only, with advancing CPB removal delay
    for k, au in enumerate(aus[1:], start=1):
        assert not any(isinstance(m, sei.BufferingPeriod) for m in au)
        (ptk,) = [m for m in au if isinstance(m, sei.PictureTiming)]
        assert ptk.au_cpb_removal_delay_minus1 == k - 1
        assert ptk.pic_dpb_output_delay == 1


def test_timing_sei_general_decoder_roundtrip():
    stream, recons = _encode()
    dec = decoder.GeneralDecoder()
    out = dec.decode(stream)
    assert dec.hash_status == [True] * 3
    for rec, got in zip(recons, out):
        for a, b in zip(rec, got):
            np.testing.assert_array_equal(a, b)


@pytest.mark.skipif(not os.path.exists(HM_DECODER),
                    reason="HM reference decoder not built")
def test_timing_sei_hm_conformance(tmp_path):
    """TAppDecoder must parse the VUI/HRD SPS and the BP/PT SEI and still
    verify every picture hash."""
    stream, _ = _encode(n=3)
    bin_path = tmp_path / "hrd.bin"
    bin_path.write_bytes(stream)
    r = subprocess.run([HM_DECODER, "-b", str(bin_path),
                        "-o", str(tmp_path / "rec.yuv")],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stdout + r.stderr
    assert r.stdout.count("(OK)") == 3 and "ERROR" not in r.stdout, r.stdout
