"""High-profile 8x8 transform + I_8x8 conformance vs JM.

Decode direction: JM lencod streams with ProfileIDC=100 and
Transform8x8Mode=1 (which exercise I_8x8 intra prediction, the 8x8
integer transform, CAVLC de-interleaved 8x8 residuals, CABAC LUMA_8x8
residual coding and the 8x8 deblocking rule) must reproduce JM's own
reconstruction bit-exactly.

Parity: jm18.5 lencod/src/transform8x8.c, intra8x8.c,
ldecod/src/read_comp_cavlc.c:1009, read_comp_cabac.c:344.
"""

import os
import subprocess

import numpy as np
import pytest

from video_codecs_tpu.models.h264.inter_codec import H264Decoder
from video_codecs_tpu.utils import yuv

JM_ENCODER = "/root/repo/.refbuild/jm18.5/bin/lencod.exe"
JM_DECODER = "/root/repo/.refbuild/jm18.5/bin/ldecod.exe"
JM_CFG = "/root/repo/.refbuild/jm18.5/bin/encoder_baseline.cfg"
FOREMAN = "/root/reference/jm18.5/bin/foreman_part_qcif.yuv"

needs_jm = pytest.mark.skipif(
    not (os.path.exists(JM_ENCODER) and os.path.exists(FOREMAN)),
    reason="JM reference encoder not built")


def _jm_encode(tmp_path, cabac: bool, intra: bool, frames: int = 3):
    args = [JM_ENCODER, "-d", JM_CFG,
            "-p", f"InputFile={FOREMAN}",
            "-p", "SourceWidth=176", "-p", "SourceHeight=144",
            "-p", f"FramesToBeEncoded={frames}",
            "-p", f"IntraPeriod={1 if intra else 0}",
            "-p", f"IDRPeriod={1 if intra else 0}",
            "-p", "ProfileIDC=100",
            "-p", f"SymbolMode={1 if cabac else 0}",
            "-p", "Transform8x8Mode=1",
            "-p", "QPISlice=30", "-p", "QPPSlice=30",
            "-p", "OutFileMode=0", "-p", "OutputFile=jm.264",
            "-p", "ReconFile=jmrec.yuv", "-p", "PicOrderCntType=2",
            "-p", "Log2MaxFNumMinus4=4", "-p", "RDOptimization=1",
            "-p", "NumberReferenceFrames=2", "-p", "SearchRange=16"]
    r = subprocess.run(args, capture_output=True, text=True, timeout=300,
                       cwd=tmp_path)
    assert (tmp_path / "jm.264").exists(), r.stdout + r.stderr
    return (tmp_path / "jm.264").read_bytes(), str(tmp_path / "jmrec.yuv")


@needs_jm
@pytest.mark.parametrize("entropy", ["cavlc", "cabac"])
@pytest.mark.parametrize("gop", ["intra", "ipp"])
def test_decode_jm_trans8_stream(tmp_path, entropy, gop):
    stream, rec_path = _jm_encode(tmp_path, entropy == "cabac",
                                  gop == "intra")
    out = H264Decoder().decode(stream)
    ry, ru, rv = yuv.read_frames(rec_path, 176, 144)
    assert len(out) == len(ry)
    for i in range(len(out)):
        for ours, ref in zip(out[i], (ry[i], ru[i], rv[i])):
            np.testing.assert_array_equal(ours.astype(np.uint8), ref)


@needs_jm
@pytest.mark.parametrize("entropy", ["cavlc", "cabac"])
def test_encode_trans8_jm_conformance(tmp_path, entropy, monkeypatch):
    """Our High-profile streams (I_8x8 forced on IDR + natural 8x8
    transform choice on P MBs) decode bit-exactly in JM ldecod."""
    from video_codecs_tpu.models.h264.inter_codec import (H264Decoder,
                                                          H264Encoder)
    monkeypatch.setenv("VCT_FORCE_I8", "1")
    ys, us, vs = yuv.read_frames(FOREMAN, 176, 144)
    frames = [(ys[i], us[i], vs[i]) for i in range(3)]
    enc = H264Encoder(176, 144, qp=28, entropy=entropy, transform8x8=True)
    stream, recons = enc.encode_sequence(frames)
    assert enc._trans8.any()           # 8x8 transform actually used
    out = H264Decoder().decode(stream)  # self roundtrip
    for o, rc in zip(out, recons):
        for a, b in zip(o, rc):
            np.testing.assert_array_equal(np.asarray(a, np.int64),
                                          np.asarray(b, np.int64))
    (tmp_path / "t8.264").write_bytes(stream)
    r = subprocess.run([JM_DECODER, "-i", "t8.264", "-o", "jm.yuv"],
                       capture_output=True, text=True, timeout=120,
                       cwd=tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    ry, ru, rv = yuv.read_frames(str(tmp_path / "jm.yuv"), 176, 144)
    for i in range(len(frames)):
        for ours, ref in zip(recons[i], (ry[i], ru[i], rv[i])):
            np.testing.assert_array_equal(ref, ours.astype(np.uint8))


def test_8x8_transform_roundtrip():
    from video_codecs_tpu.ops import h264_transform as ht
    rng = np.random.default_rng(0)
    res = rng.integers(-255, 255, (50, 8, 8))
    w = ht.forward8x8(res)
    lv = ht.quant8x8(w, 0, intra=True)
    rec = ht.inverse8x8(ht.dequant8x8(lv, 0))
    assert np.abs(rec - res).max() <= 2
    # error grows monotonically-ish with QP but stays bounded
    lv = ht.quant8x8(w, 30, intra=False)
    rec = ht.inverse8x8(ht.dequant8x8(lv, 30))
    assert np.abs(rec - res).max() < 64


def test_zigzag8x8_matches_diagonal_rule():
    from video_codecs_tpu.ops import h264_transform as ht
    z = ht.ZIGZAG_8x8
    assert sorted(z.tolist()) == list(range(64))
    assert z[0] == 0 and z[1] == 1 and z[2] == 8 and z[3] == 16
    assert z[-1] == 63
