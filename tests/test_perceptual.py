"""Perceptual RDO (stvssim fork parity): saliency-driven per-MB lambda
and SSIM-augmented mode decision wired into the H.264 encoder.

Parity: stvssim_src/stvssimrdo2_att — attention.c saliency -> att_mbWgt,
mode_decision.c:140-151 adjust_lambda, rdopt.c:469-481 SSE+(1-SSIM)."""

import os
import subprocess

import numpy as np
import pytest

from video_codecs_tpu.models.h264.inter_codec import H264Decoder, H264Encoder
from video_codecs_tpu.models.h264.intra_codec import block_ssim
from video_codecs_tpu.utils import yuv

JM_DECODER = "/root/repo/.refbuild/jm18.5/bin/ldecod.exe"
FOREMAN = "/root/reference/jm18.5/bin/foreman_part_qcif.yuv"


def test_block_ssim_bounds():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 256, (16, 16))
    assert block_ssim(a, a) == pytest.approx(1.0)
    b = rng.integers(0, 256, (16, 16))
    s = block_ssim(a, b)
    assert -1.0 <= s < 0.9


def _frames(n=3, w=96, h=96):
    # real content (a foreman crop): decisions are marginal enough that
    # lambda modulation actually flips some of them
    ys, us, vs = yuv.read_frames(FOREMAN, 176, 144, n)
    return [(ys[i][:h, :w], us[i][:h // 2, :w // 2], vs[i][:h // 2, :w // 2])
            for i in range(n)]


@pytest.mark.skipif(not os.path.exists(FOREMAN),
                    reason="foreman fixture unavailable")
def test_perceptual_streams_decode_and_differ():
    frames = _frames()
    plain, rec_plain = H264Encoder(96, 96, qp=30).encode_sequence(frames)
    perc, rec_perc = H264Encoder(
        96, 96, qp=30, perceptual="att+ssim").encode_sequence(frames)
    # perceptual mode changes decisions, not validity
    out = H264Decoder().decode(perc)
    for i in range(len(frames)):
        for j in range(3):
            np.testing.assert_array_equal(out[i][j], rec_perc[i][j])
    assert perc != plain
    p = yuv.psnr(np.stack([r[0] for r in rec_perc]),
                 np.stack([f[0] for f in frames]))
    assert p > 28, p


@pytest.mark.skipif(not os.path.exists(JM_DECODER),
                    reason="JM reference decoder not built")
def test_perceptual_stream_jm_conformant(tmp_path):
    ys, us, vs = yuv.read_frames(FOREMAN, 176, 144, 3)
    frames = [(ys[i], us[i], vs[i]) for i in range(len(ys))]
    enc = H264Encoder(176, 144, qp=30, perceptual="att+ssim")
    stream, recons = enc.encode_sequence(frames)
    (tmp_path / "p.264").write_bytes(stream)
    r = subprocess.run([JM_DECODER, "-i", "p.264", "-o", "jm.yuv"],
                       capture_output=True, text=True, timeout=120,
                       cwd=tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    ry, ru, rv = yuv.read_frames(str(tmp_path / "jm.yuv"), 176, 144)
    for i in range(len(frames)):
        for ours, ref in zip(recons[i], (ry[i], ru[i], rv[i])):
            np.testing.assert_array_equal(ref, ours.astype(np.uint8))
