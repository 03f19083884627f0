"""PCM (I_PCM) decode conformance: HM streams with --PCMEnabledFlag=1
must decode bit-exactly, including the CABAC engine restart after the
raw sample payload.

Parity: spec 7.3.8.7 pcm_sample / 9.3.1 re-initialization; hm-16.5rc1
TDecSbac.cpp:364 parseIPCMInfo, TEncCu.cpp:667 xCheckIntraPCM.
"""

import os
import subprocess

import numpy as np
import pytest

from video_codecs_tpu.models.hevc import decoder
from video_codecs_tpu.utils import yuv

HM_ENCODER = "/root/repo/.refbuild/hm-16.5rc1/bin/TAppEncoderStatic"
HM_CFG = "/root/repo/.refbuild/hm-16.5rc1/cfg/encoder_intra_main.cfg"

pytestmark = pytest.mark.skipif(
    not os.path.exists(HM_ENCODER),
    reason="HM reference encoder not built")


def test_pcm_decode(tmp_path):
    # dense noise makes transform coding expensive -> PCM wins on some
    # CUs at low QP (HM xCheckIntraPCM compares against raw-sample cost)
    rng = np.random.default_rng(7)
    w, h, n = 96, 80, 2
    ys = rng.integers(0, 256, (n, h, w), np.uint8)
    us = rng.integers(0, 256, (n, h // 2, w // 2), np.uint8)
    vs = rng.integers(0, 256, (n, h // 2, w // 2), np.uint8)
    src = tmp_path / "src.yuv"
    yuv.write_frames(str(src), ys, us, vs)
    out = tmp_path / "hm.bin"
    rec = tmp_path / "rec.yuv"
    r = subprocess.run(
        [HM_ENCODER, "-c", HM_CFG, "-i", str(src), "-b", str(out),
         "-o", str(rec), "-wdt", str(w), "-hgt", str(h), "-f", str(n),
         "-fr", "30", "-q", "7", "--SEIDecodedPictureHash=1",
         "--PCMEnabledFlag=1", "--PCMLog2MinSize=3", "--PCMLog2MaxSize=5"],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-1000:]
    stream = out.read_bytes()

    dec = decoder.GeneralIntraDecoder()
    frames = dec.decode(stream)
    assert dec.hash_status == [True] * n, "hash SEI must verify"
    ry, ru, rv = yuv.read_frames(str(rec), w, h)
    for i, f in enumerate(frames):
        np.testing.assert_array_equal(f[0].astype(np.uint8), ry[i])
        np.testing.assert_array_equal(f[1].astype(np.uint8), ru[i])
        np.testing.assert_array_equal(f[2].astype(np.uint8), rv[i])
