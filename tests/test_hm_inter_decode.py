"""Decode HM-encoder INTER streams bit-exactly (LD-P / LD-B / RA).

Golden vectors are generated on the fly with the reference binary
(.refbuild TAppEncoderStatic) using the stock common-test-condition
configs — low-delay P, low-delay B (GPB) and random-access
hierarchical-B: CTU64, AMP, full RQT, skip/merge/AMVP, TMVP,
bi-prediction, transform skip, SBH, SAO, deblocking — and decoded with
the general decoder; output must equal HM's own reconstruction
sample-for-sample (display order) and every decoded-picture-hash SEI
must verify.

Parity: VERDICT round-2 item 3 (TDecCAVLC / TDecEntropy:372 /
TDecCu:410 breadth).
"""

import os
import subprocess

import numpy as np
import pytest

from video_codecs_tpu.models.hevc import decoder
from video_codecs_tpu.utils import yuv

HM_ENCODER = "/root/repo/.refbuild/hm-16.5rc1/bin/TAppEncoderStatic"
HM_CFG_DIR = "/root/repo/.refbuild/hm-16.5rc1/cfg"
FOREMAN = "/root/reference/jm18.5/bin/foreman_part_qcif.yuv"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(HM_ENCODER) and os.path.exists(FOREMAN)),
    reason="HM reference encoder not built")


def _encode_with_hm(tmp_path, cfg, w, h, qp, frames, extra=()):
    """Cycle the 3-frame foreman fixture into a `frames`-long clip with
    real back-and-forth motion, then encode with the stock HM cfg."""
    ys, us, vs = yuv.read_frames(FOREMAN, 176, 144, 3)
    idx = [(0, 1, 2, 1)[i % 4] for i in range(frames)]
    src = tmp_path / "src.yuv"
    yuv.write_frames(str(src), ys[idx, :h, :w], us[idx, :h // 2, :w // 2],
                     vs[idx, :h // 2, :w // 2])
    out = tmp_path / "hm.bin"
    rec = tmp_path / "hm_rec.yuv"
    r = subprocess.run(
        [HM_ENCODER, "-c", f"{HM_CFG_DIR}/{cfg}", "-i", str(src),
         "-b", str(out), "-o", str(rec), "-wdt", str(w), "-hgt", str(h),
         "-f", str(frames), "-fr", "30", "-q", str(qp),
         "--SEIDecodedPictureHash=1", *extra],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-1000:]
    return out.read_bytes(), str(rec)


def _check(stream, rec_path, w, h, n):
    dec = decoder.GeneralDecoder()
    frames = dec.decode(stream)
    assert len(frames) == n
    assert dec.hash_status == [True] * n, \
        f"hash SEI mismatch: {dec.hash_status}"
    ry, ru, rv = yuv.read_frames(rec_path, w, h)
    for i, f in enumerate(frames):
        np.testing.assert_array_equal(f[0].astype(np.uint8), ry[i],
                                      err_msg=f"luma frame {i}")
        np.testing.assert_array_equal(f[1].astype(np.uint8), ru[i],
                                      err_msg=f"cb frame {i}")
        np.testing.assert_array_equal(f[2].astype(np.uint8), rv[i],
                                      err_msg=f"cr frame {i}")


@pytest.mark.parametrize("w,h,qp,n", [
    (64, 64, 32, 5),      # single CTU64, one LD GOP + 1
    (80, 48, 27, 9),      # partial boundary CTUs both dims
])
def test_decode_hm_ldp_stream(tmp_path, w, h, qp, n):
    stream, rec = _encode_with_hm(tmp_path, "encoder_lowdelay_P_main.cfg",
                                  w, h, qp, n)
    _check(stream, rec, w, h, n)


def test_decode_hm_ldb_stream(tmp_path):
    """Low-delay B (GPB): B slices with both lists pointing backward —
    exercises bi-pred, mvd_l1_zero and the no-backward TMVP branch."""
    stream, rec = _encode_with_hm(tmp_path, "encoder_lowdelay_main.cfg",
                                  64, 64, 32, 5)
    _check(stream, rec, 64, 64, 5)


@pytest.mark.parametrize("w,h,qp,n", [
    (64, 64, 32, 9),      # one full GOP-8 pyramid
    (96, 80, 37, 17),     # two GOPs, boundary CTUs
])
def test_decode_hm_ra_stream(tmp_path, w, h, qp, n):
    stream, rec = _encode_with_hm(
        tmp_path, "encoder_randomaccess_main.cfg", w, h, qp, n)
    _check(stream, rec, w, h, n)


def test_decode_hm_ldp_weighted_pred(tmp_path):
    """Explicit weighted prediction on P slices (pred_weight_table parse
    + WP motion compensation)."""
    stream, rec = _encode_with_hm(
        tmp_path, "encoder_lowdelay_P_main.cfg", 64, 64, 32, 5,
        extra=("--WeightedPredP=1",))
    _check(stream, rec, 64, 64, 5)


def test_decode_hm_ra_ctu32(tmp_path):
    """Different CTU geometry on the RA path."""
    stream, rec = _encode_with_hm(
        tmp_path, "encoder_randomaccess_main.cfg", 96, 64, 32, 9,
        extra=("--MaxCUWidth=32", "--MaxCUHeight=32",
               "--MaxPartitionDepth=3"))
    _check(stream, rec, 96, 64, 9)
