"""Main10 decode conformance: HM streams encoded at
InternalBitDepth=10 (8-bit input, codec operating at 10 bits) must
decode bit-exactly — 10-bit intra prediction defaults/clipping,
dequant/inverse-transform shifts (15 - bd - log2), interpolation
first-stage truncation (bd - 8), deblock beta/tc scaling, SAO band
shift, and the 2-byte little-endian picture-hash SEI.

Parity: spec A.3.3 Main10; hm-16.5rc1 TComTrQuant.cpp:3061 (shift
formulas), TComInterpolationFilter.cpp:99 (shift1/shift2),
TComLoopFilter.cpp (tc/beta bit-depth scale), SEIwriter MD5.
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


def _hm10(tmp_path, cfg, w, h, qp, frames, extra=()):
    ys, us, vs = yuv.read_frames(FOREMAN, 176, 144)
    cyc = [i % len(ys) for i in range(frames)]     # source is 3 frames
    src = tmp_path / "src.yuv"
    yuv.write_frames(str(src), ys[cyc][:, :h, :w],
                     us[cyc][:, :h // 2, :w // 2],
                     vs[cyc][:, :h // 2, :w // 2])
    out = tmp_path / "hm.bin"
    rec = tmp_path / "hm_rec.yuv"
    r = subprocess.run(
        [HM_ENCODER, "-c", f"{HM_CFG_DIR}/{cfg}", "-i", str(src),
         "-b", str(out), "-o", str(rec), "-wdt", str(w), "-hgt", str(h),
         "-f", str(frames), "-fr", "30", "-q", str(qp),
         "--InputBitDepth=8", "--InternalBitDepth=10",
         "--SEIDecodedPictureHash=1", *extra],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-1000:]
    return out.read_bytes(), str(rec)


def _read10(path, w, h, n):
    """HM writes 10-bit recon as 16-bit little-endian 4:2:0."""
    raw = np.fromfile(path, dtype="<u2")
    fs = w * h * 3 // 2
    raw = raw[:n * fs].reshape(n, fs)
    ys = raw[:, :w * h].reshape(n, h, w)
    us = raw[:, w * h:w * h * 5 // 4].reshape(n, h // 2, w // 2)
    vs = raw[:, w * h * 5 // 4:].reshape(n, h // 2, w // 2)
    return ys, us, vs


def _check(stream, rec, w, h, n, dec):
    frames = dec.decode(stream)
    assert len(frames) == n, len(frames)
    assert dec.sps.bit_depth == 10
    assert dec.hash_status == [True] * n, dec.hash_status
    ry, ru, rv = _read10(rec, w, h, n)
    for i, f in enumerate(frames):
        np.testing.assert_array_equal(np.asarray(f[0], np.uint16), ry[i])
        np.testing.assert_array_equal(np.asarray(f[1], np.uint16), ru[i])
        np.testing.assert_array_equal(np.asarray(f[2], np.uint16), rv[i])


@pytest.mark.parametrize("qp", [27, 37])
def test_main10_intra(tmp_path, qp):
    stream, rec = _hm10(tmp_path, "encoder_intra_main10.cfg",
                        176, 144, qp, 2)
    _check(stream, rec, 176, 144, 2, decoder.GeneralIntraDecoder())


def test_main10_lowdelay_p(tmp_path):
    # 5 source frames = IDR + one full GOP-4 (the HM LD cfgs only emit
    # complete GOPs after the I picture)
    stream, rec = _hm10(tmp_path, "encoder_lowdelay_P_main10.cfg",
                        176, 144, 32, 5)
    _check(stream, rec, 176, 144, 5, decoder.GeneralDecoder())


def test_main10_lowdelay_b_amp_tskip(tmp_path):
    stream, rec = _hm10(tmp_path, "encoder_lowdelay_main10.cfg",
                        128, 96, 30, 5,
                        ["--AMP=1", "--TransformSkip=1",
                         "--TransformSkipFast=1"])
    _check(stream, rec, 128, 96, 5, decoder.GeneralDecoder())
