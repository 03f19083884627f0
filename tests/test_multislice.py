"""Multi-slice decode conformance: HM streams with --SliceMode=1
(fixed CTUs per slice) must decode bit-exactly — slice-segment
addresses, per-slice CABAC restart, and slice-boundary availability
gating for intra references, merge/AMVP neighbors, CABAC contexts and
SAO merges.

Parity: spec 7.3.6.1 slice_segment_address / 6.4.1 availability;
hm-16.5rc1 TEncSlice.cpp:611 xDetermineStartAndBoundingCtuTsAddr,
TDecSlice.cpp per-slice decode.
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


def _hm(tmp_path, cfg, w, h, qp, frames, extra):
    ys, us, vs = yuv.read_frames(FOREMAN, 176, 144, frames)
    src = tmp_path / "src.yuv"
    yuv.write_frames(str(src), ys[:, :h, :w], us[:, :h // 2, :w // 2],
                     vs[:, :h // 2, :w // 2])
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


@pytest.mark.parametrize("arg", [1, 2])
def test_multislice_intra(tmp_path, arg):
    stream, rec = _hm(tmp_path, "encoder_intra_main.cfg", 128, 96, 32, 2,
                      ["--SliceMode=1", f"--SliceArgument={arg}"])
    dec = decoder.GeneralIntraDecoder()
    frames = dec.decode(stream)
    assert dec.hash_status == [True] * 2
    ry, _, _ = yuv.read_frames(rec, 128, 96)
    for i, f in enumerate(frames):
        np.testing.assert_array_equal(f[0].astype(np.uint8), ry[i])


def test_multislice_ldp(tmp_path):
    stream, rec = _hm(tmp_path, "encoder_lowdelay_P_main.cfg", 128, 96,
                      32, 3, ["--SliceMode=1", "--SliceArgument=2"])
    dec = decoder.GeneralDecoder()
    frames = dec.decode(stream)
    assert dec.hash_status == [True] * 3
    ry, _, _ = yuv.read_frames(rec, 128, 96)
    for i, f in enumerate(frames):
        np.testing.assert_array_equal(f[0].astype(np.uint8), ry[i])
