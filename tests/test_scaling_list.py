"""Scaling-list decode conformance: HM streams with --ScalingList=1
(default quantization matrices) and --ScalingList=2 (explicit file)
must decode bit-exactly (hash SEI verified).

Parity: spec 7.3.4 scaling_list_data / 8.6.3 scaling process;
hm-16.5rc1 TComTrQuant.cpp:3061-3283 (processScalingListDec, xDeQuant
enableScalingLists branch), TDecCAVLC parseScalingList.
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


def test_default_scaling_lists_intra(tmp_path):
    stream, rec = _hm(tmp_path, "encoder_intra_main.cfg", 96, 80, 27, 2,
                      ["--ScalingList=1"])
    dec = decoder.GeneralIntraDecoder()
    frames = dec.decode(stream)
    assert dec.hash_status == [True] * 2
    ry, _, _ = yuv.read_frames(rec, 96, 80)
    for i, f in enumerate(frames):
        np.testing.assert_array_equal(f[0].astype(np.uint8), ry[i])


def test_default_scaling_lists_ldp(tmp_path):
    stream, rec = _hm(tmp_path, "encoder_lowdelay_P_main.cfg", 96, 80,
                      32, 3, ["--ScalingList=1"])
    dec = decoder.GeneralDecoder()
    frames = dec.decode(stream)
    assert dec.hash_status == [True] * 3
    ry, _, _ = yuv.read_frames(rec, 96, 80)
    for i, f in enumerate(frames):
        np.testing.assert_array_equal(f[0].astype(np.uint8), ry[i])


def test_explicit_scaling_list_file(tmp_path):
    """--ScalingList=2: exercises the scaling_list_data() parser (DPCM
    deltas over the ungrouped diagonal scan + DC override)."""
    slf = tmp_path / "sl.txt"
    # HM ScalingListFile format: named sections, 16 or 64 values
    names4 = ["INTRA4X4_LUMA", "INTRA4X4_CHROMAU", "INTRA4X4_CHROMAV",
              "INTER4X4_LUMA", "INTER4X4_CHROMAU", "INTER4X4_CHROMAV"]
    names8 = ["INTRA8X8_LUMA", "INTRA8X8_CHROMAU", "INTRA8X8_CHROMAV",
              "INTER8X8_LUMA", "INTER8X8_CHROMAU", "INTER8X8_CHROMAV"]
    names16 = ["INTRA16X16_LUMA", "INTRA16X16_CHROMAU",
               "INTRA16X16_CHROMAV", "INTER16X16_LUMA",
               "INTER16X16_CHROMAU", "INTER16X16_CHROMAV"]
    names32 = ["INTRA32X32_LUMA", "INTER32X32_LUMA"]
    lines = []
    rng = np.random.default_rng(3)
    for n in names4:
        vals = 16 + rng.integers(-2, 6, 16)
        lines.append(f"{n} =\n" + ",".join(str(v) for v in vals) + "\n")
    for n in names8 + names16 + names32:
        vals = 16 + rng.integers(-2, 10, 64)
        lines.append(f"{n} =\n" + ",".join(str(v) for v in vals) + "\n")
        if "16X16" in n or "32X32" in n:
            lines.append(f"{n}_DC =\n18\n")
    slf.write_text("\n".join(lines))
    stream, rec = _hm(tmp_path, "encoder_intra_main.cfg", 96, 80, 32, 2,
                      ["--ScalingList=2", f"--ScalingListFile={slf}"])
    dec = decoder.GeneralIntraDecoder()
    frames = dec.decode(stream)
    assert dec.hash_status == [True] * 2
    ry, _, _ = yuv.read_frames(rec, 96, 80)
    for i, f in enumerate(frames):
        np.testing.assert_array_equal(f[0].astype(np.uint8), ry[i])
