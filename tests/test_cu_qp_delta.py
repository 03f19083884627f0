"""cu_qp_delta decode conformance: HM --RateControl=1 streams code
per-CTB luma QP deltas (cu_qp_delta_abs TU5+EG0 + sign at the first
coded TU of each quantization group) and must decode bit-exactly —
including the spatial qPY_PRED derivation (left/above in the same CTB
with previous-QG fallback, spec 8.6.1), the per-CU QP map feeding
deblocking edge QPs (8.7.2.5.3), and chroma QP re-derivation.

Parity: spec 7.3.8.4/7.3.8.10/8.6.1; hm-16.5rc1 TDecSbac::parseDeltaQP,
TComDataCU::getRefQP, TEncRateCtrl LCU-level QP assignment.
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


def test_chroma_qp_offset_stream_decodes(tmp_path):
    """Nonzero PPS cb/cr QP offsets must decode bit-exactly — the
    chroma deblock tc derivation adds cQpOffset before the chroma QP
    table (spec 8.7.2.5.5), not just the residual dequant path."""
    ys, us, vs = yuv.read_frames(FOREMAN, 176, 144)
    cyc = [i % len(ys) for i in range(5)]
    src = tmp_path / "src.yuv"
    yuv.write_frames(str(src), ys[cyc], us[cyc], vs[cyc])
    out = tmp_path / "hm.bin"
    rec = tmp_path / "hm_rec.yuv"
    r = subprocess.run(
        [HM_ENCODER, "-c", f"{HM_CFG_DIR}/encoder_lowdelay_P_main.cfg",
         "-i", str(src), "-b", str(out), "-o", str(rec),
         "-wdt", "176", "-hgt", "144", "-f", "5", "-fr", "30", "-q", "32",
         "--CbQpOffset=3", "--CrQpOffset=-2",
         "--SEIDecodedPictureHash=1"],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-1000:]
    dec = decoder.GeneralDecoder()
    frames = dec.decode(out.read_bytes())
    assert dec.hash_status == [True] * 5, dec.hash_status
    ry, ru, rv = yuv.read_frames(str(rec), 176, 144)
    for i, f in enumerate(frames):
        np.testing.assert_array_equal(f[0].astype(np.uint8), ry[i])
        np.testing.assert_array_equal(f[1].astype(np.uint8), ru[i])
        np.testing.assert_array_equal(f[2].astype(np.uint8), rv[i])


@pytest.mark.parametrize("boff,toff", [(2, 2), (-2, -1), (3, -3)])
def test_deblock_offset_stream_decodes(tmp_path, boff, toff):
    """Nonzero slice beta/tc deblocking offsets (spec 8.7.2.5.3 table
    index shifts) must decode bit-exactly."""
    ys, us, vs = yuv.read_frames(FOREMAN, 176, 144)
    cyc = [i % len(ys) for i in range(5)]
    src = tmp_path / "src.yuv"
    yuv.write_frames(str(src), ys[cyc], us[cyc], vs[cyc])
    out = tmp_path / "hm.bin"
    rec = tmp_path / "hm_rec.yuv"
    r = subprocess.run(
        [HM_ENCODER, "-c", f"{HM_CFG_DIR}/encoder_lowdelay_P_main.cfg",
         "-i", str(src), "-b", str(out), "-o", str(rec),
         "-wdt", "176", "-hgt", "144", "-f", "5", "-fr", "30", "-q", "32",
         f"--LoopFilterBetaOffset_div2={boff}",
         f"--LoopFilterTcOffset_div2={toff}",
         "--SEIDecodedPictureHash=1"],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-1000:]
    dec = decoder.GeneralDecoder()
    frames = dec.decode(out.read_bytes())
    assert dec.hash_status == [True] * 5, dec.hash_status
    ry, ru, rv = yuv.read_frames(str(rec), 176, 144)
    for i, f in enumerate(frames):
        np.testing.assert_array_equal(f[0].astype(np.uint8), ry[i])
        np.testing.assert_array_equal(f[1].astype(np.uint8), ru[i])
        np.testing.assert_array_equal(f[2].astype(np.uint8), rv[i])


@pytest.mark.parametrize("extra", [
    [],
    ["--MaxCuDQPDepth=1"],      # quantization groups below CTB size
], ids=["ctb_qg", "depth1_qg"])
def test_rate_control_stream_decodes(tmp_path, extra):
    ys, us, vs = yuv.read_frames(FOREMAN, 176, 144)
    cyc = [i % len(ys) for i in range(5)]
    src = tmp_path / "src.yuv"
    yuv.write_frames(str(src), ys[cyc], us[cyc], vs[cyc])
    out = tmp_path / "hm.bin"
    rec = tmp_path / "hm_rec.yuv"
    r = subprocess.run(
        [HM_ENCODER, "-c", f"{HM_CFG_DIR}/encoder_lowdelay_P_main.cfg",
         "-i", str(src), "-b", str(out), "-o", str(rec),
         "-wdt", "176", "-hgt", "144", "-f", "5", "-fr", "30",
         "--RateControl=1", "--TargetBitrate=200000",
         "--SEIDecodedPictureHash=1", *extra],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-1000:]
    dec = decoder.GeneralDecoder()
    frames = dec.decode(out.read_bytes())
    assert dec.pps.cu_qp_delta
    assert len(frames) == 5
    assert dec.hash_status == [True] * 5, dec.hash_status
    ry, ru, rv = yuv.read_frames(str(rec), 176, 144)
    for i, f in enumerate(frames):
        np.testing.assert_array_equal(f[0].astype(np.uint8), ry[i])
        np.testing.assert_array_equal(f[1].astype(np.uint8), ru[i])
        np.testing.assert_array_equal(f[2].astype(np.uint8), rv[i])
