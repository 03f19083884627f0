"""Rate control at reference fidelity: per-level adaptive R-lambda
(HmRateControl) and URQ basic units.

Done criterion (VERDICT round-4 ask #7): target-hit within a few
percent over >=30 frames, compared against HM's own rate-control
output on the same clip.

Parity: hm-16.5rc1 TEncRateCtrl.cpp:96-117 (update-rate ladder),
:1001 updateAfterPicture, :1095 updateAlphaBetaIntra, :1072
getRefineBitsForIntra; hm11.0_ratectrl URQ branch / jm18.5
rc_quadratic.c basic units.
"""

import os
import subprocess

import numpy as np
import pytest

from video_codecs_tpu.models.hevc import headers, inter_codec, ratectrl
from video_codecs_tpu.utils import yuv

HM_ENCODER = "/root/repo/.refbuild/hm-16.5rc1/bin/TAppEncoderStatic"
HM_CFG = "/root/repo/.refbuild/hm-16.5rc1/cfg/encoder_lowdelay_P_main.cfg"


def _clip(w, h, n, seed=2):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h + n + 8, w + 2 * n + 8), np.uint8)
    frames = []
    for f in range(n):
        y = np.ascontiguousarray(base[f:f + h, 2 * f:2 * f + w])
        u = (y[::2, ::2] // 2 + 64).astype(np.uint8)
        v = (y[1::2, ::2] // 2 + 32).astype(np.uint8)
        frames.append((y, u, v))
    return frames


def test_hm_ratecontrol_hits_target_30_frames():
    w, h, n, fps = 96, 80, 32, 30.0
    target_bps = 400_000.0
    frames = _clip(w, h, n)
    cfg = headers.HevcConfig(width=w, height=h, qp=32)
    enc = inter_codec.LowDelayEncoder(cfg, search_range=8)
    rc = ratectrl.HmRateControl(target_bps, fps, w, h)
    stream, recons = enc.encode_sequence_ldp(frames, rate_control=rc)
    achieved = len(stream) * 8 * fps / n
    err = abs(achieved - target_bps) / target_bps
    assert err < 0.08, f"achieved {achieved:.0f} vs target {target_bps}"


def test_hm_ratecontrol_adapts_per_level():
    rc = ratectrl.HmRateControl(500_000, 30.0, 96, 80,
                                gop_weights=(2.0, 1.0), n_levels=3)
    a0 = list(rc.alpha)
    for i in range(12):
        level = 1 + (i % 2)
        lam, qp = rc.start_picture(level)
        bits = 3000.0 if level == 1 else 1000.0
        rc.update_after_picture(level, bits, qp, lam, is_intra=False)
    assert rc.alpha[1] != a0[1] and rc.alpha[2] != a0[2]
    assert rc.alpha[1] != rc.alpha[2], "levels adapt independently"
    # intra model update moves the level-0 pair
    lam, qp = rc.start_picture(0, intra_cost=5.0e5)
    rc.update_after_picture(0, 20000.0, qp, lam, is_intra=True,
                            intra_cost=5.0e5)
    assert rc.alpha[0] != 6.7542


def test_urq_basic_units():
    rc = ratectrl.UrqBasicUnitControl(300_000, 30.0, 96, 80,
                                      units_per_frame=5)
    totals = []
    rng = np.random.default_rng(0)
    for f in range(40):
        rc.start_frame()
        spent = 0.0
        for u in range(5):
            qp = rc.unit_qp()
            assert 1 <= qp <= 51
            # simulated encoder: bits fall with qstep, mad noisy
            bits = 120000.0 / rc._qstep(qp) * rng.uniform(0.8, 1.25) / 5
            rc.update_unit(bits, mad=rng.uniform(4, 12))
            spent += bits
        rc.end_frame()
        totals.append(spent)
    avg = float(np.mean(totals[10:])) * 30.0
    assert abs(avg - 300_000) / 300_000 < 0.15


@pytest.mark.skipif(not os.path.exists(HM_ENCODER),
                    reason="HM reference encoder not built")
def test_vs_hm_ratecontrol(tmp_path):
    """Both HM's RC and ours must land the same target on the same
    clip; ours must be at least as close (within a few percent)."""
    w, h, n, fps = 96, 80, 32, 30
    target_bps = 300_000
    frames = _clip(w, h, n, seed=4)
    src = tmp_path / "src.yuv"
    yuv.write_frames(str(src), np.stack([f[0] for f in frames]),
                     np.stack([f[1] for f in frames]),
                     np.stack([f[2] for f in frames]))
    r = subprocess.run(
        [HM_ENCODER, "-c", HM_CFG, "-i", str(src),
         "-b", str(tmp_path / "hm.bin"), "-o", str(tmp_path / "r.yuv"),
         "-wdt", str(w), "-hgt", str(h), "-f", str(n), "-fr", str(fps),
         "--RateControl=1", f"--TargetBitrate={target_bps}"],
        capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, r.stdout[-1500:] + r.stderr[-500:]
    hm_bits = os.path.getsize(tmp_path / "hm.bin") * 8
    hm_err = abs(hm_bits * fps / n - target_bps) / target_bps

    cfg = headers.HevcConfig(width=w, height=h, qp=32)
    enc = inter_codec.LowDelayEncoder(cfg, search_range=8)
    rc = ratectrl.HmRateControl(target_bps, float(fps), w, h)
    stream, _ = enc.encode_sequence_ldp(frames, rate_control=rc)
    our_err = abs(len(stream) * 8 * fps / n - target_bps) / target_bps
    assert our_err < max(0.08, hm_err + 0.03), \
        f"ours {our_err:.3f} vs HM {hm_err:.3f}"
