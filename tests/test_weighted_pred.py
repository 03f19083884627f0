"""HEVC explicit weighted prediction (TComWeightPrediction /
WeightPredAnalysis parity): fade sequences, round-trip, HM conformance."""

import os
import subprocess

import numpy as np
import pytest

from video_codecs_tpu.models.hevc import headers, inter_codec
from video_codecs_tpu.utils import yuv

HM_DECODER = "/root/repo/.refbuild/hm-16.5rc1/bin/TAppDecoderStatic"
FOREMAN = "/root/reference/jm18.5/bin/foreman_part_qcif.yuv"


def fade_frames(n=4):
    ys, us, vs = yuv.read_frames(FOREMAN, 176, 144)
    frames = []
    for i in range(n):
        g = 1.0 - 0.12 * i
        frames.append(tuple(
            np.clip(p[i % 3].astype(np.float64) * g, 0, 255).astype(np.uint8)
            for p in (ys, us, vs)))
    return frames


def test_wp_estimation_identity_on_static():
    rng = np.random.default_rng(5)
    y = rng.integers(0, 256, (64, 64)).astype(np.uint8)
    u = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    v = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    wp = inter_codec.estimate_wp_params((y, u, v), (y, u, v))
    assert wp["w"] == (64, 64, 64) and wp["o"] == (0, 0, 0)


def test_wp_estimation_tracks_fade():
    rng = np.random.default_rng(5)
    ref = rng.integers(0, 200, (64, 64)).astype(np.uint8)
    cur = (ref.astype(np.float64) * 0.75).astype(np.uint8)
    wp = inter_codec.estimate_wp_params((cur,), (ref,))
    assert 44 <= wp["w"][0] <= 52, wp   # ~0.75 * 64


def test_wp_roundtrip_and_gain():
    frames = fade_frames()
    sizes = {}
    for wp_on in (False, True):
        cfg = headers.HevcConfig(width=176, height=144, qp=32,
                                 weighted_pred=wp_on)
        stream, recons = inter_codec.LowDelayEncoder(cfg) \
            .encode_sequence_ldp(frames)
        out = inter_codec.LowDelayDecoder().decode(stream)
        for i in range(len(frames)):
            for j in range(3):
                np.testing.assert_array_equal(out[i][j], recons[i][j])
        sizes[wp_on] = len(stream)
    # WP must pay for itself on a fade
    assert sizes[True] < 0.9 * sizes[False], sizes


@pytest.mark.skipif(not os.path.exists(HM_DECODER),
                    reason="HM reference decoder not built")
def test_wp_hm_conformance(tmp_path):
    frames = fade_frames()
    cfg = headers.HevcConfig(width=176, height=144, qp=32,
                             weighted_pred=True)
    stream, recons = inter_codec.LowDelayEncoder(cfg) \
        .encode_sequence_ldp(frames)
    (tmp_path / "wp.bin").write_bytes(stream)
    r = subprocess.run([HM_DECODER, "-b", "wp.bin", "-o", "rec.yuv"],
                       capture_output=True, text=True, timeout=120,
                       cwd=tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    assert r.stdout.count("(OK)") == len(frames), r.stdout
    assert "ERROR" not in r.stdout
    ry, ru, rv = yuv.read_frames(str(tmp_path / "rec.yuv"), 176, 144)
    for i in range(len(frames)):
        for ours, ref in zip(recons[i], (ry[i], ru[i], rv[i])):
            np.testing.assert_array_equal(ref, ours.astype(np.uint8))
