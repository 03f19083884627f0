"""Hierarchical-B (IBPBP) streams: round-trip + HM conformance."""

import os
import subprocess

import numpy as np
import pytest

from test_inter_codec import moving_clip
from test_intra_codec import HM_DECODER
from video_codecs_tpu.models.hevc import bframe_codec, headers
from video_codecs_tpu.utils import yuv


def test_bframes_roundtrip():
    w, h = 64, 48
    cfg = headers.HevcConfig(width=w, height=h, qp=30, reorder_pics=1)
    enc = bframe_codec.HierarchicalBEncoder(cfg)
    frames = moving_clip(w, h, 5)
    stream, recons = enc.encode_sequence_rab(frames)
    dec = bframe_codec.HierarchicalBDecoder()
    out = dec.decode(stream)
    assert len(out) == 5
    assert all(dec.hash_status), dec.hash_status
    for o, r in zip(out, recons):
        np.testing.assert_array_equal(o[0], r[0])
        np.testing.assert_array_equal(o[1], r[1])
        np.testing.assert_array_equal(o[2], r[2])
    p = yuv.psnr(np.stack([r[0] for r in recons]),
                 np.stack([f[0] for f in frames]))
    assert p > 30, p


@pytest.mark.skipif(not os.path.exists(HM_DECODER),
                    reason="HM reference decoder not built")
def test_bframes_hm_conformance(tmp_path):
    w, h = 64, 48
    cfg = headers.HevcConfig(width=w, height=h, qp=32, reorder_pics=1)
    enc = bframe_codec.HierarchicalBEncoder(cfg)
    frames = moving_clip(w, h, 5)
    stream, recons = enc.encode_sequence_rab(frames)
    p = tmp_path / "rab.bin"
    rec = tmp_path / "rab.yuv"
    p.write_bytes(stream)
    r = subprocess.run([HM_DECODER, "-b", str(p), "-o", str(rec)],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stdout + r.stderr
    assert r.stdout.count("(OK)") == 5 and "ERROR" not in r.stdout, r.stdout
    # HM outputs in POC order
    ry, ru, rv = yuv.read_frames(str(rec), w, h)
    for i, (ey, eu, ev) in enumerate(recons):
        np.testing.assert_array_equal(ry[i], ey.astype(np.uint8))
        np.testing.assert_array_equal(ru[i], eu.astype(np.uint8))


@pytest.mark.skipif(not os.path.exists(HM_DECODER),
                    reason="HM reference decoder not built")
def test_bipred_hm_conformance(tmp_path):
    """Static + noise content forces PRED_BI blocks; HM must agree."""
    rng = np.random.default_rng(3)
    base_y = rng.integers(60, 200, (48, 64)).astype(np.int32)
    frames = []
    for f in range(5):
        y = np.clip(base_y + rng.integers(-9, 10, base_y.shape),
                    0, 255).astype(np.uint8)
        u = np.full((24, 32), 120, np.uint8)
        v = np.full((24, 32), 130, np.uint8)
        frames.append((y, u, v))
    cfg = headers.HevcConfig(width=64, height=48, qp=35, reorder_pics=1)
    enc = bframe_codec.HierarchicalBEncoder(cfg)
    stream, recons = enc.encode_sequence_rab(frames)
    p = tmp_path / "bi.bin"
    rec = tmp_path / "bi.yuv"
    p.write_bytes(stream)
    r = subprocess.run([HM_DECODER, "-b", str(p), "-o", str(rec)],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stdout + r.stderr
    assert r.stdout.count("(OK)") == 5 and "ERROR" not in r.stdout, r.stdout
    ry, _, _ = yuv.read_frames(str(rec), 64, 48)
    for i, (ey, _, _) in enumerate(recons):
        np.testing.assert_array_equal(ry[i], ey.astype(np.uint8))
