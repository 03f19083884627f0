"""Cyclic intra refresh in P slices (jm18.5 lencod intrarefresh.c
RandomIntraMBRefresh semantics: N MBs per P picture forced to intra,
cycling until the whole picture is refreshed)."""

import os
import subprocess

import numpy as np
import pytest

from test_h264_inter import JM_DECODER
from video_codecs_tpu.entropy import bitstream as bs
from video_codecs_tpu.models.h264.inter_codec import H264Decoder, H264Encoder


def static_clip(n=4, w=64, h=48):
    rng = np.random.default_rng(5)
    y = rng.integers(0, 256, (h, w)).astype(np.uint8)
    u = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    v = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    return [(y, u, v)] * n


def _p_nal_sizes(stream):
    sizes = []
    for nal in bs.split_annexb(stream):
        if nal[0] & 0x1F == 1:      # non-IDR slice
            sizes.append(len(nal))
    return sizes


def test_intra_refresh_roundtrip_and_cycles():
    frames = static_clip(4)
    enc = H264Encoder(64, 48, qp=28, intra_refresh=4)
    stream, recons = enc.encode_sequence(frames)
    out = H264Decoder().decode(stream)
    for i in range(len(frames)):
        for j in range(3):
            np.testing.assert_array_equal(out[i][j], recons[i][j])
    # 12 MBs, 4 per P frame: the cursor wraps after 3 P frames
    assert enc._refresh_cursor == 0


def test_intra_refresh_forces_intra_on_static_content():
    """On a static scene every MB would be P_Skip; with refresh on, the
    forced intra MBs must make the P slices substantially larger."""
    frames = static_clip(4)
    base = H264Encoder(64, 48, qp=28).encode_sequence(frames)[0]
    refr = H264Encoder(64, 48, qp=28, intra_refresh=4).encode_sequence(
        frames)[0]
    b_sizes, r_sizes = _p_nal_sizes(base), _p_nal_sizes(refr)
    assert len(b_sizes) == len(r_sizes) == 3
    assert all(r > 2 * b for r, b in zip(r_sizes, b_sizes)), \
        (b_sizes, r_sizes)


@pytest.mark.skipif(not os.path.exists(JM_DECODER),
                    reason="JM reference decoder not built")
def test_intra_refresh_ldecod_conformance(tmp_path):
    frames = static_clip(4)
    enc = H264Encoder(64, 48, qp=28, intra_refresh=4)
    stream, recons = enc.encode_sequence(frames)
    bin_path = tmp_path / "ir.264"
    rec_path = tmp_path / "ir_rec.yuv"
    bin_path.write_bytes(stream)
    r = subprocess.run(
        [JM_DECODER, "-p", f"InputFile={bin_path}",
         "-p", f"OutputFile={rec_path}", "-p", "WriteUV=1"],
        capture_output=True, text=True, timeout=300, cwd=tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    raw = rec_path.read_bytes()
    w, h = 64, 48
    fsz = w * h * 3 // 2
    for i, (ey, eu, ev) in enumerate(recons):
        fr = np.frombuffer(raw[i * fsz:(i + 1) * fsz], np.uint8)
        np.testing.assert_array_equal(
            fr[:w * h].reshape(h, w), ey.astype(np.uint8))
        np.testing.assert_array_equal(
            fr[w * h:w * h + fsz // 6].reshape(h // 2, w // 2),
            eu.astype(np.uint8))
        np.testing.assert_array_equal(
            fr[w * h + fsz // 6:].reshape(h // 2, w // 2),
            ev.astype(np.uint8))
