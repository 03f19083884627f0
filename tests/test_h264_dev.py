"""Device H.264 P-slice engine (models/h264/inter_jax): streams must
round-trip in our decoder AND decode bit-exactly in JM ldecod, with the
P_16x16 / P_8x8 device mode decision engaging.
"""

import os
import subprocess

import numpy as np
import pytest

from video_codecs_tpu.models.h264.inter_codec import H264Decoder
from video_codecs_tpu.models.h264.inter_jax import DeviceH264Encoder
from video_codecs_tpu.utils import yuv

JM_DECODER = "/root/repo/.refbuild/jm18.5/bin/ldecod.exe"
FOREMAN = "/root/reference/jm18.5/bin/foreman_part_qcif.yuv"


def _roundtrip(enc, frames):
    stream, recons = enc.encode_sequence(frames)
    dec = H264Decoder()
    out = dec.decode(stream)
    assert len(out) == len(frames)
    for i, (r, o) in enumerate(zip(recons, out)):
        for c in range(3):
            np.testing.assert_array_equal(
                np.asarray(r[c], np.uint8), np.asarray(o[c], np.uint8),
                err_msg=f"frame {i} plane {c}")
    return stream, recons


def test_device_p_roundtrip():
    rng = np.random.default_rng(0)
    w, h = 96, 80
    base = rng.integers(0, 256, (h + 16, w + 16), np.uint8)
    frames = []
    for f in range(4):
        y = np.ascontiguousarray(base[f:f + h, 2 * f:2 * f + w])
        u = (y[::2, ::2] // 2 + 64).astype(np.uint8)
        v = (y[1::2, ::2] // 2 + 32).astype(np.uint8)
        frames.append((y, u, v))
    enc = DeviceH264Encoder(w, h, qp=30, search_range=8)
    _roundtrip(enc, frames)


@pytest.mark.skipif(not (os.path.exists(JM_DECODER)
                         and os.path.exists(FOREMAN)),
                    reason="JM reference decoder not built")
def test_device_p_ldecod_conformance(tmp_path):
    ys, us, vs = yuv.read_frames(FOREMAN, 176, 144)
    frames = [(ys[i], us[i], vs[i]) for i in range(len(ys))]
    enc = DeviceH264Encoder(176, 144, qp=28, search_range=16)
    stream, recons = _roundtrip(enc, frames)
    (tmp_path / "p.264").write_bytes(stream)
    r = subprocess.run([JM_DECODER, "-i", "p.264", "-o", "jm.yuv"],
                       capture_output=True, text=True, timeout=120,
                       cwd=tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    assert f"{len(frames)} frames are decoded" in r.stdout, r.stdout
    ry, ru, rv = yuv.read_frames(str(tmp_path / "jm.yuv"), 176, 144)
    for i in range(len(frames)):
        for ours, ref in zip(recons[i], (ry[i], ru[i], rv[i])):
            np.testing.assert_array_equal(ref, ours.astype(np.uint8))
