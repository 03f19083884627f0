"""Syntax-trace mode: encoder trace == decoder trace, line for line.

Parity: HM ENC_DEC_TRACE / JM TRACE — the reference's desync-hunting
tool dumps every syntax element on both sides and diffs the dumps."""

import numpy as np

from video_codecs_tpu.models.h264.inter_codec import H264Decoder, H264Encoder
from video_codecs_tpu.utils import trace


def _frames(n=3, w=64, h=48, seed=11):
    rng = np.random.default_rng(seed)
    by = rng.integers(0, 256, (h + 8, w + 8)).astype(np.uint8)
    bu = rng.integers(0, 256, (h // 2 + 4, w // 2 + 4)).astype(np.uint8)
    return [(by[t:t + h, t * 2:t * 2 + w],
             bu[t // 2:t // 2 + h // 2, t:t + w // 2],
             bu[t // 2:t // 2 + h // 2, t:t + w // 2]) for t in range(n)]


def test_cabac_enc_dec_traces_identical():
    frames = _frames()
    enc = H264Encoder(64, 48, qp=30, entropy="cabac", n_refs=2)

    trace.start()
    stream, recons = enc.encode_sequence(frames)
    enc_trace = trace.stop()
    assert not trace.active()

    trace.start()
    out = H264Decoder().decode(stream)
    dec_trace = trace.stop()

    assert len(enc_trace) > 200
    assert enc_trace == dec_trace
    for i in range(len(frames)):
        for j in range(3):
            np.testing.assert_array_equal(out[i][j], recons[i][j])


def test_trace_off_is_noop():
    frames = _frames(n=1)
    enc = H264Encoder(64, 48, qp=30, entropy="cabac")
    stream, _ = enc.encode_sequence(frames)   # no start(): nothing collected
    assert trace.stop() == []
    assert "mb_type" in " ".join(
        _traced_names()), "trace spec lost its elements"


def _traced_names():
    return list(trace._SPEC)
