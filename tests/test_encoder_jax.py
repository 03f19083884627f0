"""Device (wavefront) encoder path must match the host reference bit-exactly."""

import numpy as np

from test_intra_codec import synth_frame
from video_codecs_tpu.models.hevc import headers, intra_codec


def test_fast_path_matches_host_path():
    w, h = 64, 48
    cfg = headers.HevcConfig(width=w, height=h, qp=32)
    frames = [synth_frame(w, h, s) for s in range(2)]

    enc_a = intra_codec.IntraEncoder(cfg)
    stream_a, rec_a = enc_a.encode_sequence(frames)
    enc_b = intra_codec.IntraEncoder(cfg)
    stream_b, rec_b = enc_b.encode_sequence(frames, fast=True)

    for (ay, au, av), (by_, bu, bv) in zip(rec_a, rec_b):
        np.testing.assert_array_equal(ay, by_)
        np.testing.assert_array_equal(au, bu)
        np.testing.assert_array_equal(av, bv)
    assert stream_a == stream_b

    dec = intra_codec.IntraDecoder()
    out = dec.decode(stream_b)
    assert dec.hash_status == [True, True]
    np.testing.assert_array_equal(out[0][0], rec_b[0][0])


def test_native_cabac_matches_python():
    from video_codecs_tpu.entropy import native
    assert native.available(), "native CABAC library failed to build"
    w, h = 64, 48
    cfg = headers.HevcConfig(width=w, height=h, qp=27)
    frames = [synth_frame(w, h, s) for s in range(2)]
    enc = intra_codec.IntraEncoder(cfg)
    for (y, u, v) in frames:
        nals_nat, _ = enc.encode_frame_fast(y, u, v, use_native=True)
        nals_py, _ = enc.encode_frame_fast(y, u, v, use_native=False)
        assert nals_nat[0] == nals_py[0], "native slice != python slice"


def test_fast_path_device_rdoq_lite_roundtrip():
    """RDOQ-lite on device (quant.rdoq_lite): stream still decodes with
    hash OK and costs no more bits than it saves PSNR for (sanity)."""
    import numpy as np
    from video_codecs_tpu.models.hevc import headers, intra_codec
    rng = np.random.default_rng(8)
    w, h = 64, 48
    frames = [(rng.integers(0, 256, (h, w), np.uint8),
               rng.integers(0, 256, (h // 2, w // 2), np.uint8),
               rng.integers(0, 256, (h // 2, w // 2), np.uint8))]
    cfg = headers.HevcConfig(width=w, height=h, qp=32, rdoq="lite")
    enc = intra_codec.IntraEncoder(cfg)
    stream, recons = enc.encode_sequence(frames, fast=True)
    dec = intra_codec.IntraDecoder()
    out = dec.decode(stream)
    assert dec.hash_status == [True]
    for j in range(3):
        np.testing.assert_array_equal(out[0][j], recons[0][j])
