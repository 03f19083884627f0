"""Debug env-var registry, bit-depth converter, Annex-B byte counter.

Parity: hm-16.5rc1 Debug.h EnvVar/DebugOptionList,
App/utils/convert_NtoMbit_YCbCr.cpp, App/utils/annexBbytecount.cpp."""

import numpy as np

from video_codecs_tpu.tools.convert import annexb_byte_count, convert_bitdepth
from video_codecs_tpu.utils import debug


def test_env_registry(monkeypatch):
    v = debug.register("VCT_TEST_FLAG", "0", "test flag")
    assert v.value == "0"
    monkeypatch.setenv("VCT_TEST_FLAG", "1")
    assert v.value == "1"
    assert debug.env_flag("VCT_TEST_FLAG", False, "test flag") is True
    assert any(e.name == "VCT_TEST_FLAG" for e in debug.registered())
    assert "VCT_TEST_FLAG = 1" in debug.print_env_vars()


def test_force_i4_env(monkeypatch):
    from video_codecs_tpu.models.h264.intra_codec import H264IntraEncoder
    monkeypatch.setenv("VCT_FORCE_I4", "1")
    assert H264IntraEncoder(32, 32).force_i4 is True
    monkeypatch.setenv("VCT_FORCE_I4", "0")
    assert H264IntraEncoder(32, 32).force_i4 is False


def test_bitdepth_widen_narrow_roundtrip():
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, 1024, np.uint8).tobytes()
    ten = convert_bitdepth(raw, 8, 10)
    arr10 = np.frombuffer(ten, "<u2")
    assert arr10.max() < 1024
    np.testing.assert_array_equal(arr10 >> 2,
                                  np.frombuffer(raw, np.uint8))
    back = convert_bitdepth(ten, 10, 8)
    assert back == raw                      # exact inverse of widening


def test_bitdepth_narrow_rounds():
    x = np.array([0, 1, 2, 3, 1023], "<u2").tobytes()
    out = np.frombuffer(convert_bitdepth(x, 10, 8), np.uint8)
    np.testing.assert_array_equal(out, [0, 0, 1, 1, 255])


def test_annexb_byte_count_totals():
    from video_codecs_tpu.models.hevc import headers, intra_codec
    rng = np.random.default_rng(1)
    w, h = 32, 32
    frames = [(rng.integers(0, 256, (h, w), np.uint8),
               rng.integers(0, 256, (h // 2, w // 2), np.uint8),
               rng.integers(0, 256, (h // 2, w // 2), np.uint8))]
    stream, _ = intra_codec.IntraEncoder(
        headers.HevcConfig(width=w, height=h, qp=32)).encode_sequence(frames)
    acc = annexb_byte_count(stream)
    assert acc["total"] + acc["start_code"] == len(stream)
    assert 33 in acc["by_type"] and 34 in acc["by_type"]   # SPS, PPS
