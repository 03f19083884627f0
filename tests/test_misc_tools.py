"""JM misc-tool parity: leaky bucket, level conformance, YUV->RGB.

References: jm18.5/lencod/src/leaky_bucket.c, conformance.c (Annex A
Table A-1), cconv_yuv2rgb.c.
"""

import numpy as np
import pytest

from video_codecs_tpu.tools.misc import (
    check_level_conformance, leaky_bucket_params, level_limits,
    minimum_level, read_leaky_bucket_file, write_leaky_bucket_file,
    yuv_to_rgb)


def test_leaky_bucket_constant_rate_needs_one_frame():
    # Constant 1000-bit frames at exactly the average rate: buffer only ever
    # dips one frame below full, and startup needs just the first frame.
    params = leaky_bucket_params([1000] * 30, frame_rate=30.0,
                                 rates=[30000])
    (r, b, f), = params
    assert r == 30000
    assert b == 1000
    assert f == 1000


def test_leaky_bucket_burst_needs_bigger_buffer():
    bits = [9000] + [500] * 29  # big IDR burst then small P frames
    (r_lo, b_lo, f_lo), = leaky_bucket_params(bits, 30.0, rates=[15000])
    (r_hi, b_hi, f_hi), = leaky_bucket_params(bits, 30.0, rates=[300000])
    assert b_lo >= 9000 - 500          # burst dominates at the low rate
    assert b_hi <= b_lo                # more channel rate, less buffer
    assert f_lo >= bits[0]             # must preload at least the burst


def test_leaky_bucket_default_rates_ascend():
    rng = np.random.default_rng(7)
    bits = rng.integers(200, 5000, size=50).tolist()
    params = leaky_bucket_params(bits, 25.0, n_buckets=4)
    rates = [p[0] for p in params]
    needs = [p[1] for p in params]
    assert rates == sorted(rates) and len(set(rates)) == 4
    # monotone: higher channel rate never needs a larger buffer
    assert all(b2 <= b1 for b1, b2 in zip(needs, needs[1:]))


def test_leaky_bucket_file_roundtrip(tmp_path):
    params = [(30000, 4000, 2500), (60000, 1200, 800)]
    p = tmp_path / "lk.dat"
    write_leaky_bucket_file(p, params)
    raw = p.read_bytes()
    assert raw[:4] == b"\x00\x00\x00\x02"      # big-endian count (JM layout)
    assert read_leaky_bucket_file(p) == params


def test_level_limits_table_a1_spots():
    # spot values straight from spec Table A-1
    assert level_limits(30)["MaxFS"] == 1620
    assert level_limits(31)["MaxMBPS"] == 108000
    assert level_limits(40)["MaxBR"] == 20000 * 1200
    assert level_limits(10)["MinCR"] == 2
    with pytest.raises(ValueError):
        level_limits(14)


def test_conformance_cif_at_level_20():
    assert check_level_conformance(352, 288, 30.0, 20) == []
    # 1080p30 blows level 2.0 on every axis but fits 4.0
    bad = check_level_conformance(1920, 1080, 30.0, 20)
    assert any("MaxFS" in m for m in bad)
    assert any("MaxMBPS" in m for m in bad)
    assert check_level_conformance(1920, 1080, 30.0, 40, dpb_frames=4) == []


def test_minimum_level():
    assert minimum_level(176, 144, 15.0) == 10       # QCIF@15 = level 1
    assert minimum_level(352, 288, 30.0) == 13       # CIF@30 needs 1.3 MBPS
    assert minimum_level(1920, 1080, 30.0, dpb_frames=4) == 40


def test_yuv_to_rgb_primaries():
    # flat gray: Y=128, U=V=128 -> R=G=B ~ 1.164*(128-16) = 130
    h, w = 8, 8
    y = np.full((h, w), 128, np.uint8)
    c = np.full((h // 2, w // 2), 128, np.uint8)
    rgb = yuv_to_rgb(y, c, c)
    assert rgb.shape == (h, w, 3)
    assert np.all(rgb == 130)
    # pure "red" chroma: V max pushes R up, G down, B unchanged
    v_hot = np.full((h // 2, w // 2), 240, np.uint8)
    rgb2 = yuv_to_rgb(y, c, v_hot)
    assert np.all(rgb2[..., 0] > rgb2[..., 2])
    assert np.all(rgb2[..., 1] < rgb2[..., 2])
    # black and white clip to the rails
    assert np.all(yuv_to_rgb(np.zeros((2, 2), np.uint8),
                             np.full((1, 1), 128, np.uint8),
                             np.full((1, 1), 128, np.uint8)) == 0)
    assert np.all(yuv_to_rgb(np.full((2, 2), 255, np.uint8),
                             np.full((1, 1), 128, np.uint8),
                             np.full((1, 1), 128, np.uint8)) == 255)


def test_yuv_to_rgb_10bit():
    y = np.full((4, 4), 512, np.uint16)
    c = np.full((2, 2), 512, np.uint16)
    rgb = yuv_to_rgb(y, c, c, bit_depth=10)
    # 1.164 * (512 - 64) = 521.5 -> 521/522 after 16.16 rounding
    assert rgb.dtype == np.uint16
    assert np.all(np.abs(rgb.astype(int) - 521) <= 1)
