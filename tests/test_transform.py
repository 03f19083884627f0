"""Bit-exactness tests for ROM tables, transforms, quantization."""

import numpy as np
import pytest

from video_codecs_tpu.ops import quant, transform
from video_codecs_tpu.utils import rom

RNG = np.random.default_rng(1234)


def test_dct4_literal():
    expected = np.array(
        [[64, 64, 64, 64],
         [83, 36, -36, -83],
         [64, -64, -64, 64],
         [36, -83, 83, -36]], dtype=np.int32)
    np.testing.assert_array_equal(rom.dct_matrix(4), expected)


def test_dct8_rows():
    t8 = rom.dct_matrix(8)
    np.testing.assert_array_equal(t8[0], np.full(8, 64))
    np.testing.assert_array_equal(t8[1], [89, 75, 50, 18, -18, -50, -75, -89])
    np.testing.assert_array_equal(t8[2], [83, 36, -36, -83, -83, -36, 36, 83])
    np.testing.assert_array_equal(t8[7], [18, -50, 75, -89, 89, -75, 50, -18])


def test_dct_embedding():
    """T_N rows are the even rows of T_2N truncated to N columns (spec 8.6.4.2)."""
    for n in (4, 8, 16):
        small, big = rom.dct_matrix(n), rom.dct_matrix(2 * n)
        np.testing.assert_array_equal(small, big[::2, :n])


def test_dct32_row_values():
    t32 = rom.dct_matrix(32)
    # Row 1 = the 16 odd-index magnitudes then mirrored negated.
    row1 = [90, 90, 88, 85, 82, 78, 73, 67, 61, 54, 46, 38, 31, 22, 13, 4]
    np.testing.assert_array_equal(t32[1], row1 + [-v for v in row1[::-1]])
    np.testing.assert_array_equal(t32[16, :4], [64, -64, -64, 64])
    # Every row has the same L2 norm structure as a scaled orthogonal basis.
    norms = (t32.astype(np.int64) ** 2).sum(axis=1)
    assert norms.min() > 128000 and norms.max() < 132000


@pytest.mark.parametrize("log2", [2, 3, 4, 5])
def test_transform_roundtrip_and_jax_numpy_match(log2):
    n = 1 << log2
    res = RNG.integers(-255, 256, size=(5, n, n)).astype(np.int32)
    cj = np.asarray(transform.forward_transform(res, log2))
    for i in range(5):
        cn = transform.forward_transform_np(res[i], log2)
        np.testing.assert_array_equal(cj[i], cn)
    rj = np.asarray(transform.inverse_transform(cj, log2))
    for i in range(5):
        rn = transform.inverse_transform_np(cj[i], log2)
        np.testing.assert_array_equal(rj[i], rn)
    # Unquantized round trip is near-lossless for 8-bit content; integer
    # rounding noise grows slightly with transform size.
    assert np.abs(rj - res).max() <= {2: 2, 3: 3, 4: 4, 5: 6}[log2]


def test_dst_roundtrip():
    res = RNG.integers(-255, 256, size=(7, 4, 4)).astype(np.int32)
    c = np.asarray(transform.forward_transform(res, 2, dst=True))
    cn = transform.forward_transform_np(res[0], 2, dst=True)
    np.testing.assert_array_equal(c[0], cn)
    r = np.asarray(transform.inverse_transform(c, 2, dst=True))
    assert np.abs(r - res).max() <= 2


@pytest.mark.parametrize("qp", [0, 17, 32, 45, 51])
@pytest.mark.parametrize("log2", [2, 4])
def test_quant_dequant_match_and_monotone(qp, log2):
    n = 1 << log2
    coeff = RNG.integers(-20000, 20000, size=(4, n, n)).astype(np.int32)
    lv_j = np.asarray(quant.quantize(coeff, qp, log2))
    lv_n = quant.quantize_np(coeff, qp, log2)
    np.testing.assert_array_equal(lv_j, lv_n)
    dq_j = np.asarray(quant.dequantize(lv_j, qp, log2))
    dq_n = quant.dequantize_np(lv_n, qp, log2)
    np.testing.assert_array_equal(dq_j, dq_n)
    # Dequantized values approximate the originals to within one quantizer
    # step (in coefficient units: step = 2^qBits / quantScale).
    q_bits = rom.QUANT_SHIFT + qp // 6 + quant.transform_shift(log2)
    step = (1 << q_bits) / float(rom.QUANT_SCALES[qp % 6])
    step_err = np.abs(dq_j.astype(np.int64) - coeff).max()
    assert step_err <= step + 1
    # Sign preservation.
    assert np.all(np.sign(dq_j)[lv_j != 0] == np.sign(lv_j)[lv_j != 0])


def test_scan_diag_4x4():
    expected = [0, 4, 1, 8, 5, 2, 12, 9, 6, 3, 13, 10, 7, 14, 11, 15]
    np.testing.assert_array_equal(rom.scan_order(2, rom.SCAN_DIAG), expected)


def test_scan_orders_are_permutations():
    for log2 in (2, 3, 4, 5):
        for st in (rom.SCAN_DIAG, rom.SCAN_HOR, rom.SCAN_VER):
            s = rom.scan_order(log2, st)
            assert sorted(s.tolist()) == list(range((1 << log2) ** 2))


def test_scan_hor_8x8_grouped():
    s = rom.scan_order(3, rom.SCAN_HOR)
    # First CG is the top-left 4x4 in row-major order.
    np.testing.assert_array_equal(s[:8], [0, 1, 2, 3, 8, 9, 10, 11])
    # Second CG is the top-right 4x4.
    assert s[16] == 4


def test_chroma_qp_table():
    t = rom.CHROMA_QP_TABLE_420
    assert t[29] == 29 and t[30] == 29 and t[33] == 32 and t[43] == 37
    assert t[44] == 38 and t[57] == 51
