"""CABAC engine and residual-coding round-trip tests."""

import numpy as np
import pytest

from video_codecs_tpu.entropy import bitstream as bs
from video_codecs_tpu.entropy import cabac, ctx, residual
from video_codecs_tpu.utils import rom

RNG = np.random.default_rng(2024)


def test_exp_golomb_roundtrip():
    w = bs.BitWriter()
    vals = [0, 1, 2, 3, 7, 8, 254, 255, 1023, 2 ** 16]
    svals = [0, 1, -1, 2, -2, 17, -300, 2 ** 12]
    for v in vals:
        w.ue(v)
    for v in svals:
        w.se(v)
    w.rbsp_trailing_bits()
    r = bs.BitReader(w.data())
    assert [r.ue() for _ in vals] == vals
    assert [r.se() for _ in svals] == svals


def test_emulation_prevention():
    payloads = [b"\x00\x00\x00", b"\x00\x00\x01\x02", b"\x00\x00\x03\x04",
                b"ab\x00\x00\x00\x00\x02", bytes(RNG.integers(0, 4, 50).tolist())]
    for p in payloads:
        e = bs.insert_emulation_prevention(p)
        # No 00 00 0x pattern survives in EBSP except via 00 00 03.
        for i in range(len(e) - 2):
            if e[i] == 0 and e[i + 1] == 0:
                assert e[i + 2] > 2 or e[i + 2] == 3 and True
                assert e[i + 2] != 0 or i + 3 >= len(e)
        assert bs.strip_emulation_prevention(e) == p


def test_annexb_split():
    nals = [b"\x40\x01payload1", b"\x42\x01payload2\x80"]
    stream = bs.annexb(nals)
    assert bs.split_annexb(stream) == nals


def test_cabac_bin_roundtrip():
    """Random mix of context/bypass/terminate bins must round-trip exactly."""
    n = 5000
    states0 = ctx.init_states(ctx.I, 32)
    kinds = RNG.integers(0, 10, n)  # 0: terminate(0), 1-4 bypass, else ctx
    bins = RNG.integers(0, 2, n)
    ctxs = RNG.integers(0, ctx.NUM_CTX, n)

    w = bs.BitWriter()
    enc = cabac.CabacEncoder(w, states0.copy())
    for i in range(n):
        if kinds[i] == 0:
            enc.encode_terminate(0)
        elif kinds[i] <= 4:
            enc.encode_bypass(int(bins[i]))
        else:
            enc.encode_bin(int(ctxs[i]), int(bins[i]))
    enc.encode_terminate(1)
    enc.finish_slice()
    data = w.data()

    dec = cabac.CabacDecoder(bs.BitReader(data), states0.copy())
    for i in range(n):
        if kinds[i] == 0:
            assert dec.decode_terminate() == 0
        elif kinds[i] <= 4:
            assert dec.decode_bypass() == int(bins[i]), i
        else:
            assert dec.decode_bin(int(ctxs[i])) == int(bins[i]), i
    assert dec.decode_terminate() == 1


def test_context_init_known_values():
    # initValue 154 at any QP gives pState 0 / MPS 0 boundary region;
    # spot-check the spec formula at qp=26, initValue=111 and 184.
    s = cabac.init_context_states(np.array([154, 111, 184], np.uint8), 26)
    for packed, iv in zip(s, [154, 111, 184]):
        slope = (iv >> 4) * 5 - 45
        offset = ((iv & 15) << 3) - 16
        pre = min(126, max(1, ((slope * 26) >> 4) + offset))
        mps = 1 if pre > 63 else 0
        pstate = pre - 64 if mps else 63 - pre
        assert packed == (pstate << 1) | mps


@pytest.mark.parametrize("log2", [2, 3, 4, 5])
@pytest.mark.parametrize("scan_type", [rom.SCAN_DIAG, rom.SCAN_HOR, rom.SCAN_VER])
@pytest.mark.parametrize("is_luma", [True, False])
def test_residual_roundtrip(log2, scan_type, is_luma):
    if log2 > 3 and scan_type != rom.SCAN_DIAG:
        pytest.skip("hor/ver scans only exist for 4x4/8x8")
    n = 1 << log2
    states0 = ctx.init_states(ctx.I, 32)
    blocks = []
    for density, mag in [(0.02, 2), (0.1, 5), (0.5, 30), (1.0, 300)]:
        m = RNG.random((n, n)) < density
        v = RNG.integers(-mag, mag + 1, (n, n))
        blk = (m * v).astype(np.int32)
        if not blk.any():
            blk[RNG.integers(0, n), RNG.integers(0, n)] = 1
        blocks.append(blk)

    w = bs.BitWriter()
    enc = cabac.CabacEncoder(w, states0.copy())
    for blk in blocks:
        residual.encode_residual(enc, blk, log2, scan_type, is_luma)
    enc.encode_terminate(1)
    enc.finish_slice()

    dec = cabac.CabacDecoder(bs.BitReader(w.data()), states0.copy())
    for blk in blocks:
        got = residual.decode_residual(dec, log2, scan_type, is_luma)
        np.testing.assert_array_equal(got, blk)
    assert dec.decode_terminate() == 1


def test_residual_extreme_levels():
    """Near-maximum magnitude levels (15-bit) survive the Golomb-Rice escape."""
    states0 = ctx.init_states(ctx.I, 22)
    blk = np.zeros((4, 4), np.int32)
    blk[0, 0] = 32767
    blk[1, 0] = -32768
    blk[3, 3] = 1
    w = bs.BitWriter()
    enc = cabac.CabacEncoder(w, states0.copy())
    residual.encode_residual(enc, blk, 2, rom.SCAN_DIAG, True)
    enc.encode_terminate(1)
    enc.finish_slice()
    dec = cabac.CabacDecoder(bs.BitReader(w.data()), states0.copy())
    got = residual.decode_residual(dec, 2, rom.SCAN_DIAG, True)
    np.testing.assert_array_equal(got, blk)
