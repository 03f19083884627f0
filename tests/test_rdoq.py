"""Full RDOQ (ops/rdoq.py): RD win over hard quant, syntax round-trip,
HM decoder conformance of full-RDOQ streams."""

import os
import subprocess

import numpy as np
import pytest

from test_intra_codec import HM_DECODER, synth_frame
from video_codecs_tpu.entropy import bitstream, cabac, ctx as ctx_mod, residual
from video_codecs_tpu.models.hevc import headers, quadtree_codec
from video_codecs_tpu.ops import quant, rdoq
from video_codecs_tpu.ops import transform as tr
from video_codecs_tpu.utils import rom, yuv

QP = 32
LAM = 0.57 * 2.0 ** ((QP - 12) / 3.0)


def _rd_cost(levels, res, log2):
    dq = quant.dequantize_np(levels, QP, log2)
    r = tr.inverse_transform_np(dq, log2, dst=False)
    d = float(((res - r) ** 2).sum())
    bits = 0
    if levels.any():
        bw = bitstream.BitWriter()
        enc = cabac.CabacEncoder(bw, ctx_mod.init_states(2, QP))
        residual.encode_residual(enc, levels, log2, rom.SCAN_DIAG, True)
        enc.encode_terminate(1)
        enc.finish_slice()
        bits = bw.num_bits()
    return d + LAM * bits


@pytest.mark.parametrize("log2", [2, 3, 4, 5])
def test_rdoq_beats_hard_quant(log2):
    rng = np.random.default_rng(7)
    n = 1 << log2
    j_hard = j_full = 0.0
    for _ in range(8):
        res = (rng.integers(-40, 41, (n, n)) *
               (rng.random((n, n)) < 0.3)).astype(np.int32)
        coeff = tr.forward_transform_np(res, log2, dst=False)
        j_hard += _rd_cost(quant.quantize_np(coeff, QP, log2), res, log2)
        lv = rdoq.rdoq_np(coeff, QP, log2, lam=LAM)
        # levels must round-trip through the entropy coder
        if lv.any():
            bw = bitstream.BitWriter()
            enc = cabac.CabacEncoder(bw, ctx_mod.init_states(2, QP))
            residual.encode_residual(enc, lv, log2, rom.SCAN_DIAG, True)
            enc.encode_terminate(1)
            enc.finish_slice()
            dec = cabac.CabacDecoder(bitstream.BitReader(bw.data()),
                                     ctx_mod.init_states(2, QP))
            np.testing.assert_array_equal(
                lv, residual.decode_residual(dec, log2, rom.SCAN_DIAG, True))
        j_full += _rd_cost(lv, res, log2)
    assert j_full < j_hard, (j_full, j_hard)


def test_rdoq_chroma_and_all_zero():
    rng = np.random.default_rng(3)
    res = rng.integers(-2, 3, (8, 8)).astype(np.int32)  # tiny residual
    coeff = tr.forward_transform_np(res, 3, dst=False)
    lv = rdoq.rdoq_np(coeff, QP + 10, 3, lam=0.57 * 2 ** ((QP + 10 - 12) / 3),
                      is_luma=False)
    assert lv.shape == (8, 8)  # may be all zero — that's a legal outcome
    zero = rdoq.rdoq_np(np.zeros((16, 16), np.int32), QP, 4, lam=LAM)
    assert not zero.any()


def _encode_quadtree(rdoq_mode):
    cfg = headers.HevcConfig(width=64, height=64, qp=QP, log2_min_cb=3,
                             log2_ctb=5, log2_max_tb=5, rdoq=rdoq_mode)
    enc = quadtree_codec.QuadtreeIntraEncoder(cfg)
    frames = [synth_frame(64, 64, s) for s in range(2)]
    nals = enc.stream_headers()
    recons = []
    for f in frames:
        fn, rec = enc.encode_frame(*f)
        nals.extend(fn)
        recons.append(rec)
    return bitstream.annexb(nals), recons, frames


def test_quadtree_full_rdoq_roundtrip():
    stream, recons, frames = _encode_quadtree("full")
    dec = quadtree_codec.QuadtreeIntraDecoder()
    out = dec.decode(stream)
    assert dec.hash_status == [True, True]
    for o, r in zip(out, recons):
        np.testing.assert_array_equal(o[0], r[0])
    # full RDOQ should not cost quality: compare J against hard quant
    stream_h, recons_h, _ = _encode_quadtree(False)
    def j(stream, recons):
        d = sum(float(((r[0].astype(np.int64) -
                        f[0].astype(np.int64)) ** 2).sum())
                for r, f in zip(recons, frames))
        return d + LAM * 8 * len(stream)
    assert j(stream, recons) <= j(stream_h, recons_h) * 1.001


@pytest.mark.skipif(not os.path.exists(HM_DECODER),
                    reason="HM reference decoder not built")
def test_quadtree_full_rdoq_hm_conformance(tmp_path):
    stream, recons, _ = _encode_quadtree("full")
    p = tmp_path / "rdoq.bin"
    p.write_bytes(stream)
    r = subprocess.run([HM_DECODER, "-b", str(p), "-o",
                        str(tmp_path / "rdoq.yuv")],
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stdout + r.stderr
    assert r.stdout.count("(OK)") == 2 and "ERROR" not in r.stdout, r.stdout
    ry, _, _ = yuv.read_frames(str(tmp_path / "rdoq.yuv"), 64, 64)
    for i in range(2):
        np.testing.assert_array_equal(ry[i], recons[i][0].astype(np.uint8))
