"""H.264 CABAC entropy mode: primitive round-trips, I-slice self
round-trip, and bidirectional JM-18.5 conformance."""

import itertools
import os
import subprocess

import numpy as np
import pytest

from video_codecs_tpu.entropy import h264_cabac as hc
from video_codecs_tpu.entropy.bitstream import BitReader, BitWriter
from video_codecs_tpu.models.h264 import intra_codec as ic

JM_DECODER = "/root/repo/.refbuild/jm18.5/bin/ldecod.exe"
JM_ENCODER = "/root/repo/.refbuild/jm18.5/bin/lencod.exe"
JM_CFG = "/root/repo/.refbuild/jm18.5/bin/encoder_main.cfg"


def _frames(w, h, n, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for s in range(n):
        y = ((rng.integers(0, 50, (h, w)) + np.arange(w)[None, :] * 2 +
              s * 10) % 256).astype(np.uint8)
        u = rng.integers(100, 150, (h // 2, w // 2)).astype(np.uint8)
        v = rng.integers(100, 150, (h // 2, w // 2)).astype(np.uint8)
        out.append((y, u, v))
    return out


def test_residual_block_roundtrip_fuzz():
    rng = np.random.default_rng(1)
    for _ in range(60):
        for btype, ln in ((hc.LUMA_16DC, 16), (hc.LUMA_16AC, 15),
                          (hc.LUMA_4x4, 16), (hc.CHROMA_DC, 4),
                          (hc.CHROMA_AC, 15)):
            coeffs = (rng.integers(-60, 61, ln) *
                      (rng.random(ln) < 0.4)).astype(int).tolist()
            bw = BitWriter()
            enc = hc.H264CabacEncoder(bw, "I", 30)
            enc.residual_block(btype, coeffs, 0)
            enc.final(1)
            enc.finish()
            cd = hc.H264CabacDecoder(BitReader(bw.data()), "I", 30)
            assert cd.residual_block(btype, ln, 0) == coeffs


def test_mb_syntax_roundtrip():
    for act in range(25):
        for ci in range(3):
            bw = BitWriter()
            enc = hc.H264CabacEncoder(bw, "I", 30)
            enc.mb_type_i(act, ci)
            enc.intra_chroma_pred_mode(act % 4, ci)
            enc.mb_qp_delta(0, False)
            enc.final(1)
            enc.finish()
            cd = hc.H264CabacDecoder(BitReader(bw.data()), "I", 30)
            assert cd.mb_type_i(ci) == act
            assert cd.intra_chroma_pred_mode(ci) == act % 4
            assert cd.mb_qp_delta(False) == 0
    for cbp in range(48):
        for up, left in itertools.product(
                [None, {"cbp": 21, "ipcm": False},
                 {"cbp": 63, "ipcm": False}], repeat=2):
            bw = BitWriter()
            enc = hc.H264CabacEncoder(bw, "I", 30)
            enc.cbp(cbp, up, left)
            enc.final(1)
            enc.finish()
            cd = hc.H264CabacDecoder(BitReader(bw.data()), "I", 30)
            assert cd.cbp(up, left) == cbp


def test_mvd_refidx_dquant_roundtrip():
    vals = [0, 1, -1, 3, -7, 8, -33, 200, -511]
    for v in vals:
        for err in (0, 5, 40):
            bw = BitWriter()
            enc = hc.H264CabacEncoder(bw, "P", 30)
            enc.mvd(v, 0, err)
            enc.mvd(-v, 1, err)
            enc.ref_idx(abs(v) % 5, min(err, 3) % 4 % 3)
            enc.mb_qp_delta(max(-26, min(25, v)), v != 0)
            enc.final(1)
            enc.finish()
            cd = hc.H264CabacDecoder(BitReader(bw.data()), "P", 30)
            assert cd.mvd(0, err) == v
            assert cd.mvd(1, err) == -v
            assert cd.ref_idx(min(err, 3) % 4 % 3) == abs(v) % 5
            assert cd.mb_qp_delta(v != 0) == max(-26, min(25, v))


def test_cabac_smaller_than_cavlc():
    frames = _frames(64, 48, 2)
    sc, _ = ic.H264IntraEncoder(64, 48, qp=28,
                                entropy="cabac").encode_sequence(frames)
    sv, _ = ic.H264IntraEncoder(64, 48, qp=28,
                                entropy="cavlc").encode_sequence(frames)
    assert len(sc) < len(sv), (len(sc), len(sv))


def test_cabac_self_roundtrip():
    frames = _frames(64, 48, 3)
    enc = ic.H264IntraEncoder(64, 48, qp=28, entropy="cabac")
    stream, recons = enc.encode_sequence(frames)
    out = ic.H264IntraDecoder().decode(stream)
    for o, r in zip(out, recons):
        for c in range(3):
            np.testing.assert_array_equal(o[c], r[c])


@pytest.mark.skipif(not os.path.exists(JM_DECODER),
                    reason="JM reference decoder not built")
def test_cabac_ldecod_conformance(tmp_path):
    frames = _frames(64, 48, 3)
    enc = ic.H264IntraEncoder(64, 48, qp=28, entropy="cabac")
    stream, recons = enc.encode_sequence(frames)
    p = tmp_path / "c.264"
    p.write_bytes(stream)
    r = subprocess.run([JM_DECODER, "-i", str(p), "-o",
                        str(tmp_path / "o.yuv")],
                       capture_output=True, text=True, timeout=300,
                       cwd=tmp_path)
    assert r.returncode == 0, r.stdout[-500:] + r.stderr[-500:]
    data = (tmp_path / "o.yuv").read_bytes()
    n = 64 * 48 * 3 // 2
    for i, rc in enumerate(recons):
        fy = np.frombuffer(data[i * n:i * n + 64 * 48],
                           np.uint8).reshape(48, 64)
        np.testing.assert_array_equal(fy, rc[0].astype(np.uint8))


@pytest.mark.skipif(not (os.path.exists(JM_ENCODER)
                         and os.path.exists(JM_CFG)),
                    reason="JM reference encoder not built")
def test_jm_cabac_stream_decodes_in_ours(tmp_path):
    w, h = 48, 32
    (y, u, v), = _frames(w, h, 1, seed=3)
    (tmp_path / "in.yuv").write_bytes(y.tobytes() + u.tobytes() + v.tobytes())
    r = subprocess.run(
        [JM_ENCODER, "-d", JM_CFG,
         "-p", "InputFile=in.yuv", "-p", f"SourceWidth={w}",
         "-p", f"SourceHeight={h}", "-p", f"OutputWidth={w}",
         "-p", f"OutputHeight={h}", "-p", "FramesToBeEncoded=1",
         "-p", "IntraPeriod=1", "-p", "IDRPeriod=1", "-p", "QPISlice=30",
         "-p", "SymbolMode=1", "-p", "ProfileIDC=77",
         "-p", "OutputFile=out.264", "-p", "ReconFile=rec.yuv",
         "-p", "Transform8x8Mode=0", "-p", "NumberReferenceFrames=1",
         "-p", "RDOptimization=0"],
        capture_output=True, text=True, timeout=300, cwd=tmp_path)
    # lencod may exit nonzero over the missing leaky-bucket file after a
    # successful encode; trust the output files instead.
    assert (tmp_path / "out.264").exists(), r.stdout[-800:]
    stream = (tmp_path / "out.264").read_bytes()
    rec = np.frombuffer((tmp_path / "rec.yuv").read_bytes(), np.uint8)
    out = ic.H264IntraDecoder().decode(stream)
    np.testing.assert_array_equal(out[0][0].astype(np.uint8),
                                  rec[:w * h].reshape(h, w))
    np.testing.assert_array_equal(
        out[0][1].astype(np.uint8),
        rec[w * h:w * h + w * h // 4].reshape(h // 2, w // 2))
