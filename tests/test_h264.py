"""H.264 baseline I_16x16 codec: CAVLC round-trip, self decode, JM conformance."""

import os
import subprocess

import numpy as np
import pytest

from test_intra_codec import synth_frame
from video_codecs_tpu.entropy import cavlc
from video_codecs_tpu.entropy.bitstream import BitReader, BitWriter
from video_codecs_tpu.models.h264 import intra_codec as h264
from video_codecs_tpu.utils import yuv

JM_DECODER = "/root/repo/.refbuild/jm18.5/bin/ldecod.exe"
RNG = np.random.default_rng(21)


def test_cavlc_roundtrip_fuzz():
    for trial in range(400):
        n = int(RNG.choice([16, 15, 4]))
        mag = int(RNG.choice([1, 2, 30, 3000, 30000]))
        coeffs = [int(v) if RNG.random() < RNG.uniform(0, 1) else 0
                  for v in RNG.integers(-mag, mag + 1, n)]
        nc = -1 if n == 4 else int(RNG.choice([0, 1, 2, 3, 4, 7, 8, 16]))
        w = BitWriter()
        cavlc.encode_block(w, coeffs, nc, n)
        pad = (8 - (w.num_bits() & 7)) & 7
        if pad:
            w.write(0, pad)
        w.write(0xFF, 8)
        got = cavlc.decode_block(BitReader(w.data()), nc, n)
        assert got == coeffs, (trial, nc)


@pytest.mark.parametrize("qp", [20, 28, 40])
def test_h264_self_roundtrip(qp):
    w, h = 64, 48
    enc = h264.H264IntraEncoder(w, h, qp=qp)
    frames = [synth_frame(w, h, s) for s in range(2)]
    stream, recons = enc.encode_sequence(frames)
    dec = h264.H264IntraDecoder()
    out = dec.decode(stream)
    assert len(out) == 2
    for i in range(2):
        for j in range(3):
            np.testing.assert_array_equal(out[i][j], recons[i][j])
    p = yuv.psnr(np.stack([r[0] for r in recons]),
                 np.stack([f[0] for f in frames]))
    assert p > {20: 38, 28: 31, 40: 22}[qp], p


@pytest.mark.skipif(not os.path.exists(JM_DECODER),
                    reason="JM reference decoder not built")
def test_h264_jm_conformance(tmp_path):
    w, h = 64, 48
    enc = h264.H264IntraEncoder(w, h, qp=28)
    frames = [synth_frame(w, h, s) for s in range(3)]
    stream, recons = enc.encode_sequence(frames)
    bin_path = tmp_path / "ours.264"
    rec_path = tmp_path / "jm_rec.yuv"
    bin_path.write_bytes(stream)
    r = subprocess.run([JM_DECODER, "-i", str(bin_path), "-o", str(rec_path)],
                       capture_output=True, text=True, timeout=120,
                       cwd=tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "3 frames are decoded" in r.stdout, r.stdout
    ry, ru, rv = yuv.read_frames(str(rec_path), w, h)
    for i, (ey, eu, ev) in enumerate(recons):
        np.testing.assert_array_equal(ry[i], ey.astype(np.uint8))
        np.testing.assert_array_equal(ru[i], eu.astype(np.uint8))
        np.testing.assert_array_equal(rv[i], ev.astype(np.uint8))


@pytest.mark.skipif(not os.path.exists(JM_DECODER),
                    reason="JM reference decoder not built")
def test_h264_i4x4_jm_conformance(tmp_path):
    """All-I_4x4 stream (9-mode 4x4 intra, CBP me(v)) decodes in JM."""
    w, h = 64, 48
    enc = h264.H264IntraEncoder(w, h, qp=28)
    enc.force_i4 = True  # exercise the I_4x4 path on every MB
    frames = [synth_frame(w, h, s) for s in range(2)]
    stream, recons = enc.encode_sequence(frames)
    assert int(enc._is_i4.sum()) == enc._is_i4.size
    dec = h264.H264IntraDecoder()
    out = dec.decode(stream)
    for i in range(2):
        for j in range(3):
            np.testing.assert_array_equal(out[i][j], recons[i][j])
    p = tmp_path / "i4.264"
    p.write_bytes(stream)
    r = subprocess.run([JM_DECODER, "-i", str(p), "-o",
                        str(tmp_path / "i4.yuv")],
                       capture_output=True, text=True, timeout=120,
                       cwd=tmp_path)
    assert r.returncode == 0 and "2 frames are decoded" in r.stdout, r.stdout
    ry, ru, rv = yuv.read_frames(str(tmp_path / "i4.yuv"), w, h)
    for i in range(2):
        np.testing.assert_array_equal(ry[i], recons[i][0].astype(np.uint8))
        np.testing.assert_array_equal(ru[i], recons[i][1].astype(np.uint8))


def test_h264_mixed_mb_types():
    """Natural decision mixes I_4x4 and I_16x16 on detailed content."""
    rng = np.random.default_rng(17)
    w, h = 64, 48
    y = rng.integers(0, 256, (h, w)).astype(np.uint8)   # pure noise: I4 wins
    u = np.full((h // 2, w // 2), 100, np.uint8)
    v = np.full((h // 2, w // 2), 140, np.uint8)
    enc = h264.H264IntraEncoder(w, h, qp=20)
    stream, recons = enc.encode_sequence([(y, u, v)])
    dec = h264.H264IntraDecoder()
    out = dec.decode(stream)
    np.testing.assert_array_equal(out[0][0], recons[0][0])


@pytest.mark.skipif(not os.path.exists(JM_DECODER),
                    reason="JM reference decoder not built")
def test_h264_deblock_jm_conformance_qp40(tmp_path):
    """High QP drives the bS=4 strong filter hard; recon must match ldecod."""
    w, h = 64, 48
    frames = [synth_frame(w, h, s) for s in range(2)]
    enc = h264.H264IntraEncoder(w, h, qp=40)
    stream, recons = enc.encode_sequence(frames)
    raw = h264.H264IntraEncoder(w, h, qp=40, deblock=False)
    _, recons_raw = raw.encode_sequence(frames)
    # the filter must actually change samples at this QP
    assert (recons[0][0] != recons_raw[0][0]).any()
    dec = h264.H264IntraDecoder()
    out = dec.decode(stream)
    for i in range(2):
        for j in range(3):
            np.testing.assert_array_equal(out[i][j], recons[i][j])
    p = tmp_path / "db40.264"
    p.write_bytes(stream)
    r = subprocess.run([JM_DECODER, "-i", str(p), "-o",
                        str(tmp_path / "db40.yuv")],
                       capture_output=True, text=True, timeout=120,
                       cwd=tmp_path)
    assert r.returncode == 0 and "2 frames are decoded" in r.stdout, r.stdout
    ry, ru, rv = yuv.read_frames(str(tmp_path / "db40.yuv"), w, h)
    for i in range(2):
        np.testing.assert_array_equal(ry[i], recons[i][0].astype(np.uint8))
        np.testing.assert_array_equal(ru[i], recons[i][1].astype(np.uint8))
        np.testing.assert_array_equal(rv[i], recons[i][2].astype(np.uint8))


def test_h264_deblock_off_roundtrip():
    w, h = 64, 48
    enc = h264.H264IntraEncoder(w, h, qp=32, deblock=False)
    frames = [synth_frame(w, h, 0)]
    stream, recons = enc.encode_sequence(frames)
    out = h264.H264IntraDecoder().decode(stream)
    for j in range(3):
        np.testing.assert_array_equal(out[0][j], recons[0][j])


JM_ENCODER = "/root/repo/.refbuild/jm18.5/bin/lencod.exe"


@pytest.mark.skipif(not (os.path.exists(JM_ENCODER)
                         and os.path.exists("/root/reference/jm18.5/bin/foreman_part_qcif.yuv")),
                    reason="JM reference encoder not built")
def test_h264_decode_jm_encoded_stream(tmp_path):
    """Our decoder bit-exactly reproduces a JM-ENCODED all-intra stream,
    including the implicit-deblocking case (dbf_control_present=0)."""
    cfg = "/root/repo/.refbuild/jm18.5/bin/encoder_baseline.cfg"
    r = subprocess.run(
        [JM_ENCODER, "-d", cfg,
         "-p", "InputFile=/root/reference/jm18.5/bin/foreman_part_qcif.yuv",
         "-p", "SourceWidth=176", "-p", "SourceHeight=144",
         "-p", "FramesToBeEncoded=2", "-p", "IntraPeriod=1",
         "-p", "IDRPeriod=1", "-p", "ProfileIDC=66", "-p", "SymbolMode=0",
         "-p", "QPISlice=32", "-p", "OutFileMode=0",
         "-p", "OutputFile=jm.264", "-p", "ReconFile=jm_rec.yuv",
         "-p", "Transform8x8Mode=0", "-p", "PicOrderCntType=2",
         "-p", "Log2MaxFNumMinus4=4", "-p", "RDOptimization=0"],
        capture_output=True, text=True, timeout=300, cwd=tmp_path)
    assert (tmp_path / "jm.264").exists(), r.stdout + r.stderr
    from video_codecs_tpu.models.h264.intra_codec import H264IntraDecoder
    out = H264IntraDecoder().decode((tmp_path / "jm.264").read_bytes())
    assert len(out) == 2
    ry, ru, rv = yuv.read_frames(str(tmp_path / "jm_rec.yuv"), 176, 144)
    for i in range(2):
        for ours, ref in zip(out[i], (ry[i], ru[i], rv[i])):
            np.testing.assert_array_equal(ours.astype(np.uint8), ref)
