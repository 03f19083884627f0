"""H.264 B slices: self round-trip with display reordering, spatial
direct / B_Skip behavior, JM conformance in both directions."""

import os
import subprocess

import numpy as np
import pytest

from video_codecs_tpu.models.h264.bslice_codec import (H264BDecoder,
                                                       H264BEncoder)
from video_codecs_tpu.utils import yuv

JM_DECODER = "/root/repo/.refbuild/jm18.5/bin/ldecod.exe"
JM_ENCODER = "/root/repo/.refbuild/jm18.5/bin/lencod.exe"
FOREMAN = "/root/reference/jm18.5/bin/foreman_part_qcif.yuv"


def translating_frames(n=5, w=64, h=48, seed=3):
    rng = np.random.default_rng(seed)
    by = rng.integers(0, 256, (h + 16, w + 16)).astype(np.uint8)
    bu = rng.integers(0, 256, (h // 2 + 8, w // 2 + 8)).astype(np.uint8)
    bv = rng.integers(0, 256, (h // 2 + 8, w // 2 + 8)).astype(np.uint8)
    out = []
    for t in range(n):
        dx, dy = t * 2, t
        out.append((by[dy:dy + h, dx:dx + w],
                    bu[dy // 2:dy // 2 + h // 2, dx // 2:dx // 2 + w // 2],
                    bv[dy // 2:dy // 2 + h // 2, dx // 2:dx // 2 + w // 2]))
    return out


def roundtrip(enc, frames):
    stream, recons = enc.encode_sequence(frames)
    out = H264BDecoder().decode(stream)
    assert len(out) == len(frames)
    for i in range(len(frames)):
        for j in range(3):
            np.testing.assert_array_equal(out[i][j], recons[i][j])
    return stream, recons


@pytest.mark.parametrize("entropy", ["cavlc", "cabac"])
def test_b_self_roundtrip_translation(entropy):
    frames = translating_frames()
    stream, recons = roundtrip(
        H264BEncoder(64, 48, qp=30, b_frames=1, entropy=entropy), frames)
    p = yuv.psnr(np.stack([r[0] for r in recons]),
                 np.stack([f[0] for f in frames]))
    assert p > 30, p


def test_b_static_scene_mostly_skip():
    """A static scene after the anchors settle is mostly B_Skip: the B
    slices should be tiny relative to the IDR."""
    rng = np.random.default_rng(9)
    y = rng.integers(0, 256, (48, 64)).astype(np.uint8)
    u = rng.integers(0, 256, (24, 32)).astype(np.uint8)
    v = rng.integers(0, 256, (24, 32)).astype(np.uint8)
    frames = [(y, u, v)] * 5
    stream, recons = roundtrip(H264BEncoder(64, 48, qp=30, b_frames=1),
                               frames)
    nals = stream.split(b"\x00\x00\x00\x01")
    idr = [n for n in nals if n and (n[0] & 0x1F) == 5][0]
    # non-reference NALs (ref_idc == 0) are the B slices
    b_slices = [n for n in nals if n and (n[0] & 0x1F) == 1
                and (n[0] >> 5) == 0]
    assert len(b_slices) == 2
    assert all(len(b) < len(idr) // 10 for b in b_slices), \
        [len(b) for b in b_slices]


@pytest.mark.parametrize("b_frames", [1, 2])
def test_b_display_reorder(b_frames):
    """Decoded output must come back in display order despite the
    anchor-first coding order."""
    frames = translating_frames(n=7)
    roundtrip(H264BEncoder(64, 48, qp=28, b_frames=b_frames), frames)


def shear_frames(n=5, w=96, h=64, seed=3):
    """Top and bottom halves translate differently: rectangular B
    partitions (16x8/8x16/B_8x8) win on the boundary macroblocks."""
    rng = np.random.default_rng(seed)
    by = rng.integers(0, 256, (h + 16, w + 16)).astype(np.uint8)
    out = []
    for t in range(n):
        y = np.roll(by, (t, 2 * t), (0, 1)).copy()
        y[:h // 2 + 8] = np.roll(y[:h // 2 + 8], -3 * t, 1)
        y = y[:h, :w]
        u = (y[::2, ::2] // 2 + 60).astype(np.uint8)
        v = (y[1::2, ::2] // 2 + 30).astype(np.uint8)
        out.append((y, u, v))
    return out


@pytest.mark.parametrize("entropy", ["cavlc", "cabac"])
def test_b_partitions_roundtrip_and_engage(entropy):
    """16x8 / 8x16 / B_8x8 partition types must engage on shear motion
    and round-trip bit-exactly (spec Table 7-14 mb_types 4..22)."""
    frames = shear_frames()
    enc = H264BEncoder(96, 64, qp=30, b_frames=1, entropy=entropy)
    roundtrip(enc, frames)
    rect = sum(v for k, v in enc.mb_type_stats.items()
               if isinstance(k, int) and 4 <= k <= 21)
    b8 = enc.mb_type_stats.get(22, 0)
    assert rect > 0, enc.mb_type_stats
    assert b8 > 0, enc.mb_type_stats


@pytest.mark.skipif(not os.path.exists(JM_DECODER),
                    reason="JM reference decoder not built")
@pytest.mark.parametrize("entropy", ["cavlc", "cabac"])
def test_b_partitions_ldecod_conformance(tmp_path, entropy):
    """Partitioned B streams must decode bit-exactly in JM ldecod."""
    frames = shear_frames(n=7)
    enc = H264BEncoder(96, 64, qp=30, b_frames=2, entropy=entropy)
    stream, recons = roundtrip(enc, frames)
    assert sum(v for k, v in enc.mb_type_stats.items()
               if isinstance(k, int) and 4 <= k <= 22) > 0
    (tmp_path / "bp.264").write_bytes(stream)
    r = subprocess.run([JM_DECODER, "-i", "bp.264", "-o", "jm.yuv"],
                       capture_output=True, text=True, timeout=120,
                       cwd=tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    assert f"{len(frames)} frames are decoded" in r.stdout, r.stdout
    ry, ru, rv = yuv.read_frames(str(tmp_path / "jm.yuv"), 96, 64)
    for i in range(len(frames)):
        for ours, ref in zip(recons[i], (ry[i], ru[i], rv[i])):
            np.testing.assert_array_equal(ref, ours.astype(np.uint8))


@pytest.mark.skipif(not os.path.exists(JM_DECODER),
                    reason="JM reference decoder not built")
@pytest.mark.parametrize("entropy,b_frames", [("cavlc", 1), ("cabac", 1),
                                              ("cavlc", 2), ("cabac", 2)])
def test_b_jm_ldecod_conformance(tmp_path, entropy, b_frames):
    ys, us, vs = yuv.read_frames(FOREMAN, 176, 144)
    base = [(ys[i], us[i], vs[i]) for i in range(len(ys))]
    frames = [base[i % 3] for i in range(8)]
    enc = H264BEncoder(176, 144, qp=30, b_frames=b_frames, entropy=entropy)
    stream, recons = roundtrip(enc, frames)
    (tmp_path / "b.264").write_bytes(stream)
    r = subprocess.run([JM_DECODER, "-i", "b.264", "-o", "jm.yuv"],
                       capture_output=True, text=True, timeout=120,
                       cwd=tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    assert f"{len(frames)} frames are decoded" in r.stdout, r.stdout
    ry, ru, rv = yuv.read_frames(str(tmp_path / "jm.yuv"), 176, 144)
    for i in range(len(frames)):
        for ours, ref in zip(recons[i], (ry[i], ru[i], rv[i])):
            np.testing.assert_array_equal(ref, ours.astype(np.uint8))


@pytest.mark.skipif(not (os.path.exists(JM_ENCODER)
                         and os.path.exists(FOREMAN)),
                    reason="JM reference encoder not built")
@pytest.mark.parametrize("idc", [1, 2])
def test_b_decode_jm_weighted_bipred(tmp_path, idc):
    """JM B streams with explicit (idc=1) and implicit (idc=2) weighted
    bi-prediction decode bit-exactly.  NumberBFrames=2 over 7 frames
    puts B pictures at unequal POC distances, so the implicit weights
    genuinely differ from the default 32/32 average (spec 8.4.2.3.1)."""
    ys, us, vs = yuv.read_frames(FOREMAN, 176, 144)
    cyc = [i % 3 for i in range(7)]
    src = tmp_path / "src.yuv"
    yuv.write_frames(str(src), ys[cyc], us[cyc], vs[cyc])
    r = subprocess.run(
        [JM_ENCODER, "-d",
         "/root/repo/.refbuild/jm18.5/bin/encoder_baseline.cfg",
         "-p", f"InputFile={src}",
         "-p", "SourceWidth=176", "-p", "SourceHeight=144",
         "-p", "FramesToBeEncoded=7", "-p", "IntraPeriod=0",
         "-p", "IDRPeriod=0", "-p", "ProfileIDC=77",
         "-p", "SymbolMode=0",
         "-p", "QPISlice=30", "-p", "QPPSlice=30", "-p", "QPBSlice=32",
         "-p", "OutFileMode=0",
         "-p", "OutputFile=jm.264", "-p", "ReconFile=jm_rec.yuv",
         "-p", "Transform8x8Mode=0", "-p", "PicOrderCntType=0",
         "-p", "Log2MaxFNumMinus4=4", "-p", "RDOptimization=0",
         "-p", "PSliceSearch16x16=1", "-p", "SearchRange=16",
         "-p", "NumberBFrames=2", "-p", "BSliceSearch16x16=1",
         "-p", "BSliceSearch16x8=1", "-p", "BSliceSearch8x16=1",
         "-p", "BSliceSearch8x8=1",
         "-p", "BiPredSearch16x16=1", "-p", "DirectModeType=1",
         "-p", "DirectInferenceFlag=1", "-p", "HierarchicalCoding=0",
         "-p", "BReferencePictures=0",
         "-p", f"WeightedBiprediction={idc}",
         "-p", "WeightedPrediction=0",
         "-p", "NumberReferenceFrames=2"],
        capture_output=True, text=True, timeout=300, cwd=tmp_path)
    assert (tmp_path / "jm.264").exists(), r.stdout + r.stderr
    dec = H264BDecoder()
    out = dec.decode((tmp_path / "jm.264").read_bytes())
    assert dec.wbp_idc == idc
    assert len(out) == 7
    ry, ru, rv = yuv.read_frames(str(tmp_path / "jm_rec.yuv"), 176, 144)
    for i in range(7):
        for ours, ref in zip(out[i], (ry[i], ru[i], rv[i])):
            np.testing.assert_array_equal(ours.astype(np.uint8), ref)


@pytest.mark.skipif(not (os.path.exists(JM_ENCODER)
                         and os.path.exists(FOREMAN)),
                    reason="JM reference encoder not built")
@pytest.mark.parametrize("entropy", ["cavlc", "cabac"])
def test_b_decode_jm_stream_small_subs(tmp_path, entropy):
    """JM streams with 8x4/4x8/4x4 B sub-partitions enabled decode
    bit-exactly (full sub_mb_type Table 7-18 on the decode side)."""
    cabac = entropy == "cabac"
    r = subprocess.run(
        [JM_ENCODER, "-d",
         "/root/repo/.refbuild/jm18.5/bin/encoder_baseline.cfg",
         "-p", f"InputFile={FOREMAN}",
         "-p", "SourceWidth=176", "-p", "SourceHeight=144",
         "-p", "FramesToBeEncoded=3", "-p", "IntraPeriod=0",
         "-p", "IDRPeriod=0", "-p", "ProfileIDC=77",
         "-p", f"SymbolMode={1 if cabac else 0}",
         "-p", "QPISlice=30", "-p", "QPPSlice=30", "-p", "QPBSlice=34",
         "-p", "OutFileMode=0",
         "-p", "OutputFile=jm.264", "-p", "ReconFile=jm_rec.yuv",
         "-p", "Transform8x8Mode=0", "-p", "PicOrderCntType=0",
         "-p", "Log2MaxFNumMinus4=4", "-p", "RDOptimization=0",
         "-p", "PSliceSearch16x16=1", "-p", "SearchRange=16",
         "-p", "NumberBFrames=1", "-p", "BSliceSearch16x16=1",
         "-p", "BSliceSearch16x8=1", "-p", "BSliceSearch8x16=1",
         "-p", "BSliceSearch8x8=1", "-p", "BSliceSearch8x4=1",
         "-p", "BSliceSearch4x8=1", "-p", "BSliceSearch4x4=1",
         "-p", "BiPredSearch16x16=1", "-p", "DirectModeType=1",
         "-p", "DirectInferenceFlag=1", "-p", "HierarchicalCoding=0",
         "-p", "BReferencePictures=0", "-p", "WeightedBiprediction=0",
         "-p", "WeightedPrediction=0",
         "-p", "NumberReferenceFrames=2"],
        capture_output=True, text=True, timeout=300, cwd=tmp_path)
    assert (tmp_path / "jm.264").exists(), r.stdout + r.stderr
    out = H264BDecoder().decode((tmp_path / "jm.264").read_bytes())
    assert len(out) == 3
    ry, ru, rv = yuv.read_frames(str(tmp_path / "jm_rec.yuv"), 176, 144)
    for i in range(3):
        for ours, ref in zip(out[i], (ry[i], ru[i], rv[i])):
            np.testing.assert_array_equal(ours.astype(np.uint8), ref)


@pytest.mark.skipif(not (os.path.exists(JM_ENCODER)
                         and os.path.exists(FOREMAN)),
                    reason="JM reference encoder not built")
@pytest.mark.parametrize("entropy", ["cavlc", "cabac"])
def test_b_decode_jm_encoded_stream(tmp_path, entropy):
    """Our decoder reproduces a JM-ENCODED I-B-P stream bit-exactly
    (16x16 + 16x8/8x16/B_8x8 partitions, spatial direct, 2 L0 refs in
    B with per-partition ref_idx), CAVLC+CABAC."""
    cfg = "/root/repo/.refbuild/jm18.5/bin/encoder_baseline.cfg"
    cabac = entropy == "cabac"
    r = subprocess.run(
        [JM_ENCODER, "-d", cfg,
         "-p", f"InputFile={FOREMAN}",
         "-p", "SourceWidth=176", "-p", "SourceHeight=144",
         "-p", "FramesToBeEncoded=3", "-p", "IntraPeriod=0",
         "-p", "IDRPeriod=0", "-p", "ProfileIDC=77",
         "-p", f"SymbolMode={1 if cabac else 0}",
         "-p", "QPISlice=30", "-p", "QPPSlice=30", "-p", "QPBSlice=32",
         "-p", "OutFileMode=0",
         "-p", "OutputFile=jm.264", "-p", "ReconFile=jm_rec.yuv",
         "-p", "Transform8x8Mode=0", "-p", "PicOrderCntType=0",
         "-p", "Log2MaxFNumMinus4=4", "-p", "RDOptimization=0",
         "-p", "PSliceSearch16x16=1", "-p", "PSliceSearch16x8=0",
         "-p", "PSliceSearch8x16=0", "-p", "PSliceSearch8x8=0",
         "-p", "PSliceSearch8x4=0", "-p", "PSliceSearch4x8=0",
         "-p", "PSliceSearch4x4=0", "-p", "SearchRange=16",
         "-p", "NumberBFrames=1", "-p", "BSliceSearch16x16=1",
         "-p", "BSliceSearch16x8=1", "-p", "BSliceSearch8x16=1",
         "-p", "BSliceSearch8x8=1", "-p", "BSliceSearch8x4=0",
         "-p", "BSliceSearch4x8=0", "-p", "BSliceSearch4x4=0",
         "-p", "BiPredSearch16x16=1", "-p", "BiPredSearch16x8=1",
         "-p", "BiPredSearch8x16=1", "-p", "BiPredSearch8x8=0",
         "-p", "DirectModeType=1", "-p", "DirectInferenceFlag=1",
         "-p", "HierarchicalCoding=0", "-p", "BReferencePictures=0",
         "-p", "WeightedBiprediction=0", "-p", "WeightedPrediction=0",
         "-p", "NumberReferenceFrames=2"],
        capture_output=True, text=True, timeout=300, cwd=tmp_path)
    assert (tmp_path / "jm.264").exists(), r.stdout + r.stderr
    out = H264BDecoder().decode((tmp_path / "jm.264").read_bytes())
    assert len(out) == 3
    ry, ru, rv = yuv.read_frames(str(tmp_path / "jm_rec.yuv"), 176, 144)
    for i in range(3):
        for ours, ref in zip(out[i], (ry[i], ru[i], rv[i])):
            np.testing.assert_array_equal(ours.astype(np.uint8), ref)
