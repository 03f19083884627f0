"""CTB32 inter-quadtree RA encoder (device skip-merge tree): streams
must decode bit-exactly in the general decoder AND in HM's TAppDecoder,
and large-skip merging must actually engage (bits drop vs the flat
16x16 device encoder on low-motion content)."""

import os
import subprocess

import numpy as np
import pytest

from video_codecs_tpu.models.hevc import decoder, headers, inter_qt

HM_DECODER = "/root/repo/.refbuild/hm-16.5rc1/bin/TAppDecoderStatic"


def clip(w, h, n, seed=3):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h + n + 1, w + 2 * n + 1)).astype(np.uint8)
    frames = []
    for f in range(n):
        y = np.ascontiguousarray(base[f:f + h, 2 * f:2 * f + w])
        u = (y[::2, ::2] // 2 + 64).astype(np.uint8)
        v = (y[1::2, ::2] // 2 + 32).astype(np.uint8)
        frames.append((y, u, v))
    return frames


def _cfg(w, h, qp=32):
    return headers.HevcConfig(width=w, height=h, qp=qp, log2_ctb=5,
                              log2_min_cb=3, log2_max_tb=5,
                              reorder_pics=3, sign_data_hiding=True,
                              rdoq="lite", merge_cands=5)


def test_qt_ra_general_decoder_roundtrip():
    w, h = 96, 64
    enc = inter_qt.QtDeviceRandomAccessEncoder(_cfg(w, h), search_range=16)
    frames = clip(w, h, 9)
    stream, recons = enc.encode_sequence_ra(frames)
    dec = decoder.GeneralDecoder()
    out = dec.decode(stream)
    assert len(out) == len(frames)
    assert dec.hash_status == [True] * len(frames)
    for k, (r, o) in enumerate(zip(recons, out)):
        for c in range(3):
            np.testing.assert_array_equal(np.asarray(r[c]),
                                          np.asarray(o[c]),
                                          err_msg=f"frame {k} plane {c}")


def test_qt_ra_boundary_ctbs():
    """Picture not a CTB32 multiple: implicit boundary splits."""
    w, h = 80, 48
    enc = inter_qt.QtDeviceRandomAccessEncoder(_cfg(w, h), search_range=16)
    frames = clip(w, h, 9, seed=5)
    stream, recons = enc.encode_sequence_ra(frames)
    dec = decoder.GeneralDecoder()
    out = dec.decode(stream)
    assert dec.hash_status == [True] * len(frames)
    for r, o in zip(recons, out):
        np.testing.assert_array_equal(np.asarray(r[0]), np.asarray(o[0]))


@pytest.mark.skipif(not os.path.exists(HM_DECODER),
                    reason="HM reference decoder not built")
def test_qt_ra_hm_conformance(tmp_path):
    from video_codecs_tpu.utils import yuv

    w, h = 96, 64
    enc = inter_qt.QtDeviceRandomAccessEncoder(_cfg(w, h), search_range=16)
    frames = clip(w, h, 9)
    stream, recons = enc.encode_sequence_ra(frames)
    p = tmp_path / "qt.bin"
    rec = tmp_path / "qt.yuv"
    p.write_bytes(stream)
    r = subprocess.run([HM_DECODER, "-b", str(p), "-o", str(rec)],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stdout + r.stderr
    assert r.stdout.count("(OK)") == len(frames) and \
        "ERROR" not in r.stdout, r.stdout
    ry, ru, rv = yuv.read_frames(str(rec), w, h)
    for i, e in enumerate(recons):
        np.testing.assert_array_equal(ry[i], np.asarray(e[0], np.uint8))
        np.testing.assert_array_equal(ru[i], np.asarray(e[1], np.uint8))
        np.testing.assert_array_equal(rv[i], np.asarray(e[2], np.uint8))


def test_qt_merging_engages_and_saves_bits():
    """On slow-pan content the 32x32 skip tree must fire and the stream
    must be smaller than the flat 16x16 device RA encoder's."""
    from video_codecs_tpu.models.hevc import inter_jax

    w, h = 96, 64
    frames = clip(w, h, 9, seed=11)
    enc_qt = inter_qt.QtDeviceRandomAccessEncoder(_cfg(w, h),
                                                  search_range=16)
    s_qt, _ = enc_qt.encode_sequence_ra(frames)
    cfg16 = headers.HevcConfig(width=w, height=h, qp=32, reorder_pics=3,
                               sign_data_hiding=True)
    enc16 = inter_jax.DeviceRandomAccessEncoder(cfg16, search_range=16)
    s16, _ = enc16.encode_sequence_ra(frames)
    assert len(s_qt) < len(s16), (len(s_qt), len(s16))


def test_qt_ra_sao_roundtrip():
    """SAO on the qt B path (device stats + host offset search +
    sao() syntax per CTB32), incl. partial edge CTBs."""
    w, h = 112, 80
    cfg = _cfg(w, h)
    cfg.sao = True
    enc = inter_qt.QtDeviceRandomAccessEncoder(cfg, search_range=8)
    frames = clip(w, h, 9, seed=11)
    stream, recons = enc.encode_sequence_ra(frames)
    dec = decoder.GeneralDecoder()
    out = dec.decode(stream)
    assert dec.hash_status == [True] * len(frames)
    for k, (r, o) in enumerate(zip(recons, out)):
        for c in range(3):
            np.testing.assert_array_equal(np.asarray(r[c]),
                                          np.asarray(o[c]),
                                          err_msg=f"frame {k} plane {c}")


def test_qt_ra_cu8_and_multiref_roundtrip():
    """CU8 split tree + 2 active refs per list with device ref_idx
    search: conformant streams, CU8 engages on divergent motion."""
    w, h = 96, 64
    rng = np.random.default_rng(9)
    base = rng.integers(0, 256, (h + 32, w + 32)).astype(np.uint8)
    frames = []
    for f in range(9):
        y = np.ascontiguousarray(base[16:16 + h, 16:16 + w]).copy()
        if f:
            # per-8x8 divergent shifts -> sub-16 motion pays
            r2 = np.random.default_rng(100 + f)
            for by in range(h // 8):
                for bx in range(w // 8):
                    dy, dx = r2.integers(-3, 4, 2)
                    y[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = \
                        base[16 + by * 8 + dy:16 + (by + 1) * 8 + dy,
                             16 + bx * 8 + dx:16 + (bx + 1) * 8 + dx]
        u = (y[::2, ::2] // 2 + 64).astype(np.uint8)
        v = (y[1::2, ::2] // 2 + 32).astype(np.uint8)
        frames.append((y, u, v))
    enc = inter_qt.QtDeviceRandomAccessEncoder(
        _cfg(w, h), search_range=8, cu8=True, num_refs_active=2)
    stream, recons = enc.encode_sequence_ra(frames)
    dec = decoder.GeneralDecoder()
    out = dec.decode(stream)
    assert dec.hash_status == [True] * len(frames)
    for k, (r, o) in enumerate(zip(recons, out)):
        for c in range(3):
            np.testing.assert_array_equal(np.asarray(r[c]),
                                          np.asarray(o[c]),
                                          err_msg=f"frame {k} plane {c}")


def test_qt_ra_tmvp_roundtrip(tmp_path):
    """TMVP on the qt path: temporal merge/AMVP candidates from the
    stored collocated field, slice headers with slice_temporal_mvp /
    collocated_from_l0; serializer and decoder derive identical lists
    (shared motion_hm machinery + identical col motion)."""
    w, h = 96, 64
    cfg = _cfg(w, h)
    cfg.temporal_mvp = True
    enc = inter_qt.QtDeviceRandomAccessEncoder(cfg, search_range=8)
    frames = clip(w, h, 9, seed=13)
    stream, recons = enc.encode_sequence_ra(frames)
    dec = decoder.GeneralDecoder()
    out = dec.decode(stream)
    assert dec.hash_status == [True] * len(frames)
    for k, (r, o) in enumerate(zip(recons, out)):
        for c in range(3):
            np.testing.assert_array_equal(np.asarray(r[c]),
                                          np.asarray(o[c]),
                                          err_msg=f"frame {k} plane {c}")
    if os.path.exists(HM_DECODER):
        (tmp_path / "o.bin").write_bytes(stream)
        r = subprocess.run([HM_DECODER, "-b", str(tmp_path / "o.bin"),
                            "-o", str(tmp_path / "r.yuv")],
                           capture_output=True, text=True, timeout=300)
        assert r.returncode == 0 and "ERROR" not in r.stdout, \
            r.stdout[-1500:]
