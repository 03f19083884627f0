"""CU quadtree build: self round-trip, HM conformance, quality gain."""

import os
import subprocess

import numpy as np
import pytest

from test_intra_codec import HM_DECODER, synth_frame
from video_codecs_tpu.models.hevc import headers, intra_codec, quadtree_codec
from video_codecs_tpu.utils import yuv


def _cfg(qp=32, log2_ctb=4, **kw):
    return headers.HevcConfig(width=64, height=64 if log2_ctb > 4 else 48,
                              qp=qp, log2_min_cb=3, log2_ctb=log2_ctb,
                              log2_max_tb=min(5, log2_ctb), **kw)


@pytest.mark.parametrize("log2_ctb", [4, 5])
def test_quadtree_roundtrip(log2_ctb):
    cfg = _cfg(log2_ctb=log2_ctb)
    enc = quadtree_codec.QuadtreeIntraEncoder(cfg)
    frames = [synth_frame(cfg.width, cfg.height, s) for s in range(2)]
    stream = []
    nals = enc.stream_headers()
    recons = []
    for f in frames:
        fn, rec = enc.encode_frame(*f)
        nals.extend(fn)
        recons.append(rec)
    import video_codecs_tpu.entropy.bitstream as bsm
    stream = bsm.annexb(nals)
    dec = quadtree_codec.QuadtreeIntraDecoder()
    out = dec.decode(stream)
    assert dec.hash_status == [True, True]
    for o, r in zip(out, recons):
        np.testing.assert_array_equal(o[0], r[0])
        np.testing.assert_array_equal(o[1], r[1])
        np.testing.assert_array_equal(o[2], r[2])


@pytest.mark.skipif(not os.path.exists(HM_DECODER),
                    reason="HM reference decoder not built")
@pytest.mark.parametrize("log2_ctb", [4, 5])
def test_quadtree_hm_conformance(tmp_path, log2_ctb):
    cfg = _cfg(log2_ctb=log2_ctb)
    enc = quadtree_codec.QuadtreeIntraEncoder(cfg)
    frames = [synth_frame(cfg.width, cfg.height, s) for s in range(2)]
    nals = enc.stream_headers()
    recons = []
    for f in frames:
        fn, rec = enc.encode_frame(*f)
        nals.extend(fn)
        recons.append(rec)
    import video_codecs_tpu.entropy.bitstream as bsm
    stream = bsm.annexb(nals)
    p = tmp_path / "qt.bin"
    p.write_bytes(stream)
    r = subprocess.run([HM_DECODER, "-b", str(p), "-o",
                        str(tmp_path / "qt.yuv")],
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stdout + r.stderr
    assert r.stdout.count("(OK)") == 2 and "ERROR" not in r.stdout, r.stdout
    ry, ru, rv = yuv.read_frames(str(tmp_path / "qt.yuv"), cfg.width,
                                 cfg.height)
    for i in range(2):
        np.testing.assert_array_equal(ry[i], recons[i][0].astype(np.uint8))
        np.testing.assert_array_equal(ru[i], recons[i][1].astype(np.uint8))


def test_dump_mode_statistics(monkeypatch, capsys):
    """VCT_DUMP_MODES=1 prints per-CU-leaf mode lines
    (hm-12.1-statistic-for-modes xEncodeCU2 parity)."""
    import numpy as np
    monkeypatch.setenv("VCT_DUMP_MODES", "1")
    cfg = _cfg(log2_ctb=5)
    enc = quadtree_codec.QuadtreeIntraEncoder(cfg)
    enc.encode_frame(*synth_frame(cfg.width, cfg.height, 0))
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if l.startswith("absPartIdx=")]
    assert lines and all("PredMode=INTRA" in l and "PartSize=" in l
                         for l in lines)
    # leaves tile the frame exactly
    area = sum(int(l.split()[3].split("x")[0]) ** 2 for l in lines)
    assert area == cfg.width * cfg.height
