"""H.264 DPB command-surface tests: long-term refs, MMCO, reorder.

Covers the encoder-side long_term / lt_period / reorder='lt_first'
features (ADVICE round-3 findings): self roundtrip must be bit-exact
and the streams must decode bit-exactly in JM ldecod, which applies
spec 8.2.4/8.2.5 independently.

Parity: jm18.5/lcommon/src/mbuffer.c (mm_assign_long_term_frame_idx,
mm_mark_current_picture_long_term, sliding_window_memory_management),
ldecod/src/header.c dec_ref_pic_marking :843.
"""

import os
import subprocess

import numpy as np
import pytest

from video_codecs_tpu.models.h264 import dpb as dpb_mod
from video_codecs_tpu.models.h264.inter_codec import H264Decoder, H264Encoder
from video_codecs_tpu.utils import yuv

JM_DECODER = "/root/repo/.refbuild/jm18.5/bin/ldecod.exe"
FOREMAN = "/root/reference/jm18.5/bin/foreman_part_qcif.yuv"

needs_jm = pytest.mark.skipif(
    not (os.path.exists(JM_DECODER) and os.path.exists(FOREMAN)),
    reason="JM reference decoder not built")


def _foreman(n):
    """The fixture has 3 frames; cycle 0,1,2,1,0,... for longer GOPs."""
    ys, us, vs = yuv.read_frames(FOREMAN, 176, 144)
    cyc = [0, 1, 2, 1]
    return [(ys[cyc[i % 4]], us[cyc[i % 4]], vs[cyc[i % 4]])
            for i in range(n)]


def _roundtrip(stream, recons):
    out = H264Decoder().decode(stream)
    assert len(out) == len(recons)
    for o, rc in zip(out, recons):
        for a, b in zip(o, rc):
            np.testing.assert_array_equal(np.asarray(a, np.int64),
                                          np.asarray(b, np.int64))


def _jm_decode_matches(tmp_path, stream, recons, w=176, h=144):
    (tmp_path / "t.264").write_bytes(stream)
    r = subprocess.run([JM_DECODER, "-i", "t.264", "-o", "jm.yuv"],
                       capture_output=True, text=True, timeout=120,
                       cwd=tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    ry, ru, rv = yuv.read_frames(str(tmp_path / "jm.yuv"), w, h)
    assert len(ry) == len(recons)
    for i in range(len(recons)):
        for ours, ref in zip(recons[i], (ry[i], ru[i], rv[i])):
            np.testing.assert_array_equal(ref, ours.astype(np.uint8))


# ---- unit tests on the Dpb class ---------------------------------------


def _pic(fn, lt=None):
    sh = (np.zeros((16, 16), np.int32),) * 3
    return dpb_mod.RefPic(sh, frame_num=fn, lt_idx=lt)


def test_sliding_window_evicts_mid_list_pic():
    """list.remove on dataclass-with-arrays used to crash (__eq__ on
    numpy planes); eq=False makes eviction identity-based."""
    d = dpb_mod.Dpb(2)
    d.mark(_pic(0, lt=0))      # long-term head stays
    d.mark(_pic(1))
    d.mark(_pic(2))            # evicts fn=1 (mid list), not the LT
    assert [p.frame_num for p in d.pics] == [0, 2]
    assert d.pics[0].long_term


def test_mmco6_unmarks_duplicate_lt_idx():
    d = dpb_mod.Dpb(3)
    d.mark(_pic(0), mmco=[(6, 0)])
    cur = _pic(1)
    d.mark(cur, mmco=[(4, 1), (6, 0)])
    lts = [p for p in d.pics if p.long_term]
    assert lts == [cur]        # old lt_idx-0 picture dropped


def test_mmco3_unmarks_duplicate_lt_idx():
    d = dpb_mod.Dpb(3)
    d.mark(_pic(0), mmco=[(6, 0)])
    d.mark(_pic(1))
    # assign lt_idx 0 to the short-term fn=1 (difference_of_pic_nums=1)
    d.mark(_pic(2), mmco=[(3, 1, 0)])
    lts = [p for p in d.pics if p.long_term]
    assert len(lts) == 1 and lts[0].frame_num == 1


def test_reorder_missing_pic_raises_diagnosable():
    d = dpb_mod.Dpb(2)
    d.mark(_pic(0))
    with pytest.raises(ValueError, match="long-term"):
        d.apply_reorder(d.default_list0(1), [(2, 0)], 1, 1)
    with pytest.raises(ValueError, match="short-term"):
        d.apply_reorder(d.default_list0(1), [(0, 5)], 1, 1)


# ---- end-to-end: encoder streams with LT features ----------------------


@needs_jm
@pytest.mark.parametrize("entropy", ["cavlc", "cabac"])
def test_long_term_idr_stream(tmp_path, entropy):
    """IDR marked long-term survives the sliding window; decoders must
    see long_term_reference_flag=1 (ADVICE finding 2)."""
    frames = _foreman(5)
    enc = H264Encoder(176, 144, qp=30, entropy=entropy, n_refs=2,
                      long_term=True)
    stream, recons = enc.encode_sequence(frames)
    _roundtrip(stream, recons)
    _jm_decode_matches(tmp_path, stream, recons)


@needs_jm
def test_lt_period_mmco_stream(tmp_path):
    """Periodic MMCO 4+6 long-term replacement round-trips and decodes
    in ldecod (exercises duplicate-lt_idx eviction on both sides)."""
    frames = _foreman(6)
    enc = H264Encoder(176, 144, qp=30, entropy="cavlc", n_refs=2,
                      lt_period=2)
    stream, recons = enc.encode_sequence(frames)
    _roundtrip(stream, recons)
    _jm_decode_matches(tmp_path, stream, recons)


@needs_jm
def test_reorder_lt_first_stream(tmp_path):
    frames = _foreman(5)
    enc = H264Encoder(176, 144, qp=30, entropy="cavlc", n_refs=2,
                      long_term=True, reorder="lt_first")
    stream, recons = enc.encode_sequence(frames)
    _roundtrip(stream, recons)
    _jm_decode_matches(tmp_path, stream, recons)
