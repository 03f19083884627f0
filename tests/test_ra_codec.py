"""GOP-8 random-access hierarchical B: GOPEntry tables, RPS, conformance."""

import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")
from bench import synth_clip  # noqa: E402

from video_codecs_tpu.models.hevc import headers, ra_codec  # noqa: E402
from video_codecs_tpu.utils import yuv  # noqa: E402

HM_DECODER = "/root/repo/.refbuild/hm-16.5rc1/bin/TAppDecoderStatic"
HM_RA_CFG = "/root/repo/.refbuild/hm-16.5rc1/cfg/encoder_randomaccess_main.cfg"


def _clip(n=17):
    return [(f[0][:48, :80], f[1][:24, :40], f[2][:24, :40])
            for f in synth_clip(416, 240, n)]


def test_gop_entry_parse_stock_cfg():
    """The stock HM random-access cfg's Frame1..8 lines parse into the
    GOP-8 pyramid (TAppEncCfg GOPEntry istream parser parity)."""
    if not os.path.exists(HM_RA_CFG):
        pytest.skip("HM cfg not present")
    entries = ra_codec.parse_gop_entries(open(HM_RA_CFG).read())
    assert len(entries) == 8
    assert [e.poc for e in entries] == [8, 4, 2, 1, 3, 6, 5, 7]
    assert [e.temporal_id for e in entries] == [0, 1, 2, 3, 3, 2, 3, 3]
    assert entries[0].ref_pics == (-8, -12, -16)
    assert entries[3].ref_pics == (-1, 1, 3, 7)
    assert entries[1].qp_offset == 2
    # parsed table drives the encoder identically to the built-in one
    assert tuple(entries) == ra_codec.GOP8_RA


def test_ra_gop8_roundtrip_and_order():
    frames = _clip()
    cfg = headers.HevcConfig(width=80, height=48, qp=32, reorder_pics=3,
                             num_refs=4)
    enc = ra_codec.RandomAccessEncoder(cfg, search_range=8)
    stream, recons = enc.encode_sequence_ra(frames)
    assert len(recons) == len(frames)
    dec = ra_codec.RandomAccessDecoder()
    out = dec.decode(stream)
    assert dec.hash_status == [True] * len(frames)
    for i, (o, r) in enumerate(zip(out, recons)):
        np.testing.assert_array_equal(o[0], r[0], err_msg=f"frame {i}")
        np.testing.assert_array_equal(o[1], r[1])
        np.testing.assert_array_equal(o[2], r[2])


@pytest.mark.skipif(not os.path.exists(HM_DECODER),
                    reason="HM reference decoder not built")
def test_ra_gop8_hm_conformance(tmp_path):
    """HM decodes the GOP-8 stream: hash-SEI OK on every picture and the
    display-order (POC-reordered) output matches our recon bit-exactly —
    this validates the RPS signalling, DPB retention, list construction,
    and uni/bi/zero-merge derivations against the reference."""
    frames = _clip()
    cfg = headers.HevcConfig(width=80, height=48, qp=32, reorder_pics=3,
                             num_refs=4)
    enc = ra_codec.RandomAccessEncoder(cfg, search_range=8)
    stream, recons = enc.encode_sequence_ra(frames)
    p = tmp_path / "ra.bin"
    p.write_bytes(stream)
    r = subprocess.run([HM_DECODER, "-b", str(p),
                        "-o", str(tmp_path / "r.yuv")],
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-500:]
    assert r.stdout.count("(OK)") == len(frames), r.stdout[-3000:]
    assert "ERROR" not in r.stdout
    ry, ru, rv = yuv.read_frames(str(tmp_path / "r.yuv"), 80, 48)
    for i in range(len(frames)):
        np.testing.assert_array_equal(ry[i], recons[i][0].astype(np.uint8))
        np.testing.assert_array_equal(ru[i], recons[i][1].astype(np.uint8))
        np.testing.assert_array_equal(rv[i], recons[i][2].astype(np.uint8))


@pytest.mark.skipif(not os.path.exists(HM_DECODER),
                    reason="HM reference decoder not built")
def test_ra_gop8_sao_hm_conformance(tmp_path):
    """RA streams WITH SAO on the B pyramid (host + device encoders):
    self-roundtrip bit-exact and HM hash-SEI OK on every picture
    (TEncSampleAdaptiveOffset parity on B slices)."""
    from video_codecs_tpu.models.hevc import inter_jax as ij
    frames = _clip(9)
    cfg = headers.HevcConfig(width=80, height=48, qp=32, reorder_pics=3,
                             num_refs=4, sao=True)
    for enc in (ra_codec.RandomAccessEncoder(cfg, search_range=8),
                ij.DeviceRandomAccessEncoder(cfg, search_range=8)):
        stream, recons = enc.encode_sequence_ra(frames)
        out = ra_codec.RandomAccessDecoder().decode(stream)
        for i, (o, r) in enumerate(zip(out, recons)):
            for a, b in zip(o, r):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                              err_msg=f"frame {i}")
        p = tmp_path / "ra_sao.bin"
        p.write_bytes(stream)
        r = subprocess.run([HM_DECODER, "-b", str(p), "-o",
                            str(tmp_path / "hm.yuv")],
                           capture_output=True, text=True, timeout=300)
        assert r.returncode == 0, r.stdout + r.stderr
        assert r.stdout.count("(OK)") == len(frames), r.stdout
        assert "ERROR" not in r.stdout
