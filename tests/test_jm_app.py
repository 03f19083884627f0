"""JM-style encoder CLI: cfg parsing + end-to-end encode.

Parity: jm18.5/lencod configfile.c (`Key = Value`, -d/-p CLI)."""

import os

import numpy as np
import pytest

from video_codecs_tpu.tools import jm_encoder_app
from video_codecs_tpu.utils import yuv

JM_CFG = "/root/repo/.refbuild/jm18.5/bin/encoder_baseline.cfg"
FOREMAN = "/root/reference/jm18.5/bin/foreman_part_qcif.yuv"


@pytest.mark.skipif(not os.path.exists(JM_CFG),
                    reason="stock JM cfg not available")
def test_stock_jm_cfg_parses():
    opts = jm_encoder_app.parse_jm_cfg(JM_CFG)
    assert opts["ProfileIDC"] == "66"
    assert "InputFile" in opts and "QPISlice" in opts
    assert not any("#" in v for v in opts.values())


@pytest.mark.skipif(not os.path.exists(FOREMAN),
                    reason="foreman fixture unavailable")
def test_jm_cli_encodes_decodable_stream(tmp_path):
    out = tmp_path / "o.264"
    rec = tmp_path / "r.yuv"
    crop = tmp_path / "in.yuv"
    ys, us, vs = yuv.read_frames(FOREMAN, 176, 144, 2)
    yuv.write_frames(str(crop), ys[:, :48, :64], us[:, :24, :32],
                     vs[:, :24, :32])
    jm_encoder_app.main([
        "-p", f"InputFile={crop}", "-p", "SourceWidth=64",
        "-p", "SourceHeight=48", "-p", "FramesToBeEncoded=2",
        "-p", "QPPSlice=30", "-p", "SymbolMode=1", "-p", "SearchMode=3",
        "-p", f"OutputFile={out}", "-p", f"ReconFile={rec}"])
    from video_codecs_tpu.models.h264.inter_codec import H264Decoder
    frames = H264Decoder().decode(out.read_bytes())
    assert len(frames) == 2
    ry, ru, rv = yuv.read_frames(str(rec), 64, 48)
    for i in range(2):
        np.testing.assert_array_equal(ry[i],
                                      frames[i][0].astype(np.uint8))
