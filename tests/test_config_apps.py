"""Config system (HM cfg parity) + encoder/decoder CLI apps end-to-end."""

import subprocess
import sys

import numpy as np

from test_intra_codec import synth_frame
from video_codecs_tpu.utils import config, yuv

HM_CFG_DIR = "/root/reference/hm-16.5rc1/cfg"


def test_hm_cfg_files_parse_as_is():
    opts = config.load_config([f"{HM_CFG_DIR}/encoder_intra_main.cfg"])
    assert opts["QP"] == "32"
    assert opts["IntraPeriod"] == "1"
    assert opts["MaxCUWidth"] == "64"
    # stacking: per-sequence cfg overrides/extends the scenario cfg
    opts = config.load_config(
        [f"{HM_CFG_DIR}/encoder_intra_main.cfg",
         f"{HM_CFG_DIR}/per-sequence/BasketballDrill.cfg"],
        overrides={"QP": "37"})
    assert opts["SourceWidth"] == "832" and opts["SourceHeight"] == "480"
    assert opts["QP"] == "37"  # CLI override wins
    s = config.to_encoder_settings(opts)
    assert (s.width, s.height, s.qp, s.intra_period) == (832, 480, 37, 1)
    assert "TransformSkip" in s.unsupported  # honest about unimplemented tools


def test_encoder_decoder_apps_roundtrip(tmp_path):
    w, h, n = 64, 48, 3
    frames = [synth_frame(w, h, s) for s in range(n)]
    src = tmp_path / "in.yuv"
    yuv.write_frames(str(src), np.stack([f[0] for f in frames]),
                     np.stack([f[1] for f in frames]),
                     np.stack([f[2] for f in frames]))
    cfgf = tmp_path / "test.cfg"
    cfgf.write_text(
        "SourceWidth : 64\nSourceHeight : 48\nQP : 30   # qp\n"
        "FramesToBeEncoded : 3\nIntraPeriod : -1\nGOPSize : 1\n")
    out_bin = tmp_path / "out.bin"
    rec = tmp_path / "rec.yuv"
    r = subprocess.run(
        [sys.executable, "-m", "video_codecs_tpu.tools.encoder_app",
         "-c", str(cfgf), "-i", str(src), "-b", str(out_bin),
         "-o", str(rec)],
        capture_output=True, text=True, timeout=500, cwd="/root/repo",
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": "/root/repo"})
    assert r.returncode == 0, r.stdout + r.stderr
    assert "SUMMARY" in r.stdout

    r2 = subprocess.run(
        [sys.executable, "-m", "video_codecs_tpu.tools.decoder_app",
         "-b", str(out_bin), "-o", str(tmp_path / "dec.yuv")],
        capture_output=True, text=True, timeout=500, cwd="/root/repo",
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": "/root/repo"})
    assert r2.returncode == 0, r2.stdout + r2.stderr
    assert r2.stdout.count("(OK)") == n, r2.stdout
    a = open(rec, "rb").read()
    b = open(tmp_path / "dec.yuv", "rb").read()
    assert a == b, "decoder app output != encoder recon"
