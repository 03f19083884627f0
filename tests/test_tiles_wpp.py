"""Tiles and WPP decode conformance: HM streams with --Tiles (uniform
and explicit grids) and --WaveFrontSynchro must decode bit-exactly —
entry-point offset resolution (EBSP->RBSP), per-substream CABAC
restart in tile scan order, tile-boundary availability gating (intra
refs, merge/AMVP, CABAC contexts, SAO merges), and WPP context
inheritance from the second CTU of the row above.

Parity: spec 6.5.1 tile scan, 7.4.7.1 entry points, 9.3.1 WPP sync;
hm-16.5rc1 TDecSlice.cpp substream loop, TComPicSym tile maps.
"""

import os
import subprocess

import numpy as np
import pytest

from video_codecs_tpu.models.hevc import decoder
from video_codecs_tpu.utils import yuv

HM_ENCODER = "/root/repo/.refbuild/hm-16.5rc1/bin/TAppEncoderStatic"
HM_CFG_DIR = "/root/repo/.refbuild/hm-16.5rc1/cfg"
FOREMAN = "/root/reference/jm18.5/bin/foreman_part_qcif.yuv"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(HM_ENCODER) and os.path.exists(FOREMAN)),
    reason="HM reference encoder not built")


def _hm(tmp_path, cfg, w, h, qp, frames, extra):
    ys, us, vs = yuv.read_frames(FOREMAN, 176, 144)
    cyc = [i % len(ys) for i in range(frames)]
    # mosaic the QCIF source up to w x h (HM requires tile columns
    # >= 256 luma samples wide, so tile tests need frames >= 512 wide)
    ry = 1 + (h - 1) // 144
    rx = 1 + (w - 1) // 176
    ys = np.tile(ys, (1, ry, rx))[:, :h, :w]
    us = np.tile(us, (1, ry, rx))[:, :h // 2, :w // 2]
    vs = np.tile(vs, (1, ry, rx))[:, :h // 2, :w // 2]
    src = tmp_path / "src.yuv"
    yuv.write_frames(str(src), ys[cyc], us[cyc], vs[cyc])
    out = tmp_path / "hm.bin"
    rec = tmp_path / "hm_rec.yuv"
    r = subprocess.run(
        [HM_ENCODER, "-c", f"{HM_CFG_DIR}/{cfg}", "-i", str(src),
         "-b", str(out), "-o", str(rec), "-wdt", str(w), "-hgt", str(h),
         "-f", str(frames), "-fr", "30", "-q", str(qp),
         "--SEIDecodedPictureHash=1", *extra],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-1000:]
    return out.read_bytes(), str(rec)


def _check(stream, rec, w, h, n, dec):
    frames = dec.decode(stream)
    assert len(frames) == n, len(frames)
    assert dec.hash_status == [True] * n, dec.hash_status
    ry, ru, rv = yuv.read_frames(rec, w, h)
    for i, f in enumerate(frames):
        np.testing.assert_array_equal(f[0].astype(np.uint8), ry[i])
        np.testing.assert_array_equal(f[1].astype(np.uint8), ru[i])
        np.testing.assert_array_equal(f[2].astype(np.uint8), rv[i])


TILE_ARGS = ["--TileUniformSpacing=1", "--NumTileColumnsMinus1=1",
             "--NumTileRowsMinus1=1"]


def test_tiles_intra_2x2(tmp_path):
    stream, rec = _hm(tmp_path, "encoder_intra_main.cfg", 512, 192, 32,
                      2, TILE_ARGS)
    dec = decoder.GeneralIntraDecoder()
    _check(stream, rec, 512, 192, 2, dec)
    assert dec.pps.tiles and dec.pps.tile_cols == 2 \
        and dec.pps.tile_rows == 2


def test_tiles_intra_explicit_grid(tmp_path):
    stream, rec = _hm(tmp_path, "encoder_intra_main.cfg", 512, 192, 30,
                      2, ["--TileUniformSpacing=0",
                          "--NumTileColumnsMinus1=1",
                          "--NumTileRowsMinus1=1",
                          "--TileColumnWidthArray=4",
                          "--TileRowHeightArray=2"])
    _check(stream, rec, 512, 192, 2, decoder.GeneralIntraDecoder())


def test_tiles_lowdelay_p(tmp_path):
    stream, rec = _hm(tmp_path, "encoder_lowdelay_P_main.cfg", 512, 192,
                      32, 5, TILE_ARGS)
    _check(stream, rec, 512, 192, 5, decoder.GeneralDecoder())


def test_wpp_intra(tmp_path):
    stream, rec = _hm(tmp_path, "encoder_intra_main.cfg", 176, 144, 32,
                      2, ["--WaveFrontSynchro=1"])
    _check(stream, rec, 176, 144, 2, decoder.GeneralIntraDecoder())


def test_wpp_lowdelay_p(tmp_path):
    stream, rec = _hm(tmp_path, "encoder_lowdelay_P_main.cfg", 176, 144,
                      32, 5, ["--WaveFrontSynchro=1"])
    _check(stream, rec, 176, 144, 5, decoder.GeneralDecoder())
