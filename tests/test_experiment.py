"""Experiment harness: Bjontegaard deltas + QP sweep tables.

Parity target: stvssim_src/exp_setup/getAvg_all.sh + b_data_rdo_new/*.m
(batch QP sweeps tabulating metric-vs-bitrate per RDO variant)."""

import numpy as np
import pytest

from video_codecs_tpu.tools import experiment as ex


def _curve(rates, offset_db=0.0, scale=1.0):
    rates = np.asarray(rates, float) * scale
    psnr = 10 * np.log10(rates) + 20 + offset_db
    return rates, psnr


def test_bd_identical_curves_zero():
    r, p = _curve([100, 200, 400, 800])
    assert abs(ex.bd_rate(r, p, r, p)) < 1e-9
    assert abs(ex.bd_psnr(r, p, r, p)) < 1e-9


def test_bd_rate_pure_rate_shift():
    # test curve = same PSNR at exactly 10% fewer bits -> BD-rate = -10%
    r, p = _curve([100, 200, 400, 800])
    assert ex.bd_rate(r, p, r * 0.9, p) == pytest.approx(-10.0, abs=1e-6)
    assert ex.bd_psnr(r, p, r * 0.9, p) > 0


def test_bd_psnr_pure_quality_shift():
    r, p = _curve([100, 200, 400, 800])
    assert ex.bd_psnr(r, p, r, p + 0.5) == pytest.approx(0.5, abs=1e-6)
    assert ex.bd_rate(r, p, r, p + 0.5) < 0


def test_bd_requires_overlap():
    r1, p1 = _curve([100, 200])
    r2, p2 = _curve([10000, 20000])
    with pytest.raises(ValueError):
        ex.bd_rate(r1, p1, r2, p2)


def test_qp_sweep_hevc_intra_monotone():
    from video_codecs_tpu.models.hevc import headers, intra_codec

    rng = np.random.default_rng(5)
    h, w = 32, 32
    base = rng.integers(0, 256, (h * 2, w * 2)).astype(np.uint8)
    frames = [(base[:h, :w],
               base[:h // 2, :w // 2], base[:h // 2, :w // 2])]

    def factory(qp):
        return intra_codec.IntraEncoder(
            headers.HevcConfig(width=w, height=h, qp=qp))

    pts = ex.qp_sweep(factory, frames, qps=(28, 36), fps=30.0,
                      metrics={"n": lambda f, r: len(r)})
    assert pts[0].bitrate > pts[1].bitrate       # lower QP -> more bits
    assert pts[0].psnr_y > pts[1].psnr_y         # lower QP -> higher PSNR
    assert pts[0].extra["n"] == 1.0
    table = ex.format_table("t", pts)
    assert "Y-PSNR" in table and len(table.splitlines()) == 4
    d = ex.compare(pts, pts)
    assert abs(d["bd_rate_pct"]) < 1e-9
