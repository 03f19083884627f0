"""QP-sweep quality evaluation: HM full RDO vs our encoders on the bench clip.

Runs HM-16.5 TAppEncoderStatic (encoder_intra_main.cfg toolset) and our
all-intra paths at QPs 27/32/37/42 on the deterministic 416x240x17 bench
clip, then reports BD-rate / BD-PSNR of ours vs HM.

Usage: python scripts/eval_qt.py [--path qt|fast|host] [--frames N]
HM results are cached in scripts/.hm_sweep_cache.json (keyed by clip+qp).
"""

import argparse
import json
import math
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import synth_clip  # noqa: E402
W, H, FRAMES = 416, 240, 17
from video_codecs_tpu.tools import experiment  # noqa: E402
from video_codecs_tpu.utils import yuv  # noqa: E402

HM_ENC = "/root/repo/.refbuild/hm-16.5rc1/bin/TAppEncoderStatic"
HM_CFG = "/root/repo/.refbuild/hm-16.5rc1/cfg/encoder_intra_main.cfg"
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".hm_sweep_cache.json")


def psnr(ref_planes, rec_planes):
    """Weighted YUV PSNR? Report Y only (HM summary style comparison)."""
    num = den = 0.0
    y_ref = np.concatenate([f[0].astype(np.float64).ravel()
                            for f in ref_planes])
    y_rec = np.concatenate([f[0].astype(np.float64).ravel()
                            for f in rec_planes])
    mse = np.mean((y_ref - y_rec) ** 2)
    return 10 * math.log10(255 ** 2 / mse)


def run_hm(frames, qp, tmp):
    src = os.path.join(tmp, "src.yuv")
    ys = np.stack([f[0] for f in frames])
    us = np.stack([f[1] for f in frames])
    vs = np.stack([f[2] for f in frames])
    yuv.write_frames(src, ys, us, vs)
    out = os.path.join(tmp, f"hm{qp}.bin")
    rec = os.path.join(tmp, f"hm{qp}.yuv")
    t0 = time.time()
    r = subprocess.run(
        [HM_ENC, "-c", HM_CFG, "-i", src, "-b", out, "-o", rec,
         "-wdt", str(W), "-hgt", str(H), "-f", str(len(frames)),
         "-fr", "30", "-q", str(qp), "--ConformanceWindowMode=1"],
        capture_output=True, text=True, timeout=1200)
    dt = time.time() - t0
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    bits = os.path.getsize(out) * 8
    ry, ru, rv = yuv.read_frames(rec, W, H)
    recs = [(ry[i], ru[i], rv[i]) for i in range(len(frames))]
    return bits, psnr(frames, recs), dt


def run_ours(frames, qp, path):
    from video_codecs_tpu.models.hevc import headers, intra_codec
    from video_codecs_tpu.models.hevc import quadtree_codec

    t0 = time.time()
    if path == "qt":
        rdoq = os.environ.get("EVAL_RDOQ", "lite")
        rdoq = False if rdoq in ("0", "off") else rdoq
        sbh = os.environ.get("EVAL_SBH", "1") not in ("0", "off")
        cfg = headers.HevcConfig(width=W, height=H, qp=qp, log2_ctb=5,
                                 log2_min_cb=3, log2_max_tb=5,
                                 sign_data_hiding=sbh, rdoq=rdoq)
        enc = quadtree_codec.QuadtreeFastEncoder(cfg)
        stream, recons = enc.encode_sequence(frames)
    elif path == "fast":
        cfg = headers.HevcConfig(width=W, height=H, qp=qp)
        enc = intra_codec.IntraEncoder(cfg)
        stream, recons = enc.encode_sequence(frames, fast=True)
    else:
        raise ValueError(path)
    dt = time.time() - t0
    return len(stream) * 8, psnr(frames, recons), dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--path", default="qt")
    ap.add_argument("--frames", type=int, default=FRAMES)
    ap.add_argument("--qps", default="27,32,37,42")
    args = ap.parse_args()
    qps = [int(q) for q in args.qps.split(",")]

    frames = synth_clip(W, H, args.frames)
    cache = {}
    if os.path.exists(CACHE):
        cache = json.load(open(CACHE))

    hm_pts, our_pts = [], []
    with tempfile.TemporaryDirectory() as tmp:
        for qp in qps:
            key = f"synth{W}x{H}x{args.frames}-qp{qp}"
            if key not in cache:
                bits, p, dt = run_hm(frames, qp, tmp)
                cache[key] = [bits, p, dt]
                json.dump(cache, open(CACHE, "w"))
            bits, p, dt = cache[key]
            hm_pts.append((bits, p))
            print(f"HM   qp{qp}: {bits/1000:9.1f} kbit  Y-PSNR {p:6.3f}  "
                  f"({dt:5.1f}s = {args.frames/dt:5.2f} fps)")
        for qp in qps:
            bits, p, dt = run_ours(frames, qp, args.path)
            our_pts.append((bits, p))
            print(f"ours qp{qp}: {bits/1000:9.1f} kbit  Y-PSNR {p:6.3f}  "
                  f"({dt:5.1f}s = {args.frames/dt:5.2f} fps)")

    r_a = [b for b, _ in hm_pts]
    p_a = [p for _, p in hm_pts]
    r_t = [b for b, _ in our_pts]
    p_t = [p for _, p in our_pts]
    print(f"BD-rate vs HM: {experiment.bd_rate(r_a, p_a, r_t, p_t):+.2f}%  "
          f"BD-PSNR: {experiment.bd_psnr(r_a, p_a, r_t, p_t):+.3f} dB")


if __name__ == "__main__":
    main()
