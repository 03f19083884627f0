"""Diagnose the RA BD-rate gap: ours (device RA engine) vs HM-16.5.

Encodes the same synthetic clip with both encoders, then reports
  - per-picture bits + final PSNR for both
  - per-syntax-class CABAC bin breakdown of BOTH streams (our
    decoder-analyser hooks, TComCodingStatistics parity)
so the +XX% bits can be attributed to coeff vs mv vs mode classes.

Usage: python scripts/diag_ra_gap.py [--w 832 --h 480 --frames 17 --qp 32]
"""

import argparse
import json
import math
import os
import re
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.bench_configs import synth, write_src, psnr_y  # noqa: E402

HM = "/root/repo/.refbuild/hm-16.5rc1/bin/TAppEncoderStatic"
HM_CFG = "/root/repo/.refbuild/hm-16.5rc1/cfg"


def class_table(stream, decoder):
    from video_codecs_tpu.utils import coding_stats
    coding_stats.start()
    try:
        decoder.decode(stream)
    finally:
        st = coding_stats.stop()
    return {k: dict(v) for k, v in st.rows.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--w", type=int, default=832)
    ap.add_argument("--h", dest="hh", type=int, default=480)
    ap.add_argument("--frames", type=int, default=17)
    ap.add_argument("--qp", type=int, default=32)
    ap.add_argument("--skip-hm", action="store_true")
    args = ap.parse_args()

    frames = synth(args.w, args.hh, args.frames)
    out = {}

    # ---- HM ----
    if not args.skip_hm:
        with tempfile.TemporaryDirectory() as tmp:
            src = os.path.join(tmp, "src.yuv")
            write_src(frames, src)
            t0 = time.time()
            r = subprocess.run(
                [HM, "-c", f"{HM_CFG}/encoder_randomaccess_main.cfg",
                 "-i", src, "-b", os.path.join(tmp, "o.bin"),
                 "-o", os.path.join(tmp, "r.yuv"),
                 "-wdt", str(args.w), "-hgt", str(args.hh),
                 "-f", str(args.frames), "-fr", "30",
                 "-q", str(args.qp)],
                capture_output=True, text=True, timeout=5400)
            assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-300:]
            hm_stream = open(os.path.join(tmp, "o.bin"), "rb").read()
            per_poc = []
            for m in re.finditer(
                    r"POC\s+(\d+).*?\( (\S)-SLICE,\s+nQP\s+(-?\d+)\s+QP"
                    r"\s+(-?\d+)\s*\)\s+(\d+) bits \[Y (\d+\.\d+) dB",
                    r.stdout):
                per_poc.append(dict(poc=int(m.group(1)), st=m.group(2),
                                    qp=int(m.group(4)),
                                    bits=int(m.group(5)),
                                    ypsnr=float(m.group(6))))
            out["hm"] = dict(
                wall=time.time() - t0,
                bytes=len(hm_stream), per_poc=per_poc)
            open("/tmp/diag_hm.bin", "wb").write(hm_stream)
        print("HM done:", out["hm"]["bytes"] * 8 / args.frames, "bits/frame",
              flush=True)
    elif os.path.exists("/tmp/diag_hm.bin"):
        hm_stream = open("/tmp/diag_hm.bin", "rb").read()
        out["hm"] = dict(bytes=len(hm_stream), per_poc=[])
    else:
        hm_stream = None

    # ---- ours (device RA engine) ----
    from video_codecs_tpu.entropy import bitstream as bs
    from video_codecs_tpu.models.hevc import headers, inter_jax, ra_codec

    cfg = headers.HevcConfig(width=args.w, height=args.hh, qp=args.qp,
                             reorder_pics=3, sign_data_hiding=True)
    enc = inter_jax.DeviceRandomAccessEncoder(cfg, search_range=64)
    enc.encode_sequence_ra(frames)    # warm
    t0 = time.time()
    stream, recons = enc.encode_sequence_ra(frames)
    dt = time.time() - t0
    # per-NAL sizes
    sizes = []
    for nal in bs.split_annexb(stream):
        sizes.append(((nal[0] >> 1) & 0x3F, len(nal)))
    out["ours"] = dict(
        wall=dt, fps=args.frames / dt, bytes=len(stream),
        ypsnr=psnr_y(frames, recons),
        nal_sizes=sizes)
    open("/tmp/diag_ours.bin", "wb").write(stream)
    print("ours done:", len(stream) * 8 / args.frames, "bits/frame, PSNR",
          out["ours"]["ypsnr"], flush=True)

    # ---- per-class bin tables ----
    dec = ra_codec.RandomAccessDecoder()
    out["ours_classes"] = class_table(stream, dec)
    print("ours class table done", flush=True)
    if hm_stream is not None:
        from video_codecs_tpu.models.hevc import decoder as gd
        out["hm_classes"] = class_table(hm_stream, gd.GeneralDecoder())
        print("hm class table done", flush=True)

    with open("/tmp/diag_ra_gap.json", "w") as f:
        json.dump(out, f, indent=1, default=str)

    # ---- summary ----
    print("\n==== SUMMARY ====")
    if "hm" in out and out["hm"].get("per_poc"):
        hm_bits = sum(p["bits"] for p in out["hm"]["per_poc"])
        print(f"HM:   {hm_bits/args.frames:9.0f} bits/frame")
        for p in out["hm"]["per_poc"]:
            print(f"  POC{p['poc']:3d} {p['st']} QP{p['qp']} "
                  f"{p['bits']:8d} bits  {p['ypsnr']:.2f} dB")
    print(f"ours: {len(stream)*8/args.frames:9.0f} bits/frame, "
          f"PSNR {out['ours']['ypsnr']:.2f}")
    for k in ("ours_classes", "hm_classes"):
        if k not in out:
            continue
        print(f"\n-- {k} (bins) --")
        rows = sorted(out[k].items(), key=lambda kv: -kv[1]["bins"])
        tot = sum(v["bins"] for _, v in rows)
        for name, v in rows[:20]:
            print(f"  {name:<26}{v['bins']:>10}  "
                  f"{100*v['bins']/max(tot,1):5.1f}%")
        print(f"  {'TOTAL':<26}{tot:>10}")


if __name__ == "__main__":
    main()
