"""Driver benchmark: all-intra HEVC encode fps on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Round 2 benchmarks the QUALITY operating point: the device CU-quadtree
encoder (CTB32, CUs 32/16/8, tree-DP decision, RDOQ-lite, SBH, CU-boundary
deblocking).  QP-sweep quality vs HM full RDO on this clip: BD-rate +23.7%
(round-1 fixed-16x16 fast path: +25.3% at 57.9 fps).

Baseline: HM-16.5 TAppEncoderStatic (single thread, -O3) measured on THIS
machine encoding the same deterministic 416x240x17 clip with
cfg/encoder_intra_main.cfg (CTU64 full RDO + RDOQ + SAO): 17 frames in
13.595 s = 1.2505 fps (2026-08-17, BASELINE.md).  Our quadtree stream at
QP32 decodes bit-exact in HM's decoder (hash SEI OK; tests).
"""

import json
import sys
import time

import numpy as np

HM_BASELINE_FPS = 1.2505
W, H, FRAMES = 416, 240, 17
QP = 32


def synth_clip():
    rng = np.random.default_rng(42)
    xx, yy = np.meshgrid(np.arange(W), np.arange(H))
    tex = rng.integers(-24, 25, (H, W))
    frames = []
    for f in range(FRAMES):
        y = np.clip(((xx * 3 + yy * 2 + f * 7) % 256) * 0.7 + tex + 30 +
                    20 * np.sin(2 * np.pi * (xx + 8 * f) / 64), 0, 255).astype(np.uint8)
        u = np.clip(128 + 40 * np.sin(2 * np.pi * (xx[::2, ::2] + 4 * f) / 128),
                    0, 255).astype(np.uint8)
        v = np.clip(128 + 40 * np.cos(2 * np.pi * (yy[::2, ::2] + 4 * f) / 128),
                    0, 255).astype(np.uint8)
        frames.append((y, u, v))
    return frames


def main() -> None:
    from video_codecs_tpu.models.hevc import headers, quadtree_codec

    frames = synth_clip()
    cfg = headers.HevcConfig(width=W, height=H, qp=QP, log2_ctb=5,
                             log2_min_cb=3, log2_max_tb=5,
                             sign_data_hiding=True, rdoq="lite")
    enc = quadtree_codec.QuadtreeFastEncoder(cfg)

    # Warm-up: compile the device quadtree pipeline on frame 0.
    enc.encode_frame_fast(*frames[0])

    # best-of-2: keeps total runtime well inside the driver's budget
    # (the fresh compile alone is ~250 s over the tunnel)
    fps = 0.0
    for _ in range(2):
        t0 = time.time()
        stream, _ = enc.encode_sequence(frames)
        dt = time.time() - t0
        fps = max(fps, FRAMES / dt)

    print(json.dumps({
        "metric": "hevc_all_intra_quadtree_encode_416x240_qp32",
        "value": round(fps, 3),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / HM_BASELINE_FPS, 2),
    }))


if __name__ == "__main__":
    main()
