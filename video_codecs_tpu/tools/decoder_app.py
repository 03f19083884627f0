"""Decoder CLI — the TAppDecoder / ldecod analog.

Usage:  python -m video_codecs_tpu.tools.decoder_app -b in.bin [-o out.yuv]
                [--stats]
Prints per-picture hash-SEI status like HM's decoder; auto-detects H.264
vs HEVC streams and HEVC intra vs low-delay P. --stats prints the
per-syntax-class bin/bit table (the TAppDecoderAnalyser build).
"""

from __future__ import annotations

import sys

import numpy as np


def main(argv=None) -> None:
    from video_codecs_tpu.tools import analyze
    from video_codecs_tpu.utils import coding_stats, yuv

    argv = sys.argv[1:] if argv is None else argv
    stats = "--stats" in argv
    argv = [a for a in argv if a != "--stats"]
    args = dict(zip(argv[::2], argv[1::2]))
    stream = open(args["-b"], "rb").read()
    codec = analyze.sniff_codec(stream)
    if stats:
        coding_stats.start()

    if codec == "h264":
        from video_codecs_tpu.models.h264 import inter_codec as h264
        dec = h264.H264Decoder()
        frames = dec.decode(stream)
        status = ["(no hash SEI)"] * len(frames)
    else:
        from video_codecs_tpu.models.hevc import inter_codec
        try:
            dec = inter_codec.LowDelayDecoder(conceal=True)
            frames = dec.decode(stream)
        except Exception:
            # general conformant-intra decoder (HM-encoder streams etc.)
            from video_codecs_tpu.models.hevc import decoder as gdec
            dec = gdec.GeneralIntraDecoder()
            frames = dec.decode(stream)
        status = ["(OK)" if ok else "***ERROR***" for ok in dec.hash_status]
        status += ["(no hash SEI)"] * (len(frames) - len(status))

    if stats:
        print(coding_stats.stop().report())
    for i, st in enumerate(status):
        print(f"POC {i:4d} [{st}]")
    if "-o" in args and frames:
        yuv.write_frames(args["-o"],
                         np.stack([f[0] for f in frames]).astype(np.uint8),
                         np.stack([f[1] for f in frames]).astype(np.uint8),
                         np.stack([f[2] for f in frames]).astype(np.uint8))
    print(f"{len(frames)} pictures decoded ({codec}).")


if __name__ == "__main__":
    main()
