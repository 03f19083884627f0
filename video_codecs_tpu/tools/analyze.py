"""Bitstream analyzer: NAL-level + header-level dump for HEVC and H.264.

Parity reference: bsanalyzer/ — bs.h bit reader + h264_stream.cpp
read_nal_unit (h264_stream.h:374) + h264_analyze.cpp:63 CLI; HM
utils/annexBbytecount.cpp.

CLI:  python -m video_codecs_tpu.tools.analyze <stream> [--codec hevc|h264]
"""

from __future__ import annotations

import argparse

from video_codecs_tpu.entropy import bitstream as bs

HEVC_NAL_NAMES = {
    0: "TRAIL_N", 1: "TRAIL_R", 2: "TSA_N", 3: "TSA_R", 4: "STSA_N",
    5: "STSA_R", 6: "RADL_N", 7: "RADL_R", 8: "RASL_N", 9: "RASL_R",
    16: "BLA_W_LP", 17: "BLA_W_RADL", 18: "BLA_N_LP", 19: "IDR_W_RADL",
    20: "IDR_N_LP", 21: "CRA_NUT", 32: "VPS", 33: "SPS", 34: "PPS",
    35: "AUD", 36: "EOS", 37: "EOB", 38: "FD", 39: "PREFIX_SEI",
    40: "SUFFIX_SEI",
}

H264_NAL_NAMES = {
    1: "SLICE_NON_IDR", 2: "DPA", 3: "DPB", 4: "DPC", 5: "SLICE_IDR",
    6: "SEI", 7: "SPS", 8: "PPS", 9: "AUD", 10: "EOSEQ", 11: "EOSTREAM",
    12: "FILLER",
}


def sniff_codec(stream: bytes) -> str:
    """Guess codec from the first NAL header."""
    nals = bs.split_annexb(stream)
    if not nals:
        return "unknown"
    b0 = nals[0][0]
    # HEVC: forbidden_zero(1) + type(6) + layer(6) + tid(3) => 2-byte header,
    # H.264: forbidden_zero(1) + ref_idc(2) + type(5) => 1 byte.
    h264_type = b0 & 0x1F
    hevc_type = (b0 >> 1) & 0x3F
    if h264_type in (7,) and (b0 >> 5) != 0:
        return "h264"
    if hevc_type in (32, 33, 34, 19, 20, 21, 1, 0, 39, 40):
        return "hevc"
    return "h264" if h264_type in H264_NAL_NAMES else "hevc"


def analyze(stream: bytes, codec: str | None = None) -> list[dict]:
    codec = codec or sniff_codec(stream)
    rows = []
    for nal in bs.split_annexb(stream):
        if codec == "hevc":
            ntype = (nal[0] >> 1) & 0x3F
            tid = (nal[1] & 7) - 1
            row = {"codec": "hevc", "type": ntype,
                   "name": HEVC_NAL_NAMES.get(ntype, f"RSV{ntype}"),
                   "temporal_id": tid, "bytes": len(nal)}
            rbsp = bs.strip_emulation_prevention(nal[2:])
            row.update(_hevc_details(ntype, rbsp))
        else:
            ntype = nal[0] & 0x1F
            row = {"codec": "h264", "type": ntype,
                   "name": H264_NAL_NAMES.get(ntype, f"RSV{ntype}"),
                   "ref_idc": nal[0] >> 5, "bytes": len(nal)}
            rbsp = bs.strip_emulation_prevention(nal[1:])
            row.update(_h264_details(ntype, rbsp))
        rows.append(row)
    return rows


def _hevc_details(ntype: int, rbsp: bytes) -> dict:
    from video_codecs_tpu.models.hevc import headers
    try:
        if ntype == 33:
            cfg = headers.parse_sps(rbsp)
            return {"width": cfg.width, "height": cfg.height,
                    "ctb": 1 << cfg.log2_ctb}
        if ntype == 34:
            pps = headers.parse_pps(rbsp)
            return {"init_qp": pps.init_qp,
                    "deblock": not pps.deblocking_disabled,
                    "sign_hiding": pps.sign_data_hiding}
        if ntype in (19, 20, 21):
            r = bs.BitReader(rbsp)
            first = r.flag()
            r.flag()
            pps_id = r.ue()
            stype = r.ue()
            return {"first_slice": first, "pps_id": pps_id,
                    "slice_type": "BPI"[stype]}
        if ntype in (0, 1):
            r = bs.BitReader(rbsp)
            first = r.flag()
            pps_id = r.ue()
            stype = r.ue()
            poc = r.read(8)
            return {"first_slice": first, "pps_id": pps_id,
                    "slice_type": "BPI"[stype], "poc_lsb": poc}
    except Exception as e:  # header uses unsupported tools: still report NAL
        return {"note": f"parse: {e}"}
    return {}


def _h264_details(ntype: int, rbsp: bytes) -> dict:
    from video_codecs_tpu.models.h264 import intra_codec as h264
    try:
        if ntype == 7:
            wmb, hmb = h264.parse_sps(rbsp)
            return {"width": wmb * 16, "height": hmb * 16}
        if ntype in (1, 5):
            r = bs.BitReader(rbsp)
            first_mb = r.ue()
            stype = r.ue()
            return {"first_mb": first_mb, "slice_type": stype}
    except Exception as e:
        return {"note": f"parse: {e}"}
    return {}


def main() -> None:
    ap = argparse.ArgumentParser(description="HEVC/H.264 bitstream analyzer")
    ap.add_argument("stream")
    ap.add_argument("--codec", choices=["hevc", "h264"])
    args = ap.parse_args()
    data = open(args.stream, "rb").read()
    rows = analyze(data, args.codec)
    total = 0
    for i, row in enumerate(rows):
        extras = {k: v for k, v in row.items()
                  if k not in ("codec", "type", "name", "bytes")}
        print(f"{i:4d}  {row['name']:<14} {row['bytes']:7d} B  "
              + " ".join(f"{k}={v}" for k, v in extras.items()))
        total += row["bytes"]
    print(f"total: {len(rows)} NAL units, {total} payload bytes "
          f"({len(data)} with start codes)")


if __name__ == "__main__":
    main()
