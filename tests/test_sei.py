"""SEI message suite: write/parse roundtrip + HM decoder tolerance.

Parity: hm-16.5rc1 SEI.h:99-521, SEIwrite.cpp, SEIread.cpp."""

import os
import subprocess

import numpy as np
import pytest

from video_codecs_tpu.models.hevc import headers, intra_codec, sei

HM_DECODER = "/root/repo/.refbuild/hm-16.5rc1/bin/TAppDecoderStatic"


MESSAGES = [
    sei.BufferingPeriod(sps_id=0, initial_cpb_removal_delay=123456,
                        initial_cpb_removal_offset=7),
    sei.PictureTiming(pic_struct=0, source_scan_type=1, duplicate_flag=0),
    sei.UserDataUnregistered(uuid=bytes(range(16)), data=b"hello sei"),
    sei.RecoveryPoint(recovery_poc_cnt=8, exact_match=False,
                      broken_link=True),
    sei.ToneMappingInfo(model_id=1, sigmoid_midpoint=100, sigmoid_width=42),
    sei.ToneMappingInfo(model_id=3, coded_pivot=[0, 128, 255],
                        target_pivot=[0, 64, 255]),
    sei.FramePacking(arrangement_type=4, content_interpretation=2),
    sei.ActiveParameterSets(vps_id=0, sps_ids=[0, 1]),
    sei.MasteringDisplay(),
    sei.ContentLightLevel(max_content=4000, max_pic_average=1000),
    sei.KneeFunctionInfo(points=((0, 100), (300, 600), (1023, 1023))),
    sei.RegionRefreshInfo(refreshed=False),
    sei.NoDisplay(),
    sei.TimeCode(clock_ts=((29, 59, 58, 23),), counting_type=4),
    sei.SegmRectFramePacking(content_interpretation=2, persistence=True),
    sei.TempMotionConstrainedTileSets(
        tile_sets=((0, ((0, 1),)), (1, ((2, 3), (4, 5))))),
    sei.TempMotionConstrainedTileSets(
        all_exact_match=False,
        tile_sets=((0, ((0, 1),), False), (1, ((2, 3),), True))),
    sei.TempMotionConstrainedTileSets(each_tile_one_set=True,
                                      tile_sets=()),
]


def test_scalable_nesting_roundtrip():
    """Nested sei_message() framing survives a write/parse cycle."""
    nested = [sei.RecoveryPoint(recovery_poc_cnt=4),
              sei.ContentLightLevel()]
    msg = sei.ScalableNesting(messages=nested)
    out = sei.parse_sei_rbsp(sei.write_sei_rbsp([msg]))
    assert len(out) == 1
    assert out[0].all_layers and out[0].messages == nested


@pytest.mark.parametrize("msg", MESSAGES, ids=lambda m: type(m).__name__)
def test_sei_roundtrip_single(msg):
    rbsp = sei.write_sei_rbsp([msg])
    out = sei.parse_sei_rbsp(rbsp)
    assert len(out) == 1
    assert out[0] == msg


def test_sei_roundtrip_multi_message():
    out = sei.parse_sei_rbsp(sei.write_sei_rbsp(MESSAGES))
    assert out == MESSAGES


def test_sei_unknown_type_preserved():
    # hand-build an SEI with an unregistered payload type 200
    rbsp = bytes([200, 3, 1, 2, 3]) + b"\x80"
    out = sei.parse_sei_rbsp(rbsp)
    assert out == [(200, b"\x01\x02\x03")]


def test_sei_large_user_data_ff_escape():
    msg = sei.UserDataUnregistered(uuid=b"\xaa" * 16, data=b"x" * 600)
    out = sei.parse_sei_rbsp(sei.write_sei_rbsp([msg]))
    assert out == [msg]


@pytest.mark.skipif(not os.path.exists(HM_DECODER),
                    reason="HM reference decoder not built")
def test_sei_stream_stays_hm_conformant(tmp_path):
    """Injecting our prefix-SEI NALs into a conformant stream must not
    break HM decoding (hash SEI still verifies OK)."""
    from video_codecs_tpu.entropy import bitstream as bs
    w, h = 64, 48
    cfg = headers.HevcConfig(width=w, height=h, qp=32)
    enc = intra_codec.IntraEncoder(cfg)
    rng = np.random.default_rng(3)
    frames = [tuple(rng.integers(0, 256, s, np.uint8).astype(np.uint8)
                    for s in ((h, w), (h // 2, w // 2), (h // 2, w // 2)))]
    stream, recons = enc.encode_sequence(frames)

    extra = sei.sei_nal([sei.RecoveryPoint(0),
                         sei.MasteringDisplay(),
                         sei.UserDataUnregistered(bytes(16), b"vct")])
    # insert the SEI NAL right before the first slice NAL
    nals = bs.split_annexb(stream)
    out = b""
    inserted = False
    for nal in nals:
        t = (nal[0] >> 1) & 0x3F
        if not inserted and t in (bs.NAL_IDR_W_RADL, bs.NAL_IDR_N_LP):
            out += b"\x00\x00\x00\x01" + extra
            inserted = True
        out += b"\x00\x00\x00\x01" + nal
    assert inserted
    p = tmp_path / "sei.bin"
    p.write_bytes(out)
    r = subprocess.run([HM_DECODER, "-b", str(p),
                        "-o", str(tmp_path / "r.yuv")],
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "OK" in r.stdout and "ERROR" not in r.stdout, r.stdout


def test_nested_type_128_not_treated_as_stop_byte():
    """A nested SEI message with payloadType 128 (SOP description, one
    0x80 framing byte) must parse, not terminate the message walk."""
    nested = (bytes([128, 2, 0xAB, 0xCD]) +      # type 128, size 2
              bytes([147, 1, 0x55]))             # type 147, size 1
    out = sei._parse_messages(nested)
    assert out == [(128, b"\xab\xcd"), (147, b"\x55")]
    # top-level: trailing 0x80 stop byte still terminates the walk
    top = bytes([147, 1, 0x55]) + b"\x80"
    assert sei._parse_messages(top, top_level=True) == [(147, b"\x55")]


def test_timecode_parse_is_rewritable():
    """Sets with clock_time_stamp_flag=0 are skipped so that a parsed
    TimeCode always re-serializes."""
    from video_codecs_tpu.entropy.bitstream import BitReader, BitWriter
    w = BitWriter()
    w.write(2, 2)         # num_clock_ts = 2
    w.flag(0)             # first set absent
    # second set present, full timestamp
    w.flag(1)
    w.flag(0)
    w.write(4, 5)         # counting_type
    w.flag(1)             # full_timestamp_flag
    w.flag(0)
    w.flag(0)
    w.write(29, 9)
    w.write(59, 6)
    w.write(58, 6)
    w.write(23, 5)
    w.write(0, 5)
    while not w.byte_aligned():
        w.flag(0)
    msg = sei.TimeCode.parse(BitReader(w.data()))
    assert msg.clock_ts == ((29, 59, 58, 23),)
    w2 = BitWriter()
    msg.write(w2)         # must not raise
