"""H.264 lost-picture concealment: frame copy and motion copy.

Parity: jm18.5/ldecod ConcealMode / erc_do_p.c (frame copy, MV copy);
frame_num gap detection stands in for the reference's lost-NAL
detection in read_new_slice."""

import numpy as np

from video_codecs_tpu.models.h264.inter_codec import H264Decoder, H264Encoder
from video_codecs_tpu.utils import yuv


def translating_frames(n=6, w=64, h=48, seed=3):
    rng = np.random.default_rng(seed)
    by = rng.integers(0, 256, (h + 32, w + 32)).astype(np.uint8)
    bu = rng.integers(0, 256, (h // 2 + 16, w // 2 + 16)).astype(np.uint8)
    bv = rng.integers(0, 256, (h // 2 + 16, w // 2 + 16)).astype(np.uint8)
    out = []
    for t in range(n):
        dx, dy = t * 4, t * 2
        out.append((by[dy:dy + h, dx:dx + w],
                    bu[dy // 2:dy // 2 + h // 2, dx // 2:dx // 2 + w // 2],
                    bv[dy // 2:dy // 2 + h // 2, dx // 2:dx // 2 + w // 2]))
    return out


def _drop_nth_slice(stream: bytes, n: int) -> bytes:
    from video_codecs_tpu.entropy.bitstream import split_annexb
    out, seen = [], 0
    for nal in split_annexb(stream):
        if (nal[0] & 0x1F) in (1, 5):
            seen += 1
            if seen == n:
                continue
        out.append(b"\x00\x00\x00\x01" + _reinsert_ep(nal))
    return b"".join(out)


def _reinsert_ep(nal: bytes) -> bytes:
    # split_annexb returns raw NAL bytes (still EBSP) — passthrough
    return nal


def test_conceal_fills_lost_frame():
    frames = translating_frames()
    stream, recons = H264Encoder(64, 48, qp=30).encode_sequence(frames)
    lossy = _drop_nth_slice(stream, 4)       # lose the 3rd P picture

    fc = H264Decoder(conceal=1)
    out_fc = fc.decode(lossy)
    assert len(out_fc) == len(frames)
    assert fc.concealed == [3]

    mc = H264Decoder(conceal=2)
    out_mc = mc.decode(lossy)
    assert len(out_mc) == len(frames)
    assert mc.concealed == [3]

    orig = np.stack([f[0] for f in frames])
    p_fc = yuv.psnr(np.stack([o[0] for o in out_fc]), orig)
    p_mc = yuv.psnr(np.stack([o[0] for o in out_mc]), orig)
    # constant global translation: reusing the previous MV field must
    # beat freezing the previous picture
    assert p_mc > p_fc + 1.0, (p_mc, p_fc)
    assert p_mc > 15, p_mc


def test_conceal_noop_on_clean_stream():
    frames = translating_frames(n=4)
    stream, recons = H264Encoder(64, 48, qp=30,
                                 entropy="cabac").encode_sequence(frames)
    dec = H264Decoder(conceal=2)
    out = dec.decode(stream)
    assert dec.concealed == []
    for i in range(len(frames)):
        for j in range(3):
            np.testing.assert_array_equal(out[i][j], recons[i][j])
