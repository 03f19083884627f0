"""Per-syntax-class coding statistics (decoder-analyser parity).

Parity: HM TComCodingStatistics.h:198 / TAppDecoderAnalyser build and
JM dec_statistics.c — bins+bits accounted per syntax class."""

import numpy as np

from video_codecs_tpu.models.h264.inter_codec import H264Decoder, H264Encoder
from video_codecs_tpu.utils import coding_stats


def _frames(n=2, w=64, h=48, seed=5):
    rng = np.random.default_rng(seed)
    by = rng.integers(0, 256, (h + 8, w + 8)).astype(np.uint8)
    bu = rng.integers(0, 256, (h // 2 + 4, w // 2 + 4)).astype(np.uint8)
    return [(by[t:t + h, t:t + w],
             bu[t // 2:t // 2 + h // 2, t // 2:t // 2 + w // 2],
             bu[t // 2:t // 2 + h // 2, t // 2:t // 2 + w // 2])
            for t in range(n)]


def test_decoder_stats_account_bins_and_bits():
    frames = _frames()
    stream, recons = H264Encoder(64, 48, qp=30,
                                 entropy="cabac").encode_sequence(frames)
    coding_stats.start()
    out = H264Decoder().decode(stream)
    st = coding_stats.stop()
    assert not coding_stats.active()
    for i in range(len(frames)):
        for j in range(3):
            np.testing.assert_array_equal(out[i][j], recons[i][j])

    rows = st.rows
    assert rows["residual_block"]["bins"] > rows["mb_qp_delta"]["bins"]
    assert rows["residual_block"]["bypass"] > 0
    total_bins = sum(r["bins"] for r in rows.values())
    total_bits = sum(r["bits"] for r in rows.values())
    # CABAC compresses: coded bits < bins; and the accounted bits must
    # be the bulk of the slice payloads
    assert 0 < total_bits < total_bins
    slice_payload_bits = 8 * sum(
        len(n) for n in stream.split(b"\x00\x00\x00\x01")
        if n and (n[0] & 0x1F) in (1, 5))
    assert total_bits > slice_payload_bits * 0.7
    rep = st.report()
    assert "residual_block" in rep and "TOTAL" in rep


def test_encoder_stats_side():
    frames = _frames(n=1)
    coding_stats.start()
    H264Encoder(64, 48, qp=30, entropy="cabac").encode_sequence(frames)
    st = coding_stats.stop()
    assert st.rows["mb_type_i"]["count"] == (64 // 16) * (48 // 16)
    assert st.rows["residual_block"]["bits"] > 0


def test_stats_inactive_is_noop():
    frames = _frames(n=1)
    H264Encoder(64, 48, qp=30, entropy="cabac").encode_sequence(frames)
    assert coding_stats.stop().rows == {}


def test_hevc_decoder_analyser_stats(capsys):
    """--stats on an HEVC stream prints the per-syntax-class bin table
    (TAppDecoderAnalyser / TComCodingStatistics.h:198 parity for HEVC;
    round 1 covered only the H.264 engines)."""
    import numpy as np

    from video_codecs_tpu.models.hevc import headers, inter_codec
    from video_codecs_tpu.utils import coding_stats

    rng = np.random.default_rng(2)
    w, h = 64, 48
    frames = []
    base = rng.integers(0, 256, (h, w), np.uint8)
    for i in range(3):
        frames.append((np.roll(base, i, axis=1),
                       rng.integers(0, 256, (h // 2, w // 2), np.uint8),
                       rng.integers(0, 256, (h // 2, w // 2), np.uint8)))
    cfg = headers.HevcConfig(width=w, height=h, qp=32, num_refs=2,
                             merge_cands=5)
    enc = inter_codec.LowDelayEncoder(cfg, search_range=8)
    stream, _ = enc.encode_sequence_ldp(frames)

    coding_stats.start()
    dec = inter_codec.LowDelayDecoder()
    dec.decode(stream)
    report = coding_stats.stop().report()
    assert "sig_flag" in report and "merge_flag" in report
    assert "TOTAL" in report
    # hooks must be fully removed after stop()
    from video_codecs_tpu.entropy import cabac
    assert "decode_bin" in cabac.CabacDecoder.__dict__
