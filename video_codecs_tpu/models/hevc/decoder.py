"""General HEVC Main-profile intra decoder — decodes HM-encoder streams.

Unlike the build-specific decoders (intra_codec/quadtree_codec), this
module accepts any conformant all-intra Main stream within the toolset HM
emits for its common-test-condition intra configs: CTU 16/32/64 with any
CU quadtree, PART_NxN, the full RQT (QuadtreeTULog2Min/MaxSize +
MaxDepthIntra, spec 7.3.8.8), all 35 luma + 5 chroma modes, transform
skip, sign data hiding, strong intra smoothing, SAO, deblocking, and
decoded-picture-hash verification.

Parity references: hm-16.5rc1/source/Lib/TLibDecoder/TDecCAVLC.cpp
(parameter-set and slice-header parsing), TDecEntropy.cpp:372
xDecodeTransform (RQT recursion and cbf inheritance), TDecSbac.cpp:699
parseIntraDirChroma, TDecCu.cpp:653 xReconIntraQT (per-TU recon order),
TComPattern.cpp:209 (strong intra smoothing), TComTrQuant.cpp
xITransformSkip, TComLoopFilter.cpp (BS-2 on intra CU/TU 8-grid edges),
TComSampleAdaptiveOffset.cpp.
"""

from __future__ import annotations

import dataclasses
import hashlib

import numpy as np

from video_codecs_tpu.entropy import bitstream as bs
from video_codecs_tpu.entropy import cabac, ctx, residual
from video_codecs_tpu.models.hevc import intra_codec as ic
from video_codecs_tpu.models.hevc.quadtree_codec import build_ref_z, z_index
from video_codecs_tpu.ops import deblock as deblock_ops
from video_codecs_tpu.ops import intra as intra_ops
from video_codecs_tpu.ops import quant as quant_ops
from video_codecs_tpu.ops import sao as sao_ops
from video_codecs_tpu.ops import transform as tr_ops
from video_codecs_tpu.utils import rom

DC = 1
DM_CHROMA = 36  # sentinel: derive from luma


# ---------------------------------------------------------------------------
# Parameter sets (general parse; spec 7.3.2.2-7.3.2.3, TDecCAVLC.cpp)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class Sps:
    width: int = 0
    height: int = 0
    bit_depth: int = 8
    log2_ctb: int = 6
    log2_min_cb: int = 3
    log2_min_tb: int = 2
    log2_max_tb: int = 5
    max_tr_depth_intra: int = 1
    max_tr_depth_inter: int = 1
    sao: bool = False
    amp: bool = False
    pcm: bool = False
    temporal_mvp: bool = False
    strong_intra_smoothing: bool = False
    log2_max_poc_lsb: int = 8
    conf_win: tuple = (0, 0, 0, 0)
    rps_list: list = dataclasses.field(default_factory=list)


@dataclasses.dataclass
class StRps:
    """Short-term RPS: lists of (delta_poc, used_by_curr) with S0
    (negative, decreasing) and S1 (positive, increasing) ordering."""
    neg: list = dataclasses.field(default_factory=list)
    pos: list = dataclasses.field(default_factory=list)

    @property
    def num_delta_pocs(self):
        return len(self.neg) + len(self.pos)


def parse_st_rps(r: bs.BitReader, idx: int, prev: list,
                 slice_header: bool = False) -> StRps:
    """st_ref_pic_set(idx) (spec 7.3.7 + 7.4.8 derivation)."""
    out = StRps()
    pred = bool(r.flag()) if idx > 0 else False
    if pred:
        delta_idx = (r.ue() + 1) if slice_header else 1
        ref = prev[idx - delta_idx]
        sign = r.flag()
        abs_delta = r.ue() + 1
        delta_rps = (1 - 2 * sign) * abs_delta
        flags = []
        for _ in range(ref.num_delta_pocs + 1):
            used = bool(r.flag())
            use_delta = True if used else bool(r.flag())
            flags.append((used, use_delta))
        # derivation (spec 7.4.8): S0 from ref S1 desc, deltaRps, ref S0 asc
        ref_neg = [d for d, _ in ref.neg]
        ref_pos = [d for d, _ in ref.pos]
        n_neg = len(ref_neg)
        for j in range(len(ref_pos) - 1, -1, -1):
            d = ref_pos[j] + delta_rps
            if d < 0 and flags[n_neg + j][1]:
                out.neg.append((d, flags[n_neg + j][0]))
        if delta_rps < 0 and flags[ref.num_delta_pocs][1]:
            out.neg.append((delta_rps, flags[ref.num_delta_pocs][0]))
        for j in range(n_neg):
            d = ref_neg[j] + delta_rps
            if d < 0 and flags[j][1]:
                out.neg.append((d, flags[j][0]))
        out.neg.sort(key=lambda t: -t[0])
        for j in range(n_neg - 1, -1, -1):
            d = ref_neg[j] + delta_rps
            if d > 0 and flags[j][1]:
                out.pos.append((d, flags[j][0]))
        if delta_rps > 0 and flags[ref.num_delta_pocs][1]:
            out.pos.append((delta_rps, flags[ref.num_delta_pocs][0]))
        for j in range(len(ref_pos)):
            d = ref_pos[j] + delta_rps
            if d > 0 and flags[n_neg + j][1]:
                out.pos.append((d, flags[n_neg + j][0]))
        out.pos.sort(key=lambda t: t[0])
        return out
    n_neg = r.ue()
    n_pos = r.ue()
    poc = 0
    for _ in range(n_neg):
        poc -= r.ue() + 1
        out.neg.append((poc, bool(r.flag())))
    poc = 0
    for _ in range(n_pos):
        poc += r.ue() + 1
        out.pos.append((poc, bool(r.flag())))
    return out


@dataclasses.dataclass
class Pps:
    init_qp: int = 26
    constrained_intra: bool = False
    transform_skip: bool = False
    cu_qp_delta: bool = False
    diff_cu_qp_delta_depth: int = 0
    cb_qp_offset: int = 0
    cr_qp_offset: int = 0
    slice_chroma_qp_offsets: bool = False
    weighted_pred: bool = False
    weighted_bipred: bool = False
    transquant_bypass: bool = False
    tiles: bool = False
    entropy_sync: bool = False
    loop_filter_across_slices: bool = True
    deblocking_control: bool = False
    deblocking_override_enabled: bool = False
    deblocking_disabled: bool = False
    beta_offset_div2: int = 0
    tc_offset_div2: int = 0
    sign_data_hiding: bool = False
    cabac_init_present: bool = False
    num_ref_l0_default: int = 1
    num_ref_l1_default: int = 1
    lists_modification: bool = False
    log2_parallel_merge_level: int = 2


def _skip_profile_tier_level(r: bs.BitReader, max_sub_layers: int) -> None:
    r.read(2 + 1 + 5)
    r.read(32)
    r.read(4)       # progressive/interlaced/non-packed/frame-only
    r.read(32)      # reserved 43 bits + ...
    r.read(11)
    r.read(1)
    r.read(8)       # level idc
    flags = [(r.flag(), r.flag()) for _ in range(max_sub_layers)]
    if max_sub_layers > 0:
        for _ in range(8 - max_sub_layers):
            r.read(2)
    for prof, lev in flags:
        if prof:
            r.read(32)
            r.read(32)
            r.read(24)
        if lev:
            r.read(8)


def parse_sps(rbsp: bytes) -> Sps:
    r = bs.BitReader(rbsp)
    r.read(4)                   # sps_video_parameter_set_id
    max_sub_layers = r.read(3)
    r.flag()                    # temporal_id_nesting
    _skip_profile_tier_level(r, max_sub_layers)
    r.ue()                      # sps_seq_parameter_set_id
    chroma = r.ue()
    assert chroma == 1, "only 4:2:0 supported"
    s = Sps()
    s.width = r.ue()
    s.height = r.ue()
    if r.flag():                # conformance_window_flag
        s.conf_win = (r.ue(), r.ue(), r.ue(), r.ue())
    s.bit_depth = 8 + r.ue()
    assert 8 + r.ue() == s.bit_depth, "chroma bit depth must match"
    assert s.bit_depth == 8, "Main profile 8-bit only (Main10: roadmap)"
    s.log2_max_poc_lsb = 4 + r.ue()
    sub_layer_ordering = r.flag()
    for _ in range((max_sub_layers + 1) if sub_layer_ordering else 1):
        r.ue(), r.ue(), r.ue()  # dpb size / reorder / latency
    s.log2_min_cb = 3 + r.ue()
    s.log2_ctb = s.log2_min_cb + r.ue()
    s.log2_min_tb = 2 + r.ue()
    s.log2_max_tb = s.log2_min_tb + r.ue()
    s.max_tr_depth_inter = r.ue()
    s.max_tr_depth_intra = r.ue()
    assert not r.flag(), "scaling lists not supported"
    s.amp = bool(r.flag())
    s.sao = bool(r.flag())
    s.pcm = bool(r.flag())
    assert not s.pcm, "PCM not supported"
    s.rps_list = []
    num_rps = r.ue()
    for i in range(num_rps):
        s.rps_list.append(parse_st_rps(r, i, s.rps_list))
    if r.flag():                # long_term_ref_pics_present
        for _ in range(r.ue()):
            r.read(s.log2_max_poc_lsb), r.flag()
    s.temporal_mvp = bool(r.flag())
    s.strong_intra_smoothing = bool(r.flag())
    if r.flag():                # vui_parameters_present
        pass                    # ignored (display metadata only)
    # sps_extension flags ignored
    return s


def parse_pps(rbsp: bytes) -> Pps:
    r = bs.BitReader(rbsp)
    p = Pps()
    r.ue(), r.ue()              # pps id, sps id
    assert not r.flag(), "dependent slice segments not supported"
    r.flag()                    # output_flag_present
    r.read(3)                   # num_extra_slice_header_bits
    p.sign_data_hiding = bool(r.flag())
    p.cabac_init_present = bool(r.flag())
    p.num_ref_l0_default = 1 + r.ue()
    p.num_ref_l1_default = 1 + r.ue()
    p.init_qp = 26 + r.se()
    p.constrained_intra = bool(r.flag())
    assert not p.constrained_intra, "constrained intra not supported"
    p.transform_skip = bool(r.flag())
    p.cu_qp_delta = bool(r.flag())
    if p.cu_qp_delta:
        p.diff_cu_qp_delta_depth = r.ue()
    p.cb_qp_offset = r.se()
    p.cr_qp_offset = r.se()
    p.slice_chroma_qp_offsets = bool(r.flag())
    p.weighted_pred = bool(r.flag())
    p.weighted_bipred = bool(r.flag())
    p.transquant_bypass = bool(r.flag())
    assert not p.transquant_bypass, "transquant bypass not supported"
    p.tiles = bool(r.flag())
    p.entropy_sync = bool(r.flag())
    assert not p.tiles and not p.entropy_sync, \
        "tiles/WPP parse for foreign streams: later round"
    p.loop_filter_across_slices = bool(r.flag())
    p.deblocking_control = bool(r.flag())
    if p.deblocking_control:
        p.deblocking_override_enabled = bool(r.flag())
        p.deblocking_disabled = bool(r.flag())
        if not p.deblocking_disabled:
            p.beta_offset_div2 = r.se()
            p.tc_offset_div2 = r.se()
    assert not r.flag(), "pps scaling lists not supported"
    p.lists_modification = bool(r.flag())
    p.log2_parallel_merge_level = 2 + r.ue()
    r.flag()                    # slice_segment_header_extension_present
    return p


@dataclasses.dataclass
class SliceHeader:
    slice_type: int = 2         # 2 = I
    sao_luma: bool = False
    sao_chroma: bool = False
    qp: int = 26
    deblocking_disabled: bool = False
    beta_offset_div2: int = 0
    tc_offset_div2: int = 0
    data_offset_bits: int = 0


def parse_slice_header(rbsp: bytes, nal_type: int, sps: Sps,
                       pps: Pps) -> SliceHeader:
    r = bs.BitReader(rbsp)
    h = SliceHeader()
    first = r.flag()
    assert first, "multi-slice pictures not supported yet"
    if 16 <= nal_type <= 23:    # IRAP
        r.flag()                # no_output_of_prior_pics
    r.ue()                      # slice_pic_parameter_set_id
    h.slice_type = r.ue()
    assert h.slice_type == 2, "this decoder handles I slices"
    if nal_type not in (bs.NAL_IDR_W_RADL, bs.NAL_IDR_N_LP):
        r.read(sps.log2_max_poc_lsb)      # poc lsb
        if r.flag():                      # short_term_ref_pic_set_sps_flag
            n = len(sps.rps_list)
            if n > 1:
                r.read(max(1, (n - 1).bit_length()))   # rps idx
        else:
            parse_st_rps(r, len(sps.rps_list), sps.rps_list,
                         slice_header=True)
        if sps.temporal_mvp:
            r.flag()
    if sps.sao:
        h.sao_luma = bool(r.flag())
        h.sao_chroma = bool(r.flag())
    h.qp = pps.init_qp + r.se()
    if pps.slice_chroma_qp_offsets:
        r.se(), r.se()
    h.deblocking_disabled = pps.deblocking_disabled
    h.beta_offset_div2 = pps.beta_offset_div2
    h.tc_offset_div2 = pps.tc_offset_div2
    if pps.deblocking_control and pps.deblocking_override_enabled:
        if r.flag():            # deblocking_filter_override_flag
            h.deblocking_disabled = bool(r.flag())
            if not h.deblocking_disabled:
                h.beta_offset_div2 = r.se()
                h.tc_offset_div2 = r.se()
    if pps.loop_filter_across_slices and (h.sao_luma or h.sao_chroma or
                                          not h.deblocking_disabled):
        r.flag()                # slice_loop_filter_across_slices
    # byte_alignment(): alignment_bit_equal_to_one is ALWAYS present, even
    # when the header already ends on a byte boundary (spec 7.3.2.10)
    one = r.flag()
    assert one == 1, "alignment_bit_equal_to_one"
    r.byte_align()
    h.data_offset_bits = r.bit_pos()
    return h


# ---------------------------------------------------------------------------
# Strong intra smoothing + filtered-reference selection
# ---------------------------------------------------------------------------

def filtered_ref(ref: np.ndarray, n: int, strong: bool,
                 bit_depth: int = 8) -> np.ndarray:
    """1-2-1 smoothed reference; bilinear when strong smoothing applies
    (TComPattern.cpp:209-292; 32x32 luma only)."""
    ref = ref.astype(np.int64)
    if strong and n == 32:
        thr = 1 << (bit_depth - 5)
        bl, tl, tr = ref[0], ref[2 * n], ref[4 * n]
        if (abs(bl + tl - 2 * ref[n]) < thr and
                abs(tl + tr - 2 * ref[3 * n]) < thr):
            out = ref.copy()
            shift = n.bit_length() + 1   # log2(2n) + 1? no: log2(2n)=6 for 32
            shift = (2 * n).bit_length() - 1
            for k in range(1, 2 * n):
                out[k] = ((2 * n - k) * bl + k * tl + n) >> shift
                out[2 * n + k] = ((2 * n - k) * tl + k * tr + n) >> shift
            return out
    mid = (ref[:-2] + 2 * ref[1:-1] + ref[2:] + 2) >> 2
    return np.concatenate([ref[:1], mid, ref[-1:]])


def predict_intra_general(ref: np.ndarray, mode: int, log2: int,
                          is_luma: bool, strong: bool) -> np.ndarray:
    """predict_intra_np with HM's strong-intra-smoothing reference."""
    n = 1 << log2
    if not (is_luma and strong and n == 32 and
            intra_ops.filter_flag(mode, log2, is_luma)):
        return intra_ops.predict_intra_np(ref, mode, log2, is_luma=is_luma)
    # Rebuild a raw ref whose internal 1-2-1 smoothing we bypass by calling
    # the weight machinery directly with the strong-filtered array.
    w, bias, s_common = intra_ops._mode_weights(log2, is_luma)
    fref = filtered_ref(ref, n, True)
    ref2 = np.concatenate([ref.astype(np.int64), fref])
    pred = ((w[mode].astype(np.int64) @ ref2 + int(bias[mode])) >> s_common)
    return np.clip(pred.reshape(n, n), 0, 255).astype(np.int32)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

CHROMA_CANDS = (0, 26, 10, 1)   # planar, ver, hor, DC; DM coded separately


class GeneralIntraDecoder:
    """Decodes conformant all-intra HEVC Main streams (incl. HM output)."""

    def __init__(self) -> None:
        self.sps: Sps | None = None
        self.pps: Pps | None = None
        self.hash_status: list[bool] = []
        self.frames: list = []

    def decode(self, stream: bytes):
        self.frames = []
        for nal in bs.split_annexb(stream):
            nal_type = (nal[0] >> 1) & 0x3F
            rbsp = bs.strip_emulation_prevention(nal[2:])
            if nal_type == bs.NAL_SPS:
                self.sps = parse_sps(rbsp)
            elif nal_type == bs.NAL_PPS:
                self.pps = parse_pps(rbsp)
            elif nal_type <= 21:    # coded slice (TRAIL..CRA); I only here
                self.frames.append(self._decode_picture(rbsp, nal_type))
            elif nal_type in (bs.NAL_PREFIX_SEI, bs.NAL_SUFFIX_SEI):
                self._check_hash(rbsp)
        return self.frames

    def _check_hash(self, rbsp: bytes) -> None:
        r = bs.BitReader(rbsp)
        ptype = r.read(8)
        psize = r.read(8)
        if ptype != 132 or psize != 49:
            return
        if r.read(8) != 0:      # hash type MD5
            return
        md5s = [bytes(r.read(8) for _ in range(16)) for _ in range(3)]
        if not self.frames:
            return
        f = self.frames[-1]
        ok = all(hashlib.md5(f[i].astype(np.uint8).tobytes()).digest()
                 == md5s[i] for i in range(3))
        self.hash_status.append(ok)

    # ---- picture decode ----

    def _decode_picture(self, rbsp: bytes, nal_type: int):
        sps, pps = self.sps, self.pps
        h = parse_slice_header(rbsp, nal_type, sps, pps)
        w, hgt = sps.width, sps.height
        ctb = 1 << sps.log2_ctb
        cw = (w + ctb - 1) // ctb
        ch = (hgt + ctb - 1) // ctb

        dec = cabac.CabacDecoder(
            bs.BitReader(rbsp[h.data_offset_bits // 8:]),
            ctx.init_states(ctx.I, h.qp))
        st = _PicState(sps, pps, h)
        sao_params = [[sao_ops.SaoParam()] * 3 for _ in range(cw * ch)]

        i = 0
        for cy in range(0, hgt, ctb):
            for cx in range(0, w, ctb):
                if h.sao_luma or h.sao_chroma:
                    self._decode_sao(dec, sao_params, i, cx // ctb,
                                     cy // ctb, cw, h)
                self._decode_cqt(dec, st, cx, cy, sps.log2_ctb, 0)
                i += 1
                end = dec.decode_terminate()
                assert end == (1 if i == cw * ch else 0), \
                    f"end_of_slice mismatch at CTU {i}"

        rec_y, rec_u, rec_v = st.rec_y, st.rec_u, st.rec_v
        if not h.deblocking_disabled:
            bs_ver, bs_hor = st.bs_maps()
            rec_y, rec_u, rec_v = deblock_ops.deblock_420_bs_np(
                rec_y, rec_u, rec_v, h.qp, bs_ver, bs_hor, block=8)
        if h.sao_luma or h.sao_chroma:
            outs = [rec_y.copy(), rec_u.copy(), rec_v.copy()]
            for i in range(cw * ch):
                bx, by = i % cw, i // cw
                p3 = sao_params[i]
                if h.sao_luma:
                    sao_ops.apply_ctu(rec_y, outs[0], bx * ctb, by * ctb,
                                      ctb, p3[0])
                if h.sao_chroma:
                    half = ctb // 2
                    sao_ops.apply_ctu(rec_u, outs[1], bx * half, by * half,
                                      half, p3[1])
                    sao_ops.apply_ctu(rec_v, outs[2], bx * half, by * half,
                                      half, p3[2])
            rec_y, rec_u, rec_v = outs
        return rec_y, rec_u, rec_v

    def _decode_sao(self, dec, params, i, bx, by, cw, h: SliceHeader):
        """sao() syntax (spec 7.3.8.3) with per-component slice enables."""
        if bx > 0 and dec.decode_bin(ctx.off("sao_merge")):
            params[i] = list(params[i - 1])
            return
        if by > 0 and dec.decode_bin(ctx.off("sao_merge")):
            params[i] = list(params[i - cw])
            return
        out = [sao_ops.SaoParam()] * 3
        for c in range(3):
            if c == 0 and not h.sao_luma:
                continue
            if c > 0 and not h.sao_chroma:
                continue
            if c < 2:
                if dec.decode_bin(ctx.off("sao_type")):
                    type_idx = (sao_ops.SAO_EO if dec.decode_bypass()
                                else sao_ops.SAO_BO)
                else:
                    type_idx = sao_ops.SAO_OFF
            else:
                type_idx = out[1].type_idx
            if type_idx == sao_ops.SAO_OFF:
                continue
            mags = []
            for _ in range(4):
                m = 0
                while m < 7 and dec.decode_bypass():
                    m += 1
                mags.append(m)
            if type_idx == sao_ops.SAO_BO:
                offs = []
                for k in range(4):
                    if mags[k]:
                        neg = dec.decode_bypass()
                        offs.append(-mags[k] if neg else mags[k])
                    else:
                        offs.append(0)
                pos = dec.decode_bypass_bins(5)
                out[c] = sao_ops.SaoParam(sao_ops.SAO_BO, 0, pos, tuple(offs))
            else:
                ec = (dec.decode_bypass_bins(2) if c < 2 else out[1].eo_class)
                out[c] = sao_ops.SaoParam(sao_ops.SAO_EO, ec, 0, tuple(mags))
        params[i] = out

    # ---- coding quadtree ----

    def _decode_cqt(self, dec, st, x, y, log2, depth):
        sps = self.sps
        size = 1 << log2
        if x + size <= sps.width and y + size <= sps.height:
            split = False
            if log2 > sps.log2_min_cb:
                sctx = st.split_ctx(x, y, depth)
                split = bool(dec.decode_bin(ctx.off("split_cu_flag", sctx)))
        else:
            split = True
        if split:
            half = size // 2
            for q in range(4):
                cx, cy = x + (q & 1) * half, y + (q >> 1) * half
                if cx >= sps.width or cy >= sps.height:
                    continue
                self._decode_cqt(dec, st, cx, cy, log2 - 1, depth + 1)
            return
        self._decode_cu(dec, st, x, y, log2, depth)

    def _decode_cu(self, dec, st, x, y, log2, depth):
        sps, pps = self.sps, self.pps
        size = 1 << log2
        nxn = False
        if log2 == sps.log2_min_cb:
            nxn = dec.decode_bin(ctx.off("part_size")) == 0
        # luma intra modes: all prev flags first, then all idx/rem
        pus = 4 if nxn else 1
        half = size // 2
        prev = [dec.decode_bin(ctx.off("prev_intra_luma_pred"))
                for _ in range(pus)]
        modes = []
        for p in range(pus):
            px = x + (p & 1) * (half if nxn else 0)
            py = y + (p >> 1) * (half if nxn else 0)
            mpm = st.mpm(px, py)
            if prev[p]:
                idx = 0 if dec.decode_bypass() == 0 else 1 + dec.decode_bypass()
                mode = mpm[idx]
            else:
                rem = dec.decode_bypass_bins(5)
                for c in sorted(mpm):
                    if rem >= c:
                        rem += 1
                mode = rem
            modes.append(mode)
            st.set_pu_mode(px, py, half if nxn else size, mode)
        # chroma mode (one per CU at 4:2:0)
        if dec.decode_bin(ctx.off("chroma_pred_mode")) == 0:
            chroma_mode = modes[0]          # DM
        else:
            idx = dec.decode_bypass_bins(2)
            chroma_mode = CHROMA_CANDS[idx]
            if chroma_mode == modes[0]:
                chroma_mode = 34
        st.set_cu(x, y, size, depth)

        # transform tree + recon
        cu = _CuCtx(x, y, log2, nxn, modes, chroma_mode)
        min_tu_log2 = self._min_tu_log2(log2, nxn)
        self._decode_tt(dec, st, cu, x, y, log2, 0, min_tu_log2, True, True)

    def _min_tu_log2(self, log2_cb, nxn):
        sps = self.sps
        max_depth = sps.max_tr_depth_intra + 1   # SPS codes depth-1
        intra_split = 1 if nxn else 0
        if log2_cb < sps.log2_min_tb + max_depth - 1 + intra_split:
            return sps.log2_min_tb
        out = log2_cb - (max_depth - 1 + intra_split)
        return min(out, sps.log2_max_tb)

    def _decode_tt(self, dec, st, cu, x, y, log2, trdepth, min_tu_log2,
                   parent_cbf_cb, parent_cbf_cr):
        """transform_tree (spec 7.3.8.8; TDecEntropy xDecodeTransform)."""
        sps, pps = self.sps, self.pps
        if cu.nxn and trdepth == 0:
            subdiv = True
        elif log2 > sps.log2_max_tb:
            subdiv = True
        elif log2 == sps.log2_min_tb or log2 == min_tu_log2:
            subdiv = False
        else:
            subdiv = bool(dec.decode_bin(ctx.off("trans_subdiv", 5 - log2)))

        cbf_cb, cbf_cr = parent_cbf_cb, parent_cbf_cr
        if log2 > 2:
            if trdepth == 0 or parent_cbf_cb:
                cbf_cb = bool(dec.decode_bin(ctx.off("cbf_chroma", trdepth)))
            else:
                cbf_cb = False
            if trdepth == 0 or parent_cbf_cr:
                cbf_cr = bool(dec.decode_bin(ctx.off("cbf_chroma", trdepth)))
            else:
                cbf_cr = False

        if subdiv:
            half = 1 << (log2 - 1)
            for q in range(4):
                self._decode_tt(dec, st, cu, x + (q & 1) * half,
                                y + (q >> 1) * half, log2 - 1, trdepth + 1,
                                min_tu_log2, cbf_cb, cbf_cr)
                if log2 - 1 == 2 and q == 3:
                    pass  # chroma coded with last child below
            return

        # leaf TU
        cbf_y = bool(dec.decode_bin(
            ctx.off("cbf_luma", 1 if trdepth == 0 else 0)))
        st.mark_tu(x, y, 1 << log2)
        self._decode_tu(dec, st, cu, x, y, log2, cbf_y, cbf_cb, cbf_cr)

    def _decode_tu(self, dec, st, cu, x, y, log2, cbf_y, cbf_cb, cbf_cr):
        """transform_unit: residuals + reconstruction, TU decode order."""
        sps, pps = self.sps, self.pps
        n = 1 << log2
        # luma
        mode = cu.mode_at(x, y)
        lv = None
        ts = False
        if cbf_y:
            if pps.transform_skip and log2 == 2:
                ts = bool(dec.decode_bin(ctx.off("transform_skip", 0)))
            stype = rom.intra_scan_type(log2, mode, True)
            lv = residual.decode_residual(dec, log2, stype, True,
                                          sign_hiding=pps.sign_data_hiding)
        ref = build_ref_z(st.rec_y, x, y, n, sps.width, sps.height,
                          sps.log2_ctb)
        pred = predict_intra_general(ref, mode, log2, True,
                                     sps.strong_intra_smoothing)
        st.rec_y[y:y + n, x:x + n] = _recon_tb(
            pred, lv, st.qp, log2, dst=(log2 == 2), ts=ts)

        # chroma: at this node when log2 > 2; when log2 == 2, with the
        # fourth 4x4 luma TU of the enclosing 8x8 area (spec 7.3.8.10)
        if log2 > 2:
            self._decode_tu_chroma(dec, st, cu, x, y, log2 - 1,
                                   cbf_cb, cbf_cr)
        elif (x & 7) and (y & 7):       # blkIdx == 3 of the 8x8 group
            self._decode_tu_chroma(dec, st, cu, x - 4, y - 4, 2,
                                   cbf_cb, cbf_cr)

    def _decode_tu_chroma(self, dec, st, cu, x, y, clog2, cbf_cb, cbf_cr):
        sps, pps = self.sps, self.pps
        cs = 1 << clog2
        cx, cy = x // 2, y // 2
        cmode = cu.chroma_mode
        stype = rom.intra_scan_type(clog2, cmode, False)
        for cbf, plane, qp_off in ((cbf_cb, st.rec_u, pps.cb_qp_offset),
                                   (cbf_cr, st.rec_v, pps.cr_qp_offset)):
            lv = None
            ts = False
            if cbf:
                if pps.transform_skip and clog2 == 2:
                    ts = bool(dec.decode_bin(ctx.off("transform_skip", 1)))
                lv = residual.decode_residual(
                    dec, clog2, stype, False,
                    sign_hiding=pps.sign_data_hiding)
            refc = build_ref_z(plane, cx, cy, cs, sps.width // 2,
                               sps.height // 2, sps.log2_ctb - 1)
            predc = intra_ops.predict_intra_np(refc, cmode, clog2,
                                               is_luma=False)
            qp_c = ic.chroma_qp(st.qp + qp_off)
            plane[cy:cy + cs, cx:cx + cs] = _recon_tb(
                predc, lv, qp_c, clog2, dst=False, ts=ts)


def _recon_tb(pred, lv, qp, log2, dst, ts=False):
    if lv is None:
        return pred.astype(np.int32)
    dq = quant_ops.dequantize_np(lv, qp, log2)
    if ts:
        shift = quant_ops.transform_shift(log2)
        r = (dq + (1 << (shift - 1))) >> shift
    else:
        r = tr_ops.inverse_transform_np(dq, log2, dst=dst)
    return np.clip(pred + r, 0, 255).astype(np.int32)


class _CuCtx:
    def __init__(self, x, y, log2, nxn, modes, chroma_mode):
        self.x, self.y, self.log2, self.nxn = x, y, log2, nxn
        self.modes = modes
        self.chroma_mode = chroma_mode

    def mode_at(self, x, y):
        if not self.nxn:
            return self.modes[0]
        half = 1 << (self.log2 - 1)
        p = (1 if (x - self.x) >= half else 0) + \
            (2 if (y - self.y) >= half else 0)
        return self.modes[p]


class _PicState:
    """Recon planes + neighbor grids + TU/CU id maps for deblocking."""

    def __init__(self, sps: Sps, pps: Pps, h: SliceHeader):
        w, hgt = sps.width, sps.height
        self.sps = sps
        self.qp = h.qp
        self.rec_y = np.zeros((hgt, w), np.int32)
        self.rec_u = np.zeros((hgt // 2, w // 2), np.int32)
        self.rec_v = np.zeros((hgt // 2, w // 2), np.int32)
        self.mode = np.full((hgt // 4, w // 4), DC, np.int32)
        self.intra = np.zeros((hgt // 4, w // 4), bool)
        self.depth = np.zeros((hgt // 8, w // 8), np.int32)
        self.cu_id = np.full((hgt // 8, w // 8), -1, np.int64)
        self.tu_id = np.full((hgt // 8, w // 8), -1, np.int64)
        self._serial = 0
        self._tu_serial = 0

    def mpm(self, x, y):
        sps = self.sps
        w, hgt = sps.width, sps.height
        cur = z_index(x, y, w, sps.log2_ctb)

        def mode_at(sx, sy, clamp_ctb):
            if sx < 0 or sy < 0 or sx >= w or sy >= hgt:
                return DC
            if clamp_ctb and (sy >> sps.log2_ctb) != (y >> sps.log2_ctb):
                return DC
            if z_index(sx, sy, w, sps.log2_ctb) >= cur:
                return DC
            if not self.intra[sy // 4, sx // 4]:
                return DC
            return int(self.mode[sy // 4, sx // 4])

        a = mode_at(x - 1, y, False)
        b = mode_at(x, y - 1, True)
        if a == b:
            if a < 2:
                return [0, 1, 26]
            return [a, 2 + ((a + 29) % 32), 2 + ((a - 2 + 1) % 32)]
        out = [a, b]
        for third in (0, 1, 26):
            if third not in out:
                out.append(third)
                break
        return out

    def split_ctx(self, x, y, depth):
        c = 0
        if x > 0 and self.depth[y // 8, (x - 1) // 8] > depth:
            c += 1
        if y > 0 and self.depth[(y - 1) // 8, x // 8] > depth:
            c += 1
        return c

    def set_pu_mode(self, x, y, size, mode):
        gx, gy, s4 = x // 4, y // 4, size // 4
        self.mode[gy:gy + s4, gx:gx + s4] = mode
        self.intra[gy:gy + s4, gx:gx + s4] = True

    def set_cu(self, x, y, size, depth):
        dx, dy = x // 8, y // 8
        s8 = max(size // 8, 1)
        self._serial += 1
        self.depth[dy:dy + s8, dx:dx + s8] = depth
        self.cu_id[dy:dy + s8, dx:dx + s8] = self._serial

    def mark_tu(self, x, y, size):
        dx, dy = x // 8, y // 8
        s8 = max(size // 8, 1)
        self._tu_serial += 1
        # 4x4 TUs share their 8x8 group's id (edges between them are off
        # the deblocking grid); the group id is set by its first TU
        if size == 4:
            if (x & 7) == 0 and (y & 7) == 0:
                self.tu_id[dy, dx] = self._tu_serial
            return
        self.tu_id[dy:dy + s8, dx:dx + s8] = self._tu_serial

    def bs_maps(self):
        """BS 2 on 8-grid edges at CU or TU boundaries (all-intra)."""
        ids = self.cu_id * 100003 + self.tu_id
        h8, w8 = ids.shape
        bs_ver = 2 * (ids[:, :-1] != ids[:, 1:]).astype(np.int32).T
        bs_hor = 2 * (ids[:-1, :] != ids[1:, :]).astype(np.int32)
        return bs_ver, bs_hor
