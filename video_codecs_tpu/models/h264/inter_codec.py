"""H.264 baseline IPPP codec: P slices with P_Skip / P_L0_16x16 / intra MBs.

Mirrors the JM encoder/decoder behavior (reference: jm18.5 lencod/ldecod —
mv prediction lcommon/src/mv_prediction.c GetMotionVectorPredictorNormal,
skip derivation ldecod/src/macroblock.c skip_macroblock, inter CBP me(v)
mapping lencod/src/vlc.c:31 NCBP[1][cbp][1], deblock strengths
ldecod/src/loop_filter_normal.c get_strength_*) without copying its
structure: whole-frame numpy passes for MC/transform/deblock, serial
only in the CAVLC bit writer.

Toolset: one reference frame (the deblocked previous picture), 16x16
partitions, quarter-pel ME with the 6-tap interpolator
(ops/h264_interp.py), CAVLC, in-loop deblocking with derived bS maps.
"""

from __future__ import annotations

import numpy as np

from video_codecs_tpu.entropy import cavlc
from video_codecs_tpu.entropy.bitstream import BitReader, BitWriter
from video_codecs_tpu.ops import h264_transform as ht
from video_codecs_tpu.ops.h264_deblock import deblock_frame, intra_bs_maps
from video_codecs_tpu.ops.h264_interp import mc_chroma_np, mc_luma_np
from video_codecs_tpu.models.h264.intra_codec import (
    _BLK_X, _BLK_Y, _decoded_before,
    H264IntraDecoder, H264IntraEncoder, NcGrid, annexb, nal_unit,
    parse_pps, parse_sps, pred_luma16, strip_emulation_prevention,
    write_pps, write_sps, NAL_SPS, NAL_PPS, NAL_SLICE_IDR)

# coded_block_pattern me(v) mapping for Inter MBs, 4:2:0
# (spec Table 9-4 codeNum column 2; jm18.5/lencod/src/vlc.c:31 NCBP[1][cbp][1])
_NCBP_INTER_420 = [
    0, 2, 3, 7, 4, 8, 17, 13, 5, 18, 9, 14, 10, 15, 16, 11,
    1, 32, 33, 36, 34, 37, 44, 40, 35, 45, 38, 41, 39, 42, 43, 19,
    6, 24, 25, 20, 26, 21, 46, 28, 27, 47, 22, 29, 23, 30, 31, 12,
]
_CBP_FROM_CODE_INTER_420 = [0] * 48
for _cbp, _code in enumerate(_NCBP_INTER_420):
    _CBP_FROM_CODE_INTER_420[_code] = _cbp


def _se_bits(v: int) -> int:
    v = int(v)
    idx = 2 * v - 1 if v > 0 else -2 * v
    return 2 * (idx + 1).bit_length() - 1


def median_mv_pred(mvg, refg, gx, gy, w4):
    """16x16 L0 MV predictor (spec 8.4.1.3): median of A/B/C with the
    only-A and single-matching-ref special cases. refg is -1 for intra
    or out-of-picture blocks (which predict mv 0)."""
    h4 = mvg.shape[0]

    def nb(bx, by, inside_only_row=False):
        if bx < 0 or by < 0 or bx >= w4 or by >= h4:
            return None                       # MB outside picture
        return (int(refg[by, bx]), int(mvg[by, bx, 0]), int(mvg[by, bx, 1]))

    A = nb(gx - 1, gy)
    B = nb(gx, gy - 1)
    C = nb(gx + 4, gy - 1)
    if C is None:
        C = nb(gx - 1, gy - 1)                # fall back to D
    if B is None and C is None and A is not None:
        return A[1], A[2]
    cands = [A, B, C]
    match = [c for c in cands if c is not None and c[0] == 0]
    if len(match) == 1:
        return match[0][1], match[0][2]
    xs = [c[1] if c is not None else 0 for c in cands]
    ys = [c[2] if c is not None else 0 for c in cands]
    med = lambda a: sorted(a)[1]
    return med(xs), med(ys)


def skip_mv(mvg, refg, gx, gy, w4):
    """P_Skip motion vector (spec 8.4.1.1)."""
    h4 = mvg.shape[0]
    if gx - 1 < 0 or gy - 1 < 0:
        return 0, 0
    a = (int(refg[gy, gx - 1]), int(mvg[gy, gx - 1, 0]),
         int(mvg[gy, gx - 1, 1]))
    b = (int(refg[gy - 1, gx]), int(mvg[gy - 1, gx, 0]),
         int(mvg[gy - 1, gx, 1]))
    if a == (0, 0, 0) or b == (0, 0, 0):
        return 0, 0
    return median_mv_pred(mvg, refg, gx, gy, w4)


def bs_maps_p(intra_mb, nz_y, mvg, refg):
    """Boundary-strength maps for a P frame at 4x4 granularity
    (spec 8.7.2.1 for frame coding, one reference)."""
    mbh, mbw = intra_mb.shape
    h4, w4 = mbh * 4, mbw * 4
    intra4 = np.repeat(np.repeat(intra_mb, 4, 0), 4, 1)
    nz = nz_y > 0
    bs_ver = np.zeros((h4, w4), np.int32)
    bs_hor = np.zeros((h4, w4), np.int32)
    for axis, bs in ((1, bs_ver), (0, bs_hor)):
        if axis == 1:
            pi, qi = (slice(None), slice(None, -1)), (slice(None), slice(1, None))
            tgt = bs[:, 1:]
            mb_edge = (np.arange(1, w4) % 4 == 0)[None, :]
        else:
            pi, qi = (slice(None, -1), slice(None)), (slice(1, None), slice(None))
            tgt = bs[1:, :]
            mb_edge = (np.arange(1, h4) % 4 == 0)[:, None]
        any_intra = intra4[pi] | intra4[qi]
        any_nz = nz[pi] | nz[qi]
        dmv = np.abs(mvg[pi] - mvg[qi]).max(axis=-1) >= 4
        dref = refg[pi] != refg[qi]
        tgt[...] = np.where(any_intra, np.where(mb_edge, 4, 3),
                            np.where(any_nz, 2,
                                     np.where(dmv | dref, 1, 0)))
    return bs_ver, bs_hor


def _code_residual_16(w, lv, nc_grid, gx, gy):
    coeffs = lv.reshape(16)[cavlc.ZIGZAG_4x4]
    total = cavlc.encode_block(w, [int(c) for c in coeffs],
                               nc_grid.nc(gx, gy), 16)
    nc_grid.set(gx, gy, total)


class H264Encoder(H264IntraEncoder):
    """IPPP: IDR then P frames, one (deblocked) reference."""

    def __init__(self, width: int, height: int, qp: int = 28,
                 search_range: int = 16, gop: int = 0) -> None:
        super().__init__(width, height, qp=qp, deblock=True)
        self.sr = search_range
        self.gop = gop                 # 0 = only first frame is IDR

    def encode_sequence(self, frames):
        nals = [nal_unit(NAL_SPS, write_sps(self.w // 16, self.h // 16)),
                nal_unit(NAL_PPS, write_pps())]
        recons = []
        ref = None
        frame_num = 0
        for idx, (y, u, v) in enumerate(frames):
            is_idr = ref is None or (self.gop and idx % self.gop == 0)
            if is_idr:
                rbsp, rec = self.encode_frame(y, u, v, idr_id=idx & 1)
                nals.append(nal_unit(NAL_SLICE_IDR, rbsp))
                frame_num = 1
            else:
                rbsp, rec = self._encode_p_frame(y, u, v, ref, frame_num)
                nals.append(nal_unit(1, rbsp, ref_idc=2))
                frame_num = (frame_num + 1) & 0xFF
            recons.append(rec)
            ref = rec
        return annexb(nals), recons

    # -- motion search -----------------------------------------------------
    def _search(self, orig, ref_y, x, y, pred_mv, lam):
        sr = self.sr
        px = min(max(pred_mv[0] >> 2, -sr), sr)
        py = min(max(pred_mv[1] >> 2, -sr), sr)
        # integer full search as one SAD surface over an edge-padded
        # window (padding == the spec's coordinate clamp)
        pad = 2 * sr + 2
        refp = np.pad(ref_y, pad, mode='edge')
        x0 = x + pad + px - sr
        y0 = y + pad + py - sr
        area = refp[y0:y0 + 2 * sr + 16, x0:x0 + 2 * sr + 16]
        win = np.lib.stride_tricks.sliding_window_view(area, (16, 16))
        sad = np.abs(win.astype(np.int32)
                     - orig[None, None]).sum((2, 3))        # (2sr+1, 2sr+1)
        dxs = (np.arange(-sr, sr + 1) + px) * 4
        bits_x = np.array([_se_bits(d - pred_mv[0]) for d in dxs])
        dys = (np.arange(-sr, sr + 1) + py) * 4
        bits_y = np.array([_se_bits(d - pred_mv[1]) for d in dys])
        cost = sad + np.round(lam * (bits_y[:, None] + bits_x[None, :]))
        iy_, ix_ = np.unravel_index(int(np.argmin(cost)), cost.shape)
        best = (int(cost[iy_, ix_]), int(dxs[ix_]), int(dys[iy_]))
        # half then quarter refinement
        for step in (2, 1):
            _, bx, by = best
            for dy in (-step, 0, step):
                for dx in (-step, 0, step):
                    if dx == 0 and dy == 0:
                        continue
                    mvx, mvy = bx + dx, by + dy
                    blk = mc_luma_np(ref_y, x, y, mvx, mvy, 16, 16)
                    cost = int(np.abs(orig - blk).sum()) + round(
                        lam * (_se_bits(mvx - pred_mv[0])
                               + _se_bits(mvy - pred_mv[1])))
                    if cost < best[0]:
                        best = (cost, mvx, mvy)
        return best

    # -- P frame -----------------------------------------------------------
    def _encode_p_frame(self, y, u, v, ref, frame_num):
        qp = self.qp
        qpc = int(ht.CHROMA_QP[min(max(qp, 0), 51)])
        mbw, mbh = self.w // 16, self.h // 16
        w4 = mbw * 4
        yv, uv, vv = (p.astype(np.int32) for p in (y, u, v))
        ref_y, ref_u, ref_v = ref
        rec_y = np.zeros_like(yv)
        rec_u = np.zeros_like(uv)
        rec_v = np.zeros_like(vv)
        nc_y = NcGrid(mbw * 4, mbh * 4)
        nc_u = NcGrid(mbw * 2, mbh * 2)
        nc_v = NcGrid(mbw * 2, mbh * 2)
        self._mode4 = np.full((mbh * 4, mbw * 4), 2, np.int32)
        self._is_i4 = np.zeros((mbh, mbw), bool)
        mvg = np.zeros((mbh * 4, mbw * 4, 2), np.int32)
        refg = np.full((mbh * 4, mbw * 4), -1, np.int32)
        intra_mb = np.zeros((mbh, mbw), bool)
        lam = 0.85 * 2.0 ** ((qp - 12) / 3.0)
        lam_me = lam ** 0.5
        zz = cavlc.ZIGZAG_4x4

        w = BitWriter()
        w.ue(0)                  # first_mb_in_slice
        w.ue(5)                  # slice_type = P (all slices)
        w.ue(0)                  # pps_id
        w.write(frame_num & 0xFF, 8)
        w.flag(0)                # num_ref_idx_active_override_flag
        w.flag(0)                # ref_pic_list_modification_flag_l0
        w.flag(0)                # adaptive_ref_pic_marking_mode_flag
        w.se(qp - 26)            # slice_qp_delta
        w.ue(0)                  # disable_deblocking_filter_idc
        w.se(0)                  # slice_alpha_c0_offset_div2
        w.se(0)                  # slice_beta_offset_div2

        skip_run = 0
        for mby in range(mbh):
            for mbx in range(mbw):
                x, yy = mbx * 16, mby * 16
                cx, cy = mbx * 8, mby * 8
                gx, gy = mbx * 4, mby * 4
                orig = yv[yy:yy + 16, x:x + 16]

                pmv = median_mv_pred(mvg, refg, gx, gy, w4)
                smv = skip_mv(mvg, refg, gx, gy, w4)
                cost, mvx, mvy = self._search(orig, ref_y, x, yy, pmv, lam_me)

                # crude intra/inter decision: best I_16x16 pred SAD
                isad = min(
                    int(np.abs(orig - pred_luma16(rec_y, x, yy, m)).sum())
                    for m in ([2] + ([0] if mby else [])
                              + ([1] if mbx else [])))
                if isad + round(lam_me * 8) < cost:
                    # intra MB inside the P slice
                    w.ue(skip_run)
                    skip_run = 0
                    self._encode_mb(w, yv, uv, vv, rec_y, rec_u, rec_v,
                                    nc_y, nc_u, nc_v, mbx, mby, qp, qpc,
                                    mb_type_offset=5)
                    intra_mb[mby, mbx] = True
                    # refg stays -1, mv stays 0
                    continue

                pred = mc_luma_np(ref_y, x, yy, mvx, mvy, 16, 16)
                pu = mc_chroma_np(ref_u, cx, cy, mvx, mvy, 8, 8)
                pv = mc_chroma_np(ref_v, cx, cy, mvx, mvy, 8, 8)

                res = orig - pred
                blk = res.reshape(4, 4, 4, 4).transpose(0, 2, 1, 3)
                lv = ht.quant_ac(ht.forward4x4(blk), qp)
                cbp_luma = 0
                for i8 in range(4):
                    ids = [4 * i8 + k for k in range(4)]
                    if any(lv[_BLK_Y[i], _BLK_X[i]].any() for i in ids):
                        cbp_luma |= 1 << i8

                c_dc_q, c_ac_q = [], []
                for comp, (co, cp) in enumerate(
                        ((uv[cy:cy + 8, cx:cx + 8], pu),
                         (vv[cy:cy + 8, cx:cx + 8], pv))):
                    cres = co - cp
                    cwt = ht.forward4x4(
                        cres.reshape(2, 4, 2, 4).transpose(0, 2, 1, 3))
                    cdc = cwt[:, :, 0, 0].copy()
                    c_dc_q.append(ht.quant_chroma_dc(ht.hadamard2x2(cdc), qpc))
                    acq = ht.quant_ac(cwt, qpc)
                    acq[:, :, 0, 0] = 0
                    c_ac_q.append(acq)
                cbp_chroma = 2 if any(q.any() for q in c_ac_q) else (
                    1 if any(q.any() for q in c_dc_q) else 0)
                cbp = cbp_luma | (cbp_chroma << 4)

                mvg[gy:gy + 4, gx:gx + 4] = (mvx, mvy)
                refg[gy:gy + 4, gx:gx + 4] = 0

                if cbp == 0 and (mvx, mvy) == smv:
                    # P_Skip: recon is the prediction, nothing coded
                    skip_run += 1
                    rec_y[yy:yy + 16, x:x + 16] = pred
                    rec_u[cy:cy + 8, cx:cx + 8] = pu
                    rec_v[cy:cy + 8, cx:cx + 8] = pv
                    for bx4 in range(4):
                        for by4 in range(4):
                            nc_y.set(gx + bx4, gy + by4, 0)
                    for comp in (nc_u, nc_v):
                        for bx2 in range(2):
                            for by2 in range(2):
                                comp.set(mbx * 2 + bx2, mby * 2 + by2, 0)
                    continue

                w.ue(skip_run)
                skip_run = 0
                w.ue(0)                      # mb_type P_L0_16x16
                w.se(mvx - pmv[0])           # mvd_l0 x
                w.se(mvy - pmv[1])           # mvd_l0 y
                w.ue(_NCBP_INTER_420[cbp])   # coded_block_pattern me(v)
                if cbp:
                    w.se(0)                  # mb_qp_delta
                # luma residual: full 16-coeff blocks per coded 8x8 group
                for i8 in range(4):
                    for k in range(4):
                        idx = 4 * i8 + k
                        x4, y4 = _BLK_X[idx], _BLK_Y[idx]
                        if cbp_luma & (1 << i8):
                            _code_residual_16(w, lv[y4, x4], nc_y,
                                              gx + x4, gy + y4)
                        else:
                            nc_y.set(gx + x4, gy + y4, 0)
                if cbp_chroma:
                    for comp in (0, 1):
                        dcs = c_dc_q[comp]
                        cavlc.encode_block(
                            w, [int(dcs[0, 0]), int(dcs[0, 1]),
                                int(dcs[1, 0]), int(dcs[1, 1])], -1, 4)
                for comp, grid in ((0, nc_u), (1, nc_v)):
                    for idx in range(4):
                        x4, y4 = idx & 1, idx >> 1
                        if cbp_chroma == 2:
                            coeffs = c_ac_q[comp][y4, x4].reshape(16)[zz][1:]
                            total = cavlc.encode_block(
                                w, [int(c) for c in coeffs],
                                grid.nc(mbx * 2 + x4, mby * 2 + y4), 15)
                        else:
                            total = 0
                        grid.set(mbx * 2 + x4, mby * 2 + y4, total)

                # recon
                d = ht.dequant_ac(lv, qp)
                for i8 in range(4):
                    if not (cbp_luma & (1 << i8)):
                        for k in range(4):
                            idx = 4 * i8 + k
                            d[_BLK_Y[idx], _BLK_X[idx]] = 0
                rec_y[yy:yy + 16, x:x + 16] = np.clip(
                    pred + ht.inverse4x4(d)
                    .transpose(0, 2, 1, 3).reshape(16, 16), 0, 255)
                for comp, (plane, cp) in enumerate(
                        ((rec_u, pu), (rec_v, pv))):
                    cdc_deq = (ht.dequant_chroma_dc(c_dc_q[comp], qpc)
                               if cbp_chroma else np.zeros((2, 2), np.int64))
                    cd = ht.dequant_ac(
                        c_ac_q[comp] if cbp_chroma == 2
                        else np.zeros_like(c_ac_q[comp]), qpc)
                    cd[:, :, 0, 0] = cdc_deq
                    crec = np.clip(cp + ht.inverse4x4(cd)
                                   .transpose(0, 2, 1, 3).reshape(8, 8),
                                   0, 255)
                    plane[cy:cy + 8, cx:cx + 8] = crec

        if skip_run:
            w.ue(skip_run)
        w.rbsp_trailing_bits()

        bs_ver, bs_hor = bs_maps_p(intra_mb, nc_y.tc, mvg, refg)
        rec_y, rec_u, rec_v = deblock_frame(rec_y, rec_u, rec_v, qp, qpc,
                                            bs_ver, bs_hor)
        return w.data(), (rec_y, rec_u, rec_v)


class H264Decoder(H264IntraDecoder):
    """Decodes IDR + P (IPPP) baseline streams."""

    def __init__(self) -> None:
        super().__init__()
        self.prev = None

    def decode(self, stream: bytes) -> list:
        from video_codecs_tpu.entropy.bitstream import split_annexb
        frames = []
        for nal in split_annexb(stream):
            nal_type = nal[0] & 0x1F
            rbsp = strip_emulation_prevention(nal[1:])
            if nal_type == NAL_SPS:
                self.size = parse_sps(rbsp)
            elif nal_type == NAL_PPS:
                self.dbf_present, self._pps_cabac = parse_pps(rbsp)
                assert not self._pps_cabac, "P CABAC decode: round 2"
            elif nal_type in (NAL_SLICE_IDR, 1):
                rec = self._decode_any_slice(rbsp, nal_type == NAL_SLICE_IDR)
                self.prev = rec
                frames.append(rec)
        return frames

    def _decode_any_slice(self, rbsp, is_idr):
        r = BitReader(rbsp)
        assert r.ue() == 0
        st = r.ue()
        if st in (2, 7):
            # re-parse with the intra decoder path (it re-reads the header)
            return self._decode_slice(rbsp)
        assert st in (0, 5), f"unsupported slice_type {st}"
        return self._decode_p_slice(r)

    def _decode_p_slice(self, r):
        mbw, mbh = self.size
        w4 = mbw * 4
        assert r.ue() == 0          # pps_id
        r.read(8)                   # frame_num
        assert r.flag() == 0        # num_ref_idx_active_override_flag
        assert r.flag() == 0        # ref_pic_list_modification_flag_l0
        assert r.flag() == 0        # adaptive_ref_pic_marking_mode_flag
        qp = 26 + r.se()
        dbf_idc, aoff, boff = 0, 0, 0
        if self.dbf_present:
            dbf_idc = r.ue()
            if dbf_idc != 1:
                aoff = 2 * r.se()
                boff = 2 * r.se()
        qpc = int(ht.CHROMA_QP[min(max(qp, 0), 51)])
        ref_y, ref_u, ref_v = self.prev

        rec_y = np.zeros((mbh * 16, mbw * 16), np.int32)
        rec_u = np.zeros((mbh * 8, mbw * 8), np.int32)
        rec_v = np.zeros_like(rec_u)
        nc_y = NcGrid(mbw * 4, mbh * 4)
        nc_u = NcGrid(mbw * 2, mbh * 2)
        nc_v = NcGrid(mbw * 2, mbh * 2)
        mvg = np.zeros((mbh * 4, mbw * 4, 2), np.int32)
        refg = np.full((mbh * 4, mbw * 4), -1, np.int32)
        intra_mb = np.zeros((mbh, mbw), bool)
        mode4 = np.full((mbh * 4, mbw * 4), 2, np.int32)
        is_i4 = np.zeros((mbh, mbw), bool)
        zz = cavlc.ZIGZAG_4x4

        def pred_mode4(gx4, gy4):
            def nbr(sx4, sy4):
                if sx4 < 0 or sy4 < 0 or sx4 >= mbw * 4 or sy4 >= mbh * 4:
                    return None
                if not _decoded_before(sx4, sy4, gx4, gy4, mbw):
                    return None
                if not is_i4[sy4 // 4, sx4 // 4]:
                    return 2
                return int(mode4[sy4, sx4])
            a = nbr(gx4 - 1, gy4)
            b = nbr(gx4, gy4 - 1)
            if a is None or b is None:
                return 2
            return min(a, b)

        def decode_skip(mbx, mby):
            gx, gy = mbx * 4, mby * 4
            mvx, mvy = skip_mv(mvg, refg, gx, gy, w4)
            mvg[gy:gy + 4, gx:gx + 4] = (mvx, mvy)
            refg[gy:gy + 4, gx:gx + 4] = 0
            x, yy = mbx * 16, mby * 16
            cx, cy = mbx * 8, mby * 8
            rec_y[yy:yy + 16, x:x + 16] = mc_luma_np(ref_y, x, yy,
                                                     mvx, mvy, 16, 16)
            rec_u[cy:cy + 8, cx:cx + 8] = mc_chroma_np(ref_u, cx, cy,
                                                       mvx, mvy, 8, 8)
            rec_v[cy:cy + 8, cx:cx + 8] = mc_chroma_np(ref_v, cx, cy,
                                                       mvx, mvy, 8, 8)
            for bx4 in range(4):
                for by4 in range(4):
                    nc_y.set(gx + bx4, gy + by4, 0)
            for grid in (nc_u, nc_v):
                for bx2 in range(2):
                    for by2 in range(2):
                        grid.set(mbx * 2 + bx2, mby * 2 + by2, 0)

        n_mbs = mbw * mbh
        addr = 0
        while addr < n_mbs:
            run = r.ue()
            for _ in range(run):
                decode_skip(addr % mbw, addr // mbw)
                addr += 1
            if addr >= n_mbs:
                break
            mbx, mby = addr % mbw, addr // mbw
            addr += 1
            mb_type = r.ue()
            if mb_type >= 5:
                intra_mb[mby, mbx] = True
                if mb_type == 5:
                    self._decode_i4_mb(r, None, rec_y, rec_u, rec_v,
                                       nc_y, nc_u, nc_v, mbx, mby,
                                       qp, qpc, mode4, is_i4, pred_mode4)
                else:
                    self._decode_i16_mb(r, mb_type - 6, rec_y, rec_u, rec_v,
                                        nc_y, nc_u, nc_v, mbx, mby, qp, qpc)
                continue
            assert mb_type == 0, f"unsupported P mb_type {mb_type}"
            gx, gy = mbx * 4, mby * 4
            x, yy = mbx * 16, mby * 16
            cx, cy = mbx * 8, mby * 8
            pmv = median_mv_pred(mvg, refg, gx, gy, w4)
            mvx = pmv[0] + r.se()
            mvy = pmv[1] + r.se()
            mvg[gy:gy + 4, gx:gx + 4] = (mvx, mvy)
            refg[gy:gy + 4, gx:gx + 4] = 0
            cbp = _CBP_FROM_CODE_INTER_420[r.ue()]
            cbp_luma, cbp_chroma = cbp & 15, cbp >> 4
            if cbp:
                assert r.se() == 0      # mb_qp_delta
            lv = np.zeros((4, 4, 4, 4), np.int64)
            for i8 in range(4):
                for k in range(4):
                    idx = 4 * i8 + k
                    x4, y4 = _BLK_X[idx], _BLK_Y[idx]
                    if cbp_luma & (1 << i8):
                        coeffs = cavlc.decode_block(
                            r, nc_y.nc(gx + x4, gy + y4), 16)
                        flat = np.zeros(16, np.int64)
                        flat[zz] = coeffs
                        lv[y4, x4] = flat.reshape(4, 4)
                        nc_y.set(gx + x4, gy + y4,
                                 sum(1 for c in coeffs if c))
                    else:
                        nc_y.set(gx + x4, gy + y4, 0)
            c_dc_q = [np.zeros((2, 2), np.int64) for _ in range(2)]
            c_ac_q = [np.zeros((2, 2, 4, 4), np.int64) for _ in range(2)]
            if cbp_chroma:
                for comp in (0, 1):
                    lst = cavlc.decode_block(r, -1, 4)
                    c_dc_q[comp][0, 0], c_dc_q[comp][0, 1] = lst[0], lst[1]
                    c_dc_q[comp][1, 0], c_dc_q[comp][1, 1] = lst[2], lst[3]
            for comp, grid in ((0, nc_u), (1, nc_v)):
                for idx in range(4):
                    x4, y4 = idx & 1, idx >> 1
                    if cbp_chroma == 2:
                        coeffs = cavlc.decode_block(
                            r, grid.nc(mbx * 2 + x4, mby * 2 + y4), 15)
                        flat = np.zeros(16, np.int64)
                        flat[zz[1:]] = coeffs
                        c_ac_q[comp][y4, x4] = flat.reshape(4, 4)
                        grid.set(mbx * 2 + x4, mby * 2 + y4,
                                 sum(1 for c in coeffs if c))
                    else:
                        grid.set(mbx * 2 + x4, mby * 2 + y4, 0)

            pred = mc_luma_np(ref_y, x, yy, mvx, mvy, 16, 16)
            d = ht.dequant_ac(lv, qp)
            rec_y[yy:yy + 16, x:x + 16] = np.clip(
                pred + ht.inverse4x4(d)
                .transpose(0, 2, 1, 3).reshape(16, 16), 0, 255)
            for comp, (plane, refp) in enumerate(
                    ((rec_u, ref_u), (rec_v, ref_v))):
                cp = mc_chroma_np(refp, cx, cy, mvx, mvy, 8, 8)
                cdc_deq = (ht.dequant_chroma_dc(c_dc_q[comp], qpc)
                           if cbp_chroma else np.zeros((2, 2), np.int64))
                cd = ht.dequant_ac(
                    c_ac_q[comp] if cbp_chroma == 2
                    else np.zeros_like(c_ac_q[comp]), qpc)
                cd[:, :, 0, 0] = cdc_deq
                plane[cy:cy + 8, cx:cx + 8] = np.clip(
                    cp + ht.inverse4x4(cd)
                    .transpose(0, 2, 1, 3).reshape(8, 8), 0, 255)

        if dbf_idc != 1:
            bs_ver, bs_hor = bs_maps_p(intra_mb, nc_y.tc, mvg, refg)
            rec_y, rec_u, rec_v = deblock_frame(rec_y, rec_u, rec_v, qp, qpc,
                                                bs_ver, bs_hor, aoff, boff)
        return rec_y, rec_u, rec_v
