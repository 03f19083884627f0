"""H.264/AVC baseline I_16x16 intra encoder + decoder (CAVLC) — Milestone C.

Toolset: baseline profile, 4:2:0 8-bit, all-I slices of I_16x16 macroblocks
(4 luma 16x16 modes + 4 chroma 8x8 modes), CAVLC entropy coding, deblocking
disabled via slice header.  Streams decode in JM-18.5 ldecod bit-exactly.

Parity references: SURVEY.md §2.6/3.3; jm18.5/lencod/src/intra16x16.c
(prediction modes), intra_chroma.c, vlc.c / cavlc tables (entropy/cavlc.py),
lcommon transform.c + spec 8.5.10-12 (ops/h264_transform.py), parset.c
(SPS/PPS), slice/MB syntax spec 7.3.3-7.3.5.
"""

from __future__ import annotations

import numpy as np

from video_codecs_tpu.entropy import cavlc
from video_codecs_tpu.entropy.bitstream import (BitReader, BitWriter,
                                                insert_emulation_prevention,
                                                strip_emulation_prevention)
from video_codecs_tpu.ops import h264_transform as ht

NAL_SLICE_IDR = 5
NAL_SPS = 7
NAL_PPS = 8

# luma4x4BlkIdx -> (x4, y4) within the MB (spec 6.4.3).
_BLK_X = [2 * ((i8 & 1)) + (i4 & 1) for i8 in range(4) for i4 in range(4)]
_BLK_Y = [2 * ((i8 >> 1)) + (i4 >> 1) for i8 in range(4) for i4 in range(4)]


def nal_unit(nal_type: int, rbsp: bytes, ref_idc: int = 3) -> bytes:
    header = bytes([(ref_idc << 5) | nal_type])
    return header + insert_emulation_prevention(rbsp)


def annexb(nals: list[bytes]) -> bytes:
    out = bytearray()
    for nal in nals:
        out += b"\x00\x00\x00\x01" + nal
    return bytes(out)


def write_sps(width_mbs: int, height_mbs: int) -> bytes:
    w = BitWriter()
    w.write(66, 8)   # profile_idc = baseline
    w.flag(1)        # constraint_set0
    w.write(0, 7)    # other constraint flags + reserved
    w.write(30, 8)   # level_idc 3.0
    w.ue(0)          # sps_id
    w.ue(4)          # log2_max_frame_num_minus4 -> 8 bits
    w.ue(2)          # pic_order_cnt_type = 2
    w.ue(1)          # max_num_ref_frames
    w.flag(0)        # gaps_in_frame_num_value_allowed
    w.ue(width_mbs - 1)
    w.ue(height_mbs - 1)
    w.flag(1)        # frame_mbs_only_flag
    w.flag(1)        # direct_8x8_inference_flag
    w.flag(0)        # frame_cropping_flag
    w.flag(0)        # vui_parameters_present_flag
    w.rbsp_trailing_bits()
    return w.data()


def write_pps() -> bytes:
    w = BitWriter()
    w.ue(0)          # pps_id
    w.ue(0)          # sps_id
    w.flag(0)        # entropy_coding_mode = CAVLC
    w.flag(0)        # bottom_field_pic_order_in_frame_present
    w.ue(0)          # num_slice_groups_minus1
    w.ue(0)          # num_ref_idx_l0_default_active_minus1
    w.ue(0)          # num_ref_idx_l1_default_active_minus1
    w.flag(0)        # weighted_pred_flag
    w.write(0, 2)    # weighted_bipred_idc
    w.se(0)          # pic_init_qp_minus26
    w.se(0)          # pic_init_qs_minus26
    w.se(0)          # chroma_qp_index_offset
    w.flag(1)        # deblocking_filter_control_present_flag
    w.flag(0)        # constrained_intra_pred_flag
    w.flag(0)        # redundant_pic_cnt_present_flag
    w.rbsp_trailing_bits()
    return w.data()


def parse_sps(rbsp: bytes) -> tuple[int, int]:
    r = BitReader(rbsp)
    profile = r.read(8)
    r.read(8)        # constraint flags
    r.read(8)        # level
    assert r.ue() == 0
    r.ue()           # log2_max_frame_num_minus4
    poc_type = r.ue()
    assert poc_type == 2, "only pic_order_cnt_type 2 supported"
    r.ue()
    r.flag()
    wmb = r.ue() + 1
    hmb = r.ue() + 1
    assert r.flag() == 1, "frame_mbs_only required"
    r.flag()
    assert r.flag() == 0, "cropping unsupported"
    _ = profile
    return wmb, hmb


def parse_pps(rbsp: bytes) -> bool:
    r = BitReader(rbsp)
    assert r.ue() == 0 and r.ue() == 0
    assert r.flag() == 0, "CABAC streams unsupported (CAVLC only)"
    r.flag()
    assert r.ue() == 0, "FMO unsupported"
    r.ue(), r.ue()
    r.flag()
    r.read(2)
    init_qp = 26 + r.se()
    r.se()
    assert r.se() == 0, "chroma qp offset unsupported"
    dbf_present = bool(r.flag())
    assert r.flag() == 0
    r.flag()
    assert init_qp == 26
    return dbf_present


# ---------------------------------------------------------------------------
# Intra prediction (spec 8.3.3 / 8.3.4)
# ---------------------------------------------------------------------------

def pred_luma16(rec: np.ndarray, x: int, y: int, mode: int) -> np.ndarray:
    top = rec[y - 1, x:x + 16].astype(np.int32) if y > 0 else None
    left = rec[y:y + 16, x - 1].astype(np.int32) if x > 0 else None
    if mode == 0:    # vertical
        return np.tile(top, (16, 1))
    if mode == 1:    # horizontal
        return np.tile(left[:, None], (1, 16))
    if mode == 2:    # DC
        if top is not None and left is not None:
            dc = (int(top.sum()) + int(left.sum()) + 16) >> 5
        elif top is not None:
            dc = (int(top.sum()) + 8) >> 4
        elif left is not None:
            dc = (int(left.sum()) + 8) >> 4
        else:
            dc = 128
        return np.full((16, 16), dc, np.int32)
    # plane
    corner = int(rec[y - 1, x - 1])
    hh = sum((i + 1) * (int(top[8 + i]) -
                        (int(top[6 - i]) if i < 7 else corner))
             for i in range(8))
    vv = sum((i + 1) * (int(left[8 + i]) -
                        (int(left[6 - i]) if i < 7 else corner))
             for i in range(8))
    a = 16 * (int(left[15]) + int(top[15]))
    b = (5 * hh + 32) >> 6
    c = (5 * vv + 32) >> 6
    xs = np.arange(16)
    out = (a + b * (xs[None, :] - 7) + c * (xs[:, None] - 7) + 16) >> 5
    return np.clip(out, 0, 255).astype(np.int32)


def pred_chroma8(rec: np.ndarray, x: int, y: int, mode: int) -> np.ndarray:
    top = rec[y - 1, x:x + 8].astype(np.int32) if y > 0 else None
    left = rec[y:y + 8, x - 1].astype(np.int32) if x > 0 else None
    if mode == 0:    # DC, per 4x4 quadrant (spec 8.3.4.1)
        out = np.zeros((8, 8), np.int32)
        for qy in (0, 4):
            for qx in (0, 4):
                t = top[qx:qx + 4] if top is not None else None
                l = left[qy:qy + 4] if left is not None else None
                if qx == qy:         # corner quadrants use both if avail
                    if t is not None and l is not None:
                        dc = (int(t.sum()) + int(l.sum()) + 4) >> 3
                    elif t is not None:
                        dc = (int(t.sum()) + 2) >> 2
                    elif l is not None:
                        dc = (int(l.sum()) + 2) >> 2
                    else:
                        dc = 128
                elif qx == 4:        # top-right prefers top
                    if t is not None:
                        dc = (int(t.sum()) + 2) >> 2
                    elif l is not None:
                        dc = (int(l.sum()) + 2) >> 2
                    else:
                        dc = 128
                else:                # bottom-left prefers left
                    if l is not None:
                        dc = (int(l.sum()) + 2) >> 2
                    elif t is not None:
                        dc = (int(t.sum()) + 2) >> 2
                    else:
                        dc = 128
                out[qy:qy + 4, qx:qx + 4] = dc
        return out
    if mode == 1:    # horizontal
        return np.tile(left[:, None], (1, 8))
    if mode == 2:    # vertical
        return np.tile(top, (8, 1))
    # plane
    corner = int(rec[y - 1, x - 1])
    hh = sum((i + 1) * (int(top[4 + i]) -
                        (int(top[2 - i]) if i < 3 else corner))
             for i in range(4))
    vv = sum((i + 1) * (int(left[4 + i]) -
                        (int(left[2 - i]) if i < 3 else corner))
             for i in range(4))
    a = 16 * (int(left[7]) + int(top[7]))
    b = (17 * hh + 16) >> 5
    c = (17 * vv + 16) >> 5
    xs = np.arange(8)
    out = (a + b * (xs[None, :] - 3) + c * (xs[:, None] - 3) + 16) >> 5
    return np.clip(out, 0, 255).astype(np.int32)


# ---------------------------------------------------------------------------
# nC bookkeeping
# ---------------------------------------------------------------------------

class NcGrid:
    """Per-4x4-block TotalCoeff storage with spec 9.2.1 nC derivation."""

    def __init__(self, blocks_w: int, blocks_h: int) -> None:
        self.tc = np.zeros((blocks_h, blocks_w), np.int32)

    def nc(self, bx: int, by: int) -> int:
        a = int(self.tc[by, bx - 1]) if bx > 0 else None
        b = int(self.tc[by - 1, bx]) if by > 0 else None
        if a is not None and b is not None:
            return (a + b + 1) >> 1
        if a is not None:
            return a
        if b is not None:
            return b
        return 0

    def set(self, bx: int, by: int, total: int) -> None:
        self.tc[by, bx] = total


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

class H264IntraEncoder:
    def __init__(self, width: int, height: int, qp: int = 28) -> None:
        assert width % 16 == 0 and height % 16 == 0
        self.w, self.h, self.qp = width, height, qp

    def encode_sequence(self, frames) -> tuple[bytes, list]:
        nals = [nal_unit(NAL_SPS, write_sps(self.w // 16, self.h // 16)),
                nal_unit(NAL_PPS, write_pps())]
        recons = []
        for idx, (y, u, v) in enumerate(frames):
            rbsp, rec = self.encode_frame(y, u, v, idx)
            nals.append(nal_unit(NAL_SLICE_IDR, rbsp))
            recons.append(rec)
        return annexb(nals), recons

    def encode_frame(self, y, u, v, idr_id: int = 0):
        qp = self.qp
        qpc = int(ht.CHROMA_QP[min(max(qp, 0), 51)])
        mbw, mbh = self.w // 16, self.h // 16
        yv, uv, vv = (p.astype(np.int32) for p in (y, u, v))
        rec_y = np.zeros_like(yv)
        rec_u = np.zeros_like(uv)
        rec_v = np.zeros_like(vv)
        nc_y = NcGrid(mbw * 4, mbh * 4)
        nc_u = NcGrid(mbw * 2, mbh * 2)
        nc_v = NcGrid(mbw * 2, mbh * 2)

        w = BitWriter()
        # slice header (IDR, I slice)
        w.ue(0)              # first_mb_in_slice
        w.ue(7)              # slice_type = I (all slices)
        w.ue(0)              # pps_id
        w.write(0, 8)        # frame_num
        w.ue(idr_id & 1)     # idr_pic_id (toggle to separate IDRs)
        w.flag(0)            # dec_ref_pic_marking: no_output_of_prior_pics
        w.flag(0)            # long_term_reference_flag
        w.se(qp - 26)        # slice_qp_delta
        w.ue(1)              # disable_deblocking_filter_idc = 1 (off)

        for mby in range(mbh):
            for mbx in range(mbw):
                self._encode_mb(w, yv, uv, vv, rec_y, rec_u, rec_v,
                                nc_y, nc_u, nc_v, mbx, mby, qp, qpc)
        w.rbsp_trailing_bits()
        return w.data(), (rec_y, rec_u, rec_v)

    def _encode_mb(self, w, yv, uv, vv, rec_y, rec_u, rec_v,
                   nc_y, nc_u, nc_v, mbx, mby, qp, qpc):
        x, y = mbx * 16, mby * 16
        cx, cy = mbx * 8, mby * 8
        avail_t, avail_l = mby > 0, mbx > 0

        # ---- luma mode decision + transform ----
        modes = [2] + ([0] if avail_t else []) + ([1] if avail_l else []) + \
                ([3] if (avail_t and avail_l) else [])
        orig = yv[y:y + 16, x:x + 16]
        best_mode, best_sad, best_pred = None, None, None
        for m in modes:
            p = pred_luma16(rec_y, x, y, m)
            sad = int(np.abs(orig - p).sum())
            if best_sad is None or sad < best_sad:
                best_mode, best_sad, best_pred = m, sad, p
        res = orig - best_pred
        blk = res.reshape(4, 4, 4, 4).transpose(0, 2, 1, 3)  # [y4][x4][4][4]
        wt = ht.forward4x4(blk)
        dc = wt[:, :, 0, 0].copy()
        dc_q = ht.quant_luma_dc(ht.fwd_hadamard4x4_dc(dc), qp)
        ac_q = ht.quant_ac(wt, qp)
        ac_q[:, :, 0, 0] = 0
        cbp_luma = 15 if ac_q.any() else 0

        # ---- chroma ----
        cmodes = [0] + ([1] if avail_l else []) + ([2] if avail_t else []) + \
                 ([3] if (avail_t and avail_l) else [])
        co = {0: uv[cy:cy + 8, cx:cx + 8], 1: vv[cy:cy + 8, cx:cx + 8]}
        best_cm, best_csad, best_cpred = None, None, None
        for m in cmodes:
            pu = pred_chroma8(rec_u, cx, cy, m)
            pv = pred_chroma8(rec_v, cx, cy, m)
            sad = int(np.abs(co[0] - pu).sum()) + int(np.abs(co[1] - pv).sum())
            if best_csad is None or sad < best_csad:
                best_cm, best_csad, best_cpred = m, sad, (pu, pv)
        c_dc_q, c_ac_q = [], []
        for comp in (0, 1):
            cres = co[comp] - best_cpred[comp]
            cblk = cres.reshape(2, 4, 2, 4).transpose(0, 2, 1, 3)
            cwt = ht.forward4x4(cblk)
            cdc = cwt[:, :, 0, 0].copy()
            c_dc_q.append(ht.quant_chroma_dc(ht.hadamard2x2(cdc), qpc))
            acq = ht.quant_ac(cwt, qpc)
            acq[:, :, 0, 0] = 0
            c_ac_q.append(acq)
        any_cdc = any(q.any() for q in c_dc_q)
        any_cac = any(q.any() for q in c_ac_q)
        cbp_chroma = 2 if any_cac else (1 if any_cdc else 0)

        # ---- syntax ----
        mb_type = 1 + best_mode + 4 * cbp_chroma + 12 * (1 if cbp_luma else 0)
        w.ue(mb_type)
        w.ue(best_cm)        # intra_chroma_pred_mode
        w.se(0)              # mb_qp_delta
        # Intra16x16DCLevel: nC of luma block 0
        zz = cavlc.ZIGZAG_4x4
        # DC levels are the quantized Hadamard coefficients in zig-zag order
        dc_list = [int(dc_q.reshape(16)[zz[i]]) for i in range(16)]
        cavlc.encode_block(w, dc_list, nc_y.nc(mbx * 4, mby * 4), 16)
        # AC blocks
        for idx in range(16):
            x4, y4 = _BLK_X[idx], _BLK_Y[idx]
            gx, gy = mbx * 4 + x4, mby * 4 + y4
            if cbp_luma:
                coeffs = ac_q[y4, x4].reshape(16)[zz][1:]
                total = cavlc.encode_block(w, [int(c) for c in coeffs],
                                           nc_y.nc(gx, gy), 15)
            else:
                total = 0
            nc_y.set(gx, gy, total)
        # chroma DC
        if cbp_chroma:
            for comp in (0, 1):
                dcs = c_dc_q[comp]
                lst = [int(dcs[0, 0]), int(dcs[0, 1]),
                       int(dcs[1, 0]), int(dcs[1, 1])]
                cavlc.encode_block(w, lst, -1, 4)
        # chroma AC
        for comp, grid in ((0, nc_u), (1, nc_v)):
            for idx in range(4):
                x4, y4 = idx & 1, idx >> 1
                gx, gy = mbx * 2 + x4, mby * 2 + y4
                if cbp_chroma == 2:
                    coeffs = c_ac_q[comp][y4, x4].reshape(16)[zz][1:]
                    total = cavlc.encode_block(w, [int(c) for c in coeffs],
                                               grid.nc(gx, gy), 15)
                else:
                    total = 0
                grid.set(gx, gy, total)

        # ---- reconstruction (decoder-identical) ----
        dc_deq = ht.dequant_luma_dc(dc_q, qp)
        d = ht.dequant_ac(ac_q if cbp_luma else np.zeros_like(ac_q), qp)
        d[:, :, 0, 0] = dc_deq
        r = ht.inverse4x4(d)
        rec = np.clip(best_pred +
                      r.transpose(0, 2, 1, 3).reshape(16, 16), 0, 255)
        rec_y[y:y + 16, x:x + 16] = rec
        for comp, (plane, pred) in enumerate((
                (rec_u, best_cpred[0]), (rec_v, best_cpred[1]))):
            if cbp_chroma:
                cdc_deq = ht.dequant_chroma_dc(c_dc_q[comp], qpc)
            else:
                cdc_deq = np.zeros((2, 2), np.int64)
            cd = ht.dequant_ac(
                c_ac_q[comp] if cbp_chroma == 2 else np.zeros_like(c_ac_q[comp]),
                qpc)
            cd[:, :, 0, 0] = cdc_deq
            cr = ht.inverse4x4(cd)
            crec = np.clip(pred + cr.transpose(0, 2, 1, 3).reshape(8, 8),
                           0, 255)
            plane[cy:cy + 8, cx:cx + 8] = crec


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

class H264IntraDecoder:
    def __init__(self) -> None:
        self.size = None

    def decode(self, stream: bytes) -> list:
        from video_codecs_tpu.entropy.bitstream import split_annexb
        frames = []
        for nal in split_annexb(stream):
            nal_type = nal[0] & 0x1F
            rbsp = strip_emulation_prevention(nal[1:])
            if nal_type == NAL_SPS:
                self.size = parse_sps(rbsp)
            elif nal_type == NAL_PPS:
                self.dbf_present = parse_pps(rbsp)
            elif nal_type in (NAL_SLICE_IDR, 1):
                frames.append(self._decode_slice(rbsp))
        return frames

    def _decode_slice(self, rbsp: bytes):
        mbw, mbh = self.size
        r = BitReader(rbsp)
        assert r.ue() == 0
        st = r.ue()
        assert st in (2, 7), "only I slices supported"
        assert r.ue() == 0
        r.read(8)            # frame_num
        r.ue()               # idr_pic_id
        r.flag(), r.flag()   # dec_ref_pic_marking (IDR)
        qp = 26 + r.se()
        if self.dbf_present:
            assert r.ue() == 1, "deblocking must be disabled in this build"
        qpc = int(ht.CHROMA_QP[min(max(qp, 0), 51)])

        rec_y = np.zeros((mbh * 16, mbw * 16), np.int32)
        rec_u = np.zeros((mbh * 8, mbw * 8), np.int32)
        rec_v = np.zeros_like(rec_u)
        nc_y = NcGrid(mbw * 4, mbh * 4)
        nc_u = NcGrid(mbw * 2, mbh * 2)
        nc_v = NcGrid(mbw * 2, mbh * 2)
        zz = cavlc.ZIGZAG_4x4

        for mby in range(mbh):
            for mbx in range(mbw):
                x, y = mbx * 16, mby * 16
                cx, cy = mbx * 8, mby * 8
                mb_type = r.ue()
                assert 1 <= mb_type <= 24, f"only I_16x16 supported, got {mb_type}"
                lmode = (mb_type - 1) % 4
                cbp_chroma = ((mb_type - 1) // 4) % 3
                cbp_luma = 15 if (mb_type - 1) >= 12 else 0
                cmode = r.ue()
                dqp = r.se()
                assert dqp == 0
                # luma DC
                dc_list = cavlc.decode_block(r, nc_y.nc(mbx * 4, mby * 4), 16)
                dc_q = np.zeros(16, np.int64)
                dc_q[zz] = dc_list
                dc_q = dc_q.reshape(4, 4)
                ac_q = np.zeros((4, 4, 4, 4), np.int64)
                for idx in range(16):
                    x4, y4 = _BLK_X[idx], _BLK_Y[idx]
                    gx, gy = mbx * 4 + x4, mby * 4 + y4
                    if cbp_luma:
                        coeffs = cavlc.decode_block(r, nc_y.nc(gx, gy), 15)
                        flat = np.zeros(16, np.int64)
                        flat[zz[1:]] = coeffs
                        ac_q[y4, x4] = flat.reshape(4, 4)
                        nc_y.set(gx, gy, sum(1 for c in coeffs if c))
                    else:
                        nc_y.set(gx, gy, 0)
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
                        gx, gy = mbx * 2 + x4, mby * 2 + y4
                        if cbp_chroma == 2:
                            coeffs = cavlc.decode_block(r, grid.nc(gx, gy), 15)
                            flat = np.zeros(16, np.int64)
                            flat[zz[1:]] = coeffs
                            c_ac_q[comp][y4, x4] = flat.reshape(4, 4)
                            grid.set(gx, gy, sum(1 for c in coeffs if c))
                        else:
                            grid.set(gx, gy, 0)

                # recon
                pred = pred_luma16(rec_y, x, y, lmode)
                dc_deq = ht.dequant_luma_dc(dc_q, qp)
                d = ht.dequant_ac(ac_q, qp)
                d[:, :, 0, 0] = dc_deq
                rr = ht.inverse4x4(d)
                rec_y[y:y + 16, x:x + 16] = np.clip(
                    pred + rr.transpose(0, 2, 1, 3).reshape(16, 16), 0, 255)
                for comp, plane in ((0, rec_u), (1, rec_v)):
                    cpred = pred_chroma8(plane, cx, cy, cmode)
                    cdc_deq = ht.dequant_chroma_dc(c_dc_q[comp], qpc)
                    cd = ht.dequant_ac(c_ac_q[comp], qpc)
                    cd[:, :, 0, 0] = cdc_deq
                    cr = ht.inverse4x4(cd)
                    plane[cy:cy + 8, cx:cx + 8] = np.clip(
                        cpred + cr.transpose(0, 2, 1, 3).reshape(8, 8), 0, 255)
        return rec_y, rec_u, rec_v
