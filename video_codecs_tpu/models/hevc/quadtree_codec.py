"""HEVC all-intra encoder/decoder with a CU quadtree (CTB16 -> CU8 -> PU4).

Extends the fixed-grid build with: split_cu_flag (neighbor-depth contexts),
8x8 CUs with PART_2Nx2N or PART_NxN (four 4x4 luma PUs), forced TU split
for NxN (4x4 luma TUs using the DST), mode-dependent coefficient scans for
4x4/8x8 TBs, full spec MPM (left + above candidates at PU granularity,
above clamped at CTB rows), and Z-scan sample availability.

Parity references: HM TEncCu xCompressCU :349 (the recursive RDO this
build's batched two-level decision replaces), TDecCu xDecodeCU :175,
spec 7.3.8.4-7.3.8.11.  Conformance: HM TAppDecoder hash-OK (tests).
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

from video_codecs_tpu.entropy import bitstream as bs
from video_codecs_tpu.entropy import cabac, ctx, residual
from video_codecs_tpu.models.hevc import headers
from video_codecs_tpu.models.hevc import intra_codec as ic
from video_codecs_tpu.ops import deblock as deblock_ops
from video_codecs_tpu.ops import intra as intra_ops
from video_codecs_tpu.ops import quant as quant_ops
from video_codecs_tpu.ops import transform as tr_ops
from video_codecs_tpu.utils import rom

DC = 1


def z_index(x: int, y: int, w: int, ctb_shift: int = 4) -> int:
    """Global decode order of the minimal block containing sample (x, y):
    CTB raster order, Morton (Z) order inside the CTB.  ctb_shift is the
    CTB size in THIS plane's coordinates (4 for luma CTB16, 3 for the
    corresponding 8x8 chroma region in 4:2:0)."""
    ctb_x, ctb_y = x >> ctb_shift, y >> ctb_shift
    nbits = ctb_shift - 2
    ix, iy = (x >> 2) & ((1 << nbits) - 1), (y >> 2) & ((1 << nbits) - 1)
    morton = 0
    for b in range(nbits):
        morton |= ((ix >> b) & 1) << (2 * b)
        morton |= ((iy >> b) & 1) << (2 * b + 1)
    ctbs_per_row = (w + (1 << ctb_shift) - 1) >> ctb_shift
    return ((ctb_y * ctbs_per_row + ctb_x) << (2 * nbits)) + morton


def build_ref_z(plane: np.ndarray, x: int, y: int, n: int,
                w: int, h: int, ctb_shift: int = 4) -> np.ndarray:
    """Reference array with general Z-scan availability (spec 6.4.1)."""
    r = 4 * n + 1
    samples = np.zeros(r, np.int32)
    avail = np.zeros(r, bool)
    cur = z_index(x, y, w, ctb_shift)

    def ok(sx: int, sy: int) -> bool:
        if sx < 0 or sy < 0 or sx >= w or sy >= h:
            return False
        return z_index(sx, sy, w, ctb_shift) < cur

    for k in range(2 * n):                 # left column, bottom -> top
        j = 2 * n - 1 - k
        if ok(x - 1, y + j):
            samples[k] = plane[y + j, x - 1]
            avail[k] = True
    if ok(x - 1, y - 1):
        samples[2 * n] = plane[y - 1, x - 1]
        avail[2 * n] = True
    for i in range(2 * n):                 # top row, left -> right
        if ok(x + i, y - 1):
            samples[2 * n + 1 + i] = plane[y - 1, x + i]
            avail[2 * n + 1 + i] = True
    if not avail.any():
        return np.full(r, 128, np.int32)
    out = samples.copy()
    if not avail[0]:
        out[0] = samples[np.argmax(avail)]
    for k in range(1, r):
        if not avail[k]:
            out[k] = out[k - 1]
    return out


@dataclasses.dataclass
class CuInfo:
    """One coding unit (16x16 unsplit, or 8x8)."""
    x: int
    y: int
    size: int
    nxn: bool = False
    modes: list[int] = dataclasses.field(default_factory=lambda: [DC])
    levels_y: list = dataclasses.field(default_factory=list)   # per luma TU
    levels_cb: np.ndarray | None = None
    levels_cr: np.ndarray | None = None


@dataclasses.dataclass
class CtbInfo:
    split: bool
    cus: list[CuInfo]


class Grids:
    """Neighbor state: intra mode per 4x4, CU depth per 8x8."""

    def __init__(self, w: int, h: int) -> None:
        self.mode = np.full((h // 4, w // 4), DC, np.int32)
        self.intra = np.zeros((h // 4, w // 4), bool)
        self.depth = np.zeros((h // 8, w // 8), np.int32)

    def set_cu(self, cu: CuInfo, depth: int) -> None:
        gx, gy = cu.x // 4, cu.y // 4
        s4 = cu.size // 4
        if cu.nxn:
            half = s4 // 2
            for p, m in enumerate(cu.modes):
                px, py = gx + (p & 1) * half, gy + (p >> 1) * half
                self.mode[py:py + half, px:px + half] = m
        else:
            self.mode[gy:gy + s4, gx:gx + s4] = cu.modes[0]
        self.intra[gy:gy + s4, gx:gx + s4] = True
        dx, dy = cu.x // 8, cu.y // 8
        s8 = max(cu.size // 8, 1)
        self.depth[dy:dy + s8, dx:dx + s8] = depth

    def mpm(self, x: int, y: int, w: int, h: int) -> list[int]:
        """spec 8.4.2: A = (x-1, y), B = (x, y-1); B outside CTB -> DC."""
        cur = z_index(x, y, w)

        def mode_at(sx, sy, clamp_ctb):
            if sx < 0 or sy < 0 or sx >= w or sy >= h:
                return DC
            if clamp_ctb and (sy >> 4) != (y >> 4):
                return DC
            if z_index(sx, sy, w) >= cur:
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

    def split_ctx(self, x: int, y: int, depth: int, w: int, h: int) -> int:
        c = 0
        if x > 0 and self.depth[y // 8, (x - 1) // 8] > depth:
            c += 1
        if y > 0 and self.depth[(y - 1) // 8, x // 8] > depth:
            c += 1
        return c


def code_tb(orig, pred, qp, log2, dst, rdoq, sbh):
    res = orig.astype(np.int32) - pred
    coeff = tr_ops.forward_transform_np(res, log2, dst=dst)
    if rdoq:
        levels = quant_ops.rdoq_lite_np(
            coeff, qp, log2, lam=0.57 * 2.0 ** ((qp - 12) / 3.0))
    else:
        levels = quant_ops.quantize_np(coeff, qp, log2)
    if sbh and levels.any():
        levels = quant_ops.apply_sbh_np(levels, log2)
    if not levels.any():
        return levels, pred.astype(np.int32)
    dq = quant_ops.dequantize_np(levels, qp, log2)
    r = tr_ops.inverse_transform_np(dq, log2, dst=dst)
    return levels, np.clip(pred + r, 0, 255).astype(np.int32)


def _qt_bs_maps(depth8: np.ndarray, w: int, h: int):
    """BS maps on the 8-px deblocking grid for an all-intra quadtree
    picture: 16-grid edges are always CU boundaries (BS 2); interior
    8-edges are boundaries only where the CTB is split."""
    n_ve = w // 8 - 1
    n_he = h // 8 - 1
    rows8, cols8 = h // 8, w // 8
    bs_ver = np.zeros((n_ve, rows8), np.int32)
    bs_hor = np.zeros((n_he, cols8), np.int32)
    for k in range(n_ve):
        x = 8 * (k + 1)
        for j in range(rows8):
            if x % 16 == 0 or depth8[j, x // 8] == 1:
                bs_ver[k, j] = 2
    for k in range(n_he):
        y = 8 * (k + 1)
        for j in range(cols8):
            if y % 16 == 0 or depth8[y // 8, j] == 1:
                bs_hor[k, j] = 2
    return bs_ver, bs_hor


class QuadtreeIntraEncoder(ic.IntraEncoder):
    """All-intra encoder with CTB16 -> CU8 (-> PU4) quadtree decisions."""

    def __init__(self, cfg: headers.HevcConfig) -> None:
        assert cfg.log2_min_cb == 3, "set log2_min_cb=3 for the quadtree build"
        assert cfg.tile_columns == 1, "tiles + quadtree: round 2"
        super(ic.IntraEncoder, self).__init__()  # skip parent asserts
        assert cfg.width % 16 == 0 and cfg.height % 16 == 0
        self.cfg = cfg

    # ---- encoding ----

    def encode_frame(self, y, u, v, modes=None):
        cfg = self.cfg
        w, h = cfg.width, cfg.height
        qp, qp_c = cfg.qp, ic.chroma_qp(cfg.qp)
        yv, uv, vv = (p.astype(np.int32) for p in (y, u, v))
        rec_y = np.zeros_like(yv)
        rec_u = np.zeros_like(uv)
        rec_v = np.zeros_like(vv)
        grids = Grids(w, h)
        sl = math.sqrt(0.57 * 2.0 ** ((qp - 12) / 3.0))

        ctbs: list[CtbInfo] = []
        for cy in range(0, h, 16):
            for cx in range(0, w, 16):
                ctbs.append(self._encode_ctb(
                    yv, uv, vv, rec_y, rec_u, rec_v, grids, cx, cy,
                    qp, qp_c, sl))

        if not cfg.deblocking_disabled:
            bs_ver, bs_hor = _qt_bs_maps(grids.depth, w, h)
            rec_y, rec_u, rec_v = deblock_ops.deblock_420_bs_np(
                rec_y, rec_u, rec_v, qp, bs_ver, bs_hor, block=8)
        slice_nal = self._encode_slice_qt(ctbs)
        sei_nal = self._hash_sei(rec_y, rec_u, rec_v)
        return [slice_nal, sei_nal], (rec_y, rec_u, rec_v)

    def _best_mode(self, plane, rec, x, yq, n, w, h, sl, grids):
        """SATD + MPM-bit cost over all 35 modes (recon-neighbor refs)."""
        ref = build_ref_z(rec, x, yq, n, w, h)
        orig = plane[yq:yq + n, x:x + n]
        log2 = n.bit_length() - 1
        preds = intra_ops.predict_intra(
            ref[None], np.broadcast_to(np.arange(35, dtype=np.int32),
                                       (1, 35)).copy(), log2)
        preds = np.asarray(preds)[0]
        d = np.abs(preds.astype(np.int64) -
                   orig[None]).reshape(35, -1).sum(axis=1)
        mpm = grids.mpm(x, yq, w, h)
        bits = np.full(35, 6.0)
        bits[mpm[0]] = 2.0
        bits[mpm[1]] = 3.0
        bits[mpm[2]] = 3.0
        cost = d + np.round(sl * bits).astype(np.int64)
        mode = int(np.argmin(cost))
        return mode, int(cost[mode]), preds[mode]

    def _code_cu(self, yv, uv, vv, rec_y, rec_u, rec_v, grids, cu: CuInfo,
                 qp, qp_c, sl, depth):
        """Reconstruct one CU (updates planes + grids); fills levels."""
        cfg = self.cfg
        w, h = cfg.width, cfg.height
        x, yq, size = cu.x, cu.y, cu.size
        rdoq, sbh = cfg.rdoq, cfg.sign_data_hiding
        if cu.nxn:
            # four 4x4 luma PUs == TUs (DST), Z order
            for p in range(4):
                px, py = x + (p & 1) * 4, yq + (p >> 1) * 4
                mode = cu.modes[p]
                ref = build_ref_z(rec_y, px, py, 4, w, h)
                pred = intra_ops.predict_intra_np(ref, mode, 2)
                lv, rec = code_tb(yv[py:py + 4, px:px + 4], pred, qp, 2,
                                  True, rdoq, sbh)
                cu.levels_y.append(lv if lv.any() else None)
                rec_y[py:py + 4, px:px + 4] = rec
        else:
            log2 = size.bit_length() - 1
            mode = cu.modes[0]
            ref = build_ref_z(rec_y, x, yq, size, w, h)
            pred = intra_ops.predict_intra_np(ref, mode, log2)
            lv, rec = code_tb(yv[yq:yq + size, x:x + size], pred, qp, log2,
                              False, rdoq, sbh)
            cu.levels_y.append(lv if lv.any() else None)
            rec_y[yq:yq + size, x:x + size] = rec
        # chroma TB: size//2 (>=4), DM mode = modes[0]
        cs = max(size // 2, 4)
        clog2 = cs.bit_length() - 1
        cx, cy = x // 2, yq // 2
        for comp, (po, pr) in enumerate(((uv, rec_u), (vv, rec_v))):
            refc = build_ref_z(pr, cx, cy, cs, w // 2, h // 2, ctb_shift=3)
            predc = intra_ops.predict_intra_np(refc, cu.modes[0], clog2,
                                               is_luma=False)
            lvc, recc = code_tb(po[cy:cy + cs, cx:cx + cs], predc, qp_c,
                                clog2, False, rdoq, sbh)
            if comp == 0:
                cu.levels_cb = lvc if lvc.any() else None
            else:
                cu.levels_cr = lvc if lvc.any() else None
            pr[cy:cy + cs, cx:cx + cs] = recc
        grids.set_cu(cu, depth)

    def _encode_ctb(self, yv, uv, vv, rec_y, rec_u, rec_v, grids, cx, cy,
                    qp, qp_c, sl) -> CtbInfo:
        cfg = self.cfg
        w, h = cfg.width, cfg.height

        # ---- decision on a scratch copy (recon refs evolve with choices) --
        def trial(split: bool):
            ry, ru, rv = rec_y.copy(), rec_u.copy(), rec_v.copy()
            g2 = Grids(w, h)
            g2.mode[:] = grids.mode
            g2.intra[:] = grids.intra
            g2.depth[:] = grids.depth
            cost = 0
            ctb = CtbInfo(split, [])
            if not split:
                mode, c, _ = self._best_mode(yv, ry, cx, cy, 16, w, h, sl, g2)
                cu = CuInfo(cx, cy, 16, False, [mode])
                self._code_cu(yv, uv, vv, ry, ru, rv, g2, cu, qp, qp_c, sl, 0)
                d = int(np.abs(ry[cy:cy + 16, cx:cx + 16].astype(np.int64) -
                               yv[cy:cy + 16, cx:cx + 16]).sum())
                cost = d + c - c + int(round(sl * 3)) + c * 0  # dist + split bit
                cost = d + int(round(sl * 3))
                ctb.cus.append(cu)
            else:
                cost = int(round(sl * 1))
                for q in range(4):
                    sx, sy = cx + (q & 1) * 8, cy + (q >> 1) * 8
                    # 2Nx2N vs NxN for this 8x8
                    m8, c8, _ = self._best_mode(yv, ry, sx, sy, 8, w, h, sl, g2)
                    # NxN estimate: sum of 4x4 best SATDs (orig-neighbor
                    # approximation before recon)
                    cnxn = int(round(sl * 2))
                    modes4 = []
                    for p in range(4):
                        px, py = sx + (p & 1) * 4, sy + (p >> 1) * 4
                        m4, c4, _ = self._best_mode(yv, ry, px, py, 4, w, h,
                                                    sl, g2)
                        modes4.append(m4)
                        cnxn += c4
                    if c8 <= cnxn:
                        cu = CuInfo(sx, sy, 8, False, [m8])
                    else:
                        cu = CuInfo(sx, sy, 8, True, modes4)
                    self._code_cu(yv, uv, vv, ry, ru, rv, g2, cu, qp, qp_c,
                                  sl, 1)
                    ctb.cus.append(cu)
                d = int(np.abs(ry[cy:cy + 16, cx:cx + 16].astype(np.int64) -
                               yv[cy:cy + 16, cx:cx + 16]).sum())
                cost += d
            return cost, ctb, (ry, ru, rv, g2)

        cost_n, ctb_n, st_n = trial(False)
        cost_s, ctb_s, st_s = trial(True)
        if cost_n <= cost_s:
            ctb, (ry, ru, rv, g2) = ctb_n, st_n
        else:
            ctb, (ry, ru, rv, g2) = ctb_s, st_s
        rec_y[:], rec_u[:], rec_v[:] = ry, ru, rv
        grids.mode[:] = g2.mode
        grids.intra[:] = g2.intra
        grids.depth[:] = g2.depth
        return ctb

    # ---- CABAC ----

    def _encode_slice_qt(self, ctbs: list[CtbInfo]) -> bytes:
        cfg = self.cfg
        w = headers.write_slice_header(cfg, bs.NAL_IDR_W_RADL)
        enc = cabac.CabacEncoder(w, ctx.init_states(ctx.I, cfg.qp))
        grids = Grids(cfg.width, cfg.height)
        n = len(ctbs)
        for i, ctb in enumerate(ctbs):
            self._encode_ctb_syntax(enc, grids, ctb)
            enc.encode_terminate(1 if i == n - 1 else 0)
        enc.finish_slice()
        return bs.nal_unit(bs.NAL_IDR_W_RADL, w.data())

    def _encode_ctb_syntax(self, enc, grids: Grids, ctb: CtbInfo):
        cfg = self.cfg
        w, h = cfg.width, cfg.height
        cu0 = ctb.cus[0]
        sctx = grids.split_ctx(cu0.x, cu0.y, 0, w, h)
        enc.encode_bin(ctx.off("split_cu_flag", sctx), 1 if ctb.split else 0)
        for cu in ctb.cus:
            self._encode_cu_syntax(enc, grids, cu, 0 if not ctb.split else 1)

    def _encode_cu_syntax(self, enc, grids: Grids, cu: CuInfo, depth: int):
        cfg = self.cfg
        w, h = cfg.width, cfg.height
        sbh = cfg.sign_data_hiding
        if cu.size == 8:
            enc.encode_bin(ctx.off("part_size"), 0 if cu.nxn else 1)
        # (16x16 CU at depth 0 is not min size -> no part_mode)
        pus = 4 if cu.nxn else 1
        half = cu.size // 2
        flags = []
        for p in range(pus):
            px = cu.x + (p & 1) * (half if cu.nxn else 0)
            py = cu.y + (p >> 1) * (half if cu.nxn else 0)
            mpm = grids.mpm(px, py, w, h)
            mode = cu.modes[p]
            flags.append((mode in mpm, mpm, mode))
            enc.encode_bin(ctx.off("prev_intra_luma_pred"),
                           1 if mode in mpm else 0)
            # grids must evolve PU by PU for later-PU MPM derivation
            self._set_pu_mode(grids, cu, p)
        for in_mpm, mpm, mode in flags:
            if in_mpm:
                idx = mpm.index(mode)
                enc.encode_bypass(0 if idx == 0 else 1)
                if idx:
                    enc.encode_bypass(idx - 1)
            else:
                rem = mode
                for c in sorted(mpm, reverse=True):
                    if mode > c:
                        rem -= 1
                enc.encode_bypass_bins(rem, 5)
        enc.encode_bin(ctx.off("chroma_pred_mode"), 0)  # DM

        # transform tree
        cbf_cb = cu.levels_cb is not None
        cbf_cr = cu.levels_cr is not None
        enc.encode_bin(ctx.off("cbf_chroma"), 1 if cbf_cb else 0)
        enc.encode_bin(ctx.off("cbf_chroma"), 1 if cbf_cr else 0)
        if cu.nxn:
            for p in range(4):
                lv = cu.levels_y[p]
                enc.encode_bin(ctx.off("cbf_luma", 0), 0 if lv is None else 1)
                if lv is not None:
                    st = rom.intra_scan_type(2, cu.modes[p], True)
                    residual.encode_residual(enc, lv, 2, st, True,
                                             sign_hiding=sbh)
        else:
            lv = cu.levels_y[0]
            enc.encode_bin(ctx.off("cbf_luma", 1), 0 if lv is None else 1)
            if lv is not None:
                log2 = cu.size.bit_length() - 1
                st = rom.intra_scan_type(log2, cu.modes[0], True)
                residual.encode_residual(enc, lv, log2, st, True,
                                         sign_hiding=sbh)
        cs = max(cu.size // 2, 4)
        clog2 = cs.bit_length() - 1
        cst = rom.intra_scan_type(clog2, cu.modes[0], False)
        if cbf_cb:
            residual.encode_residual(enc, cu.levels_cb, clog2, cst, False,
                                     sign_hiding=sbh)
        if cbf_cr:
            residual.encode_residual(enc, cu.levels_cr, clog2, cst, False,
                                     sign_hiding=sbh)
        grids.set_cu(cu, depth)

    @staticmethod
    def _set_pu_mode(grids: Grids, cu: CuInfo, p: int):
        half = cu.size // 2 if cu.nxn else cu.size
        px = cu.x + (p & 1) * (half if cu.nxn else 0)
        py = cu.y + (p >> 1) * (half if cu.nxn else 0)
        s4 = half // 4 if cu.nxn else cu.size // 4
        gx, gy = px // 4, py // 4
        grids.mode[gy:gy + s4, gx:gx + s4] = cu.modes[p]
        grids.intra[gy:gy + s4, gx:gx + s4] = True


class QuadtreeIntraDecoder(ic.IntraDecoder):
    """Decoder for the quadtree all-intra streams (log2_min_cb == 3)."""

    def _decode_slice(self, rbsp: bytes, nal_type: int):
        cfg, pps = self.cfg, self.pps
        info = headers.parse_slice_header(rbsp, nal_type, pps,
                                          sps_sao=cfg.sao)
        qp = info.qp
        qp_c = ic.chroma_qp(qp)
        w, h = cfg.width, cfg.height
        data = rbsp[info.data_offset_bits // 8:]
        dec = cabac.CabacDecoder(bs.BitReader(data),
                                 ctx.init_states(ctx.I, qp))
        rec_y = np.zeros((h, w), np.int32)
        rec_u = np.zeros((h // 2, w // 2), np.int32)
        rec_v = np.zeros_like(rec_u)
        grids = Grids(w, h)
        sbh = pps.sign_data_hiding

        n_ctbs = (w // 16) * (h // 16)
        i = 0
        for cy in range(0, h, 16):
            for cx in range(0, w, 16):
                sctx = grids.split_ctx(cx, cy, 0, w, h)
                split = dec.decode_bin(ctx.off("split_cu_flag", sctx))
                subs = ([(cx, cy, 16)] if not split else
                        [(cx + (q & 1) * 8, cy + (q >> 1) * 8, 8)
                         for q in range(4)])
                for (x, yq, size) in subs:
                    self._decode_cu(dec, grids, rec_y, rec_u, rec_v,
                                    x, yq, size, qp, qp_c, sbh,
                                    1 if split else 0)
                i += 1
                end = dec.decode_terminate()
                assert end == (1 if i == n_ctbs else 0)
        if not pps.deblocking_disabled:
            bs_ver, bs_hor = _qt_bs_maps(grids.depth, w, h)
            rec_y, rec_u, rec_v = deblock_ops.deblock_420_bs_np(
                rec_y, rec_u, rec_v, qp, bs_ver, bs_hor, block=8)
        return rec_y, rec_u, rec_v

    def _decode_cu(self, dec, grids, rec_y, rec_u, rec_v, x, yq, size,
                   qp, qp_c, sbh, depth):
        cfg = self.cfg
        w, h = cfg.width, cfg.height
        nxn = False
        if size == 8:
            nxn = dec.decode_bin(ctx.off("part_size")) == 0
        pus = 4 if nxn else 1
        half = size // 2
        prev_flags = []
        modes = []
        for p in range(pus):
            prev_flags.append(dec.decode_bin(ctx.off("prev_intra_luma_pred")))
        for p in range(pus):
            px = x + (p & 1) * (half if nxn else 0)
            py = yq + (p >> 1) * (half if nxn else 0)
            mpm = grids.mpm(px, py, w, h)
            if prev_flags[p]:
                idx = 0 if dec.decode_bypass() == 0 else 1 + dec.decode_bypass()
                mode = mpm[idx]
            else:
                rem = dec.decode_bypass_bins(5)
                for c in sorted(mpm):
                    if rem >= c:
                        rem += 1
                mode = rem
            modes.append(mode)
            cu_t = CuInfo(x, yq, size, nxn, modes + [DC] * (pus - len(modes)))
            self._set_mode(grids, px, py, (half if nxn else size), mode)
        assert dec.decode_bin(ctx.off("chroma_pred_mode")) == 0
        cbf_cb = dec.decode_bin(ctx.off("cbf_chroma"))
        cbf_cr = dec.decode_bin(ctx.off("cbf_chroma"))

        if nxn:
            for p in range(4):
                px, py = x + (p & 1) * 4, yq + (p >> 1) * 4
                cbf = dec.decode_bin(ctx.off("cbf_luma", 0))
                lv = None
                if cbf:
                    st = rom.intra_scan_type(2, modes[p], True)
                    lv = residual.decode_residual(dec, 2, st, True,
                                                  sign_hiding=sbh)
                ref = build_ref_z(rec_y, px, py, 4, w, h)
                pred = intra_ops.predict_intra_np(ref, modes[p], 2)
                rec_y[py:py + 4, px:px + 4] = _recon(pred, lv, qp, 2, True)
        else:
            log2 = size.bit_length() - 1
            cbf = dec.decode_bin(ctx.off("cbf_luma", 1))
            lv = None
            if cbf:
                st = rom.intra_scan_type(log2, modes[0], True)
                lv = residual.decode_residual(dec, log2, st, True,
                                              sign_hiding=sbh)
            ref = build_ref_z(rec_y, x, yq, size, w, h)
            pred = intra_ops.predict_intra_np(ref, modes[0], log2)
            rec_y[yq:yq + size, x:x + size] = _recon(pred, lv, qp, log2, False)

        cs = max(size // 2, 4)
        clog2 = cs.bit_length() - 1
        cst = rom.intra_scan_type(clog2, modes[0], False)
        cx, cy = x // 2, yq // 2
        for comp, (cbf_c, plane) in enumerate(((cbf_cb, rec_u),
                                               (cbf_cr, rec_v))):
            lvc = None
            if cbf_c:
                lvc = residual.decode_residual(dec, clog2, cst, False,
                                               sign_hiding=sbh)
            refc = build_ref_z(plane, cx, cy, cs, w // 2, h // 2, ctb_shift=3)
            predc = intra_ops.predict_intra_np(refc, modes[0], clog2,
                                               is_luma=False)
            plane[cy:cy + cs, cx:cx + cs] = _recon(predc, lvc, qp_c, clog2,
                                                   False)
        dx, dy = x // 8, yq // 8
        s8 = max(size // 8, 1)
        grids.depth[dy:dy + s8, dx:dx + s8] = depth

    @staticmethod
    def _set_mode(grids, px, py, psize, mode):
        s4 = psize // 4
        gx, gy = px // 4, py // 4
        grids.mode[gy:gy + s4, gx:gx + s4] = mode
        grids.intra[gy:gy + s4, gx:gx + s4] = True


def _recon(pred, lv, qp, log2, dst):
    if lv is None:
        return pred.astype(np.int32)
    dq = quant_ops.dequantize_np(lv, qp, log2)
    r = tr_ops.inverse_transform_np(dq, log2, dst=dst)
    return np.clip(pred + r, 0, 255).astype(np.int32)
