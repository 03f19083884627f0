"""Device inter CU-quadtree (CTB32) for the random-access encoder — the
BD-rate upgrade over the flat 16x16 inter grid.

The round-2/3 device inter engine codes every picture as a flat grid of
16x16 CTBs; HM wins most of its rate at low bitrates with LARGE skip
CUs.  This module widens the emitted toolset to CTB32 streams:

  - IDR pictures use the device intra CU-quadtree (quadtree_codec
    .QuadtreeFastEncoder, CTB32 / CU 32/16/8 tree-DP) instead of the
    flat fast path;
  - B/P pictures keep the per-16 device decision (inter_jax
    .encode_b_frame_dev) and add a device TREE pass (qt_merge_dev):
    every aligned 32x32 region evaluates a small set of whole-region
    motion candidates (its children's MVs + zero) by true SSE + rate
    estimate against the sum of its children's costs, and collapses to
    one skip/no-residual CU32 when cheaper (HM TEncCu xCompressCU's
    2Nx2N-merge-at-higher-depth decision, made for all regions at once);
  - the host phase re-derives spec-exact merge-5 candidate lists with
    the PU-level machinery shared with the general decoder
    (motion_hm.py) and codes whichever syntax reproduces the
    device-decided motion: cu_skip/merge_idx when the MV is in the
    list, explicit 2Nx2N + AMVP MVD with rqt_root_cbf=0 otherwise — so
    approximation never breaks conformance, it only ever costs bits.

Streams are plain Main-profile: HM's TAppDecoder and our GeneralDecoder
both decode them bit-exactly (tests/test_inter_qt.py).

Parity references: hm-16.5rc1/source/Lib/TLibEncoder/TEncCu.cpp:349
xCompressCU (depth recursion + merge/skip early decision), TEncSearch
.cpp:2912 predInterSearch, TEncSbac.cpp (codeSplitFlag/codeSkipFlag/
codeMergeIndex ctx layout), TComDataCU.cpp getInterMergeCandidates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from video_codecs_tpu.entropy import bitstream as bs
from video_codecs_tpu.entropy import cabac, ctx, residual
from video_codecs_tpu.models.hevc import encoder_jax
from video_codecs_tpu.models.hevc import inter_codec as pc
from video_codecs_tpu.models.hevc import inter_jax
from video_codecs_tpu.models.hevc import motion_hm
from video_codecs_tpu.models.hevc import quadtree_codec
from video_codecs_tpu.models.hevc import ra_codec as ra
from video_codecs_tpu.models.hevc import intra_codec as ic
from video_codecs_tpu.models.hevc.intra_codec import chroma_qp
from video_codecs_tpu.ops import deblock as deblock_ops
from video_codecs_tpu.ops import interp
from video_codecs_tpu.utils import rom

L0, L1 = 0, 1
DC = 1
MODE_INTER, MODE_INTRA = 0, 1
NAL_TRAIL_N, NAL_TRAIL_R = 0, 1


# ---------------------------------------------------------------------------
# Device phase: 32x32 merge/skip tree decision + final recon
# ---------------------------------------------------------------------------

def _sse_blocks(a_plane, b_blocks, xs, ys, n):
    a = encoder_jax._extract_blocks(a_plane, xs, ys, n)
    d = (a - b_blocks).astype(jnp.int32)
    return jnp.sum(d * d, axis=(-2, -1))


def _coef_bits_blocks(coef_plane, xs, ys, n):
    """Cheap device-side coefficient-rate proxy per block: 2 bits per
    nonzero + 2 bits per magnitude doubling (Exp-Golomb-ish)."""
    lv = encoder_jax._extract_blocks(coef_plane, xs, ys, n)
    a = jnp.abs(lv)
    nnz = jnp.sum(a > 0, axis=(-2, -1))
    mag = jnp.sum(jnp.ceil(jnp.log2(1.0 + a.astype(jnp.float32))
                           ).astype(jnp.int32), axis=(-2, -1))
    return 2 * nnz + 2 * mag


def _pred_cand(refs_y_pair, r0, r1, xs, ys, n, dirs, mv0x, mv0y,
               mv1x, mv1y, has_l1, mc14):
    """Uni/bi prediction for per-block candidate motion (8-bit clipped);
    refs are [R, H, W] stacks with per-block ref indices r0/r1."""
    q0 = mc14(refs_y_pair[0], r0, xs, ys, mv0x, mv0y, n)
    if not has_l1:
        return jnp.clip((q0 + 32) >> 6, 0, 255).astype(jnp.int32)
    q1 = mc14(refs_y_pair[1], r1, xs, ys, mv1x, mv1y, n)
    return jnp.where(
        (dirs == 3)[:, None, None], interp.bi_average(q0, q1),
        jnp.where((dirs == 1)[:, None, None],
                  jnp.clip((q0 + 32) >> 6, 0, 255),
                  jnp.clip((q1 + 32) >> 6, 0, 255))).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("qp", "w", "h", "has_l1", "sbh", "rdoq", "deblock",
                     "lam"))
def qt_merge_dev(y, u, v, ref0_y, ref0_u, ref0_v, ref1_y, ref1_u, ref1_v,
                 st16, qp: int, w: int, h: int, has_l1: bool, sbh: bool,
                 rdoq: bool, deblock: bool = True,
                 lam: float | None = None):
    """Tree pass over the per-16 decision `st16` (encode_b_frame_dev
    output with deblock=False): decide skip-CU32 regions, substitute
    their prediction, re-run the intra wavefront on the final recon,
    and deblock.  Returns the final state + tree maps."""
    bw, bh = w // 16, h // 16
    nb = bw * bh
    g32w, g32h = bw // 2, bh // 2
    qp_c = chroma_qp(qp)
    yi = y.astype(jnp.int32)
    ui = u.astype(jnp.int32)
    vi = v.astype(jnp.int32)

    def stack3(p):
        p = p.astype(jnp.int32)
        return p[None] if p.ndim == 2 else p

    refs_y = [stack3(ref0_y), stack3(ref1_y)]
    refs_u = [stack3(ref0_u), stack3(ref1_u)]
    refs_v = [stack3(ref0_v), stack3(ref1_v)]
    if lam is None:
        lam = 0.85 * 2.0 ** ((qp - 12) / 3.0)

    x0 = jnp.tile(jnp.arange(bw, dtype=jnp.int32) * 16, bh)
    y0 = jnp.repeat(jnp.arange(bh, dtype=jnp.int32) * 16, bw)
    cx0, cy0 = x0 // 2, y0 // 2

    rec_y = st16["rec_y"].astype(jnp.int32)
    rec_u = st16["rec_u"].astype(jnp.int32)
    rec_v = st16["rec_v"].astype(jnp.int32)
    coef_y = st16["coef_y"].astype(jnp.int32)
    coef_u = st16["coef_u"].astype(jnp.int32)
    coef_v = st16["coef_v"].astype(jnp.int32)

    # ---- per-16 cost: true SSE of the coded result + the RDOQ's own
    # CABAC-rate estimate (exact-rate tree decision; ~8 bits of
    # mode/merge/cbf syntax overhead per CU) ----
    rec_blk = encoder_jax._extract_blocks(rec_y, x0, y0, 16)
    d16 = _sse_blocks(yi, rec_blk, x0, y0, 16)
    d16 = d16 + _sse_blocks(
        ui, encoder_jax._extract_blocks(rec_u, cx0, cy0, 8), cx0, cy0, 8)
    d16 = d16 + _sse_blocks(
        vi, encoder_jax._extract_blocks(rec_v, cx0, cy0, 8), cx0, cy0, 8)
    if "coef_bits" in st16:
        r16 = 8.0 + st16["coef_bits"].reshape(-1)
    else:
        r16 = (8 + _coef_bits_blocks(coef_y, x0, y0, 16) +
               _coef_bits_blocks(coef_u, cx0, cy0, 8) +
               _coef_bits_blocks(coef_v, cx0, cy0, 8)).astype(jnp.float32)
    cost16 = (d16 + jnp.round(lam * r16).astype(jnp.int32)).reshape(bh, bw)

    # ---- candidate motion per aligned 32x32 region ----
    pred_mode = st16["pred_mode"].astype(jnp.int32)
    fb_dir = 3 if has_l1 else 1
    is_inter = pred_mode == MODE_INTER
    dir_m = jnp.where(is_inter, st16["inter_dir"].astype(jnp.int32), 0)
    mv = {k: st16[k] for k in ("mv0x", "mv0y", "mv1x", "mv1y")}
    zg16 = jnp.zeros((bh, bw), jnp.int32)
    rf = {"r0": st16.get("ref0_idx", zg16.astype(jnp.int8))
          .astype(jnp.int32),
          "r1": st16.get("ref1_idx", zg16.astype(jnp.int8))
          .astype(jnp.int32)}

    def child(f, dy, dx):
        return f[dy::2, dx::2][:g32h, :g32w]

    cands = []
    for dy in (0, 1):
        for dx in (0, 1):
            d = child(dir_m, dy, dx)
            ok = d > 0
            cands.append(tuple(
                jnp.where(ok, child(mv[k], dy, dx), 0).reshape(-1)
                for k in ("mv0x", "mv0y", "mv1x", "mv1y")) +
                (jnp.where(ok, d, fb_dir).reshape(-1),) + tuple(
                jnp.where(ok, child(rf[k], dy, dx), 0).reshape(-1)
                for k in ("r0", "r1")))
    zg = jnp.zeros(g32h * g32w, jnp.int32)
    cands.append((zg, zg, zg, zg,
                  jnp.full(g32h * g32w, fb_dir, jnp.int32), zg, zg))

    x32 = jnp.tile(jnp.arange(g32w, dtype=jnp.int32) * 32, g32h)
    y32 = jnp.repeat(jnp.arange(g32h, dtype=jnp.int32) * 32, g32w)
    zr = jnp.zeros(g32h * g32w, jnp.int32)
    cur32 = encoder_jax._extract_blocks(yi, x32, y32, 32)
    cur32u = encoder_jax._extract_blocks(ui, x32 // 2, y32 // 2, 16)
    cur32v = encoder_jax._extract_blocks(vi, x32 // 2, y32 // 2, 16)

    INF = jnp.int32(1 << 30)
    best_cost = jnp.full(g32h * g32w, INF, jnp.int32)
    best = [zg, zg, zg, zg, jnp.full(g32h * g32w, fb_dir, jnp.int32),
            zg, zg]
    best_planes = None
    for c in cands:
        m0x, m0y, m1x, m1y, dirs, cr0, cr1 = c
        py32 = _pred_cand(refs_y, cr0, cr1, x32, y32, 32, dirs, m0x, m0y,
                          m1x, m1y, has_l1, interp.mc_luma14_multi)
        pu32 = _pred_cand(refs_u, cr0, cr1, x32 // 2, y32 // 2, 16, dirs,
                          m0x, m0y, m1x, m1y, has_l1,
                          interp.mc_chroma14_multi)
        pv32 = _pred_cand(refs_v, cr0, cr1, x32 // 2, y32 // 2, 16, dirs,
                          m0x, m0y, m1x, m1y, has_l1,
                          interp.mc_chroma14_multi)
        d = jnp.sum((cur32 - py32) ** 2, axis=(-2, -1)) + \
            jnp.sum((cur32u - pu32) ** 2, axis=(-2, -1)) + \
            jnp.sum((cur32v - pv32) ** 2, axis=(-2, -1))
        cost = d + jnp.round(lam * 14).astype(jnp.int32)
        better = cost < best_cost
        best_cost = jnp.where(better, cost, best_cost)
        best = [jnp.where(better, a, b) for a, b in zip(c, best)]
        sel = better[:, None, None]
        if best_planes is None:
            best_planes = (py32, pu32, pv32)
        else:
            best_planes = tuple(jnp.where(sel, n_, o_) for n_, o_ in
                                zip((py32, pu32, pv32), best_planes))

    # ---- residual-coded CU32 candidate: code the best whole-region
    # prediction's residual as an RQT split to 4 TU16 (TEncSearch
    # xEstimateInterResidualQT at depth 1), with the RDOQ's exact-rate
    # estimate; regions may now merge with cbf != 0 ----
    def to16(a, n):
        g = a.shape[0]
        return (a.reshape(g, 2, n, 2, n).transpose(0, 1, 3, 2, 4)
                .reshape(g * 4, n, n))

    cur16m = to16(cur32, 16)
    pred16m = to16(best_planes[0], 16)
    lv16y, rec16y, cbf16y, rbits_y = encoder_jax._code_blocks_rate(
        cur16m, pred16m, qp, 4, sbh=sbh, rdoq="full" if rdoq else rdoq,
        lam=lam)
    cur8u = to16(cur32u, 8)
    pred8u = to16(best_planes[1], 8)
    lv8u, rec8u, cbf8u, rbits_u = encoder_jax._code_blocks_rate(
        cur8u, pred8u, qp_c, 3, sbh=sbh, rdoq="full" if rdoq else rdoq,
        is_luma=False, lam=lam)
    cur8v = to16(cur32v, 8)
    pred8v = to16(best_planes[2], 8)
    lv8v, rec8v, cbf8v, rbits_v = encoder_jax._code_blocks_rate(
        cur8v, pred8v, qp_c, 3, sbh=sbh, rdoq="full" if rdoq else rdoq,
        is_luma=False, lam=lam)

    def per_region(a):
        return jnp.sum(a.reshape(-1, 4), axis=1)

    d_res = per_region(jnp.sum((cur16m - rec16y) ** 2, axis=(-2, -1)) +
                       jnp.sum((cur8u - rec8u) ** 2, axis=(-2, -1)) +
                       jnp.sum((cur8v - rec8v) ** 2, axis=(-2, -1)))
    bits_res = per_region(rbits_y + rbits_u + rbits_v)
    any_cbf32 = per_region((cbf16y | cbf8u | cbf8v)
                           .astype(jnp.int32)) > 0
    # syntax overhead: ~20 bits (merge + split + cbf flags) vs ~7 for skip
    j_res = (d_res.astype(jnp.float32) + lam * (20.0 + bits_res)) \
        .astype(jnp.int32)
    j_skip = best_cost       # SSE + lam*14 from the candidate loop
    j_res = jnp.where(any_cbf32, j_res, INF)

    child_sum = (child(cost16, 0, 0) + child(cost16, 0, 1) +
                 child(cost16, 1, 0) + child(cost16, 1, 1)).reshape(-1)
    j_best32 = jnp.minimum(j_skip, j_res)
    merged = j_best32 <= child_sum                        # [G]
    res32 = merged & (j_res < j_skip)
    merged_g = merged.reshape(g32h, g32w)

    # ---- substitute merged regions into the final state ----
    m2 = jnp.zeros((bh, bw), bool)
    m2 = m2.at[:2 * g32h:2, :2 * g32w:2].set(merged_g)
    m2 = m2.at[:2 * g32h:2, 1:2 * g32w:2].set(merged_g)
    m2 = m2.at[1:2 * g32h:2, :2 * g32w:2].set(merged_g)
    m2 = m2.at[1:2 * g32h:2, 1:2 * g32w:2].set(merged_g)

    def up2(f32):
        f = jnp.zeros((bh, bw), f32.dtype)
        g = f32.reshape(g32h, g32w)
        for dy in (0, 1):
            for dx in (0, 1):
                f = f.at[dy:2 * g32h:2, dx:2 * g32w:2].set(g)
        return f

    fin_pred_mode = jnp.where(m2, MODE_INTER, pred_mode)
    fin_dir = jnp.where(m2, up2(best[4]), dir_m)
    fin_mv = {}
    for i, k in enumerate(("mv0x", "mv0y", "mv1x", "mv1y")):
        fin_mv[k] = jnp.where(m2, up2(best[i]), mv[k])
    fin_r0 = jnp.where(m2, up2(best[5]), rf["r0"])
    fin_r1 = jnp.where(m2, up2(best[6]), rf["r1"])

    def up2vals(v4):
        """[G*4] child-order values -> [bh, bw] map over covered blocks."""
        g = v4.reshape(g32h, g32w, 2, 2)
        f = jnp.zeros((bh, bw), v4.dtype)
        for dy in (0, 1):
            for dx in (0, 1):
                f = f.at[dy:2 * g32h:2, dx:2 * g32w:2].set(g[:, :, dy, dx])
        return f

    res2 = jnp.zeros((bh, bw), bool)
    res2g = res32.reshape(g32h, g32w)
    for dy in (0, 1):
        for dx in (0, 1):
            res2 = res2.at[dy:2 * g32h:2, dx:2 * g32w:2].set(res2g)
    cbf_y = jnp.where(m2, res2 & up2vals(cbf16y), st16["cbf_y"])
    cbf_cb = jnp.where(m2, res2 & up2vals(cbf8u), st16["cbf_cb"])
    cbf_cr = jnp.where(m2, res2 & up2vals(cbf8v), st16["cbf_cr"])

    def from16(a, n):
        g = a.shape[0] // 4
        return (a.reshape(g, 2, 2, n, n).transpose(0, 1, 3, 2, 4)
                .reshape(g, 2 * n, 2 * n))

    sel32 = merged
    use_res = res32[:, None, None]
    rec_y = inter_jax._scatter_blocks(
        rec_y, jnp.where(use_res, from16(rec16y, 16), best_planes[0]),
        x32, y32, 32, sel32)
    rec_u = inter_jax._scatter_blocks(
        rec_u, jnp.where(use_res, from16(rec8u, 8), best_planes[1]),
        x32 // 2, y32 // 2, 16, sel32)
    rec_v = inter_jax._scatter_blocks(
        rec_v, jnp.where(use_res, from16(rec8v, 8), best_planes[2]),
        x32 // 2, y32 // 2, 16, sel32)
    zero32y = jnp.zeros((g32h * g32w, 32, 32), jnp.int32)
    zero32c = jnp.zeros((g32h * g32w, 16, 16), jnp.int32)
    coef_y = inter_jax._scatter_blocks(
        coef_y, jnp.where(use_res, from16(lv16y, 16), zero32y),
        x32, y32, 32, sel32)
    coef_u = inter_jax._scatter_blocks(
        coef_u, jnp.where(use_res, from16(lv8u, 8), zero32c),
        x32 // 2, y32 // 2, 16, sel32)
    coef_v = inter_jax._scatter_blocks(
        coef_v, jnp.where(use_res, from16(lv8v, 8), zero32c),
        x32 // 2, y32 // 2, 16, sel32)

    # ---- intra blocks re-run on the FINAL recon (their neighbors may
    # have been replaced by merged-region prediction) ----
    intra_grid = (fin_pred_mode == MODE_INTRA)
    intra_modes = st16["intra_mode"].astype(jnp.int32)
    planes, cbfs = inter_jax._intra_wavefront(
        yi, ui, vi, intra_grid, intra_modes,
        (rec_y, rec_u, rec_v, coef_y, coef_u, coef_v),
        (jnp.where(intra_grid.reshape(-1), False, cbf_y.reshape(-1)),
         jnp.where(intra_grid.reshape(-1), False, cbf_cb.reshape(-1)),
         jnp.where(intra_grid.reshape(-1), False, cbf_cr.reshape(-1))),
        qp, qp_c, sbh, rdoq, bw, bh)
    rec_y, rec_u, rec_v, coef_y, coef_u, coef_v = planes
    cbf_y, cbf_cb, cbf_cr = (c.reshape(bh, bw) for c in cbfs)

    # ---- BS maps on the final fields ----
    pm = fin_pred_mode
    dirg = fin_dir
    m0x, m0y = fin_mv["mv0x"], fin_mv["mv0y"]
    m1x, m1y = fin_mv["mv1x"], fin_mv["mv1y"]
    tusplit = jnp.where(m2, False, st16.get(
        "tusplit", jnp.zeros((bh, bw), bool)))
    split8m = jnp.where(m2, False, st16.get(
        "split8", jnp.zeros((bh, bw), bool)))
    cbf_y8m = st16.get("cbf_y8", jnp.zeros((2 * bh, 2 * bw), bool))

    def up8(f):
        return jnp.repeat(jnp.repeat(f, 2, 0), 2, 1)

    # final per-8 motion: CU8-split blocks carry their own PU motion,
    # everything else repeats the CU16/CU32 field onto the 8 grid
    use8 = up8(split8m)
    z8 = jnp.zeros((2 * bh, 2 * bw), jnp.int32)
    dir8f = jnp.where(use8, st16.get("dir8", z8.astype(jnp.int8))
                      .astype(jnp.int32), up8(dirg))
    m0x8f = jnp.where(use8, st16.get("mv0x8", z8), up8(m0x))
    m0y8f = jnp.where(use8, st16.get("mv0y8", z8), up8(m0y))
    m1x8f = jnp.where(use8, st16.get("mv1x8", z8), up8(m1x))
    m1y8f = jnp.where(use8, st16.get("mv1y8", z8), up8(m1y))
    r0_8f = jnp.where(use8, st16.get("r0_8", z8.astype(jnp.int8))
                      .astype(jnp.int32), up8(fin_r0))
    r1_8f = jnp.where(use8, st16.get("r1_8", z8.astype(jnp.int8))
                      .astype(jnp.int32), up8(fin_r1))
    if deblock:
        # BS derivation at 8-sample granularity (spec 8.7.2.4 /
        # TComLoopFilter xGetBoundaryStrengthSingle): TU8-split and
        # CU8-split CUs create internal edges, and CU-boundary edges use
        # the cbf of the ADJACENT TU, not of the whole CU.  Use the
        # per-8 motion field (interior edge pairs of unsplit CUs then
        # have identical motion, leaving only the cbf condition) and
        # the per-TU effective cbf map.
        pm8, dir8 = up8(pm), dir8f
        m0x8, m0y8 = m0x8f, m0y8f
        m1x8, m1y8 = m1x8f, m1y8f
        eff8 = jnp.where(up8(tusplit | split8m), cbf_y8m, up8(cbf_y))

        def bs_pair8(sl_a, sl_b):
            a_i = (pm8 == MODE_INTRA)[sl_a]
            b_i = (pm8 == MODE_INTRA)[sl_b]
            intra2 = a_i | b_i
            diff_dir = dir8[sl_a] != dir8[sl_b]
            d0 = (jnp.abs(m0x8[sl_a] - m0x8[sl_b]) >= 4) | \
                 (jnp.abs(m0y8[sl_a] - m0y8[sl_b]) >= 4) | \
                 (r0_8f[sl_a] != r0_8f[sl_b])
            d1 = (jnp.abs(m1x8[sl_a] - m1x8[sl_b]) >= 4) | \
                 (jnp.abs(m1y8[sl_a] - m1y8[sl_b]) >= 4) | \
                 (r1_8f[sl_a] != r1_8f[sl_b])
            use0 = (dir8[sl_a] & 1) > 0
            mv_diff = jnp.where(dir8[sl_a] == 3, d0 | d1,
                                jnp.where(use0, d0, d1))
            one = eff8[sl_a] | eff8[sl_b] | diff_dir | mv_diff
            return jnp.where(intra2, 2,
                             jnp.where(one, 1, 0)).astype(jnp.int32)

        ver8 = bs_pair8(np.s_[:, :-1], np.s_[:, 1:]).T
        hor8 = bs_pair8(np.s_[:-1, :], np.s_[1:, :])
        # only TU/PU boundaries are filtered (spec 8.7.2.2): odd 8-grid
        # edges exist only inside TU8-split or CU8-split CUs
        inner = tusplit | split8m
        odd_ok_v = jnp.repeat(inner.T, 2, axis=1)         # [bw, bh8]
        ver8 = ver8.at[0::2].set(
            jnp.where(odd_ok_v, ver8[0::2], 0))
        odd_ok_h = jnp.repeat(inner, 2, axis=1)           # [bh, bw8]
        hor8 = hor8.at[0::2].set(
            jnp.where(odd_ok_h, hor8[0::2], 0))
        rec_y, rec_u, rec_v = deblock_ops.deblock_420_bs(
            rec_y, rec_u, rec_v, qp, ver8, hor8, block=8)

    return dict(
        merged32=merged_g,
        res32=res32.reshape(g32h, g32w),
        tusplit=tusplit,
        split8=split8m,
        dir8=dir8f.astype(jnp.int8),
        mv0x8=m0x8f, mv0y8=m0y8f, mv1x8=m1x8f, mv1y8=m1y8f,
        r0_8=r0_8f.astype(jnp.int8), r1_8=r1_8f.astype(jnp.int8),
        ref0_idx=fin_r0.astype(jnp.int8),
        ref1_idx=fin_r1.astype(jnp.int8),
        cbf_y8=st16.get("cbf_y8", jnp.zeros((2 * bh, 2 * bw), bool)),
        cbf_cb4=st16.get("cbf_cb4", jnp.zeros((2 * bh, 2 * bw), bool)),
        cbf_cr4=st16.get("cbf_cr4", jnp.zeros((2 * bh, 2 * bw), bool)),
        pred_mode=fin_pred_mode.astype(jnp.int8),
        intra_mode=intra_modes.astype(jnp.int8),
        inter_dir=fin_dir.astype(jnp.int8),
        mv0x=fin_mv["mv0x"], mv0y=fin_mv["mv0y"],
        mv1x=fin_mv["mv1x"], mv1y=fin_mv["mv1y"],
        cbf_y=cbf_y, cbf_cb=cbf_cb, cbf_cr=cbf_cr,
        coef_y=jnp.clip(coef_y, -32768, 32767).astype(jnp.int16),
        coef_u=jnp.clip(coef_u, -32768, 32767).astype(jnp.int16),
        coef_v=jnp.clip(coef_v, -32768, 32767).astype(jnp.int16),
        rec_y=rec_y.astype(jnp.uint8),
        rec_u=rec_u.astype(jnp.uint8),
        rec_v=rec_v.astype(jnp.uint8),
    )


@functools.partial(jax.jit, static_argnames=("ctb",))
def _sao_stats_jit(orig, rec, ctb: int):
    """Device SAO statistics of one (padded, CTB-multiple) plane."""
    from video_codecs_tpu.ops import sao as sao_ops
    return sao_ops.sao_stats_dev(orig, rec, ctb)


def _pad_to(a, m):
    h, w = a.shape
    ph, pw = -h % m, -w % m
    if ph or pw:
        a = np.pad(a, ((0, ph), (0, pw)), mode="edge")
    return a


# ---------------------------------------------------------------------------
# Host phase: spec-exact reconciliation + CABAC over the CU quadtree
# ---------------------------------------------------------------------------

class QtDeviceRandomAccessEncoder(ra.RandomAccessEncoder):
    """GOP-driven RA encoder emitting CTB32 streams: device intra
    quadtree for IDR, device per-16 inter decision + 32x32 skip-merge
    tree for B/P pictures, merge-5 syntax via motion_hm."""

    def __init__(self, cfg, gop: tuple = ra.GOP8_RA,
                 search_range: int = 64, me_method: str = "pyr",
                 cu8: bool = True, num_refs_active: int = 1) -> None:
        assert cfg.log2_ctb == 5 and cfg.log2_min_cb == 3 and \
            cfg.log2_max_tb == 5, "qt inter build is CTB32 (quadtree SPS)"
        assert cfg.width % 16 == 0 and cfg.height % 16 == 0
        cfg.tt_depth_inter = 1     # CU32 residuals code an RQT split
        self.cu8 = cu8
        #: active refs per list (HM GOPEntry num_ref_pics_active uses 2;
        #: our device ref-choice approximations currently measure ~6 BD
        #: points WORSE with 2 than 1 on foreman, so 1 is the default
        #: until ref selection runs on true RD — the 2-ref machinery is
        #: conformant and tested)
        self.num_refs_active = num_refs_active
        super().__init__(cfg, gop, search_range, me_method)
        self._qt_intra = quadtree_codec.QuadtreeFastEncoder(cfg)
        # HM I-slice lambda scale: 0.57*(1 - 0.05*NumberBFrames)
        # (TEncSlice.cpp:323) -> stronger pyramid base
        nbf = self.gop_size - 1
        self._qt_intra.lam_scale = 1.0 - min(0.5, 0.05 * nbf)

    def encode_frame(self, y, u, v, *args, **kwargs):
        """IDR via the device intra CU-quadtree (CTB32 geometry)."""
        return self._qt_intra.encode_frame_fast(y, u, v)

    def _encode_b_frame(self, frame, poc, refs, is_anchor):
        e = next((e for e in self.gop
                  if (poc - e.poc) % self.gop_size == 0), None)
        self._cur_is_ref = e is None or e.temporal_id < 3
        cfg = self.cfg
        y, u, v = frame
        l0, l1 = getattr(self, "_cur_ref_lists", None) or (
            [(refs[L0][0], refs[L0][1])],
            [(refs[L1][0], refs[L1][1])] if L1 in refs else [])
        has_l1 = bool(l1)
        ref_pocs = [[p for p, _ in l0], [p for p, _ in l1]]

        def stack(lst, c):
            return jnp.asarray(np.stack(
                [np.asarray(planes[c], np.int32) for _, planes in lst]))

        args = [stack(l0, 0), stack(l0, 1), stack(l0, 2)]
        args += [stack(l1 or l0, 0), stack(l1 or l0, 1),
                 stack(l1 or l0, 2)]
        lam = inter_jax._gop_lambda(self, poc)
        no_backward = all(p < poc for lst in ref_pocs for p in lst)
        if cfg.temporal_mvp:
            col_poc = (ref_pocs[1][0] if has_l1 else ref_pocs[0][0])
            tf = self._tmvp_fields(col_poc, poc, ref_pocs)
            qt = self._device_phase(y, u, v, args, has_l1, lam,
                                    tmvp_fields=tf,
                                    no_backward=no_backward)
        else:
            qt = self._device_phase(y, u, v, args, has_l1, lam)
        sao_params = None
        if cfg.sao:
            sao_params = self._sao_decide_qt(
                (np.asarray(y), np.asarray(u), np.asarray(v)), qt, lam)
        qt = {k: np.asarray(val) for k, val in qt.items()}
        if sao_params is not None:
            from video_codecs_tpu.ops import sao as sao_ops
            qt["rec_y"] = sao_ops.apply_frame(
                qt["rec_y"], sao_params, 32, 0).astype(np.uint8)
            qt["rec_u"] = sao_ops.apply_frame(
                qt["rec_u"], sao_params, 16, 1).astype(np.uint8)
            qt["rec_v"] = sao_ops.apply_frame(
                qt["rec_v"], sao_params, 16, 2).astype(np.uint8)

        slice_nal = self._serialize_qt_slice(qt, poc, is_anchor,
                                             ref_pocs, sao_params)
        if cfg.temporal_mvp:
            self._store_motion(qt, poc, ref_pocs)
        rec = tuple(qt[k].astype(np.int32)
                    for k in ("rec_y", "rec_u", "rec_v"))
        sei_nal = self._hash_sei(*rec)
        return [slice_nal, sei_nal], rec

    # ---- TMVP support: per-picture motion storage + device fields ----

    def _store_motion(self, qt, poc, ref_pocs):
        """Retain the picture's final 8-grid motion as the collocated
        source (spec-identical to what any decoder reconstructs from
        the stream; 8-grid repeat == the 4x4 field since every PU is
        >= 8 samples)."""
        mots = getattr(self, "_motion", None)
        if mots is None:
            mots = self._motion = {}
        d8 = qt["dir8"].astype(np.int32)
        intra8 = np.repeat(np.repeat(
            qt["pred_mode"].astype(np.int32) == MODE_INTRA, 2, 0), 2, 1)
        rp = [np.asarray(ref_pocs[0], np.int32),
              np.asarray(ref_pocs[1] or [0], np.int32)]
        r0 = qt.get("r0_8", np.zeros_like(d8)).astype(np.int32)
        r1 = qt.get("r1_8", np.zeros_like(d8)).astype(np.int32)
        mots[poc] = dict(
            poc=poc,
            inter=(~intra8) & (d8 > 0),
            pf0=(~intra8) & ((d8 & 1) > 0),
            pf1=(~intra8) & ((d8 & 2) > 0),
            mv0x=qt["mv0x8"].astype(np.int32),
            mv0y=qt["mv0y8"].astype(np.int32),
            mv1x=qt["mv1x8"].astype(np.int32),
            mv1y=qt["mv1y8"].astype(np.int32),
            r0=r0, r1=r1,
            rp0=rp[0][np.clip(r0, 0, len(rp[0]) - 1)],
            rp1=rp[1][np.clip(r1, 0, len(rp[1]) - 1)])
        if len(mots) > 20:
            for k in sorted(mots)[:-20]:
                del mots[k]

    def _tmvp_fields(self, col_poc, poc, ref_pocs):
        """Device TMVP candidate inputs from the stored collocated
        motion, compressed to the 16 grid (top-left 4x4 per 16x16 —
        spec 8.5.3.2.8 / TComCUMvField::compress)."""
        m = getattr(self, "_motion", {}).get(col_poc)
        cfg = self.cfg
        bw, bh = cfg.width // 16, cfg.height // 16
        if m is None:
            z = jnp.zeros((bh, bw), jnp.int32)
            return (jnp.zeros((bh, bw), bool), z, z, z, z,
                    jnp.zeros((bh, bw), bool), jnp.zeros((bh, bw), bool),
                    z, z, jnp.int32(0), jnp.int32(poc),
                    jnp.int32(ref_pocs[0][0]),
                    jnp.int32(ref_pocs[1][0] if ref_pocs[1]
                              else ref_pocs[0][0]))

        def c16(a):
            return jnp.asarray(np.ascontiguousarray(a[::2, ::2]))

        return (c16(m["inter"]), c16(m["mv0x"]), c16(m["mv0y"]),
                c16(m["mv1x"]), c16(m["mv1y"]), c16(m["pf0"]),
                c16(m["pf1"]), c16(m["rp0"]), c16(m["rp1"]),
                jnp.int32(m["poc"]), jnp.int32(poc),
                jnp.int32(ref_pocs[0][0]),
                jnp.int32(ref_pocs[1][0] if ref_pocs[1]
                          else ref_pocs[0][0]))

    def _col_picmotion(self, col_poc):
        """motion_hm.PicMotion view of the stored collocated picture
        (serializer + decoder-parity TMVP derivation).  An unknown POC
        (the IDR) maps to an all-intra field — exactly the decoder's
        view, so candidate lists stay in lockstep."""
        cfg = self.cfg
        m = getattr(self, "_motion", {}).get(col_poc)
        if m is None:
            pm = motion_hm.PicMotion(cfg.width, cfg.height, col_poc)
            pm.intra[:] = True
            pm.decoded[:] = True
            return pm
        pm = motion_hm.PicMotion(cfg.width, cfg.height, m["poc"])

        def up(a):
            return np.repeat(np.repeat(a, 2, 0), 2, 1)

        pm.pf[0] = up(m["pf0"])
        pm.pf[1] = up(m["pf1"])
        pm.mv[0, :, :, 0] = up(m["mv0x"])
        pm.mv[0, :, :, 1] = up(m["mv0y"])
        pm.mv[1, :, :, 0] = up(m["mv1x"])
        pm.mv[1, :, :, 1] = up(m["mv1y"])
        pm.ref_idx[0] = np.where(pm.pf[0], up(m["r0"]), -1)
        pm.ref_idx[1] = np.where(pm.pf[1], up(m["r1"]), -1)
        pm.ref_poc[0] = up(m["rp0"])
        pm.ref_poc[1] = up(m["rp1"])
        pm.intra[:] = up(~m["inter"])
        pm.decoded[:] = True
        return pm

    def _device_phase(self, y, u, v, args, has_l1, lam,
                      tmvp_fields=None, no_backward=False):
        """Full device pipeline of one B picture: per-16 decision +
        CU8 tree + 32 merge tree + deblock.  The multichip dryrun
        overrides this with a tile-sharded twin (pad -> compute ->
        crop); the host serializer consumes either's qt dict."""
        cfg = self.cfg
        st16 = inter_jax.encode_b_frame_dev(
            jnp.asarray(y), jnp.asarray(u), jnp.asarray(v), *args,
            qp=cfg.qp, w=cfg.width, h=cfg.height, has_l1=has_l1,
            search_range=self.search_range, sbh=cfg.sign_data_hiding,
            rdoq=True, me_method=self.me_method, deblock=False,
            allow_intra=False, merge_eval="best4", lam=lam, rqt=True,
            cu8=self.cu8, tmvp_fields=tmvp_fields,
            no_backward=no_backward)
        return qt_merge_dev(
            jnp.asarray(y), jnp.asarray(u), jnp.asarray(v), *args, st16,
            qp=cfg.qp, w=cfg.width, h=cfg.height, has_l1=has_l1,
            sbh=cfg.sign_data_hiding, rdoq=True,
            deblock=not cfg.deblocking_disabled, lam=lam)

    def _sao_decide_qt(self, origs, qt, lam):
        """Per-CTB32 SAO decision for the qt B path: classification +
        stats batched on device (_sao_stats_jit), tiny per-CTU offset
        search on host (TEncSampleAdaptiveOffset::decideBlkParams
        analog; chroma shares type/EO-class per the sao() syntax)."""
        from video_codecs_tpu.ops import sao as sao_ops

        cfg = self.cfg
        if not lam:
            lam = 0.85 * 2.0 ** ((cfg.qp - 12) / 3.0)
        n_ctb = cfg.ctbs_x * cfg.ctbs_y
        stats = []
        for comp, ctb in ((0, 32), (1, 16), (2, 16)):
            o = _pad_to(np.asarray(origs[comp], np.int32), ctb)
            r = _pad_to(np.asarray(qt["rec_y" if comp == 0 else
                                      ("rec_u" if comp == 1 else
                                       "rec_v")], np.int32), ctb)
            stats.append([np.asarray(a) for a in
                          _sao_stats_jit(jnp.asarray(o), jnp.asarray(r),
                                         ctb)])
        params = [[None] * 3 for _ in range(n_ctb)]
        for by in range(cfg.ctbs_y):
            for bx in range(cfg.ctbs_x):
                i = by * cfg.ctbs_x + bx
                ec, es, bc, bsum = stats[0]
                params[i][0] = sao_ops.decide_from_stats(
                    ec[:, :, by, bx], es[:, :, by, bx], bc[:, by, bx],
                    bsum[:, by, bx], lam)
                ec, es, bc, bsum = stats[1]
                cb = sao_ops.decide_from_stats(
                    ec[:, :, by, bx], es[:, :, by, bx], bc[:, by, bx],
                    bsum[:, by, bx], lam)
                ec, es, bc, bsum = stats[2]
                if cb.type_idx == sao_ops.SAO_EO:
                    cr = sao_ops.decide_eo_from_stats(
                        ec[:, :, by, bx], es[:, :, by, bx],
                        cb.eo_class, lam)
                elif cb.type_idx == sao_ops.SAO_BO:
                    cr = sao_ops.decide_bo_from_stats(
                        bc[:, by, bx], bsum[:, by, bx], lam)
                else:
                    cr = sao_ops.SaoParam()
                params[i][1], params[i][2] = cb, cr
        return params

    # ---- serializer ----

    def _serialize_qt_slice(self, qt, poc, is_anchor, ref_pocs,
                            sao_params=None) -> bytes:
        cfg = self.cfg
        rps = getattr(self, "_cur_rps", None)
        if rps is None:
            neg = [(p - poc, True) for p in ref_pocs[0] if p < poc]
            pos = [(p - poc, True) for p in ref_pocs[1] if p > poc]
            rps = (neg, pos)
        n0 = len(ref_pocs[0])
        n1 = max(1, len(ref_pocs[1]))
        w = ra.write_ra_slice_header(cfg, poc, 1 if is_anchor else 0,
                                     cfg.qp, *rps, n0=n0, n1=n1)
        enc = cabac.CabacEncoder(
            w, ctx.init_states(ctx.P if is_anchor else ctx.B, cfg.qp))

        col = None
        if cfg.temporal_mvp:
            col = self._col_picmotion(
                ref_pocs[1][0] if ref_pocs[1] else ref_pocs[0][0])
        st = _QtSliceState(cfg, qt, poc, is_anchor, ref_pocs, col)
        n_ctbs = cfg.ctbs_x * cfg.ctbs_y
        i = 0
        for cy in range(0, cfg.height, 32):
            for cx in range(0, cfg.width, 32):
                if sao_params is not None:
                    ic.encode_sao_ctu(enc, sao_params, i, cx // 32,
                                      cy // 32, cfg.ctbs_x, 0)
                self._code_qt_node(enc, st, cx, cy, 5)
                i += 1
                enc.encode_terminate(1 if i == n_ctbs else 0)
        enc.finish_slice()
        nal_type = NAL_TRAIL_R if getattr(self, "_cur_is_ref", True) \
            else NAL_TRAIL_N
        return bs.nal_unit(nal_type, w.data())

    def _code_qt_node(self, enc, st, x, y, log2):
        cfg = self.cfg
        size = 1 << log2
        inside = x + size <= cfg.width and y + size <= cfg.height
        if inside and log2 == 5:
            split = not bool(st.qt["merged32"][y // 32, x // 32])
            enc.encode_bin(ctx.off("split_cu_flag", st.split_ctx(x, y, 0)),
                           1 if split else 0)
            if not split:
                self._code_cu(enc, st, x, y, 32)
                return
        elif not inside:
            # implicit split (boundary CTB); recurse into valid children
            pass
        if log2 == 4:
            if inside:
                # min CB is 8: an explicit split flag at 16 (CU8 tree)
                sp8 = bool(st.qt.get("split8") is not None and
                           st.qt["split8"][y // 16, x // 16])
                enc.encode_bin(
                    ctx.off("split_cu_flag", st.split_ctx(x, y, 1)),
                    1 if sp8 else 0)
                if sp8:
                    for q in range(4):
                        self._code_cu8(enc, st, x + (q & 1) * 8,
                                       y + (q >> 1) * 8)
                else:
                    self._code_cu(enc, st, x, y, 16)
            return
        half = size // 2
        for q in range(4):
            nx, ny = x + (q & 1) * half, y + (q >> 1) * half
            if nx >= cfg.width or ny >= cfg.height:
                continue
            self._code_qt_node(enc, st, nx, ny, log2 - 1)

    def _code_cu(self, enc, st, x, y, size):
        cfg = self.cfg
        qt = st.qt
        bx, by = x // 16, y // 16
        nblk = size // 16
        depth = 5 - size.bit_length() + 1       # 0 at 32, 1 at 16
        st.set_depth(x, y, size, 0 if size == 32 else 1)
        if qt["pred_mode"][by, bx] == MODE_INTRA:
            self._code_intra_cu(enc, st, x, y)
            return
        d = int(qt["inter_dir"][by, bx])
        r0i = int(qt["ref0_idx"][by, bx]) if "ref0_idx" in qt else 0
        r1i = int(qt["ref1_idx"][by, bx]) if "ref1_idx" in qt else 0
        m = motion_hm.Motion(
            [bool(d & 1), bool(d & 2)],
            [(int(qt["mv0x"][by, bx]), int(qt["mv0y"][by, bx])),
             (int(qt["mv1x"][by, bx]), int(qt["mv1y"][by, bx]))],
            [r0i if d & 1 else -1, r1i if d & 2 else -1],
            [st.ref_pocs[L0][r0i] if d & 1 else 0,
             st.ref_pocs[L1][r1i] if d & 2 else 0])
        cands = motion_hm.merge_candidates_pu(
            st.pm, st.mctx, x, y, size, size, "2Nx2N", 0, cfg.log2_ctb)
        midx = next((i for i, c in enumerate(cands)
                     if c.same_motion(m)), -1)
        cbfs = [bool(qt[k][by:by + nblk, bx:bx + nblk].any())
                for k in ("cbf_y", "cbf_cb", "cbf_cr")]
        no_res = not any(cbfs)

        skip = midx >= 0 and no_res
        enc.encode_bin(ctx.off("skip_flag", st.skip_ctx(x, y)),
                       1 if skip else 0)
        if skip:
            self._code_merge_idx(enc, midx)
            st.set_inter(x, y, size, m, skip=True)
            return
        enc.encode_bin(ctx.off("pred_mode"), 0)
        enc.encode_bin(ctx.off("part_size"), 1)     # PART_2Nx2N
        enc.encode_bin(ctx.off("merge_flag"), 1 if midx >= 0 else 0)
        if midx >= 0:
            self._code_merge_idx(enc, midx)
            # 2Nx2N merge non-skip: rqt_root_cbf inferred 1
            assert not no_res, "no-residual merge must be skip"
        else:
            if not st.is_anchor:
                # inter_pred_idc, ctx = CU depth (sizes >= 16 -> 2 forms)
                if d == 3:
                    enc.encode_bin(ctx.off("inter_dir", depth), 1)
                else:
                    enc.encode_bin(ctx.off("inter_dir", depth), 0)
                    enc.encode_bin(ctx.off("inter_dir", 4),
                                   0 if d == 1 else 1)
            for lx in (L0, L1):
                if not m.pf[lx]:
                    continue
                self._code_ref_idx(enc, m.ref_idx[lx],
                                   len(st.ref_pocs[lx]))
                amvp = motion_hm.amvp_candidates_pu(
                    st.pm, st.mctx, x, y, size, size, lx, m.ref_idx[lx],
                    cfg.log2_ctb)
                mvds = [(m.mv[lx][0] - p[0], m.mv[lx][1] - p[1])
                        for p in amvp]
                bits = [pc.mvd_bits_estimate(dd) for dd in mvds]
                mi = 0 if bits[0] <= bits[1] else 1
                self._encode_mvd(enc, mvds[mi])
                enc.encode_bin(ctx.off("mvp_idx"), mi)
            enc.encode_bin(ctx.off("qt_root_cbf"), 0 if no_res else 1)
            if no_res:
                st.set_inter(x, y, size, m, skip=False)
                return
        # transform tree (spec 7.3.8.8, mirrored by GeneralDecoder
        # _decode_tt_inter): CU32 splits to 4 TU16; CU16 is TU == CU
        if size == 32:
            self._write_tt32(enc, st, x, y)
        elif bool(qt.get("tusplit") is not None and
                  qt["tusplit"][by, bx]):
            self._write_tt16_split(enc, st, x, y)
        else:
            if self.cfg.tt_depth_inter > 0:
                # trafoDepth 0 < MaxDepth: explicit non-split at 16
                enc.encode_bin(ctx.off("trans_subdiv", 1), 0)
            cbf_y, cbf_cb, cbf_cr = cbfs
            enc.encode_bin(ctx.off("cbf_chroma"), 1 if cbf_cb else 0)
            enc.encode_bin(ctx.off("cbf_chroma"), 1 if cbf_cr else 0)
            if cbf_cb or cbf_cr:
                enc.encode_bin(ctx.off("cbf_luma", 1), 1 if cbf_y else 0)
            else:
                assert cbf_y
            self._write_tu16(enc, st, x, y, cbf_y, cbf_cb, cbf_cr)
        st.set_inter(x, y, size, m, skip=False)

    def _code_cu8(self, enc, st, x, y):
        """One 8x8 CU of a split 16 (min CB): 2Nx2N PU with its own
        motion, TU8 luma + 4x4 chroma (spec 7.3.8.5; GeneralDecoder
        _decode_cu/_decode_inter_cu/_decode_tt_inter at log2 3)."""
        cfg = self.cfg
        qt = st.qt
        gy, gx = y // 8, x // 8
        st.set_depth(x, y, 8, 2)
        d = int(qt["dir8"][gy, gx])
        r0i = int(qt["r0_8"][gy, gx]) if "r0_8" in qt else 0
        r1i = int(qt["r1_8"][gy, gx]) if "r1_8" in qt else 0
        m = motion_hm.Motion(
            [bool(d & 1), bool(d & 2)],
            [(int(qt["mv0x8"][gy, gx]), int(qt["mv0y8"][gy, gx])),
             (int(qt["mv1x8"][gy, gx]), int(qt["mv1y8"][gy, gx]))],
            [r0i if d & 1 else -1, r1i if d & 2 else -1],
            [st.ref_pocs[L0][r0i] if d & 1 else 0,
             st.ref_pocs[L1][r1i] if d & 2 else 0])
        cands = motion_hm.merge_candidates_pu(
            st.pm, st.mctx, x, y, 8, 8, "2Nx2N", 0, cfg.log2_ctb)
        midx = next((i for i, c in enumerate(cands)
                     if c.same_motion(m)), -1)
        cbf_y = bool(qt["cbf_y8"][gy, gx])
        cbf_cb = bool(qt["cbf_cb4"][gy, gx])
        cbf_cr = bool(qt["cbf_cr4"][gy, gx])
        no_res = not (cbf_y or cbf_cb or cbf_cr)

        skip = midx >= 0 and no_res
        enc.encode_bin(ctx.off("skip_flag", st.skip_ctx(x, y)),
                       1 if skip else 0)
        if skip:
            self._code_merge_idx(enc, midx)
            st.set_inter(x, y, 8, m, skip=True)
            return
        enc.encode_bin(ctx.off("pred_mode"), 0)
        enc.encode_bin(ctx.off("part_size"), 1)     # PART_2Nx2N
        enc.encode_bin(ctx.off("merge_flag"), 1 if midx >= 0 else 0)
        if midx >= 0:
            self._code_merge_idx(enc, midx)
            assert not no_res, "no-residual merge must be skip"
        else:
            if not st.is_anchor:
                if d == 3:
                    enc.encode_bin(ctx.off("inter_dir", 2), 1)
                else:
                    enc.encode_bin(ctx.off("inter_dir", 2), 0)
                    enc.encode_bin(ctx.off("inter_dir", 4),
                                   0 if d == 1 else 1)
            for lx in (L0, L1):
                if not m.pf[lx]:
                    continue
                self._code_ref_idx(enc, m.ref_idx[lx],
                                   len(st.ref_pocs[lx]))
                amvp = motion_hm.amvp_candidates_pu(
                    st.pm, st.mctx, x, y, 8, 8, lx, m.ref_idx[lx],
                    cfg.log2_ctb)
                mvds = [(m.mv[lx][0] - p[0], m.mv[lx][1] - p[1])
                        for p in amvp]
                bits = [pc.mvd_bits_estimate(dd) for dd in mvds]
                mi = 0 if bits[0] <= bits[1] else 1
                self._encode_mvd(enc, mvds[mi])
                enc.encode_bin(ctx.off("mvp_idx"), mi)
            enc.encode_bin(ctx.off("qt_root_cbf"), 0 if no_res else 1)
            if no_res:
                st.set_inter(x, y, 8, m, skip=False)
                return
        # transform tree: TU8 (explicit non-split), chroma 4x4
        enc.encode_bin(ctx.off("trans_subdiv", 2), 0)
        enc.encode_bin(ctx.off("cbf_chroma", 0), 1 if cbf_cb else 0)
        enc.encode_bin(ctx.off("cbf_chroma", 0), 1 if cbf_cr else 0)
        if cbf_cb or cbf_cr:
            enc.encode_bin(ctx.off("cbf_luma", 1), 1 if cbf_y else 0)
        else:
            assert cbf_y
        sbh = cfg.sign_data_hiding
        if cbf_y:
            residual.encode_residual(
                enc, qt["coef_y"][y:y + 8, x:x + 8].astype(np.int32),
                3, rom.SCAN_DIAG, True, sign_hiding=sbh)
        cx, cy = x // 2, y // 2
        if cbf_cb:
            residual.encode_residual(
                enc, qt["coef_u"][cy:cy + 4, cx:cx + 4].astype(np.int32),
                2, rom.SCAN_DIAG, False, sign_hiding=sbh)
        if cbf_cr:
            residual.encode_residual(
                enc, qt["coef_v"][cy:cy + 4, cx:cx + 4].astype(np.int32),
                2, rom.SCAN_DIAG, False, sign_hiding=sbh)
        st.set_inter(x, y, 8, m, skip=False)

    def _write_tt16_split(self, enc, st, x, y):
        """CU16 transform tree split to 4 TU8 luma + 4x4 chroma per
        child (encoder RQT depth 1; GeneralDecoder _decode_tt_inter)."""
        qt = st.qt
        sbh = self.cfg.sign_data_hiding
        bx, by = x // 16, y // 16
        enc.encode_bin(ctx.off("trans_subdiv", 1), 1)
        cb_p = bool(qt["cbf_cb"][by, bx])
        cr_p = bool(qt["cbf_cr"][by, bx])
        enc.encode_bin(ctx.off("cbf_chroma", 0), 1 if cb_p else 0)
        enc.encode_bin(ctx.off("cbf_chroma", 0), 1 if cr_p else 0)
        for q in range(4):
            sx, sy = x + (q & 1) * 8, y + (q >> 1) * 8
            gy, gx = sy // 8, sx // 8
            cb = bool(qt["cbf_cb4"][gy, gx])
            cr = bool(qt["cbf_cr4"][gy, gx])
            if cb_p:
                enc.encode_bin(ctx.off("cbf_chroma", 1), 1 if cb else 0)
            else:
                assert not cb
            if cr_p:
                enc.encode_bin(ctx.off("cbf_chroma", 1), 1 if cr else 0)
            else:
                assert not cr
            cy_ = bool(qt["cbf_y8"][gy, gx])
            enc.encode_bin(ctx.off("cbf_luma", 0), 1 if cy_ else 0)
            if cy_:
                residual.encode_residual(
                    enc, qt["coef_y"][sy:sy + 8, sx:sx + 8]
                    .astype(np.int32), 3, rom.SCAN_DIAG, True,
                    sign_hiding=sbh)
            ccx, ccy = sx // 2, sy // 2
            if cb:
                residual.encode_residual(
                    enc, qt["coef_u"][ccy:ccy + 4, ccx:ccx + 4]
                    .astype(np.int32), 2, rom.SCAN_DIAG, False,
                    sign_hiding=sbh)
            if cr:
                residual.encode_residual(
                    enc, qt["coef_v"][ccy:ccy + 4, ccx:ccx + 4]
                    .astype(np.int32), 2, rom.SCAN_DIAG, False,
                    sign_hiding=sbh)

    def _write_tt32(self, enc, st, x, y):
        """CU32 transform tree: split_transform_flag=1 + 4 TU16 children
        (chroma 8x8 per child, parent-conditioned cbf flags)."""
        qt = st.qt
        bx, by = x // 16, y // 16
        enc.encode_bin(ctx.off("trans_subdiv", 0), 1)
        cb_p = bool(qt["cbf_cb"][by:by + 2, bx:bx + 2].any())
        cr_p = bool(qt["cbf_cr"][by:by + 2, bx:bx + 2].any())
        enc.encode_bin(ctx.off("cbf_chroma", 0), 1 if cb_p else 0)
        enc.encode_bin(ctx.off("cbf_chroma", 0), 1 if cr_p else 0)
        for q in range(4):
            sx, sy = x + (q & 1) * 16, y + (q >> 1) * 16
            sbx, sby = sx // 16, sy // 16
            cb = bool(qt["cbf_cb"][sby, sbx])
            cr = bool(qt["cbf_cr"][sby, sbx])
            if cb_p:
                enc.encode_bin(ctx.off("cbf_chroma", 1), 1 if cb else 0)
            else:
                assert not cb
            if cr_p:
                enc.encode_bin(ctx.off("cbf_chroma", 1), 1 if cr else 0)
            else:
                assert not cr
            cy_ = bool(qt["cbf_y"][sby, sbx])
            enc.encode_bin(ctx.off("cbf_luma", 0), 1 if cy_ else 0)
            self._write_tu16(enc, st, sx, sy, cy_, cb, cr)

    def _code_intra_cu(self, enc, st, x, y):
        cfg = self.cfg
        qt = st.qt
        bx, by = x // 16, y // 16
        enc.encode_bin(ctx.off("skip_flag", st.skip_ctx(x, y)), 0)
        enc.encode_bin(ctx.off("pred_mode"), 1)
        # intra CU at 16 is NOT min CB (8): no part_size bin
        mode = int(qt["intra_mode"][by, bx])
        mpm = st.mpm(x, y)
        if mode in mpm:
            enc.encode_bin(ctx.off("prev_intra_luma_pred"), 1)
            idx = mpm.index(mode)
            enc.encode_bypass(0 if idx == 0 else 1)
            if idx:
                enc.encode_bypass(idx - 1)
        else:
            enc.encode_bin(ctx.off("prev_intra_luma_pred"), 0)
            rem = mode
            for c in sorted(mpm, reverse=True):
                if mode > c:
                    rem -= 1
            enc.encode_bypass_bins(rem, 5)
        enc.encode_bin(ctx.off("chroma_pred_mode"), 0)   # DM
        cbf_y = bool(qt["cbf_y"][by, bx])
        cbf_cb = bool(qt["cbf_cb"][by, bx])
        cbf_cr = bool(qt["cbf_cr"][by, bx])
        enc.encode_bin(ctx.off("cbf_chroma"), 1 if cbf_cb else 0)
        enc.encode_bin(ctx.off("cbf_chroma"), 1 if cbf_cr else 0)
        enc.encode_bin(ctx.off("cbf_luma", 1), 1 if cbf_y else 0)
        self._write_tu16(enc, st, x, y, cbf_y, cbf_cb, cbf_cr)
        st.set_intra(x, y, 16, mode)

    def _write_tu16(self, enc, st, x, y, cbf_y, cbf_cb, cbf_cr):
        sbh = self.cfg.sign_data_hiding
        qt = st.qt
        if cbf_y:
            residual.encode_residual(
                enc, qt["coef_y"][y:y + 16, x:x + 16].astype(np.int32),
                4, rom.SCAN_DIAG, True, sign_hiding=sbh)
        cx, cy = x // 2, y // 2
        if cbf_cb:
            residual.encode_residual(
                enc, qt["coef_u"][cy:cy + 8, cx:cx + 8].astype(np.int32),
                3, rom.SCAN_DIAG, False, sign_hiding=sbh)
        if cbf_cr:
            residual.encode_residual(
                enc, qt["coef_v"][cy:cy + 8, cx:cx + 8].astype(np.int32),
                3, rom.SCAN_DIAG, False, sign_hiding=sbh)

    def _code_ref_idx(self, enc, idx: int, nref: int) -> None:
        """TR ref_idx_lX: bins 0/1 ctx-coded, rest bypass (mirror of
        GeneralDecoder._parse_ref_idx / TDecSbac parseRefFrmIdx)."""
        if nref <= 1:
            return
        enc.encode_bin(ctx.off("ref_idx", 0), 1 if idx > 0 else 0)
        if idx == 0:
            return
        k = 1
        while k < nref - 1:
            b = 1 if idx > k else 0
            if k == 1:
                enc.encode_bin(ctx.off("ref_idx", 1), b)
            else:
                enc.encode_bypass(b)
            if not b:
                break
            k += 1

    def _code_merge_idx(self, enc, idx: int) -> None:
        pc.LowDelayEncoder._encode_merge_idx(self, enc, idx)

    _encode_mvd = pc.LowDelayEncoder._encode_mvd


class _QtSliceState:
    """Per-slice serializer state: spec motion grid + depth/mode maps."""

    def __init__(self, cfg, qt, poc, is_anchor, ref_pocs, col=None):
        self.cfg = cfg
        self.qt = qt
        self.is_anchor = is_anchor
        self.ref_pocs = ref_pocs
        self.pm = motion_hm.PicMotion(cfg.width, cfg.height, poc)
        no_backward = all(p <= poc for lst in ref_pocs for p in lst)
        self.mctx = motion_hm.SliceMotionCtx(
            poc, ref_pocs, not is_anchor,
            cfg.merge_cands, cfg.temporal_mvp and col is not None, col,
            False, no_backward)
        self.depth8 = np.zeros((cfg.height // 8, cfg.width // 8), np.int32)
        self.mode4 = np.full((cfg.height // 4, cfg.width // 4), DC,
                             np.int32)

    def split_ctx(self, x, y, depth):
        c = 0
        if x > 0 and self.depth8[y // 8, (x - 1) // 8] > depth:
            c += 1
        if y > 0 and self.depth8[(y - 1) // 8, x // 8] > depth:
            c += 1
        return c

    def set_depth(self, x, y, size, depth):
        s8 = size // 8
        self.depth8[y // 8:y // 8 + s8, x // 8:x // 8 + s8] = depth

    def skip_ctx(self, x, y):
        pm = self.pm
        c = 0
        gx, gy = x // 4, y // 4
        if x > 0 and pm.decoded[gy, gx - 1] and pm.skip[gy, gx - 1]:
            c += 1
        if y > 0 and pm.decoded[gy - 1, gx] and pm.skip[gy - 1, gx]:
            c += 1
        return c

    def set_inter(self, x, y, size, m, skip):
        self.pm.set_pu(x, y, size, size, m)
        if skip:
            self.pm.skip[y // 4:(y + size) // 4, x // 4:(x + size) // 4] \
                = True

    def set_intra(self, x, y, size, mode):
        self.pm.set_intra(x, y, size)
        s4 = size // 4
        self.mode4[y // 4:y // 4 + s4, x // 4:x // 4 + s4] = mode

    def mpm(self, x, y):
        """Spec MPM (twin of the general decoder's _PicState.mpm; CTB-row
        clamp for the above neighbor)."""
        pm = self.pm

        def mode_at(sx, sy, clamp_ctb):
            if sx < 0 or sy < 0 or sx >= self.cfg.width or \
                    sy >= self.cfg.height:
                return DC
            if clamp_ctb and (sy >> self.cfg.log2_ctb) != \
                    (y >> self.cfg.log2_ctb):
                return DC
            if not pm.decoded[sy // 4, sx // 4] or \
                    not pm.intra[sy // 4, sx // 4]:
                return DC
            return int(self.mode4[sy // 4, sx // 4])

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
