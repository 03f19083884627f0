"""HEVC scalar quantization / dequantization, batched and bit-exact.

Parity reference: hm-16.5rc1/source/Lib/TLibCommon/TComTrQuant.cpp —
xQuant (:1126, non-RDOQ branch) and xDeQuant (:1314, no scaling lists).
Both are elementwise over coefficient blocks, so they batch over any leading
axes and fuse into the surrounding transform matmuls under XLA.

QP parameterisation (QpParam): per = qp // 6, rem = qp % 6.
Forward:  level = sign * ((|c| * quantScale[rem] + add) >> qBits),
          qBits = 14 + per + transformShift,
          add   = (I-slice ? 171 : 85) << (qBits - 9).
Inverse:  rightShift = 6 - (transformShift + per); with the standard clip of
          the input level to 16 bits and output to the transform dynamic range.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from video_codecs_tpu.utils.devconst import dev_const

from video_codecs_tpu.utils import rom


def transform_shift(log2_size: int, bit_depth: int = 8) -> int:
    return rom.MAX_TR_DYNAMIC_RANGE - bit_depth - log2_size


def quantize(coeff: jnp.ndarray, qp: int, log2_size: int, *,
             intra_slice: bool = True, bit_depth: int = 8) -> jnp.ndarray:
    """Quantize coefficient blocks [..., N, N] int32 -> levels int32."""
    per, rem = qp // 6, qp % 6
    q_bits = rom.QUANT_SHIFT + per + transform_shift(log2_size, bit_depth)
    add = (171 if intra_slice else 85) << (q_bits - 9)
    scale = int(rom.QUANT_SCALES[rem])
    # int32 is sufficient: |c| <= 32767, scale <= 26214, add < 2^26, so the
    # intermediate stays below 2^30 (HM uses Int64 out of caution).
    c = coeff.astype(jnp.int32)
    mag = (jnp.abs(c) * scale + add) >> q_bits
    lim = 1 << rom.MAX_TR_DYNAMIC_RANGE
    level = jnp.clip(jnp.sign(c) * mag, -lim, lim - 1)
    return level.astype(jnp.int32)


def dequantize(level: jnp.ndarray, qp: int, log2_size: int, *,
               bit_depth: int = 8) -> jnp.ndarray:
    """Dequantize levels [..., N, N] int32 -> coefficients int32."""
    per, rem = qp // 6, qp % 6
    right_shift = rom.IQUANT_SHIFT - (transform_shift(log2_size, bit_depth) + per)
    scale = int(rom.INV_QUANT_SCALES[rem])
    lim = 1 << rom.MAX_TR_DYNAMIC_RANGE
    q = jnp.clip(level.astype(jnp.int32), -32768, 32767)
    if right_shift > 0:
        add = 1 << (right_shift - 1)
        c = (q * scale + add) >> right_shift
    else:
        c = (q * scale) << (-right_shift)
    return jnp.clip(c, -lim, lim - 1).astype(jnp.int32)


def _rate_bits(levels):
    """Crude per-level rate model (bits x 8 fixed point): sig+sign+Golomb."""
    import numpy as _n
    a = _n.abs(levels.astype(_n.float64))
    return _n.where(a == 0, 0.0, 2.0 + _n.log2(a + 1.0))


def rdoq_lite(coeff: jnp.ndarray, qp: int, log2_size: int, *,
              lam: float, bit_depth: int = 8,
              lam_scale: float = 2.0) -> jnp.ndarray:
    """Device twin of rdoq_lite_np: per-coefficient floor/ceil/zero
    choice by J = D_td + lambda_td * R, fully elementwise (jit-safe).
    Distortion squared in f32 (decisions may differ from the f64 host
    twin on ties; both emit valid levels)."""
    per, rem = qp // 6, qp % 6
    q_bits = rom.QUANT_SHIFT + per + transform_shift(log2_size, bit_depth)
    scale = int(rom.QUANT_SCALES[rem])
    c = coeff.astype(jnp.int32)
    mag = jnp.abs(c)
    l_floor = (mag * scale) >> q_bits
    # lam_scale: rate-model calibration (the crude per-level bit estimate
    # undercounts).  2.0 was the fixed-16x16 path's QP-sweep optimum; the
    # quadtree path measures better at 1.0 (its tree decision already
    # charges rate) and passes its own value.
    lam_td = float(lam_scale) * float(lam) * float(
        4 ** (15 - bit_depth - log2_size))

    def cost(lv):
        dq = dequantize(lv, qp, log2_size, bit_depth=bit_depth)
        d = (mag - dq).astype(jnp.float32) ** 2
        a = jnp.abs(lv).astype(jnp.float32)
        r = jnp.where(a == 0, 0.0, 2.0 + jnp.log2(a + 1.0))
        return d + jnp.float32(lam_td) * r

    l0 = jnp.clip(l_floor, 0, (1 << 15) - 1)
    l1 = jnp.clip(l_floor + 1, 0, (1 << 15) - 1)
    best = jnp.where(cost(l1) < cost(l0), l1, l0)
    return (jnp.sign(c) * best).astype(jnp.int32)


def rdoq_lite_np(coeff: np.ndarray, qp: int, log2_size: int, *,
                 lam: float, bit_depth: int = 8,
                 lam_scale: float = 1.0) -> np.ndarray:
    """Soft-decision quantization (RDOQ-lite).

    Parity reference (behavioral): HM xRateDistOptQuant TComTrQuant.cpp:2129.
    Per coefficient, choose between floor and ceil levels (and zero) by
    J = D_td + lambda_td * R with exact dequant distortion in the transform
    domain; lambda scaled by the transform gain 4^(15-bd-log2). Skips the
    CG/last-position optimization of full RDOQ (roadmap), which keeps it a
    pure elementwise op.
    """
    per, rem = qp // 6, qp % 6
    q_bits = rom.QUANT_SHIFT + per + transform_shift(log2_size, bit_depth)
    scale = int(rom.QUANT_SCALES[rem])
    c = coeff.astype(np.int64)
    mag = np.abs(c)
    l_floor = (mag * scale) >> q_bits
    lam_td = lam_scale * lam * float(4 ** (15 - bit_depth - log2_size))

    best_l = np.zeros_like(l_floor)
    best_j = None
    for delta in (0, 1):
        l = np.clip(l_floor + delta, 0, (1 << 15) - 1)
        dq = dequantize_np(l.astype(np.int32), qp, log2_size,
                           bit_depth=bit_depth)
        d = (mag - dq.astype(np.int64)) ** 2
        j = d.astype(np.float64) + lam_td * _rate_bits(l)
        if best_j is None:
            best_l, best_j = l, j
        else:
            take = j < best_j
            best_l = np.where(take, l, best_l)
            best_j = np.where(take, j, best_j)
    return (np.sign(c) * best_l).astype(np.int32)


def apply_sbh_np(levels: np.ndarray, log2_size: int,
                 coeff: np.ndarray | None = None, qp: int | None = None,
                 scan_type: int | None = None,
                 bit_depth: int = 8) -> np.ndarray:
    """Sign-data-hiding parity fix (encoder side, host twin).

    Per 4x4 coefficient group with lastSig-firstSig >= 4 in scan order, the
    sign of the first significant coefficient is inferred from the parity
    of the absolute-level sum (spec 7.3.8.11).  With the original
    coefficients `coeff` + `qp` given, the parity-fixing +-1 move is chosen
    by minimum transform-domain distortion delta (HM signBitHidingHDQ,
    TComTrQuant.cpp:991); otherwise a cheap heuristic is used.
    """
    from video_codecs_tpu.utils import rom

    n = 1 << log2_size
    if scan_type is None:
        scan_type = rom.SCAN_DIAG
    scan = rom.scan_order(log2_size, scan_type)
    flat = levels.reshape(-1).copy()
    coeffs = flat[scan]
    orig = coeff.reshape(-1)[scan] if coeff is not None else None
    for cg in range(0, n * n, 16):
        c = coeffs[cg:cg + 16]
        nz = np.nonzero(c)[0]
        if nz.size == 0 or nz[-1] - nz[0] < 4:
            continue
        sum_abs = int(np.abs(c).sum())
        neg = c[nz[0]] < 0
        if (sum_abs & 1) == (1 if neg else 0):
            continue
        if orig is None:
            big = nz[np.abs(c[nz]) >= 2]
            if big.size:
                pos = big[-1]
                c[pos] -= np.sign(c[pos])
            else:
                c[nz[0]] += -1 if neg else 1
            continue
        o = orig[cg:cg + 16]
        first, last = int(nz[0]), int(nz[-1])
        lmag = np.abs(c).astype(np.int64)
        cmag = np.abs(o).astype(np.float64)

        def dq(lv):
            return dequantize_np(lv.astype(np.int32), qp, log2_size,
                                 bit_depth=bit_depth).astype(np.float64)

        err0 = (cmag - dq(lmag)) ** 2
        cost_inc = (cmag - dq(lmag + 1)) ** 2 - err0
        cost_dec = (cmag - dq(np.maximum(lmag - 1, 0))) ** 2 - err0
        pos_r = np.arange(16)
        in_span = (pos_r >= first) & (pos_r <= last)
        interior = (pos_r > first) & (pos_r < last)
        inc_ok = in_span
        dec_ok = (lmag >= 2) | ((lmag == 1) & interior)
        big = 1e30
        cand = np.concatenate([np.where(inc_ok, cost_inc, big),
                               np.where(dec_ok, cost_dec, big)])
        best = int(np.argmin(cand))
        is_dec = best >= 16
        p = best - 16 if is_dec else best
        if c[p] != 0:
            c[p] += (-1 if is_dec else 1) * np.sign(c[p])
        else:
            c[p] = -1 if o[p] < 0 else 1
    out = np.zeros_like(flat)
    out[scan] = coeffs
    return out.reshape(n, n)


def _sbh_fix_cgs(coeffs: jnp.ndarray, orig: jnp.ndarray, qp: int,
                 log2_size: int, bit_depth: int = 8) -> jnp.ndarray:
    """SBH parity fix over scan-ordered coefficient groups [..., G, 16].

    HM signBitHidingHDQ semantics (TComTrQuant.cpp:991): when the parity
    of the CG's absolute-level sum disagrees with the sign to hide, apply
    the single +-1 level change with the SMALLEST transform-domain
    distortion delta against the original coefficients `orig` (scan order,
    same shape).  Candidate moves keep the CG's first/last significant
    positions intact so the hidden-sign condition re-derives identically.
    """
    sig = coeffs != 0
    pos = jnp.arange(16, dtype=jnp.int32)
    first = jnp.min(jnp.where(sig, pos, 16), axis=-1)
    last = jnp.max(jnp.where(sig, pos, -1), axis=-1)
    hidden = (last - first) >= 4
    sum_abs = jnp.sum(jnp.abs(coeffs), axis=-1)
    first_c = jnp.minimum(first, 15)
    first_val = jnp.take_along_axis(coeffs, first_c[..., None], axis=-1)[..., 0]
    neg = first_val < 0
    mismatch = hidden & ((sum_abs & 1) != neg.astype(jnp.int32))

    lmag = jnp.abs(coeffs)
    cmag = jnp.abs(orig).astype(jnp.float32)

    def dq(lv):
        return dequantize(lv, qp, log2_size,
                          bit_depth=bit_depth).astype(jnp.float32)

    err0 = (cmag - dq(lmag)) ** 2
    cost_inc = (cmag - dq(lmag + 1)) ** 2 - err0
    cost_dec = (cmag - dq(jnp.maximum(lmag - 1, 0))) ** 2 - err0

    interior = (pos > first[..., None]) & (pos < last[..., None])
    in_span = (pos >= first[..., None]) & (pos <= last[..., None])
    inc_ok = in_span
    dec_ok = (lmag >= 2) | ((lmag == 1) & interior)

    big = jnp.float32(1e30)
    cand = jnp.concatenate([jnp.where(inc_ok, cost_inc, big),
                            jnp.where(dec_ok, cost_dec, big)], axis=-1)
    best = jnp.argmin(cand, axis=-1)
    is_dec = best >= 16
    bpos = jnp.where(is_dec, best - 16, best)

    cur = jnp.take_along_axis(coeffs, bpos[..., None], axis=-1)[..., 0]
    cur_o = jnp.take_along_axis(orig, bpos[..., None], axis=-1)[..., 0]
    new_sign = jnp.where(cur != 0, jnp.sign(cur),
                         jnp.where(cur_o < 0, -1, 1))
    delta = jnp.where(is_dec, -1, 1) * new_sign
    newval = jnp.where(cur != 0, cur + jnp.where(is_dec, -1, 1) * jnp.sign(cur),
                       delta)
    adj = jnp.where(mismatch, newval - cur, 0)
    return coeffs + adj[..., None] * (pos == bpos[..., None])


def apply_sbh(levels: jnp.ndarray, log2_size: int, coeff: jnp.ndarray,
              qp: int, bit_depth: int = 8) -> jnp.ndarray:
    """Vectorized SBH parity fix over [..., N, N] level blocks (device),
    diagonal scan (the only scan for TBs > 8x8 luma / 4x4 chroma).
    `coeff` = original transform coefficients (same shape) for the
    minimum-distortion move selection."""
    from video_codecs_tpu.utils import rom

    n = 1 << log2_size
    scan = dev_const(rom.scan_order(log2_size, rom.SCAN_DIAG))
    shp = levels.shape[:-2]
    flat = levels.reshape(shp + (n * n,))
    cflat = coeff.reshape(shp + (n * n,))
    cgs = flat[..., scan].reshape(shp + (-1, 16))
    ocgs = cflat[..., scan].reshape(shp + (-1, 16))
    cgs = _sbh_fix_cgs(cgs, ocgs, qp, log2_size, bit_depth)
    out = jnp.zeros_like(flat)
    out = out.at[..., scan].set(cgs.reshape(shp + (n * n,)))
    return out.reshape(levels.shape)


def apply_sbh_scan(levels: jnp.ndarray, log2_size: int,
                   scan_type: jnp.ndarray, coeff: jnp.ndarray,
                   qp: int, bit_depth: int = 8) -> jnp.ndarray:
    """SBH parity fix with a per-block coefficient scan (device).

    levels: [B, N, N]; scan_type: [B] int32 in {SCAN_DIAG, SCAN_HOR,
    SCAN_VER}.  Needed for 8x8 luma and 4x4 chroma intra TBs, whose scan
    is mode-dependent (spec 7.4.9.11) and determines the CG grouping the
    sign-hiding parity is computed over.
    """
    from video_codecs_tpu.utils import rom

    n = 1 << log2_size
    scans = np.stack([rom.scan_order(log2_size, t) for t in range(3)])
    invs = np.argsort(scans, axis=-1).astype(np.int32)  # raster -> scan pos
    shp = levels.shape[:-2]
    flat = levels.reshape(shp + (n * n,))
    cflat = coeff.reshape(shp + (n * n,))
    perm = dev_const(scans)[scan_type]                # [B, n*n]
    cgs = jnp.take_along_axis(flat, perm, axis=-1).reshape(shp + (-1, 16))
    ocgs = jnp.take_along_axis(cflat, perm, axis=-1).reshape(shp + (-1, 16))
    cgs = _sbh_fix_cgs(cgs, ocgs, qp, log2_size, bit_depth)
    out_scan = cgs.reshape(shp + (n * n,))
    inv = dev_const(invs)[scan_type]
    out = jnp.take_along_axis(out_scan, inv, axis=-1)
    return out.reshape(levels.shape)


def quantize_np(coeff: np.ndarray, qp: int, log2_size: int, *,
                intra_slice: bool = True, bit_depth: int = 8) -> np.ndarray:
    per, rem = qp // 6, qp % 6
    q_bits = rom.QUANT_SHIFT + per + transform_shift(log2_size, bit_depth)
    add = (171 if intra_slice else 85) << (q_bits - 9)
    scale = int(rom.QUANT_SCALES[rem])
    c = coeff.astype(np.int64)
    mag = (np.abs(c) * scale + add) >> q_bits
    lim = 1 << rom.MAX_TR_DYNAMIC_RANGE
    return np.clip(np.sign(c) * mag, -lim, lim - 1).astype(np.int32)


def dequantize_np(level: np.ndarray, qp: int, log2_size: int, *,
                  bit_depth: int = 8) -> np.ndarray:
    per, rem = qp // 6, qp % 6
    right_shift = rom.IQUANT_SHIFT - (transform_shift(log2_size, bit_depth) + per)
    scale = int(rom.INV_QUANT_SCALES[rem])
    lim = 1 << rom.MAX_TR_DYNAMIC_RANGE
    q = np.clip(level.astype(np.int64), -32768, 32767)
    if right_shift > 0:
        add = 1 << (right_shift - 1)
        c = (q * scale + add) >> right_shift
    else:
        c = (q * scale) << (-right_shift)
    return np.clip(c, -lim, lim - 1).astype(np.int32)
