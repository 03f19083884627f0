"""HEVC sub-pel interpolation + motion compensation (spec 8.5.4.2.2).

Parity reference: hm-16.5rc1/source/Lib/TLibCommon/TComInterpolationFilter.cpp
— 8-tap luma / 4-tap chroma DCT-IF coefficient tables (:57-65), templated
filterHor/filterVer (:350-392).

Batched over blocks: each block carries its own integer MV + fractional
phase; gathers are clamped to the picture (edge replication, equivalent to
HM's margin padding).  All arithmetic int32, 14-bit intermediate domain:
    shift1 = BitDepth-8 (=0), shift2 = 6, shift3 = 14-BitDepth (=6),
    final uni-pred: (pred14 + 32) >> 6, clipped.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# frac -> 8 taps (TComInterpolationFilter.cpp:57)
LUMA_FILTERS = np.array([
    [0, 0, 0, 64, 0, 0, 0, 0],
    [-1, 4, -10, 58, 17, -5, 1, 0],
    [-1, 4, -11, 40, 40, -11, 4, -1],
    [0, 1, -5, 17, 58, -10, 4, -1]], np.int32)

# frac (1/8) -> 4 taps (TComInterpolationFilter.cpp:64)
CHROMA_FILTERS = np.array([
    [0, 64, 0, 0],
    [-2, 58, 10, -2],
    [-4, 54, 16, -2],
    [-6, 46, 28, -4],
    [-4, 36, 36, -4],
    [-4, 28, 46, -6],
    [-2, 16, 54, -4],
    [-2, 10, 58, -2]], np.int32)


def _taps_dev(luma: bool):
    """Filter-tap constants, freshly materialized from numpy per trace
    (cached CONCRETE jnp constants break jax-0.9 cache-hit dispatch —
    see utils/devconst.py)."""
    return jnp.asarray(LUMA_FILTERS if luma else CHROMA_FILTERS)


def _gather_window(ref: jnp.ndarray, x0, y0, w: int, h: int) -> jnp.ndarray:
    """[B, h, w] windows at integer (x0, y0), edge-replicated."""
    hh, ww = ref.shape
    rows = jnp.clip(y0[:, None, None] +
                    jnp.arange(h, dtype=jnp.int32)[None, :, None], 0, hh - 1)
    cols = jnp.clip(x0[:, None, None] +
                    jnp.arange(w, dtype=jnp.int32)[None, None, :], 0, ww - 1)
    return ref[rows, cols]


def mc_luma(ref: jnp.ndarray, x0, y0, mvx, mvy, n: int) -> jnp.ndarray:
    """Spec-exact luma MC [B, n, n]: two 8-tap stages, standard shifts.

    The unified two-pass path is exact for every phase: full-pel taps are
    a single 64, and *64 followed by >>6 is lossless, so the integer-MV
    and single-direction cases reduce to the spec formulas bit-exactly.
    (x0, y0): block positions; (mvx, mvy): quarter-pel MVs, per block.
    """
    ix = x0 + (mvx >> 2)
    iy = y0 + (mvy >> 2)
    fx = mvx & 3
    fy = mvy & 3
    win = _gather_window(ref.astype(jnp.int32), ix - 3, iy - 3, n + 7, n + 7)
    taps = _taps_dev(True)
    fh = taps[fx]
    fv = taps[fy]
    cols = jnp.stack([win[:, :, i:i + n] for i in range(8)], axis=-1)
    hor = jnp.einsum("byxi,bi->byx", cols, fh)    # >> shift1 (=0); 14-bit
    rows = jnp.stack([hor[:, i:i + n, :] for i in range(8)], axis=-1)
    ver = jnp.einsum("byxi,bi->byx", rows, fv)    # 20-bit
    pred14 = ver >> 6                              # shift2
    out = jnp.clip((pred14 + 32) >> 6, 0, 255)
    return out.astype(jnp.int32)


def mc_chroma(ref: jnp.ndarray, x0, y0, mvx, mvy, n: int) -> jnp.ndarray:
    """Chroma MC: 1/8-pel MVs (= luma quarter-pel MV used directly in
    chroma sample units), 4-tap filters, taps -1..+2."""
    ix = x0 + (mvx >> 3)
    iy = y0 + (mvy >> 3)
    fx = mvx & 7
    fy = mvy & 7
    win = _gather_window(ref.astype(jnp.int32), ix - 1, iy - 1, n + 3, n + 3)
    taps = _taps_dev(False)
    fh = taps[fx]
    fv = taps[fy]
    cols = jnp.stack([win[:, :, i:i + n] for i in range(4)], axis=-1)
    hor = jnp.einsum("byxi,bi->byx", cols, fh)
    rows = jnp.stack([hor[:, i:i + n, :] for i in range(4)], axis=-1)
    ver = jnp.einsum("byxi,bi->byx", rows, fv)
    pred14 = ver >> 6
    out = jnp.clip((pred14 + 32) >> 6, 0, 255)
    return out.astype(jnp.int32)


def _gather_window_multi(refs: jnp.ndarray, ridx, x0, y0, w: int,
                         h: int) -> jnp.ndarray:
    """[B, h, w] windows from stacked planes refs [R, H, W]: block b reads
    plane ridx[b] at integer (x0[b], y0[b]), edge-replicated."""
    hh, ww = refs.shape[-2:]
    rows = jnp.clip(y0[:, None, None] +
                    jnp.arange(h, dtype=jnp.int32)[None, :, None], 0, hh - 1)
    cols = jnp.clip(x0[:, None, None] +
                    jnp.arange(w, dtype=jnp.int32)[None, None, :], 0, ww - 1)
    return refs[ridx[:, None, None], rows, cols]


def _mc_luma14_core(win: jnp.ndarray, fx, fy, n: int) -> jnp.ndarray:
    """Two-stage 8-tap filtering of gathered [B, n+7, n+7] windows into the
    14-bit intermediate domain (no final shift)."""
    taps = _taps_dev(True)
    fh = taps[fx]
    fv = taps[fy]
    cols = jnp.stack([win[:, :, i:i + n] for i in range(8)], axis=-1)
    hor = jnp.einsum("byxi,bi->byx", cols, fh)
    rows = jnp.stack([hor[:, i:i + n, :] for i in range(8)], axis=-1)
    return jnp.einsum("byxi,bi->byx", rows, fv) >> 6


def mc_luma14_multi(refs: jnp.ndarray, ridx, x0, y0, mvx, mvy,
                    n: int) -> jnp.ndarray:
    """Luma MC to the 14-bit domain from stacked references [R, H, W] with
    a per-block reference index (bi-pred hypothesis / WP input)."""
    ix = x0 + (mvx >> 2)
    iy = y0 + (mvy >> 2)
    win = _gather_window_multi(refs.astype(jnp.int32), ridx,
                               ix - 3, iy - 3, n + 7, n + 7)
    return _mc_luma14_core(win, mvx & 3, mvy & 3, n)


def mc_luma_multi(refs: jnp.ndarray, ridx, x0, y0, mvx, mvy,
                  n: int) -> jnp.ndarray:
    """Spec-exact uni-pred luma MC from stacked references [R, H, W]."""
    p14 = mc_luma14_multi(refs, ridx, x0, y0, mvx, mvy, n)
    return jnp.clip((p14 + 32) >> 6, 0, 255).astype(jnp.int32)


def _mc_chroma14_core(win: jnp.ndarray, fx, fy, n: int) -> jnp.ndarray:
    taps = _taps_dev(False)
    fh = taps[fx]
    fv = taps[fy]
    cols = jnp.stack([win[:, :, i:i + n] for i in range(4)], axis=-1)
    hor = jnp.einsum("byxi,bi->byx", cols, fh)
    rows = jnp.stack([hor[:, i:i + n, :] for i in range(4)], axis=-1)
    return jnp.einsum("byxi,bi->byx", rows, fv) >> 6


def mc_chroma14_multi(refs: jnp.ndarray, ridx, x0, y0, mvx, mvy,
                      n: int) -> jnp.ndarray:
    ix = x0 + (mvx >> 3)
    iy = y0 + (mvy >> 3)
    win = _gather_window_multi(refs.astype(jnp.int32), ridx,
                               ix - 1, iy - 1, n + 3, n + 3)
    return _mc_chroma14_core(win, mvx & 7, mvy & 7, n)


def mc_chroma_multi(refs: jnp.ndarray, ridx, x0, y0, mvx, mvy,
                    n: int) -> jnp.ndarray:
    p14 = mc_chroma14_multi(refs, ridx, x0, y0, mvx, mvy, n)
    return jnp.clip((p14 + 32) >> 6, 0, 255).astype(jnp.int32)


def bi_average(p0_14: jnp.ndarray, p1_14: jnp.ndarray) -> jnp.ndarray:
    """Default bi-pred combine (spec 8.5.4.2.3.2): both hypotheses in the
    14-bit domain, (p0 + p1 + 64) >> 7, clipped to 8-bit."""
    return jnp.clip((p0_14 + p1_14 + 64) >> 7, 0, 255).astype(jnp.int32)


# ---------------------------------------------------------------------------
# NumPy scalar twin (tests / host reference)
# ---------------------------------------------------------------------------

def mc_luma_np(ref: np.ndarray, x0: int, y0: int, mvx: int, mvy: int,
               n: int) -> np.ndarray:
    ix, iy = x0 + (mvx >> 2), y0 + (mvy >> 2)
    fx, fy = mvx & 3, mvy & 3
    h, w = ref.shape
    win = np.zeros((n + 7, n + 7), np.int64)
    for r in range(n + 7):
        for c in range(n + 7):
            win[r, c] = ref[min(max(iy - 3 + r, 0), h - 1),
                            min(max(ix - 3 + c, 0), w - 1)]
    fh = LUMA_FILTERS[fx].astype(np.int64)
    fv = LUMA_FILTERS[fy].astype(np.int64)
    hor = np.zeros((n + 7, n), np.int64)
    for r in range(n + 7):
        for c in range(n):
            hor[r, c] = (win[r, c:c + 8] * fh).sum()
    out = np.zeros((n, n), np.int64)
    for r in range(n):
        for c in range(n):
            v = (hor[r:r + 8, c] * fv).sum() >> 6
            out[r, c] = min(max((v + 32) >> 6, 0), 255)
    return out.astype(np.int32)


def mc_chroma_np(ref: np.ndarray, x0: int, y0: int, mvx: int, mvy: int,
                 n: int) -> np.ndarray:
    ix, iy = x0 + (mvx >> 3), y0 + (mvy >> 3)
    fx, fy = mvx & 7, mvy & 7
    h, w = ref.shape
    win = np.zeros((n + 3, n + 3), np.int64)
    for r in range(n + 3):
        for c in range(n + 3):
            win[r, c] = ref[min(max(iy - 1 + r, 0), h - 1),
                            min(max(ix - 1 + c, 0), w - 1)]
    fh = CHROMA_FILTERS[fx].astype(np.int64)
    fv = CHROMA_FILTERS[fy].astype(np.int64)
    hor = np.zeros((n + 3, n), np.int64)
    for r in range(n + 3):
        for c in range(n):
            hor[r, c] = (win[r, c:c + 4] * fh).sum()
    out = np.zeros((n, n), np.int64)
    for r in range(n):
        for c in range(n):
            v = (hor[r:r + 4, c] * fv).sum() >> 6
            out[r, c] = min(max((v + 32) >> 6, 0), 255)
    return out.astype(np.int32)


# ---------------------------------------------------------------------------
# Bi-prediction (spec 8.5.4.2.3.2 default weighted sample prediction):
# each hypothesis stays in the 14-bit domain; out = (p0 + p1 + 64) >> 7.
# ---------------------------------------------------------------------------

def _mc_luma14_np(ref, x0, y0, mvx, mvy, n):
    ix, iy = x0 + (mvx >> 2), y0 + (mvy >> 2)
    fx, fy = mvx & 3, mvy & 3
    h, w = ref.shape
    win = np.zeros((n + 7, n + 7), np.int64)
    for r in range(n + 7):
        for c in range(n + 7):
            win[r, c] = ref[min(max(iy - 3 + r, 0), h - 1),
                            min(max(ix - 3 + c, 0), w - 1)]
    fh = LUMA_FILTERS[fx].astype(np.int64)
    fv = LUMA_FILTERS[fy].astype(np.int64)
    hor = np.zeros((n + 7, n), np.int64)
    for r in range(n + 7):
        for c in range(n):
            hor[r, c] = (win[r, c:c + 8] * fh).sum()
    out = np.zeros((n, n), np.int64)
    for r in range(n):
        for c in range(n):
            out[r, c] = (hor[r:r + 8, c] * fv).sum() >> 6
    return out


def _mc_chroma14_np(ref, x0, y0, mvx, mvy, n):
    ix, iy = x0 + (mvx >> 3), y0 + (mvy >> 3)
    fx, fy = mvx & 7, mvy & 7
    h, w = ref.shape
    win = np.zeros((n + 3, n + 3), np.int64)
    for r in range(n + 3):
        for c in range(n + 3):
            win[r, c] = ref[min(max(iy - 1 + r, 0), h - 1),
                            min(max(ix - 1 + c, 0), w - 1)]
    fh = CHROMA_FILTERS[fx].astype(np.int64)
    fv = CHROMA_FILTERS[fy].astype(np.int64)
    hor = np.zeros((n + 3, n), np.int64)
    for r in range(n + 3):
        for c in range(n):
            hor[r, c] = (win[r, c:c + 4] * fh).sum()
    out = np.zeros((n, n), np.int64)
    for r in range(n):
        for c in range(n):
            out[r, c] = (hor[r:r + 4, c] * fv).sum() >> 6
    return out


def mc_luma14_rect_np(ref: np.ndarray, x0: int, y0: int, mvx: int,
                      mvy: int, w: int, h: int,
                      bit_depth: int = 8) -> np.ndarray:
    """Vectorized rectangular luma MC to the 14-bit domain (general
    decoder path: PU sizes 64x64 .. 8x4).  The horizontal intermediate
    is truncated by shift1 = bit_depth - 8 BEFORE the vertical stage
    (spec 8.5.3.3.3.1) — the two truncations do not commute."""
    ix, iy = x0 + (mvx >> 2), y0 + (mvy >> 2)
    fx, fy = mvx & 3, mvy & 3
    hh, ww = ref.shape
    rows = np.clip(iy - 3 + np.arange(h + 7), 0, hh - 1)
    cols = np.clip(ix - 3 + np.arange(w + 7), 0, ww - 1)
    win = ref[np.ix_(rows, cols)].astype(np.int64)
    fh = LUMA_FILTERS[fx].astype(np.int64)
    fv = LUMA_FILTERS[fy].astype(np.int64)
    hor = sum(win[:, i:i + w] * fh[i] for i in range(8)) >> (bit_depth - 8)
    return sum(hor[i:i + h, :] * fv[i] for i in range(8)) >> 6


def mc_chroma14_rect_np(ref: np.ndarray, x0: int, y0: int, mvx: int,
                        mvy: int, w: int, h: int,
                        bit_depth: int = 8) -> np.ndarray:
    """Vectorized rectangular chroma MC to the 14-bit domain (1/8-pel)."""
    ix, iy = x0 + (mvx >> 3), y0 + (mvy >> 3)
    fx, fy = mvx & 7, mvy & 7
    hh, ww = ref.shape
    rows = np.clip(iy - 1 + np.arange(h + 3), 0, hh - 1)
    cols = np.clip(ix - 1 + np.arange(w + 3), 0, ww - 1)
    win = ref[np.ix_(rows, cols)].astype(np.int64)
    fh = CHROMA_FILTERS[fx].astype(np.int64)
    fv = CHROMA_FILTERS[fy].astype(np.int64)
    hor = sum(win[:, i:i + w] * fh[i] for i in range(4)) >> (bit_depth - 8)
    return sum(hor[i:i + h, :] * fv[i] for i in range(4)) >> 6


def mc_luma_bi_np(ref0, ref1, x0, y0, mv0, mv1, n):
    p0 = _mc_luma14_np(ref0, x0, y0, mv0[0], mv0[1], n)
    p1 = _mc_luma14_np(ref1, x0, y0, mv1[0], mv1[1], n)
    return np.clip((p0 + p1 + 64) >> 7, 0, 255).astype(np.int32)


def mc_chroma_bi_np(ref0, ref1, x0, y0, mv0, mv1, n):
    p0 = _mc_chroma14_np(ref0, x0, y0, mv0[0], mv0[1], n)
    p1 = _mc_chroma14_np(ref1, x0, y0, mv1[0], mv1[1], n)
    return np.clip((p0 + p1 + 64) >> 7, 0, 255).astype(np.int32)


def mc_luma_wp_np(ref, x0, y0, mvx, mvy, n, w, o, denom):
    """Explicit weighted uni-prediction, luma (spec 8.5.3.3.4.3;
    TComWeightPrediction.cpp addWeightUni): the weight applies to the
    14-bit interpolation intermediate, then one combined shift."""
    p14 = _mc_luma14_np(ref, x0, y0, mvx, mvy, n)
    shift = denom + 6            # log2Wd = denom + (14 - bitDepth)
    return np.clip(((p14 * w + (1 << (shift - 1))) >> shift) + o, 0, 255)


def mc_chroma_wp_np(ref, x0, y0, mvx, mvy, n, w, o, denom):
    """Explicit weighted uni-prediction, chroma."""
    p14 = _mc_chroma14_np(ref, x0, y0, mvx, mvy, n)
    shift = denom + 6
    return np.clip(((p14 * w + (1 << (shift - 1))) >> shift) + o, 0, 255)
