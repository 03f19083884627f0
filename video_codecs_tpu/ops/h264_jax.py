"""Device (jnp) twins of the H.264 pixel ops: batched quarter-pel MC,
4x4 integer transform + quant/dequant, chroma 2x2 DC — the compute core
of the H.264 device encoder (models/h264/inter_jax.py).

Parity: ops/h264_transform.py + ops/h264_interp.py numpy references
(jm18.5/lcommon/src/transform.c, mc_prediction.c get_block_luma /
get_block_chroma; spec 8.4.2.2, 8.5.10-8.5.12).  All integer math fits
int32 (|W| <= 255*36, *MF <= 1.3e8 < 2^31).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from video_codecs_tpu.ops import h264_transform as ht
from video_codecs_tpu.utils.devconst import dev_const

_TAPS6 = (1, -5, 20, 20, -5, 1)


def _gather(ref, x0, y0, w: int, h: int):
    """[B, h, w] clamped windows at integer (x0, y0) per block."""
    H, W = ref.shape
    rows = jnp.clip(y0[:, None, None] +
                    jnp.arange(h, dtype=jnp.int32)[None, :, None], 0, H - 1)
    cols = jnp.clip(x0[:, None, None] +
                    jnp.arange(w, dtype=jnp.int32)[None, None, :], 0, W - 1)
    return ref[rows, cols].astype(jnp.int32)


def _hfilt(a, n):
    return sum(t * a[..., :, k:n + k] for k, t in enumerate(_TAPS6))


def _vfilt(a, n):
    return sum(t * a[..., k:n + k, :] for k, t in enumerate(_TAPS6))


def mc_luma_dev(ref, x0, y0, mvx, mvy, n: int):
    """Batched quarter-pel luma MC: [B] block origins/MVs -> [B, n, n]
    (spec 8.4.2.2.1 G..r grid, j from unrounded intermediates)."""
    xi = x0 + (mvx >> 2)
    yi = y0 + (mvy >> 2)
    dx = mvx & 3
    dy = mvy & 3
    pat = _gather(ref, xi - 2, yi - 2, n + 6, n + 6)

    G = pat[:, 2:2 + n, 2:2 + n]
    b1 = _hfilt(pat, n + 1)                       # [B, n+6, n+1]
    b_all = jnp.clip((b1 + 16) >> 5, 0, 255)
    b = b_all[:, 2:2 + n, 0:n]
    s = b_all[:, 3:3 + n, 0:n]
    h1 = _vfilt(pat, n + 1)                       # [B, n+1, n+6]
    h_all = jnp.clip((h1 + 16) >> 5, 0, 255)
    h_ = h_all[:, 0:n, 2:2 + n]
    m = h_all[:, 0:n, 3:3 + n]
    j1 = _vfilt(b1, n + 1)                        # [B, n+1, n+1]
    j = jnp.clip((j1[:, 0:n, 0:n] + 512) >> 10, 0, 255)
    Hn = pat[:, 2:2 + n, 3:3 + n]
    Mn = pat[:, 3:3 + n, 2:2 + n]

    def avg(a, c):
        return (a + c + 1) >> 1

    # select per block by (dx, dy); 16 variants, masked
    out = G
    for (fx, fy), v in (
            ((1, 0), avg(G, b)), ((2, 0), b), ((3, 0), avg(b, Hn)),
            ((0, 1), avg(G, h_)), ((0, 2), h_), ((0, 3), avg(h_, Mn)),
            ((2, 2), j), ((2, 1), avg(b, j)), ((2, 3), avg(j, s)),
            ((1, 2), avg(h_, j)), ((3, 2), avg(j, m)),
            ((1, 1), avg(b, h_)), ((3, 1), avg(b, m)),
            ((1, 3), avg(h_, s)), ((3, 3), avg(m, s))):
        sel = ((dx == fx) & (dy == fy))[:, None, None]
        out = jnp.where(sel, v, out)
    return out


def mc_chroma_dev(ref, x0, y0, mvx, mvy, n: int):
    """Batched eighth-pel bilinear chroma MC (mv in quarter-LUMA units)."""
    xi = x0 + (mvx >> 3)
    yi = y0 + (mvy >> 3)
    dx = (mvx & 7)[:, None, None]
    dy = (mvy & 7)[:, None, None]
    pat = _gather(ref, xi, yi, n + 1, n + 1)
    A = pat[:, 0:n, 0:n]
    B = pat[:, 0:n, 1:1 + n]
    C = pat[:, 1:1 + n, 0:n]
    D = pat[:, 1:1 + n, 1:1 + n]
    return ((8 - dx) * (8 - dy) * A + dx * (8 - dy) * B +
            (8 - dx) * dy * C + dx * dy * D + 32) >> 6


_CF_D = np.asarray(ht._CF, np.int32)
_POS_D = np.asarray(ht._POS_CLASS, np.int32)


def fwd4x4_dev(res):
    """[..., 4, 4] -> transformed W = Cf X Cf^T."""
    cf = dev_const(_CF_D)
    return jnp.einsum("ij,...jk,lk->...il", cf, res.astype(jnp.int32), cf)


def inv4x4_dev(d):
    """Spec 8.5.12.2 butterfly inverse with final (x+32)>>6 — exact
    twin of ht.inverse4x4 (same butterfly order; >>1 makes it matter)."""
    x = d.astype(jnp.int32)
    e0 = x[..., 0, :] + x[..., 2, :]
    e1 = x[..., 0, :] - x[..., 2, :]
    e2 = (x[..., 1, :] >> 1) - x[..., 3, :]
    e3 = x[..., 1, :] + (x[..., 3, :] >> 1)
    g = jnp.stack([e0 + e3, e1 + e2, e1 - e2, e0 - e3], axis=-2)
    f0 = g[..., :, 0] + g[..., :, 2]
    f1 = g[..., :, 0] - g[..., :, 2]
    f2 = (g[..., :, 1] >> 1) - g[..., :, 3]
    f3 = g[..., :, 1] + (g[..., :, 3] >> 1)
    h = jnp.stack([f0 + f3, f1 + f2, f1 - f2, f0 - f3], axis=-1)
    return (h + 32) >> 6


def quant_ac_dev(w, qp: int, intra: bool = False):
    qbits = 15 + qp // 6
    f = (1 << qbits) // (3 if intra else 6)
    m = dev_const(np.asarray(ht._MF[qp % 6], np.int32)[_POS_D])
    lv = (jnp.abs(w) * m + f) >> qbits
    return jnp.sign(w) * lv


def dequant_ac_dev(levels, qp: int):
    v = dev_const(np.asarray(ht._V[qp % 6], np.int32)[_POS_D])
    return (levels * v) << (qp // 6)


def hadamard2x2_dev(x):
    a = x[..., 0, 0]
    b = x[..., 0, 1]
    c = x[..., 1, 0]
    d = x[..., 1, 1]
    return jnp.stack([
        jnp.stack([a + b + c + d, a - b + c - d], axis=-1),
        jnp.stack([a + b - c - d, a - b - c + d], axis=-1)], axis=-2)


def quant_chroma_dc_dev(dc_h, qp: int, intra: bool = False):
    qbits = 15 + qp // 6
    f = (1 << qbits) // (3 if intra else 6)
    m0 = int(ht._MF[qp % 6][0])
    lv = (jnp.abs(dc_h) * m0 + 2 * f) >> (qbits + 1)
    return jnp.sign(dc_h) * lv


def dequant_chroma_dc_dev(levels, qp: int):
    f = hadamard2x2_dev(levels)
    ls = int(ht._V[qp % 6][0]) << 4
    return ((f * ls) << (qp // 6)) >> 5
