"""Motion estimation: batched integer search + fractional refinement.

Parity reference (behavioral, not structural): hm-16.5rc1 TEncSearch
xMotionEstimation :3663 / xPatternSearch :3786 / xPatternSearchFracDIF
:4240.  TPU-native shape per SURVEY.md §7.1: instead of TZSearch's
data-dependent early exits, evaluate a full fixed window of candidates for
every block in one tensor op (SAD over [B, (2R+1)^2] shifts), then refine
half- and quarter-pel with batched on-the-fly MC + SATD.  All blocks of a
frame are searched simultaneously.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from video_codecs_tpu.ops import cost as cost_ops
from video_codecs_tpu.ops import interp


def integer_search(ref: jnp.ndarray, cur: jnp.ndarray, x0, y0, n: int,
                   search_range: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Full integer-pel search around (0, 0) for every block.

    ref: [H, W]; cur: [B, n, n]; returns (mvx, mvy) int-pel [B].
    """
    r = search_range
    win = interp._gather_window(ref, x0 - r, y0 - r, n + 2 * r, n + 2 * r)
    # patches for every shift: [B, (2r+1)^2, n, n]
    dy, dx = np.meshgrid(np.arange(2 * r + 1), np.arange(2 * r + 1),
                         indexing="ij")
    dy = dy.reshape(-1)
    dx = dx.reshape(-1)
    rows = dy[None, :, None, None] + np.arange(n)[None, None, :, None]
    cols = dx[None, :, None, None] + np.arange(n)[None, None, None, :]
    patches = win[:, rows[0], cols[0]]              # [B, S, n, n]
    sad = jnp.sum(jnp.abs(patches - cur[:, None].astype(jnp.int32)),
                  axis=(-2, -1))                    # [B, S]
    # small center bias like HM's mv-cost: prefer shorter MVs on ties
    mv_cost = (np.abs(dy - r) + np.abs(dx - r)).astype(np.int32)
    best = jnp.argmin(sad + mv_cost[None, :], axis=1)
    return (dx[best] - r).astype(jnp.int32), (dy[best] - r).astype(jnp.int32)


_OFFS8 = np.array([(-1, -1), (0, -1), (1, -1), (-1, 0), (1, 0),
                   (-1, 1), (0, 1), (1, 1)], np.int32)


def _refine(ref, cur, x0, y0, mvx, mvy, n, step):
    """One diamond refinement round at quarter-pel `step` using SATD."""
    cand_x = mvx[:, None] + _OFFS8[None, :, 0] * step   # [B, 8]
    cand_y = mvy[:, None] + _OFFS8[None, :, 1] * step
    b = cur.shape[0]
    best = cost_ops.hadamard_satd_8x8(
        cur, interp.mc_luma(ref, x0, y0, mvx, mvy, n))  # [B]
    for k in range(8):
        pred = interp.mc_luma(ref, x0, y0, cand_x[:, k], cand_y[:, k], n)
        satd = cost_ops.hadamard_satd_8x8(cur, pred)
        better = satd < best
        best = jnp.where(better, satd, best)
        mvx = jnp.where(better, cand_x[:, k], mvx)
        mvy = jnp.where(better, cand_y[:, k], mvy)
    return mvx, mvy, best


def motion_search(ref: jnp.ndarray, cur: jnp.ndarray, x0, y0, n: int,
                  search_range: int = 8):
    """Integer + half + quarter search; returns (mvx, mvy) quarter-pel [B]
    and the final SATD."""
    imx, imy = integer_search(ref, cur.astype(jnp.int32), x0, y0, n,
                              search_range)
    mvx, mvy = imx * 4, imy * 4
    mvx, mvy, _ = _refine(ref, cur, x0, y0, mvx, mvy, n, 2)
    mvx, mvy, satd = _refine(ref, cur, x0, y0, mvx, mvy, n, 1)
    return mvx, mvy, satd
