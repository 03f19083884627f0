"""H.264 in-loop deblocking filter (spec 8.7), all-intra frame coding.

Vectorized per edge: every decision/filter value is computed from the
*original* samples of the edge window before any write-back, which is
exactly the reference semantics (JM loads L0..L3/R0..R3 up front —
jm18.5/ldecod/src/loop_filter_normal.c:548-614 strong,
:664-700 normal, :840-900 chroma). Ordering across edges is sequential
and matches JM's DeblockPicture (jm18.5/ldecod/src/loopFilter.c:44-69,
:483-640): macroblocks in raster order, each MB filtering its four
vertical luma edges (chroma at edges 0 and 2), then its four horizontal
edges, in place, so later edges see earlier edges' filtered samples.

All MBs here are intra in frame coding, so boundary strength is 4 on MB
edges and 3 on internal 4x4 edges — no bS derivation needed.
Alpha/beta/tc0 tables are the spec Tables 8-16/8-17
(jm18.5/ldecod/inc/loop_filter.h:36-48).
"""

from __future__ import annotations

import numpy as np

ALPHA_TABLE = np.array(
    [0] * 16
    + [4, 4, 5, 6, 7, 8, 9, 10, 12, 13, 15, 17, 20, 22, 25, 28,
       32, 36, 40, 45, 50, 56, 63, 71, 80, 90, 101, 113,
       127, 144, 162, 182, 203, 226, 255, 255], np.int32)

BETA_TABLE = np.array(
    [0] * 16
    + [2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 6, 6, 7, 7, 8, 8,
       9, 9, 10, 10, 11, 11, 12, 12, 13, 13, 14, 14,
       15, 15, 16, 16, 17, 17, 18, 18], np.int32)

# tc0 by [indexA][bS] for bS in 1..3 (column 0 unused).
CLIP_TAB = np.zeros((52, 4), np.int32)
CLIP_TAB[16:] = [
    (0, 0, 0, 0), (0, 0, 0, 1), (0, 0, 0, 1), (0, 0, 0, 1),
    (0, 0, 0, 1), (0, 0, 1, 1), (0, 0, 1, 1), (0, 1, 1, 1),
    (0, 1, 1, 1), (0, 1, 1, 1), (0, 1, 1, 1), (0, 1, 1, 2),
    (0, 1, 1, 2), (0, 1, 1, 2), (0, 1, 1, 2), (0, 1, 2, 3),
    (0, 1, 2, 3), (0, 2, 2, 3), (0, 2, 2, 4), (0, 2, 3, 4),
    (0, 2, 3, 4), (0, 3, 3, 5), (0, 3, 4, 6), (0, 3, 4, 6),
    (0, 4, 5, 7), (0, 4, 5, 8), (0, 4, 6, 9), (0, 5, 7, 10),
    (0, 6, 8, 11), (0, 6, 8, 13), (0, 7, 10, 14), (0, 8, 11, 16),
    (0, 9, 12, 18), (0, 10, 13, 20), (0, 11, 15, 23), (0, 13, 17, 25),
]


def _edge_luma(win: np.ndarray, bs: int, alpha: int, beta: int,
               tc0: int) -> np.ndarray:
    """Filter one luma edge. win is (N, 8) = [p3 p2 p1 p0 q0 q1 q2 q3]."""
    w = win.astype(np.int32)
    p3, p2, p1, p0, q0, q1, q2, q3 = (w[:, i] for i in range(8))
    filt = ((np.abs(p0 - q0) < alpha) & (np.abs(p1 - p0) < beta)
            & (np.abs(q1 - q0) < beta))
    ap = np.abs(p2 - p0) < beta
    aq = np.abs(q2 - q0) < beta
    out = w.copy()
    if bs == 4:
        small = np.abs(p0 - q0) < ((alpha >> 2) + 2)
        weak_p = (2 * p1 + p0 + q1 + 2) >> 2
        weak_q = (2 * q1 + q0 + p1 + 2) >> 2
        sp = filt & small & ap
        sq = filt & small & aq
        out[:, 3] = np.where(sp, (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3,
                             np.where(filt, weak_p, p0))
        out[:, 2] = np.where(sp, (p2 + p1 + p0 + q0 + 2) >> 2, p1)
        out[:, 1] = np.where(sp, (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3, p2)
        out[:, 4] = np.where(sq, (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3,
                             np.where(filt, weak_q, q0))
        out[:, 5] = np.where(sq, (q2 + q1 + q0 + p0 + 2) >> 2, q1)
        out[:, 6] = np.where(sq, (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3, q2)
    else:
        tc = tc0 + ap.astype(np.int32) + aq.astype(np.int32)
        dif = np.clip((4 * (q0 - p0) + (p1 - q1) + 4) >> 3, -tc, tc)
        mid = (p0 + q0 + 1) >> 1
        out[:, 3] = np.where(filt, np.clip(p0 + dif, 0, 255), p0)
        out[:, 4] = np.where(filt, np.clip(q0 - dif, 0, 255), q0)
        dp1 = np.clip((p2 + mid - 2 * p1) >> 1, -tc0, tc0)
        dq1 = np.clip((q2 + mid - 2 * q1) >> 1, -tc0, tc0)
        out[:, 2] = np.where(filt & ap, p1 + dp1, p1)
        out[:, 5] = np.where(filt & aq, q1 + dq1, q1)
    return out


def _edge_chroma(win: np.ndarray, bs: int, alpha: int, beta: int,
                 tc0: int) -> np.ndarray:
    """Filter one chroma edge. win is (N, 4) = [p1 p0 q0 q1]."""
    w = win.astype(np.int32)
    p1, p0, q0, q1 = (w[:, i] for i in range(4))
    filt = ((np.abs(p0 - q0) < alpha) & (np.abs(p1 - p0) < beta)
            & (np.abs(q1 - q0) < beta))
    out = w.copy()
    if bs == 4:
        out[:, 1] = np.where(filt, (2 * p1 + p0 + q1 + 2) >> 2, p0)
        out[:, 2] = np.where(filt, (2 * q1 + q0 + p1 + 2) >> 2, q0)
    else:
        tc = tc0 + 1
        dif = np.clip((4 * (q0 - p0) + (p1 - q1) + 4) >> 3, -tc, tc)
        out[:, 1] = np.where(filt, np.clip(p0 + dif, 0, 255), p0)
        out[:, 2] = np.where(filt, np.clip(q0 - dif, 0, 255), q0)
    return out


def deblock_frame_intra(y: np.ndarray, u: np.ndarray, v: np.ndarray,
                        qp: int, qpc: int, alpha_off: int = 0,
                        beta_off: int = 0):
    """Deblock a reconstructed all-intra 4:2:0 frame; returns new planes.

    qp/qpc are the (uniform) luma and chroma QPs of the frame; alpha_off/
    beta_off are FilterOffsetA/B (slice_alpha_c0_offset_div2*2 etc.).
    """
    Y = y.astype(np.int32).copy()
    U = u.astype(np.int32).copy()
    V = v.astype(np.int32).copy()
    h, w = Y.shape

    ia = min(max(qp + alpha_off, 0), 51)
    ib = min(max(qp + beta_off, 0), 51)
    al, bl = int(ALPHA_TABLE[ia]), int(BETA_TABLE[ib])
    tc0_l = [0, int(CLIP_TAB[ia, 3]), 0]       # index by bS==3 slot below
    iac = min(max(qpc + alpha_off, 0), 51)
    ibc = min(max(qpc + beta_off, 0), 51)
    ac, bc = int(ALPHA_TABLE[iac]), int(BETA_TABLE[ibc])
    tc0_c3 = int(CLIP_TAB[iac, 3])

    def luma_ver(x, y0, bs):
        if al == 0 and bl == 0:
            return
        Y[y0:y0 + 16, x - 4:x + 4] = _edge_luma(
            Y[y0:y0 + 16, x - 4:x + 4], bs, al, bl, tc0_l[1])

    def luma_hor(x0, yy, bs):
        if al == 0 and bl == 0:
            return
        win = Y[yy - 4:yy + 4, x0:x0 + 16].T
        Y[yy - 4:yy + 4, x0:x0 + 16] = _edge_luma(
            win, bs, al, bl, tc0_l[1]).T

    def chroma_ver(P, cx, cy0, bs):
        if ac == 0 and bc == 0:
            return
        P[cy0:cy0 + 8, cx - 2:cx + 2] = _edge_chroma(
            P[cy0:cy0 + 8, cx - 2:cx + 2], bs, ac, bc, tc0_c3)

    def chroma_hor(P, cx0, cy, bs):
        if ac == 0 and bc == 0:
            return
        win = P[cy - 2:cy + 2, cx0:cx0 + 8].T
        P[cy - 2:cy + 2, cx0:cx0 + 8] = _edge_chroma(
            win, bs, ac, bc, tc0_c3).T

    for mby in range(h // 16):
        for mbx in range(w // 16):
            x0, y0 = mbx * 16, mby * 16
            cx0, cy0 = mbx * 8, mby * 8
            # vertical edges, left to right
            for e in range(4):
                if e == 0 and mbx == 0:
                    continue
                bs = 4 if e == 0 else 3
                luma_ver(x0 + 4 * e, y0, bs)
                if e in (0, 2):        # chroma_edge[0][e][YUV420]
                    for P in (U, V):
                        chroma_ver(P, cx0 + 2 * e, cy0, bs)
            # horizontal edges, top to bottom
            for e in range(4):
                if e == 0 and mby == 0:
                    continue
                bs = 4 if e == 0 else 3
                luma_hor(x0, y0 + 4 * e, bs)
                if e in (0, 2):
                    for P in (U, V):
                        chroma_hor(P, cx0, cy0 + 2 * e, bs)
    return Y, U, V
