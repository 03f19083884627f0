"""Literal, scalar implementation of HEVC intra prediction (spec 8.4.4.2).

Golden twin for tests: written straight from the standard text, one sample
at a time, independently of the vectorized video_codecs_tpu.ops.intra code.
"""

import numpy as np

ANGLES = {2: 32, 3: 26, 4: 21, 5: 17, 6: 13, 7: 9, 8: 5, 9: 2, 10: 0,
          11: -2, 12: -5, 13: -9, 14: -13, 15: -17, 16: -21, 17: -26,
          18: -32, 19: -26, 20: -21, 21: -17, 22: -13, 23: -9, 24: -5,
          25: -2, 26: 0, 27: 2, 28: 5, 29: 9, 30: 13, 31: 17, 32: 21,
          33: 26, 34: 32}
INV_ANGLES = {-2: -4096, -5: -1638, -9: -910, -13: -630, -17: -482,
              -21: -390, -26: -315, -32: -256}


def clip(v, lo, hi):
    return max(lo, min(hi, v))


def substitute(samples, avail, bit_depth=8):
    """samples/avail: linear arrays length 4N+1 (bottom-left ... top-right)."""
    r = len(samples)
    out = list(samples)
    if not any(avail):
        return [1 << (bit_depth - 1)] * r
    if not avail[0]:
        j = next(i for i in range(r) if avail[i])
        out[0] = samples[j]
    for k in range(1, r):
        if not avail[k]:
            out[k] = out[k - 1]
    return out


def filter_ref(ref):
    r = len(ref)
    out = list(ref)
    for k in range(1, r - 1):
        out[k] = (ref[k - 1] + 2 * ref[k] + ref[k + 1] + 2) >> 2
    return out


def filter_flag(mode, n, is_luma):
    if not is_luma or n == 4 or mode == 1:
        return False
    dist = min(abs(mode - 26), abs(mode - 10))
    thresh = {8: 7, 16: 1, 32: 0}[n]
    return dist > thresh


def predict(ref_linear, mode, n, is_luma=True, bit_depth=8):
    """ref_linear: substituted reference, length 4N+1, layout as ops.intra."""
    if filter_flag(mode, n, is_luma):
        ref_linear = filter_ref(ref_linear)
    # p[-1][-1] corner; left[j]=p[-1][j]; top[i]=p[i][-1]
    corner = ref_linear[2 * n]
    left = [ref_linear[2 * n - 1 - j] for j in range(2 * n)]
    top = [ref_linear[2 * n + 1 + i] for i in range(2 * n)]
    maxval = (1 << bit_depth) - 1
    pred = np.zeros((n, n), np.int64)

    if mode == 0:  # planar
        for y in range(n):
            for x in range(n):
                pred[y, x] = ((n - 1 - x) * left[y] + (x + 1) * top[n] +
                              (n - 1 - y) * top[x] + (y + 1) * left[n] + n
                              ) >> (int(np.log2(n)) + 1)
        return pred

    if mode == 1:  # DC
        dc = (sum(top[:n]) + sum(left[:n]) + n) >> (int(np.log2(n)) + 1)
        pred[:, :] = dc
        if is_luma and n <= 16:
            for x in range(1, n):
                pred[0, x] = (top[x] + 3 * dc + 2) >> 2
            for y in range(1, n):
                pred[y, 0] = (left[y] + 3 * dc + 2) >> 2
            pred[0, 0] = (left[0] + 2 * dc + top[0] + 2) >> 2
        return pred

    angle = ANGLES[mode]
    if mode >= 18:
        main = [corner] + top          # refMain[t] = p[t-1][-1]
        side = [corner] + left
    else:
        main = [corner] + left
        side = [corner] + top

    # Build ref[] indexed -N..2N as dict.
    ref = {}
    for t in range(0, 2 * n + 1):
        ref[t] = main[t]
    bound = (n * angle) >> 5
    if angle < 0 and bound < -1:
        inv = INV_ANGLES[angle]
        for x in range(-1, bound - 1, -1):
            ref[x] = side[(x * inv + 128) >> 8]

    out = np.zeros((n, n), np.int64)
    for y in range(n):
        pos = (y + 1) * angle
        iidx = pos >> 5
        fact = pos & 31
        for x in range(n):
            i0 = x + iidx + 1
            if fact:
                v = ((32 - fact) * ref[i0] + fact * ref[i0 + 1] + 16) >> 5
            else:
                v = ref[i0]
            out[y, x] = v
        if angle == 0 and is_luma and n <= 16:
            out[y, 0] = clip(main[1] + ((side[y + 1] - corner) >> 1), 0, maxval)
    if mode < 18:
        out = out.T
    np.clip(out, 0, maxval, out=out)
    return out
