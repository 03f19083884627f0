"""Pallas SAD kernel == reference, in interpreter mode (CPU CI).

The compiled Mosaic kernel was validated on the real TPU chip
(256-slice static unroll; see ops/pallas_sad.py docstring).
"""

import numpy as np
import jax.numpy as jnp

from video_codecs_tpu.ops import pallas_sad

RNG = np.random.default_rng(5)


def test_pallas_sad_matches_reference():
    B, n, r = 5, 16, 8
    cur = RNG.integers(0, 256, (B, n, n)).astype(np.int32)
    win = RNG.integers(0, 256, (B, n + 2 * r, n + 2 * r)).astype(np.int32)
    got = np.asarray(pallas_sad.sad_surface(
        jnp.asarray(cur), jnp.asarray(win), n, r, interpret=True))
    for b in range(B):
        for dy in range(0, 17, 4):
            for dx in range(0, 17, 4):
                want = np.abs(win[b, dy:dy + n, dx:dx + n] - cur[b]).sum()
                assert got[b, dy, dx] == want
