"""Pallas TPU kernel: full-window SAD for integer motion search.

The ME hot loop (TEncSearch xPatternSearch :3786 analog). The jnp
formulation materializes patches [B, (2R+1)^2, N, N] in HBM; this kernel
keeps each block's search window plus the current block resident in VMEM
and accumulates the SAD surface on the fly — HBM traffic drops from
O(B * S * N^2) to O(B * (N + 2R)^2).

Grid: one program per block. Per program:
  cur   [N, N]            current block
  win   [N+2R, N+2R]      search window (edge-replicated by the caller)
  out   [(2R+1), (2R+1)]  SAD per integer displacement

Falls back to interpreter mode off-TPU (tests run it on CPU and assert
bit-equality with the jnp reference path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def _sad_kernel(cur_ref, win_ref, out_ref, *, n: int, r: int):
    """Accumulate the whole SAD surface over the N^2 block pixels:
    out[dy, dx] = sum_{y,x} |win[dy+y, dx+x] - cur[y,x]|.  Each iteration
    is one hardware-tile-aligned vector op — no scatters, one final store.
    Tiles are padded to (8k, 128) per the VMEM tiling constraints."""
    span = 2 * r + 1
    rows = _round_up(span, 8)
    cols = 128

    # Static unroll: Mosaic requires static (or 128-aligned) lane offsets,
    # so the N^2 shifted-window slices use compile-time starts.
    acc = jnp.zeros((rows, cols), jnp.int32)
    for y in range(n):
        for x in range(n):
            c = cur_ref[0, y, x]
            tile = win_ref[0, y:y + rows, x:x + cols]
            acc = acc + jnp.abs(tile - c)
    out_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("n", "r", "interpret"))
def sad_surface(cur: jnp.ndarray, win: jnp.ndarray, n: int, r: int,
                interpret: bool = False) -> jnp.ndarray:
    """cur [B, n, n], win [B, n+2r, n+2r] -> SAD [B, 2r+1, 2r+1] (int32)."""
    b = cur.shape[0]
    span = 2 * r + 1
    rows = _round_up(span, 8)
    cols = 128
    wh = n - 1 + rows
    ww = n - 1 + cols
    win_p = jnp.zeros((b, wh, ww), jnp.int32)
    win_p = win_p.at[:, :n + 2 * r, :n + 2 * r].set(win.astype(jnp.int32))
    kernel = functools.partial(_sad_kernel, n=n, r=r)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wh, ww), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, cols), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, rows, cols), jnp.int32),
        interpret=interpret,
    )(cur.astype(jnp.int32), win_p)
    return out[:, :span, :span]
