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
