"""Constant helper for numpy tables used inside jitted code.

`dev_const` returns a fresh `jnp.asarray` of a content-cached contiguous
numpy array.  Two rules it encodes (learned the hard way):

  - constants for jitted code should be materialized FROM NUMPY inside
    each trace — never cache the jnp result and never create non-scalar
    module-level jnp values in modules that may be lazily imported from
    inside a traced function (the value would be created as a tracer of
    that trace and poison every later one);
  - the numpy content cache dedups the host-side ascontiguousarray /
    table-building work across call sites.
"""

from __future__ import annotations

import hashlib

import jax.numpy as jnp
import numpy as np

_NP_CACHE: dict = {}


def dev_const(arr, dtype=None) -> jnp.ndarray:
    """Traced constant from a numpy table (content-cached numpy source)."""
    a = np.ascontiguousarray(arr)
    key = (a.shape, a.dtype.name,
           hashlib.blake2b(a.tobytes(), digest_size=16).digest())
    hit = _NP_CACHE.get(key)
    if hit is None:
        _NP_CACHE[key] = hit = a
    return jnp.asarray(hit, dtype)
