"""TZSearch (ops/me.py tz_search): near-exhaustive quality on real video,
jittability, and the LowDelay encoder path with FastSearch."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from video_codecs_tpu.ops import me  # noqa: E402
from video_codecs_tpu.utils import yuv  # noqa: E402

FOREMAN = "/root/reference/jm18.5/bin/foreman_part_qcif.yuv"


def _foreman_blocks(n=16, r=24):
    ys, _, _ = yuv.read_frames(FOREMAN, 176, 144)
    ref = ys[0].astype(np.int32)
    cur_f = ys[2].astype(np.int32)
    bx = np.arange(r, 176 - r - n + 1, n)
    by = np.arange(r, 144 - r - n + 1, n)
    xs, ysr = np.meshgrid(bx, by, indexing="xy")
    xs, ysr = xs.reshape(-1), ysr.reshape(-1)
    cur = np.stack([cur_f[y:y + n, x:x + n] for x, y in zip(xs, ysr)])
    return ref, cur, xs, ysr


def _mean_sad(ref, cur, xs, ys, mvx, mvy, n=16):
    tot = []
    for i, (x, y) in enumerate(zip(xs, ys)):
        px, py = x + int(mvx[i]), y + int(mvy[i])
        tot.append(np.abs(ref[py:py + n, px:px + n] - cur[i]).sum())
    return float(np.mean(tot))


def test_tz_close_to_exhaustive_on_video():
    ref, cur, xs, ys = _foreman_blocks()
    r = 24
    args = (jnp.asarray(ref), jnp.asarray(cur), jnp.asarray(xs),
            jnp.asarray(ys))
    tz = me.tz_search(*args, 16, r)
    fs = me.integer_search(*args, 16, r)
    sad_tz = _mean_sad(ref, cur, xs, ys, *[np.asarray(a) for a in tz])
    sad_fs = _mean_sad(ref, cur, xs, ys, *[np.asarray(a) for a in fs])
    # TZ trades a few shallow local minima for ~8x fewer SADs; HM's own
    # TZSearch has the same property. Bound the mean-SAD gap at 5%.
    assert sad_tz <= sad_fs * 1.05, (sad_tz, sad_fs)


def test_tz_jits_with_static_shapes():
    ref, cur, xs, ys = _foreman_blocks()
    import functools
    f = jax.jit(functools.partial(me.tz_search, n=16, search_range=24))
    mvx, mvy = f(jnp.asarray(ref), jnp.asarray(cur), jnp.asarray(xs),
                 jnp.asarray(ys))
    e_mvx, e_mvy = me.tz_search(jnp.asarray(ref), jnp.asarray(cur),
                                jnp.asarray(xs), jnp.asarray(ys), 16, 24)
    np.testing.assert_array_equal(np.asarray(mvx), np.asarray(e_mvx))
    np.testing.assert_array_equal(np.asarray(mvy), np.asarray(e_mvy))


def test_motion_search_method_dispatch():
    ref, cur, xs, ys = _foreman_blocks()
    a = (jnp.asarray(ref), jnp.asarray(cur), jnp.asarray(xs), jnp.asarray(ys))
    mvx_t, mvy_t, _ = me.motion_search(*a, 16, 24, "tz")
    mvx_a, mvy_a, _ = me.motion_search(*a, 16, 24, "auto")  # auto->tz @ 24
    np.testing.assert_array_equal(np.asarray(mvx_t), np.asarray(mvx_a))
    np.testing.assert_array_equal(np.asarray(mvy_t), np.asarray(mvy_a))
