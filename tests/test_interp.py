"""MC interpolation: vectorized == scalar spec twin, all phases."""

import numpy as np

from video_codecs_tpu.ops import interp

RNG = np.random.default_rng(3)


def test_luma_mc_all_phases():
    ref = RNG.integers(0, 256, (64, 80)).astype(np.int32)
    n = 16
    cases = []
    for fx in range(4):
        for fy in range(4):
            cases.append((24, 16, (RNG.integers(-30, 30) << 2) + fx,
                          (RNG.integers(-20, 20) << 2) + fy))
    # edge cases: MV pointing far outside the picture
    cases += [(0, 0, -400, -400), (64, 48, 400, 400), (0, 48, -3, 5)]
    x0 = np.array([c[0] for c in cases], np.int32)
    y0 = np.array([c[1] for c in cases], np.int32)
    mvx = np.array([c[2] for c in cases], np.int32)
    mvy = np.array([c[3] for c in cases], np.int32)
    got = np.asarray(interp.mc_luma(ref, x0, y0, mvx, mvy, n))
    for i, (x, y, vx, vy) in enumerate(cases):
        want = interp.mc_luma_np(ref, x, y, vx, vy, n)
        np.testing.assert_array_equal(got[i], want, err_msg=str(cases[i]))


def test_chroma_mc_all_phases():
    ref = RNG.integers(0, 256, (32, 40)).astype(np.int32)
    n = 8
    cases = [(8, 8, (RNG.integers(-20, 20) << 3) + fx,
              (RNG.integers(-10, 10) << 3) + fy)
             for fx in range(8) for fy in range(8)]
    x0 = np.array([c[0] for c in cases], np.int32)
    y0 = np.array([c[1] for c in cases], np.int32)
    mvx = np.array([c[2] for c in cases], np.int32)
    mvy = np.array([c[3] for c in cases], np.int32)
    got = np.asarray(interp.mc_chroma(ref, x0, y0, mvx, mvy, n))
    for i, (x, y, vx, vy) in enumerate(cases):
        want = interp.mc_chroma_np(ref, x, y, vx, vy, n)
        np.testing.assert_array_equal(got[i], want, err_msg=str(cases[i]))
