"""Vectorized intra prediction == literal spec implementation, all modes/sizes."""

import numpy as np
import pytest

import spec_intra
from video_codecs_tpu.ops import intra

RNG = np.random.default_rng(99)


@pytest.mark.parametrize("log2", [2, 3, 4, 5])
@pytest.mark.parametrize("is_luma", [True, False])
def test_predict_all_modes_match_spec(log2, is_luma):
    if not is_luma and log2 == 5:
        pytest.skip("chroma TBs are at most 16x16 in 4:2:0 Main")
    n = 1 << log2
    b = 4
    refs = RNG.integers(0, 256, size=(b, 4 * n + 1)).astype(np.int32)
    modes = np.broadcast_to(np.arange(35, dtype=np.int32), (b, 35)).copy()
    got = np.asarray(intra.predict_intra(refs, modes, log2, is_luma=is_luma))
    for i in range(b):
        for mode in range(35):
            want = spec_intra.predict(refs[i].tolist(), mode, n, is_luma=is_luma)
            np.testing.assert_array_equal(
                got[i, mode], want,
                err_msg=f"mode {mode} size {n} luma={is_luma} block {i}")


def test_substitution_matches_spec():
    n = 8
    r = 4 * n + 1
    for _ in range(50):
        samples = RNG.integers(0, 256, size=r).astype(np.int32)
        avail = RNG.random(r) < 0.6
        got = np.asarray(intra.substitute_unavailable(samples[None], avail[None]))[0]
        want = spec_intra.substitute(samples.tolist(), avail.tolist())
        np.testing.assert_array_equal(got, want)
    # Nothing available -> mid-gray.
    got = np.asarray(intra.substitute_unavailable(
        samples[None], np.zeros((1, r), bool)))[0]
    assert (got == 128).all()


def test_smoothing_matches_spec():
    ref = RNG.integers(0, 256, size=(3, 33)).astype(np.int32)
    got = np.asarray(intra.smooth_reference(ref))
    for i in range(3):
        want = spec_intra.filter_ref(ref[i].tolist())
        np.testing.assert_array_equal(got[i], want)
