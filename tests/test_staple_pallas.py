"""Fused-Pallas STAPLE must match the XLA reference implementation.

On CPU the kernel runs in interpret mode; the same code compiles to Mosaic on
TPU (exercised by bench.py)."""

import numpy as np

from deep_staple_tpu.consensus.staple import staple_consensus
from deep_staple_tpu.consensus.staple_pallas import staple_consensus_pallas


def _raters(rng, shape=(10, 12, 11), n_good=4, n_bad=2):
    truth = np.zeros(shape, np.int32)
    truth[2:8, 3:9, 3:9] = 1
    out = []
    for _ in range(n_good):
        r = truth.copy()
        flip = rng.rand(*shape) < 0.03
        r[flip] = 1 - r[flip]
        out.append(r)
    for _ in range(n_bad):
        out.append(np.roll(truth, (4, 4, 0), axis=(0, 1, 2)))
    return out


def test_pallas_staple_matches_xla(rng):
    raters = _raters(rng)
    a = staple_consensus(raters, max_iterations=60)
    b = staple_consensus_pallas(raters, max_iterations=60)
    np.testing.assert_array_equal(np.asarray(a.consensus), np.asarray(b.consensus))
    np.testing.assert_allclose(np.asarray(a.sensitivities), np.asarray(b.sensitivities), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.specificities), np.asarray(b.specificities), rtol=1e-4, atol=1e-5)


def test_pallas_staple_nondivisible_sizes(rng):
    # V not a multiple of the kernel block, R not a multiple of 8
    raters = _raters(rng, shape=(7, 9, 5), n_good=3, n_bad=0)
    a = staple_consensus(raters, max_iterations=30)
    b = staple_consensus_pallas(raters, max_iterations=30)
    np.testing.assert_array_equal(np.asarray(a.consensus), np.asarray(b.consensus))
    np.testing.assert_allclose(np.asarray(a.probabilities), np.asarray(b.probabilities), rtol=1e-4, atol=1e-5)
