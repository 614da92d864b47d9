"""Consensus: DP voting vs reference formula (via torch), STAPLE EM sanity +
JAX vs C++ cross-validation."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from deep_staple_tpu.consensus import calc_dp_consensus, staple_consensus
from deep_staple_tpu.consensus.native_staple import native_staple_available, staple_consensus_native


def _torch_dp_consensus(lbl_list, weighting_list):
    # exact transcription of consensus.ipynb cell 5:1-10
    LIMIT = 0.5
    label_stack = torch.stack(lbl_list)
    weightings = torch.tensor(weighting_list)
    weightings = torch.softmax(weightings, 0)
    weighted_stack = label_stack * weightings.view(-1, 1, 1, 1)
    return (weighted_stack.sum(0) > LIMIT).long()


def test_dp_consensus_matches_reference(rng):
    lbls = [torch.from_numpy(rng.randint(0, 2, size=(6, 5, 4)).astype(np.float32)) for _ in range(5)]
    dps = rng.randn(5).astype(np.float32).tolist()
    want = _torch_dp_consensus(lbls, dps).numpy()
    got = np.asarray(
        calc_dp_consensus(jnp.stack([jnp.asarray(l.numpy()) for l in lbls]), jnp.asarray(dps))
    )
    np.testing.assert_array_equal(got, want)


def _make_raters(rng, shape=(12, 12, 12), n_good=4, n_bad=2):
    truth = np.zeros(shape, np.int32)
    truth[3:9, 3:9, 3:9] = 1
    raters = []
    for _ in range(n_good):
        r = truth.copy()
        flip = rng.rand(*shape) < 0.02
        r[flip] = 1 - r[flip]
        raters.append(r)
    for _ in range(n_bad):
        raters.append(np.roll(truth, (5, 5, 0), axis=(0, 1, 2)))
    return truth, raters


def test_staple_recovers_truth_and_ranks_raters(rng):
    truth, raters = _make_raters(rng)
    res = staple_consensus(raters, max_iterations=200)
    consensus = np.asarray(res.consensus)
    # Consensus should essentially match the truth
    inter = np.logical_and(consensus == 1, truth == 1).sum()
    dice = 2 * inter / (consensus.sum() + truth.sum())
    assert dice > 0.95
    sens = np.asarray(res.sensitivities)
    # good raters (first 4) must have much higher sensitivity than bad ones
    assert sens[:4].min() > sens[4:].max()


@pytest.mark.skipif(not native_staple_available(), reason="native lib not built")
def test_staple_jax_matches_native_cpp(rng):
    _, raters = _make_raters(rng, n_good=3, n_bad=2)
    res = staple_consensus(raters, max_iterations=50)
    c_cons, c_p, c_q, c_iters = staple_consensus_native(raters, max_iterations=50)
    np.testing.assert_array_equal(np.asarray(res.consensus), c_cons)
    np.testing.assert_allclose(np.asarray(res.sensitivities), c_p, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(res.specificities), c_q, rtol=1e-3, atol=1e-4)


def test_staple_unanimous_converges_fast():
    truth = np.zeros((8, 8, 8), np.int32)
    truth[2:6, 2:6, 2:6] = 1
    res = staple_consensus([truth, truth, truth], max_iterations=200)
    np.testing.assert_array_equal(np.asarray(res.consensus), truth)
    assert int(res.iterations) < 200


# ---------------------------------------------------------------------------
# Implementation-independent golden (VERDICT r4 #5): the constants below were
# derived by benchmarks/staple_golden_derivation.py, which evaluates the
# PUBLISHED binary STAPLE EM update equations (Warfield, Zou, Wells, IEEE TMI
# 23(7):903-921, 2004 — E-step W_j = a_j/(a_j+b_j); M-step p_i, q_i as
# weighted rater agreement) in 80-digit decimal arithmetic with the
# ITK-convention initialization (p=q=0.99999, g = mean(D)), importing NOTHING
# from this package. They anchor consensus/staple.py to the published
# algorithm rather than to any implementation in this repository. (ITK's own
# test-suite baselines are unavailable offline; see the derivation script's
# docstring.)
_GOLDEN_PATTERNS = [
    ((1, 1, 1), 25), ((1, 1, 0), 8), ((1, 0, 1), 5), ((0, 1, 1), 2),
    ((1, 0, 0), 4), ((0, 1, 0), 3), ((0, 0, 1), 6), ((0, 0, 0), 47),
]
_GOLDEN_SENS = [0.9415583898692108, 0.8493785025004894, 0.7667088709525609]
_GOLDEN_SPEC = [0.943281689878763, 0.9469367704427127, 0.8893547929810574]
_GOLDEN_POSTERIOR = {
    (1, 1, 1): 0.9991630561835669,
    (1, 1, 0): 0.9783514146562602,
    (1, 0, 1): 0.9222582863665588,
    (0, 1, 1): 0.8166988851485366,
    (1, 0, 0): 0.3099069927851911,
    (0, 1, 0): 0.14432199329965237,
    (0, 0, 1): 0.04239752548492065,
    (0, 0, 0): 0.0016732208343583882,
}


def test_staple_matches_published_equations_fixed_point():
    """Gate staple_consensus against the exact-arithmetic fixed point of the
    published Warfield-2004 EM equations (constants vendored above; rerun
    `python benchmarks/staple_golden_derivation.py` to re-derive them)."""
    voxels = []
    for pat, count in _GOLDEN_PATTERNS:
        voxels.extend([pat] * count)
    dec = np.array(voxels, np.float32).T  # (3 raters, 100 voxels)
    raters = [dec[i].reshape(10, 10) for i in range(3)]
    res = staple_consensus(raters, max_iterations=500, epsilon=1e-7)
    np.testing.assert_allclose(
        np.asarray(res.sensitivities), _GOLDEN_SENS, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(res.specificities), _GOLDEN_SPEC, atol=2e-4)
    probs = np.asarray(res.probabilities)
    cons = np.asarray(res.consensus).reshape(-1)
    for j, pat in enumerate(voxels):
        assert abs(probs[j] - _GOLDEN_POSTERIOR[pat]) < 5e-4, (
            pat, probs[j], _GOLDEN_POSTERIOR[pat])
        assert cons[j] == int(_GOLDEN_POSTERIOR[pat] > 0.5)
