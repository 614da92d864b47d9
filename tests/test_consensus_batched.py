"""Batched (vmapped) consensus must equal the per-case path."""

import numpy as np

from deep_staple_tpu.consensus.evaluate import evaluate_consensus
from deep_staple_tpu.consensus.staple import staple_consensus, staple_consensus_batch


def _snapshot(rng, cases=3, atlases=4, shape=(10, 9, 8)):
    d_ids, labels, mods, dps = [], [], [], []
    for c in range(cases):
        truth = np.zeros(shape, np.int32)
        truth[2:7, 2:7, 2:6] = 1
        truth = np.roll(truth, c, axis=0)
        for m in range(atlases):
            d_ids.append(f"{c:03d}l:m{100+m:03d}l")
            labels.append(truth)
            mods.append(np.roll(truth, rng.randint(-2, 3, 3), (0, 1, 2)))
            dps.append(rng.randn())
    n = len(d_ids)
    return {
        "d_ids": d_ids,
        "data_parameters": np.asarray(dps, np.float32),
        "labels": np.stack(labels),
        "modified_labels": np.stack(mods),
        "train_predictions": np.stack(labels),
        "dataset_idxs": np.arange(n),
        "image_paths": ["x"] * n,
        "label_paths": ["y"] * n,
        "disturb_flags": np.zeros(n, bool),
    }


def test_batched_consensus_matches_loop(rng):
    snap = _snapshot(rng)
    a = evaluate_consensus(dict(snap), staple_max_iterations=40, batch_cases=False)
    b = evaluate_consensus(dict(snap), staple_max_iterations=40, batch_cases=True)
    assert set(a.keys()) == set(b.keys())
    for f_id in a:
        np.testing.assert_array_equal(np.asarray(a[f_id]["dp_consensus"]), b[f_id]["dp_consensus"])
        np.testing.assert_array_equal(
            np.asarray(a[f_id]["staple_consensus"]), b[f_id]["staple_consensus"]
        )
        np.testing.assert_allclose(
            np.asarray(a[f_id]["dp_consensus_oracle_dice"]),
            b[f_id]["dp_consensus_oracle_dice"], rtol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(a[f_id]["staple_consensus_oracle_dice"]),
            b[f_id]["staple_consensus_oracle_dice"], rtol=1e-5,
        )


def test_staple_batch_matches_single(rng):
    stacks = (rng.rand(3, 5, 8, 8, 8) > 0.7).astype(np.int32)
    batch = staple_consensus_batch(stacks, max_iterations=30)
    for c in range(3):
        single = staple_consensus(list(stacks[c]), max_iterations=30)
        np.testing.assert_array_equal(np.asarray(batch.consensus[c]), np.asarray(single.consensus))
        np.testing.assert_allclose(
            np.asarray(batch.sensitivities[c]), np.asarray(single.sensitivities), rtol=1e-4, atol=1e-5
        )
