"""Loss + DP-optimizer numerics vs torch."""

import numpy as np
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from deep_staple_tpu.train.losses import (
    weighted_cross_entropy,
    per_sample_cross_entropy,
    dp_loss_fn,
)
from deep_staple_tpu.train.optim import (
    sparse_adam_init,
    sparse_adam_update,
    exp_lr,
    cosine_warm_restarts_lr,
)


def test_weighted_ce_matches_torch(rng):
    logits = rng.randn(2, 5, 6, 4, 3).astype(np.float32)  # (B,D,H,W,C)
    targets = rng.randint(0, 3, size=(2, 5, 6, 4)).astype(np.int64)
    cw = np.array([0.2, 1.0, 2.5], np.float32)

    t_logits = torch.from_numpy(np.moveaxis(logits, -1, 1))
    want = nn.CrossEntropyLoss(torch.from_numpy(cw))(t_logits, torch.from_numpy(targets)).item()
    got = float(weighted_cross_entropy(jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(cw)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_per_sample_ce_matches_torch(rng):
    logits = rng.randn(3, 5, 6, 4, 2).astype(np.float32)
    targets = rng.randint(0, 2, size=(3, 5, 6, 4)).astype(np.int64)
    t_logits = torch.from_numpy(np.moveaxis(logits, -1, 1))
    want = (
        nn.CrossEntropyLoss(reduction="none")(t_logits, torch.from_numpy(targets))
        .mean(dim=(-3, -2, -1))
        .numpy()
    )
    got = np.asarray(per_sample_cross_entropy(jnp.asarray(logits), jnp.asarray(targets)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_dp_loss_matches_reference_formula(rng):
    """Full DP loss vs an exact torch transcription of main_deep_staple.py:738-759."""
    B = 4
    logits = rng.randn(B, 5, 6, 4, 2).astype(np.float32)
    targets = rng.randint(0, 2, size=(B, 5, 6, 4)).astype(np.int64)
    bare = rng.randn(B).astype(np.float32)
    fixed = (rng.rand(B).astype(np.float32) + 2.0)

    t_logits = torch.from_numpy(np.moveaxis(logits, -1, 1))
    t_tgt = torch.from_numpy(targets)
    dp_loss = nn.CrossEntropyLoss(reduction="none")(t_logits, t_tgt).mean(dim=(-3, -2, -1))
    weight = torch.sigmoid(torch.from_numpy(bare))
    weight = weight / weight.mean()
    weight = weight / torch.from_numpy(fixed)
    p_pred_num = (t_logits.argmax(1) > 0).sum(dim=(-3, -2, -1)).detach()
    risk = -weight * p_pred_num / (5 * 6 * 4)
    want = ((dp_loss * weight).sum() + risk.sum()).item()

    got = float(
        dp_loss_fn(
            jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(bare), jnp.asarray(fixed),
            use_risk_regularization=True,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_sparse_adam_matches_torch(rng):
    N = 6
    emb = nn.Embedding(N, 1, sparse=True)
    with torch.no_grad():
        emb.weight.zero_()
    opt = torch.optim.SparseAdam(emb.parameters(), lr=0.1)

    params = jnp.zeros((N,), jnp.float32)
    st = sparse_adam_init(params)

    batches = [np.array([0, 2, 3]), np.array([1, 2]), np.array([0, 4, 5]), np.array([2])]
    for step, idxs in enumerate(batches):
        coef = rng.randn(len(idxs)).astype(np.float32)
        # torch step
        opt.zero_grad()
        loss = (emb(torch.from_numpy(idxs.astype(np.int64))).squeeze(-1) * torch.from_numpy(coef)).sum()
        loss.backward()
        opt.step()
        # ours
        grads = jnp.zeros((N,)).at[jnp.asarray(idxs)].add(jnp.asarray(coef))
        touched = jnp.zeros((N,), bool).at[jnp.asarray(idxs)].set(True)
        params, st = sparse_adam_update(params, grads, st, touched, 0.1)

    np.testing.assert_allclose(
        np.asarray(params), emb.weight.detach().numpy().squeeze(-1), rtol=1e-4, atol=1e-6
    )


def test_lr_schedules_match_torch():
    lin = nn.Linear(1, 1)
    opt = torch.optim.AdamW(lin.parameters(), lr=0.01)
    sched = torch.optim.lr_scheduler.ExponentialLR(opt, gamma=0.99)
    for k in range(5):
        assert abs(exp_lr(0.01, k) - opt.param_groups[0]["lr"]) < 1e-12
        sched.step()

    opt2 = torch.optim.AdamW(lin.parameters(), lr=0.01)
    sched2 = torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(opt2, T_0=10, T_mult=2)
    for k in range(35):
        assert abs(cosine_warm_restarts_lr(0.01, k) - opt2.param_groups[0]["lr"]) < 1e-9
        sched2.step()
