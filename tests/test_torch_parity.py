"""Torch <-> Flax weight-transplant parity gate (SURVEY.md §7 build gate #2).

Transplants a reference-format torch state_dict (layout of
`deep_staple/MobileNet_LR_ASPP_3D.py:261-270`, produced here by
`benchmarks.torch_reference_step.TorchLRASPP3D` whose key layout is
reference-identical) into the Flax model and asserts:

  1. fp32 logit parity on a fixed volume (eval mode, transplanted BN stats),
  2. one-step training parity vs the reference's per-batch schedule
     (`main_deep_staple.py:707-773`): CE loss, model gradient global norm,
     AdamW update magnitude, OOL DP loss, and the SparseAdam DP update,
  3. the flax->torch export round-trips.

Dropout is disabled on both sides (rate 0) — the masks are framework RNG and
cannot be made equal; everything else runs the real train-mode path.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from benchmarks.torch_reference_step import TorchLRASPP3D
from deep_staple_tpu.core.config import TrainConfig
from deep_staple_tpu.models import MobileNetLRASPP3D
from deep_staple_tpu.models.torch_interop import (
    flax_variables_to_torch_state_dict,
    torch_state_dict_to_flax,
)
from deep_staple_tpu.train.losses import weighted_cross_entropy
from deep_staple_tpu.train.optim import make_model_optimizer
from deep_staple_tpu.train.state import create_state
from deep_staple_tpu.train.step import make_train_step

SPATIAL = (24, 24, 16)
B, N = 2, 6
CW = np.array([0.5, 1.5], np.float32)


@pytest.fixture(scope="module")
def torch_model_and_variables():
    torch.manual_seed(0)
    tm = TorchLRASPP3D()
    tm.aspp.project[3].p = 0.0  # disable dropout (see module docstring)
    # Advance BN running stats away from the (0, 1) init so eval parity
    # actually exercises the transplanted statistics.
    tm.train()
    with torch.no_grad():
        for i in range(2):
            tm(torch.randn(2, 1, *SPATIAL, generator=torch.Generator().manual_seed(i)))
    variables = torch_state_dict_to_flax(tm.state_dict())
    return tm, variables


def _flax_model():
    return MobileNetLRASPP3D(num_classes=2, use_checkpointing=False, dropout_rate=0.0)


def _batch(rng):
    return {
        "image": rng.randn(B, *SPATIAL).astype(np.float32),
        "label": (rng.rand(B, *SPATIAL) > 0.8).astype(np.int32),
        "modified_label": (rng.rand(B, *SPATIAL) > 0.8).astype(np.int32),
        "dataset_idx": np.array([1, 3], np.int32),
    }


def test_logit_parity_eval(torch_model_and_variables, rng):
    tm, variables = torch_model_and_variables
    x = rng.randn(B, *SPATIAL).astype(np.float32)

    tm.eval()
    with torch.no_grad():
        want = tm(torch.from_numpy(x)[:, None]).numpy()  # (B, C, D, H, W)

    got = _flax_model().apply(variables, jnp.asarray(x)[..., None], train=False)["out"]
    got = np.moveaxis(np.asarray(got), -1, 1)

    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-5)


def test_one_step_parity(torch_model_and_variables, rng):
    import copy

    tm, variables = torch_model_and_variables
    tm = copy.deepcopy(tm)  # the step mutates params/BN stats in place
    batch = _batch(rng)
    dp0 = rng.randn(N).astype(np.float32) * 0.1
    fixed = (4.0 + rng.rand(N)).astype(np.float32)
    lr = 0.01

    # --- torch side: the reference per-batch schedule (:707-773) ---
    img = torch.from_numpy(batch["image"])[:, None]
    mod = torch.from_numpy(batch["modified_label"]).long()
    idxs = torch.from_numpy(batch["dataset_idx"]).long()
    tm.train()
    before = [p.detach().clone() for p in tm.parameters()]
    opt = torch.optim.AdamW(tm.parameters(), lr=lr)
    emb = torch.nn.Embedding(N, 1, sparse=True)
    emb.weight.data = torch.from_numpy(dp0)[:, None].clone()
    opt_dp = torch.optim.SparseAdam(emb.parameters(), lr=0.1)
    t_fixed = torch.from_numpy(fixed)

    opt.zero_grad()
    ce_t = torch.nn.CrossEntropyLoss(torch.from_numpy(CW))(tm(img), mod)
    ce_t.backward()
    gnorm_t = torch.sqrt(sum((p.grad**2).sum() for p in tm.parameters()))
    opt.step()
    upd_t = torch.sqrt(
        sum(((p - b) ** 2).sum() for p, b in zip(tm.parameters(), before))
    )

    for p in tm.parameters():
        p.requires_grad = False
    dp_logits = tm(img)  # strict OOL: second forward with UPDATED params
    per_ce = torch.nn.CrossEntropyLoss(reduction="none")(dp_logits, mod).mean(
        dim=(-3, -2, -1)
    )
    w = torch.sigmoid(emb(idxs).squeeze(-1))
    w = w / w.mean() / t_fixed[idxs]
    ppn = (dp_logits.argmax(1) > 0).sum(dim=(-3, -2, -1)).detach()
    dp_t = (per_ce * w).sum() + (-w * ppn / float(np.prod(SPATIAL))).sum()
    opt_dp.zero_grad()
    dp_t.backward()
    opt_dp.step()
    dp_after_t = emb.weight.detach().numpy()[:, 0]

    # --- jax side: the fused strict-OOL train step ---
    config = TrainConfig(use_checkpointing=False, ool_mode="strict")
    model = _flax_model()
    state, tx = create_state(model, (1,) + SPATIAL + (1,), N, use_data_params=True)
    state = state.replace(
        params=jax.tree.map(jnp.asarray, variables["params"]),
        batch_stats=jax.tree.map(jnp.asarray, variables["batch_stats"]),
        opt_state=make_model_optimizer(0.01).init(variables["params"]),
        dp_params=jnp.asarray(dp0),
    )
    step = make_train_step(model, tx, config, CW, fixed, augment=False)
    new_state, metrics = step(state, batch, lr, jax.random.PRNGKey(0))

    np.testing.assert_allclose(
        float(metrics["ce_loss"]), float(ce_t.detach()), rtol=2e-5, atol=1e-6
    )
    # dp_loss is evaluated on the post-AdamW-step params (strict OOL). Adam's
    # first step is lr*g/(|g|+eps) — sign-like, so framework fp noise in
    # near-zero grads perturbs the updated params by O(lr) and the dp_loss
    # scalar inherits a ~1e-2 relative wobble. The DP *update* below is still
    # tight (1e-7): its gradient passes through the same sign-like SparseAdam.
    np.testing.assert_allclose(
        float(metrics["dp_loss"]), float(dp_t.detach()), rtol=5e-2, atol=1e-6
    )

    def g_norm(tree):
        return float(
            jnp.sqrt(sum(jnp.sum(x**2) for x in jax.tree.leaves(tree)))
        )

    def ce_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            jnp.asarray(batch["image"])[..., None],
            train=True,
            rngs={"dropout": jax.random.PRNGKey(0)},
            mutable=["batch_stats"],
        )
        return weighted_cross_entropy(
            out["out"], jnp.asarray(batch["modified_label"]), jnp.asarray(CW)
        )

    grads = jax.grad(ce_fn)(state.params)
    np.testing.assert_allclose(g_norm(grads), float(gnorm_t), rtol=2e-3)

    upd = jax.tree.map(lambda a, b: a - b, new_state.params, state.params)
    np.testing.assert_allclose(g_norm(upd), float(upd_t), rtol=5e-4)

    dp_after = np.asarray(new_state.dp_params)
    np.testing.assert_allclose(dp_after, dp_after_t, rtol=1e-4, atol=2e-6)
    # Untouched DP rows must be exactly untouched on both sides.
    untouched = np.setdiff1d(np.arange(N), batch["dataset_idx"])
    np.testing.assert_array_equal(dp_after[untouched], dp0[untouched])


def test_flax_to_torch_roundtrip(torch_model_and_variables, rng):
    tm, variables = torch_model_and_variables
    sd = flax_variables_to_torch_state_dict(variables)

    torch.manual_seed(1)
    tm2 = TorchLRASPP3D()
    tm2.aspp.project[3].p = 0.0
    missing, unexpected = tm2.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, strict=False
    )
    assert not unexpected
    assert all("num_batches_tracked" in k for k in missing)

    x = rng.randn(1, *SPATIAL).astype(np.float32)
    tm.eval(), tm2.eval()
    with torch.no_grad():
        np.testing.assert_allclose(
            tm2(torch.from_numpy(x)[:, None]).numpy(),
            tm(torch.from_numpy(x)[:, None]).numpy(),
            rtol=1e-5,
            atol=1e-6,
        )
