"""2D-path parity gates (the twin of test_torch_parity.py for the reference's
torchvision `lraspp_mobilenet_v3_large` 2D model, `main_deep_staple.py:386-394`).

Cross-checks the Flax `LRASPPMobileNetV3Large2D` against an independent torch
restatement with torchvision's exact state_dict key layout
(`benchmarks.torch_reference_2d.TorchLRASPP2D`):

  1. parameter-count gate (hardcoded literal so joint drift is caught),
  2. fp32 logit parity on a fixed image (eval mode, transplanted BN stats),
  3. flax -> torchvision-format export round-trips.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from benchmarks.torch_reference_2d import TorchLRASPP2D
from deep_staple_tpu.models.lraspp2d import LRASPPMobileNetV3Large2D
from deep_staple_tpu.models.torch_interop import (
    flax_lraspp2d_to_torchvision,
    torchvision_lraspp2d_to_flax,
)

H, W = 40, 48


@pytest.fixture(scope="module")
def torch_model_and_variables():
    torch.manual_seed(0)
    tm = TorchLRASPP2D(in_channels=1, num_classes=2)
    # Advance BN running stats away from (0, 1) so eval parity actually
    # exercises the transplanted statistics.
    tm.train()
    with torch.no_grad():
        for i in range(2):
            tm(torch.randn(2, 1, H, W, generator=torch.Generator().manual_seed(i)))
    return tm, torchvision_lraspp2d_to_flax(tm.state_dict())


def test_param_count_gate(torch_model_and_variables):
    tm, variables = torch_model_and_variables
    n_torch = sum(p.numel() for p in tm.parameters())
    n_flax = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    # torchvision lraspp_mobilenet_v3_large at num_classes=2 with the stem
    # conv swapped to in_channels=1 (the 2D twin of the 3D 1,228,932 gate).
    # Checks out against torchvision's published 3,221,538 at num_classes=21:
    # -(41+129)*19 classifier shrink, -16*2*3*3 stem in-channel swap.
    assert n_torch == n_flax == 3_218_020


def test_variables_cover_model(torch_model_and_variables):
    _, variables = torch_model_and_variables
    model = LRASPPMobileNetV3Large2D(num_classes=2)
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 1)), train=False)
    # Converted tree structure must match the model's own init exactly.
    assert jax.tree.structure(init["params"]) == jax.tree.structure(variables["params"])
    assert jax.tree.structure(init["batch_stats"]) == jax.tree.structure(
        variables["batch_stats"]
    )
    for a, b in zip(jax.tree.leaves(init["params"]), jax.tree.leaves(variables["params"])):
        assert a.shape == b.shape


def test_eval_logit_parity(torch_model_and_variables):
    tm, variables = torch_model_and_variables
    tm.eval()
    x = np.random.RandomState(7).randn(2, 1, H, W).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()

    model = LRASPPMobileNetV3Large2D(num_classes=2)
    out = model.apply(variables, jnp.asarray(np.moveaxis(x, 1, -1)), train=False)["out"]
    got = np.moveaxis(np.asarray(out), -1, 1)
    # bilinear resize + conv emitter differences keep this in fp32 tolerance
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_export_roundtrip(torch_model_and_variables):
    tm, variables = torch_model_and_variables
    sd = flax_lraspp2d_to_torchvision(variables)
    ref_sd = tm.state_dict()
    missing = {k for k in ref_sd if "num_batches_tracked" not in k} - set(sd)
    assert not missing, sorted(missing)[:5]
    for k, v in sd.items():
        np.testing.assert_array_equal(v, ref_sd[k].numpy(), err_msg=k)
