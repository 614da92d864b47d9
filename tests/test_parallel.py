"""Multi-chip paths on the virtual 8-device CPU mesh: data-parallel train step
equivalence and spatially-sharded whole-volume inference correctness."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from deep_staple_tpu.core.config import TrainConfig
from deep_staple_tpu.models import MobileNetLRASPP3D
from deep_staple_tpu.parallel.mesh import make_mesh, shard_batch, replicate_state
from deep_staple_tpu.parallel.spatial import make_whole_volume_inference
from deep_staple_tpu.train.driver import make_model
from deep_staple_tpu.train.state import create_state
from deep_staple_tpu.train.step import make_train_step


@pytest.fixture(scope="module")
def tiny_setup():
    # fused OOL: dp_loss is computed from the pre-update logits, so it is a
    # deterministic pre-update scalar comparable across shardings (strict mode
    # evaluates dp_loss on post-AdamW params, which are sign-amplified).
    config = TrainConfig(use_checkpointing=False, ool_mode="fused")
    model, _ = make_model(config, 2)
    B, base = 8, (16, 16, 12)
    aug = tuple(int(s * 1.5) for s in base)
    n = 32
    state, tx = create_state(model, (1,) + aug + (1,), n)
    cw = np.array([0.5, 1.5], np.float32)
    fw = np.full((n,), 5.0, np.float32)
    step = make_train_step(model, tx, config, cw, fw, pre_interpolation_factor=1.5)
    rng = np.random.RandomState(0)
    batch = {
        "image": rng.randn(B, *base).astype(np.float32),
        "label": (rng.rand(B, *base) > 0.8).astype(np.int32),
        "modified_label": (rng.rand(B, *base) > 0.8).astype(np.int32),
        "dataset_idx": np.arange(B, dtype=np.int32),
    }
    return model, state, step, batch


def test_data_parallel_step_matches_single_device(tiny_setup):
    """Sharded-vs-unsharded equivalence of the *compute graph*.

    Pre-update quantities (CE loss, per-sample dice) must match tightly.
    Post-update params are NOT compared: AdamW's first step is ~lr*sign(g),
    which amplifies 1e-7 reduction-order differences into sign flips — an
    inherent property of the optimizer, not a sharding bug.
    """
    model, state, step, batch_np = tiny_setup
    key = jax.random.PRNGKey(0)

    batch1 = {k: jnp.asarray(v) for k, v in batch_np.items()}
    s1, m1 = step(state, batch1, 0.01, key)

    mesh = make_mesh(data=8, space=1)
    with mesh:
        state8 = replicate_state(state, mesh)
        batch8 = shard_batch(batch_np, mesh)
        s8, m8 = step(state8, batch8, 0.01, key)

    np.testing.assert_allclose(
        np.asarray(m1["ce_loss"]), np.asarray(m8["ce_loss"]), rtol=2e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(m1["dp_loss"]), np.asarray(m8["dp_loss"]), rtol=2e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(m1["dice"]), np.asarray(m8["dice"]), rtol=1e-5, atol=1e-6, equal_nan=True
    )
    # DP rows touched by the batch moved; untouched rows did not.
    dp1 = np.asarray(s1.dp_params)
    dp8 = np.asarray(s8.dp_params)
    B = batch_np["image"].shape[0]
    assert np.all(dp1[B:] == 0) and np.all(dp8[B:] == 0)
    assert np.all(dp1[:B] != 0) and np.all(dp8[:B] != 0)


def test_data_parallel_production_preset_int6(tiny_setup):
    """`--preset production --mesh_data_axis N` gate, two halves:

    1. The fused int6 packed warp (bitwise pack/unpack + per-sample absmax
       inside the jit) shards correctly over ('data',): f32 compute so the
       sharded and unsharded graphs must agree tightly (the only intended
       difference is reduction order). int6 remains production-reachable as
       the spatially-sharded-mesh downgrade target and the closest native-
       sharding sibling of fast-sep.
    2. The full bf16 production preset (fast-sep since r4) compiles and runs
       sharded with the driver's mesh wiring (shard_map'd warp passes); only
       sanity-bounded (bf16's ~0.4% mantissa eps makes 8-way reduction
       reorder differences of ~1-2% on the small dp_loss legitimate —
       measured 1.8% vs the f32 int6 half, plus the sep warp's ~0.3-1%
       voxel deltas — so tight equivalence belongs to the f32 half and to
       test_sep_warp.py::test_train_step_sep_mesh).
    """
    _, state, _, batch_np = tiny_setup
    n = int(np.asarray(state.dp_params).shape[0])
    cw = np.array([0.5, 1.5], np.float32)
    fw = np.full((n,), 5.0, np.float32)
    aug = tuple(int(s * 1.5) for s in batch_np["image"].shape[1:])
    key = jax.random.PRNGKey(0)
    batch1 = {k: jnp.asarray(v) for k, v in batch_np.items()}
    mesh = make_mesh(data=8, space=1)
    B = batch_np["image"].shape[0]

    # --- half 1: int6 warp sharding equivalence (f32) ---
    config = TrainConfig.tpu_production(
        use_checkpointing=False, compute_dtype="float32", augment_order="fast-int6"
    )
    model, _ = make_model(config, 2)
    state_p, tx = create_state(model, (1,) + aug + (1,), n)
    step = make_train_step(model, tx, config, cw, fw, pre_interpolation_factor=1.5)
    _, m1 = step(state_p, batch1, 0.01, key)
    with mesh:
        state8 = replicate_state(state_p, mesh)
        batch8 = shard_batch(batch_np, mesh)
        s8, m8 = step(state8, batch8, 0.01, key)
    np.testing.assert_allclose(
        np.asarray(m1["ce_loss"]), np.asarray(m8["ce_loss"]), rtol=2e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(m1["dp_loss"]), np.asarray(m8["dp_loss"]), rtol=2e-4, atol=1e-5
    )
    dp8 = np.asarray(s8.dp_params)
    assert np.all(dp8[B:] == 0) and np.all(dp8[:B] != 0)

    # --- half 2: full bf16 production preset runs sharded ---
    config_bf16 = TrainConfig.tpu_production(use_checkpointing=False)
    assert config_bf16.augment_order == "fast-sep"
    model_b, _ = make_model(config_bf16, 2)
    state_b, tx_b = create_state(model_b, (1,) + aug + (1,), n)
    step_b = make_train_step(model_b, tx_b, config_bf16, cw, fw,
                             pre_interpolation_factor=1.5, mesh=mesh)
    with mesh:
        sb, mb = step_b(replicate_state(state_b, mesh), shard_batch(batch_np, mesh), 0.01, key)
    assert np.isfinite(float(mb["loss"])) and np.isfinite(float(mb["dp_loss"]))
    np.testing.assert_allclose(
        float(mb["ce_loss"]), float(np.asarray(m1["ce_loss"])), rtol=5e-2
    )
    dpb = np.asarray(sb.dp_params)
    assert np.all(dpb[B:] == 0) and np.all(dpb[:B] != 0)


def test_spatially_sharded_inference_matches_unsharded():
    model = MobileNetLRASPP3D(num_classes=2, use_checkpointing=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 32, 12))
    variables = model.init({"params": jax.random.PRNGKey(1)}, x[..., None], train=False)

    want = np.asarray(jnp.argmax(model.apply(variables, x[..., None], train=False)["out"], -1))

    mesh = make_mesh(data=1, space=8)
    infer = make_whole_volume_inference(model, mesh)
    got = np.asarray(infer(variables, x))
    np.testing.assert_array_equal(got, want)


def test_dryrun_multichip_self_bootstraps_from_initialized_jax():
    """Regression gate for the driver artifact: dryrun_multichip must work
    even when jax is already imported/initialized in this process (as under
    the axon sitecustomize) by re-execing into a clean virtual-CPU child."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    assert "jax" in sys.modules  # precondition: the hostile case
    g.dryrun_multichip(2)  # raises on child failure


def test_spatially_sharded_train_step_matches_unsharded(tiny_setup):
    """Whole-volume (no-crop) TRAINING over the ('space',) axis: the fused
    train step jitted with the volume H axis sharded 4-way must match the
    unsharded step's pre-update scalars (CE, dp_loss, dice). On hardware the
    same path runs 128^3 L4 volumes (BASELINE.md stretch config); shapes here
    are CPU-small, the program (halo-exchanged convs via GSPMD) is the same.
    """
    model, state, step, batch_np = tiny_setup
    key = jax.random.PRNGKey(7)

    batch1 = {k: jnp.asarray(v) for k, v in batch_np.items()}
    _, m1 = step(state, batch1, 0.01, key)

    mesh = make_mesh(data=2, space=4)
    with mesh:
        state_s = replicate_state(state, mesh)
        batch_s = shard_batch(batch_np, mesh, spatial_axis=True)
        _, ms = step(state_s, batch_s, 0.01, key)

    for k in ("ce_loss", "dp_loss"):
        np.testing.assert_allclose(
            np.asarray(m1[k]), np.asarray(ms[k]), rtol=5e-4, atol=1e-5
        )
    # A handful of near-tie voxels flip argmax under the sharded reduction
    # order; on these tiny volumes that moves per-sample dice by ~3e-4.
    np.testing.assert_allclose(
        np.asarray(m1["dice"]), np.asarray(ms["dice"]), atol=1e-3,
        equal_nan=True,
    )


@pytest.fixture(scope="module")
def mesh_driver_runs(tmp_path_factory):
    """Three train_dl runs on the synthetic fixture: single-device, a data=8
    mesh (config.mesh_data_axis), and a data=2 x model=4 tensor-parallel mesh
    (config.mesh_model_axis) — all through the production driver path. Each
    is a full multi-minute 1-epoch training; this fixture dominates the
    module's wall-clock."""
    from deep_staple_tpu.data.synthetic import generate_synthetic_crossmoda
    from deep_staple_tpu.train.driver import train_dl
    from deep_staple_tpu.train.prepare import prepare_data

    root = tmp_path_factory.mktemp("meshsynth")
    generate_synthetic_crossmoda(
        root, num_cases=6, atlas_count=2, bad_atlases_per_case=1,
        size=(16, 16, 16), seed=0,
    )

    def run(mesh_axis, model_axis=1):
        # One epoch: after the first AdamW step the model params differ by
        # ~lr*sign(fp-noise) across shardings (see the data-parallel test's
        # docstring), so later-epoch DP grads diverge O(1) by construction.
        # One step proves the driver's mesh path end-to-end with comparable
        # numbers.
        tag = f"{mesh_axis}x{model_axis}"
        config = TrainConfig(
            dataset="synthetic", reg_state="synthetic",
            dataset_directory=str(root), crop_3d_w_dim_range=None,
            epochs=1, batch_size=8, num_val_images=2,
            use_checkpointing=False, ool_mode="fused", save_every=1000,
            save_labels=False, log_jsonl=False,
            output_dir=str(root / f"out{tag}"),
            mdl_save_prefix=str(root / f"models{tag}"),
            mesh_data_axis=mesh_axis,
            mesh_model_axis=model_axis,
        )
        dataset, atlas_count = prepare_data(config)
        return train_dl(f"mesh{tag}-test", config, dataset, atlas_count)

    return run(1), run(8), run(2, 4)


def test_train_dl_mesh_matches_single_device(mesh_driver_runs):
    res1, res8, _ = (r[0] for r in mesh_driver_runs)

    h1 = [r for r in res1["writer"].history if "losses/loss_fold0" in r]
    h8 = [r for r in res8["writer"].history if "losses/loss_fold0" in r]
    assert len(h1) == len(h8) == 1
    for a, b in zip(h1, h8):
        np.testing.assert_allclose(
            a["losses/loss_fold0"], b["losses/loss_fold0"], rtol=5e-4
        )

    dp1 = np.asarray(res1["state"].dp_params)
    dp8 = np.asarray(res8["state"].dp_params)
    np.testing.assert_allclose(dp1, dp8, atol=1e-3)
    # Same DP oracle: every trained instance moved in the same direction.
    t = res1["train_idxs"]
    assert np.all(np.sign(dp1[t]) == np.sign(dp8[t]))
    assert np.all(dp1[t] != 0) and np.all(dp8[t] != 0)


def test_train_dl_tensor_parallel_matches_single_device(mesh_driver_runs):
    """config.mesh_model_axis: the production driver on a (data=2, model=4)
    mesh — params + optimizer TP-sharded via parallel/tensor.py — must
    reproduce the single-device loss and DP trajectory."""
    res1, _, res_tp = (r[0] for r in mesh_driver_runs)

    h1 = [r for r in res1["writer"].history if "losses/loss_fold0" in r]
    htp = [r for r in res_tp["writer"].history if "losses/loss_fold0" in r]
    assert len(h1) == len(htp) == 1
    np.testing.assert_allclose(
        h1[0]["losses/loss_fold0"], htp[0]["losses/loss_fold0"], rtol=5e-4
    )

    dp1 = np.asarray(res1["state"].dp_params)
    dptp = np.asarray(res_tp["state"].dp_params)
    np.testing.assert_allclose(dp1, dptp, atol=1e-3)
    t = res1["train_idxs"]
    assert np.all(np.sign(dp1[t]) == np.sign(dptp[t]))
    assert np.all(dptp[t] != 0)


@pytest.mark.slow  # a fourth full train_dl run on the fixture
def test_train_dl_pipeline_parallel_matches_single_device(mesh_driver_runs, tmp_path):
    """config.mesh_pipe_stages=2: the production driver on two pipeline
    devices (stage 0 him+lom on device 0, stage 1 aspp+head+losses on device
    1, `parallel/pipeline.py::make_pp_train_step`) must reproduce the
    single-device loss and DP trajectory. pipe_microbatches=1 keeps the step
    math EXACT vs the fused step (same rng streams, same BN stats — gated in
    f64 by test_pp_train_step_matches_fused_step), so the driver-level
    tolerance is the same fp-noise bound the data/tensor mesh gates use.
    Also covers the post-epoch state re-placement: eval/checkpoint/snapshot
    run single-device on state whose stage trees lived on two devices."""
    from deep_staple_tpu.data.synthetic import generate_synthetic_crossmoda
    from deep_staple_tpu.train.driver import train_dl
    from deep_staple_tpu.train.prepare import prepare_data

    res1 = mesh_driver_runs[0][0]

    root = tmp_path / "ppsynth"
    generate_synthetic_crossmoda(
        root, num_cases=6, atlas_count=2, bad_atlases_per_case=1,
        size=(16, 16, 16), seed=0,
    )
    config = TrainConfig(
        dataset="synthetic", reg_state="synthetic",
        dataset_directory=str(root), crop_3d_w_dim_range=None,
        epochs=1, batch_size=8, num_val_images=2,
        use_checkpointing=False, ool_mode="fused", save_every=1000,
        save_labels=False, log_jsonl=False,
        output_dir=str(root / "outpp"),
        mdl_save_prefix=str(root / "modelspp"),
        mesh_pipe_stages=2, pipe_microbatches=1,
    )
    dataset, atlas_count = prepare_data(config)
    res_pp = train_dl("pp-test", config, dataset, atlas_count)[0]

    h1 = [r for r in res1["writer"].history if "losses/loss_fold0" in r]
    hpp = [r for r in res_pp["writer"].history if "losses/loss_fold0" in r]
    assert len(h1) == len(hpp) == 1
    np.testing.assert_allclose(
        h1[0]["losses/loss_fold0"], hpp[0]["losses/loss_fold0"], rtol=5e-4
    )

    dp1 = np.asarray(res1["state"].dp_params)
    dppp = np.asarray(res_pp["state"].dp_params)
    t = res1["train_idxs"]
    np.testing.assert_allclose(dp1, dppp, atol=1e-3)
    assert np.all(np.sign(dp1[t]) == np.sign(dppp[t]))
    assert np.all(dppp[t] != 0)
    # val dice was computed from the merged re-placed state (post-epoch
    # device_put) — it must exist and be finite.
    v = [r for r in res_pp["writer"].history if "scores/val_dice_mean_wo_bg_fold0" in r]
    assert v and np.isfinite(v[0]["scores/val_dice_mean_wo_bg_fold0"])


@pytest.mark.slow  # f64 GPipe-vs-sequential gate: ~3.5 min
def test_pipeline_gpipe_matches_sequential_accumulation():
    """Pipeline parallelism (parallel/pipeline.py): the 2-stage GPipe runner
    — stage 0 (him+lom) on device 0, stage 1 (aspp+head+upsample) on device 1,
    activation recomputation at the boundary — must equal the unsplit model:
    stage composition reproduces the train-mode forward EXACTLY, and the
    pipelined microbatch loss/grads equal sequential gradient accumulation.

    Runs under float64 so the gate is tight (1e-6 norm-relative): in f32 the
    two different jit fusion structures disagree by up to ~1e-2 on
    near-cancelling BN-backward grads (pure rounding, verified against this
    same f64 oracle), which would force a vacuously loose gate.
    """
    from deep_staple_tpu.parallel.pipeline import (
        GPipe2, merge_variables, split_variables,
    )

    with jax.enable_x64():
        model = MobileNetLRASPP3D(
            num_classes=2, use_checkpointing=False, dropout_rate=0.5
        )
        x = jax.random.normal(
            jax.random.PRNGKey(0), (4, 12, 12, 8, 1)
        ).astype(jnp.float64)
        labels = jax.random.randint(jax.random.PRNGKey(1), (4, 12, 12, 8), 0, 2)
        variables = model.init({"params": jax.random.PRNGKey(2)}, x, train=False)
        variables = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float64)
            if jnp.issubdtype(a.dtype, jnp.floating) else a,
            variables,
        )

        def ce(logits, lab):
            logp = jax.nn.log_softmax(logits, axis=-1)
            oh = jax.nn.one_hot(lab, 2, dtype=logits.dtype)
            return -jnp.mean(jnp.sum(oh * logp, axis=-1))

        pp = GPipe2(model, ce, in_spatial=x.shape[1:4])
        n_micro, m = 2, 2
        rng = jax.random.PRNGKey(3)
        rngs = jax.random.split(rng, n_micro)
        v0, v1 = pp.place_variables(variables)

        # split/merge roundtrip + exact train-mode stage composition
        s0, s1 = split_variables(variables)
        assert merge_variables(s0, s1)["params"].keys() == variables["params"].keys()
        (h, l), _ = pp.stage0.apply(
            v0, jax.device_put(x[:m], pp.d0), True, mutable=["batch_stats"]
        )
        out_s, _ = pp.stage1.apply(
            v1, jax.device_put(h, pp.d1), jax.device_put(l, pp.d1), True,
            rngs={"dropout": rngs[0]}, mutable=["batch_stats"],
        )
        out_f, _ = model.apply(
            variables, x[:m], train=True,
            rngs={"dropout": rngs[0]}, mutable=["batch_stats"],
        )
        comp = np.max(np.abs(np.asarray(out_s["out"]) - np.asarray(out_f["out"])))
        assert comp < 1e-12, f"stage composition diverged: {comp}"

        # pipelined fwd+bwd vs sequential microbatch accumulation
        loss_pp, (g0, g1), _ = pp.loss_and_grads(
            v0, v1, np.asarray(x), np.asarray(labels), rng, n_micro
        )

        def loss_full(params, xi, li, key):
            out, mut = model.apply(
                {**variables, "params": params}, xi, train=True,
                rngs={"dropout": key}, mutable=["batch_stats"],
            )
            return ce(out["out"], li), mut

        tot_l, tot_g = 0.0, None
        for i in range(n_micro):
            (li_, _), gi = jax.value_and_grad(loss_full, has_aux=True)(
                variables["params"], x[i * m:(i + 1) * m],
                labels[i * m:(i + 1) * m], rngs[i],
            )
            tot_l += li_ / n_micro
            gi = jax.tree_util.tree_map(lambda a: a / n_micro, gi)
            tot_g = gi if tot_g is None else jax.tree_util.tree_map(
                jnp.add, tot_g, gi
            )

        # The head's final upsample casts to f32 BY DESIGN (matching the
        # model, lraspp3d.py:402), so the loss scalar itself is f32-precision
        # even under x64; the grads below regain f64 agreement once the
        # cotangents re-enter the f64 network.
        np.testing.assert_allclose(loss_pp, float(tot_l), rtol=2e-5)
        ref = dict(jax.tree_util.tree_flatten_with_path(tot_g)[0])
        got = dict(jax.tree_util.tree_flatten_with_path({**g0, **g1})[0])
        assert set(ref) == set(got)
        for k, vref in ref.items():
            a, b = np.asarray(got[k]), np.asarray(vref)
            # norm-relative with a tiny atol: BN biases directly before the
            # next normalization have mathematically-zero (~1e-17) grads.
            assert np.max(np.abs(a - b)) <= 1e-9 + 1e-6 * np.max(np.abs(b)), (
                jax.tree_util.keystr(k)
            )

        # Full pipelined TRAIN step: per-stage AdamW updates resident on each
        # stage's device must equal one AdamW step on the UNSPLIT param tree
        # from the same (pipelined) grads — the claim is that the stage split
        # cannot change an element-wise optimizer's update. (Grad equality vs
        # sequential accumulation is the gate above; feeding tot_g here
        # instead would re-test it through Adam's g/(sqrt(v)+eps), which
        # amplifies ~1e-8 grad noise on small elements into ~1e-4 update
        # differences and gates nothing new.)
        import optax

        tx = optax.adamw(0.01)
        opt0, opt1 = pp.init_optimizer(tx, v0, v1)
        _, nv0, nv1, _, _ = pp.train_step(
            v0, v1, opt0, opt1, np.asarray(x), np.asarray(labels), rng, n_micro
        )
        g_merged = jax.device_get({**g0, **g1})
        upd, _ = tx.update(g_merged, tx.init(variables["params"]), variables["params"])
        want_p = jax.tree_util.tree_map(jnp.add, variables["params"], upd)
        got_p = merge_variables(nv0, nv1)["params"]
        wm = dict(jax.tree_util.tree_flatten_with_path(want_p)[0])
        gm = dict(jax.tree_util.tree_flatten_with_path(got_p)[0])
        assert set(wm) == set(gm)
        for k in wm:
            a, b = np.asarray(gm[k]), np.asarray(wm[k])
            assert np.max(np.abs(a - b)) <= 1e-9 + 1e-6 * np.max(np.abs(b)), (
                jax.tree_util.keystr(k)
            )


@pytest.mark.slow  # f64 step-equivalence gates: several distinct compiles
def test_pp_train_step_matches_fused_step():
    """`make_pp_train_step` (config.mesh_pipe_stages=2): the driver-integrated
    pipelined train step must reproduce `make_train_step` on the SAME
    DeepStapleState — params, batch_stats, DP vector, metrics — not just
    grads (the GPipe gate above covers those for the raw runner).

    Three gates, all f64 (see the GPipe test's docstring for why):

      1. fused OOL, n_micro=1: equal to the fused single-device step. The rng
         streams coincide by construction (same split(rng, 3), and the stage
         modules reuse the production submodule names so flax's path-folded
         dropout streams match), so the only differences are jit-fusion
         rounding. Params are gated at atol 2e-4: the head upsample's
         BY-DESIGN f32 cast (lraspp3d.py) seeds cotangents at f32 precision,
         and Adam at g≈0 amplifies |dg| by up to 1/eps — measured noise
         reaches ~3e-5 on near-cancelling conv grads, while a real bug is a
         sign flip, O(2*lr)=2e-2 (100x the gate).
      2. strict OOL, n_micro=1: same, through the second-forward schedule —
         with bn_mode='batch' (FWD#2 consumes and re-advances FWD#1's stats)
         AND bn_mode='async' (FWD#2 must normalize through the STEP-START
         stats and running stats advance once — the regime-switch rule,
         train/step.py).
      3. fused OOL, n_micro=2: equal to SEQUENTIAL microbatch accumulation of
         the unsplit model — per-microbatch grads with the GLOBAL CE
         denominator summed, BN stats averaged (parallel-accumulation GPipe
         semantics), one AdamW step, DP pass over the concatenated logits.
    """
    from deep_staple_tpu.parallel.pipeline import make_pp_train_step
    from deep_staple_tpu.train.losses import _nll, dp_loss_fn
    from deep_staple_tpu.train.optim import sparse_adam_init, sparse_adam_update
    from deep_staple_tpu.train.step import _with_lr, make_train_step

    with jax.enable_x64():
        model = MobileNetLRASPP3D(num_classes=2, use_checkpointing=False)
        B, base, n = 4, (12, 12, 8), 16
        state, tx = create_state(model, (1,) + base + (1,), n)

        def cast64(t):
            return jax.tree_util.tree_map(
                lambda a: a.astype(jnp.float64)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, t,
            )

        def to64(st):
            p64 = cast64(st.params)
            d64 = st.dp_params.astype(jnp.float64)
            return st.replace(
                params=p64, batch_stats=cast64(st.batch_stats),
                opt_state=tx.init(p64), dp_params=d64,
                dp_opt_state=sparse_adam_init(d64),
            )

        state = to64(state)
        cw = np.array([0.5, 1.5], np.float32)
        fw = np.full((n,), 5.0, np.float32)
        rng_np = np.random.RandomState(0)
        batch = {
            "image": rng_np.randn(B, *base).astype(np.float64),
            "label": (rng_np.rand(B, *base) > 0.8).astype(np.int32),
            "modified_label": (rng_np.rand(B, *base) > 0.8).astype(np.int32),
            "dataset_idx": np.arange(B, dtype=np.int32),
        }
        batch_j = {k: jnp.asarray(v) for k, v in batch.items()}
        key = jax.random.PRNGKey(0)
        lr = 0.01

        def assert_state_match(sa, sb, what):
            fa = dict(jax.tree_util.tree_flatten_with_path(
                (sa.params, sa.batch_stats))[0])
            fb = dict(jax.tree_util.tree_flatten_with_path(
                (sb.params, sb.batch_stats))[0])
            assert set(fa) == set(fb)
            for k in fa:
                d = np.max(np.abs(np.asarray(fa[k]) - np.asarray(fb[k])))
                assert d <= 2e-4, f"{what}: {jax.tree_util.keystr(k)} diff {d}"
            np.testing.assert_allclose(
                np.asarray(sa.dp_params), np.asarray(sb.dp_params),
                atol=1e-5, err_msg=what,
            )

        # --- gate 1+2: n_micro=1 vs the fused factory, both OOL modes,
        # plus the strict+async-BN regime-switch rule ---
        model_async = MobileNetLRASPP3D(
            num_classes=2, use_checkpointing=False, bn_mode="async"
        )
        state_async = to64(create_state(model_async, (1,) + base + (1,), n)[0])
        for ool, bn in (("fused", "batch"), ("strict", "batch"), ("strict", "async")):
            mdl = model if bn == "batch" else model_async
            st = state if bn == "batch" else state_async
            config = TrainConfig(use_checkpointing=False, ool_mode=ool, bn_mode=bn)
            ref_step = make_train_step(
                mdl, tx, config, cw, fw,
                pre_interpolation_factor=1.5, augment=False,
            )
            sr, mr = ref_step(st, batch_j, lr, key)
            pp_step = make_pp_train_step(
                mdl, tx, config, cw, fw,
                pre_interpolation_factor=1.5, augment=False, n_micro=1,
            )
            sp, mp = pp_step(st, batch, lr, key)
            np.testing.assert_allclose(
                float(mr["ce_loss"]), float(mp["ce_loss"]), rtol=2e-5,
                err_msg=ool,
            )
            np.testing.assert_allclose(
                float(mr["dp_loss"]), float(mp["dp_loss"]), rtol=2e-5,
                err_msg=ool,
            )
            np.testing.assert_allclose(
                np.asarray(mr["dice"]), np.asarray(mp["dice"]),
                rtol=1e-6, equal_nan=True, err_msg=ool,
            )
            assert_state_match(sr, sp, f"pp vs fused step ({ool}, bn={bn})")
            assert int(sp.step) == int(st.step) + 1

        # --- gate 3: n_micro=2 vs sequential microbatch accumulation ---
        config = TrainConfig(use_checkpointing=False, ool_mode="fused")
        pp_step2 = make_pp_train_step(
            model, tx, config, cw, fw,
            pre_interpolation_factor=1.5, augment=False, n_micro=2,
        )
        sp2, mp2 = pp_step2(state, batch, lr, key)

        cw_j = jnp.asarray(cw)
        img, lbl, mod = batch_j["image"], batch_j["label"], batch_j["modified_label"]

        def wsel(t):
            return cw_j[0] * (t == 0) + cw_j[1] * (t == 1)

        denom = jnp.sum(wsel(mod))
        _, rng_drop, _ = jax.random.split(key, 3)
        drops = jax.random.split(rng_drop, 2)
        m = B // 2

        def loss_mb(params, xi, ti, dkey):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                xi[..., None], train=True,
                rngs={"dropout": dkey}, mutable=["batch_stats"],
            )
            logits = out["out"]
            return jnp.sum(_nll(logits, ti) * wsel(ti)) / denom, (logits, mut)

        tot_g, tot_l, logits_mb, stats_mb = None, 0.0, [], []
        for i in range(2):
            (li, (lg, mut)), gi = jax.value_and_grad(loss_mb, has_aux=True)(
                state.params, img[i * m:(i + 1) * m],
                mod[i * m:(i + 1) * m], drops[i],
            )
            tot_l += li
            logits_mb.append(lg)
            stats_mb.append(mut["batch_stats"])
            tot_g = gi if tot_g is None else jax.tree_util.tree_map(jnp.add, tot_g, gi)

        upd, _ = tx.update(tot_g, _with_lr(state.opt_state, lr), state.params)
        want_params = jax.tree_util.tree_map(jnp.add, state.params, upd)
        want_stats = jax.tree_util.tree_map(
            lambda a, b: (a + b) / 2, stats_mb[0], stats_mb[1]
        )
        dp_logits = jax.lax.stop_gradient(jnp.concatenate(logits_mb, 0))
        idxs = batch_j["dataset_idx"]

        def dp_obj(dp_vec):
            return dp_loss_fn(
                dp_logits, mod, dp_vec[idxs], jnp.asarray(fw)[idxs],
                use_risk_regularization=True,
            )

        dp_loss, dp_g = jax.value_and_grad(dp_obj)(state.dp_params)
        touched = jnp.zeros_like(state.dp_params, jnp.bool_).at[idxs].set(True)
        want_dp, _ = sparse_adam_update(
            state.dp_params, dp_g, state.dp_opt_state, touched,
            config.lr_inst_param,
        )

        np.testing.assert_allclose(float(mp2["ce_loss"]), float(tot_l), rtol=2e-5)
        np.testing.assert_allclose(float(mp2["dp_loss"]), float(dp_loss), rtol=2e-5)
        oracle = state.replace(params=want_params, batch_stats=want_stats,
                               dp_params=want_dp)
        assert_state_match(sp2, oracle, "pp n_micro=2 vs sequential accumulation")


def test_multihost_input_sharding_math_and_assembly():
    """Per-host input sharding: the host index blocks partition the global
    batch contiguously, and single-process assembly produces global arrays
    identical to a plain data-sharded device_put."""
    import numpy as np

    from deep_staple_tpu.parallel.mesh import make_mesh, shard_batch
    from deep_staple_tpu.parallel.multihost import (
        host_shard_indices,
        local_batch_to_global,
    )

    idxs = np.arange(16)
    blocks = [host_shard_indices(idxs, 4, h) for h in range(4)]
    np.testing.assert_array_equal(np.concatenate(blocks), idxs)
    assert all(len(b) == 4 for b in blocks)
    with pytest.raises(ValueError):
        host_shard_indices(np.arange(10), 4, 0)

    mesh = make_mesh(data=8, space=1)
    rng = np.random.RandomState(0)
    batch = {
        "image": rng.randn(8, 6, 6, 4).astype(np.float32),
        "dataset_idx": np.arange(8, dtype=np.int32),
    }
    # single process: the "local" batch IS the global batch
    global_arrays = local_batch_to_global(batch, mesh)
    ref = shard_batch(batch, mesh)
    for k in batch:
        np.testing.assert_array_equal(np.asarray(global_arrays[k]), np.asarray(ref[k]))
        assert global_arrays[k].sharding.spec == ref[k].sharding.spec


def test_replicate_to_mesh_matches_device_put():
    """replicate_to_mesh (the multi-host-safe replacement for device_put with
    an empty PartitionSpec, used for val batches) must produce fully
    replicated arrays with identical contents."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from deep_staple_tpu.parallel.mesh import make_mesh
    from deep_staple_tpu.parallel.multihost import replicate_to_mesh

    mesh = make_mesh(data=4, space=2)
    tree = {"image": np.arange(24, dtype=np.float32).reshape(2, 3, 4)}
    out = replicate_to_mesh(tree, mesh)
    ref = jax.device_put(tree["image"], NamedSharding(mesh, P()))
    np.testing.assert_array_equal(np.asarray(out["image"]), np.asarray(ref))
    assert out["image"].sharding.is_fully_replicated


def test_maybe_init_distributed_wiring(monkeypatch):
    """main.maybe_init_distributed must call jax.distributed.initialize with
    the configured coordinator/count/id BEFORE any device use, and be a no-op
    when unconfigured (the single-host default)."""
    from deep_staple_tpu.core.config import TrainConfig
    from deep_staple_tpu.main import maybe_init_distributed

    calls = []

    def fake_init(coordinator_address=None, num_processes=None, process_id=None):
        calls.append((coordinator_address, num_processes, process_id))

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    assert maybe_init_distributed(TrainConfig()) is False
    assert maybe_init_distributed(TrainConfig(dist_num_processes=1)) is False
    assert calls == []
    assert maybe_init_distributed(
        TrainConfig(dist_num_processes=4, dist_coordinator="h0:8476", dist_process_id=2)
    ) is True
    assert calls == [("h0:8476", 4, 2)]


def test_train_dl_rejects_indivisible_multihost_mesh(monkeypatch):
    """With N processes, mesh_data_axis must divide over the hosts; the driver
    raises up front instead of failing inside host_shard_indices mid-epoch."""
    from deep_staple_tpu.train import driver as driver_mod

    monkeypatch.setattr(driver_mod.jax, "process_count", lambda: 3)
    with pytest.raises(ValueError, match="divide over 3 processes"):
        driver_mod.train_dl(
            "mh-reject", TrainConfig(mesh_data_axis=8, epochs=1), dataset=None
        )


def test_spatially_sharded_int6_production_warp(tiny_setup):
    """`--preset production --mesh-space-axis M`: on spatially-sharded TPU
    meshes the driver downgrades fast-sep to the fused int6 packed warp
    (the scanline passes gather along every spatial axis and can't run
    shard-locally), so the int6 warp's global flattened-index gathers over
    the packed image+label volume must stay correct when the volume H axis
    is sharded over ('space',) — GSPMD gathers from a sharded operand. f32
    compute so the only intended difference vs unsharded is reduction
    order."""
    _, state, _, batch_np = tiny_setup
    n = int(np.asarray(state.dp_params).shape[0])
    cw = np.array([0.5, 1.5], np.float32)
    fw = np.full((n,), 5.0, np.float32)
    aug = tuple(int(s * 1.5) for s in batch_np["image"].shape[1:])
    key = jax.random.PRNGKey(3)

    config = TrainConfig.tpu_production(
        use_checkpointing=False, compute_dtype="float32", augment_order="fast-int6"
    )
    model, _ = make_model(config, 2)
    state_p, tx = create_state(model, (1,) + aug + (1,), n)
    step = make_train_step(model, tx, config, cw, fw, pre_interpolation_factor=1.5)

    batch1 = {k: jnp.asarray(v) for k, v in batch_np.items()}
    _, m1 = step(state_p, batch1, 0.01, key)

    mesh = make_mesh(data=2, space=4)
    with mesh:
        state_s = replicate_state(state_p, mesh)
        batch_s = shard_batch(batch_np, mesh, spatial_axis=True)
        s_s, ms = step(state_s, batch_s, 0.01, key)

    for k in ("ce_loss", "dp_loss"):
        np.testing.assert_allclose(
            np.asarray(m1[k]), np.asarray(ms[k]), rtol=5e-4, atol=1e-5
        )
    dp = np.asarray(s_s.dp_params)
    B = batch_np["image"].shape[0]
    assert np.all(dp[:B] != 0) and np.all(dp[B:] == 0)


def test_tensor_parallel_forward_matches_unsharded():
    """Tensor parallelism (parallel/tensor.py): the Megatron-style column/row
    channel shardings over ('model',) must be pure annotation — logits equal
    to the unsharded forward (GSPMD inserts the psums). model=8 stresses the
    narrowest width (block-0 mid = 32 -> 4 channels/shard)."""
    from deep_staple_tpu.parallel.tensor import count_sharded_leaves, shard_tp

    model = MobileNetLRASPP3D(num_classes=2, use_checkpointing=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 12, 1))
    variables = model.init({"params": jax.random.PRNGKey(1)}, x, train=False)
    want = np.asarray(model.apply(variables, x, train=False)["out"])

    mesh = make_mesh(data=1, space=1, model=8)
    # anti-vacuity: the path rules must actually hit the model (148 of 195
    # leaves at these widths), or this test would pass on replicated params
    assert count_sharded_leaves(variables, mesh) > 100
    with mesh:
        v_tp = shard_tp(variables, mesh)
        got = np.asarray(model.apply(v_tp, x, train=False)["out"])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_tensor_parallel_train_step_matches_unsharded(tiny_setup):
    """Full train step on a (data=2, model=4) mesh: params + optimizer mirrors
    TP-sharded, batch data-sharded. Pre-update scalars must match the
    unsharded step; the updated params must STAY TP-sharded (the AdamW update
    ran sharded — mu/nu inherit the param specs by path suffix)."""
    from deep_staple_tpu.parallel.tensor import shard_tp

    model, state, step, batch_np = tiny_setup
    key = jax.random.PRNGKey(11)

    batch1 = {k: jnp.asarray(v) for k, v in batch_np.items()}
    _, m1 = step(state, batch1, 0.01, key)

    mesh = make_mesh(data=2, space=1, model=4)
    with mesh:
        state_tp = shard_tp(state, mesh)
        batch_tp = shard_batch(batch_np, mesh)
        s_tp, m_tp = step(state_tp, batch_tp, 0.01, key)

    for k in ("ce_loss", "dp_loss"):
        np.testing.assert_allclose(
            np.asarray(m1[k]), np.asarray(m_tp[k]), rtol=5e-4, atol=1e-5
        )
    np.testing.assert_allclose(
        np.asarray(m1["dice"]), np.asarray(m_tp["dice"]), atol=1e-3, equal_nan=True
    )
    dp = np.asarray(s_tp.dp_params)
    B = batch_np["image"].shape[0]
    assert np.all(dp[:B] != 0) and np.all(dp[B:] == 0)
    k0 = s_tp.params["him"]["InvertedResidual3D_0"]["ConvBN_0"]["Conv_0"]["kernel"]
    assert not k0.sharding.is_fully_replicated
