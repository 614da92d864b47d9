"""Subprocess worker for the 2-process multi-host e2e test.

Runs the REAL production driver (`train_dl`) as one process of a 2-process
JAX distributed job on the CPU backend (4 virtual devices per process, Gloo
collectives — the same code path a Cloud TPU pod slice launch takes through
`main.maybe_init_distributed`). Prints the final DP vector for cross-process
equality checks.

Usage: python multihost_worker.py <process_id> <coordinator_port> <fixture_dir> <out_dir>
"""

import os
import sys


def main():
    pid, port, fixture_dir, out_dir = sys.argv[1:5]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
    )

    from deep_staple_tpu.core.config import TrainConfig
    from deep_staple_tpu.main import maybe_init_distributed

    config = TrainConfig(
        dist_num_processes=2,
        dist_coordinator=f"127.0.0.1:{port}",
        dist_process_id=int(pid),
        mesh_data_axis=8,
        epochs=1,
        batch_size=8,
        num_val_images=1,
        atlas_count=1,
        use_checkpointing=False,
        ool_mode="fused",
        save_every=1000,
        save_labels=False,
        # Orbax on multi-host: save_checkpoint is entered by BOTH processes
        # as a global collective (train/checkpoint.py); epx 0 saves
        # (0 % save_every == 0), giving the e2e run a real 2-process
        # collective checkpoint to restore below.
        checkpoint_backend="orbax",
        lr_inst_param=0.2,
        output_dir=os.path.join(out_dir, "out"),
        mdl_save_prefix=os.path.join(out_dir, "models"),
    )
    assert maybe_init_distributed(config)

    import numpy as np

    from deep_staple_tpu.data.crossmoda import (
        CrossmodaHybridIdDataset, get_crossmoda_data_load_closure,
    )
    from deep_staple_tpu.train.driver import train_dl

    closure = get_crossmoda_data_load_closure(
        base_dir=fixture_dir, domain="target", state="l4", use_additional_data=False,
        size=(16, 16, 16), resample=True, normalize=True, crop_3d_w_dim_range=None,
        ensure_labeled_pairs=True, modified_3d_label_override=None, debug=False,
    )
    dataset = CrossmodaHybridIdDataset(
        closure, size=(16, 16, 16), resample=True, normalize=True,
        crop_3d_w_dim_range=None, ensure_labeled_pairs=True,
        prevent_disturbance=True, pre_interpolation_factor=1.5,
    )
    results = train_dl("mh-e2e", config, dataset, atlas_count=1)
    dp = np.asarray(results[0]["state"].dp_params)
    print("DP_VECTOR", " ".join(f"{v:.6e}" for v in dp), flush=True)

    # Multi-host orbax round-trip: restore the collective save both
    # processes just wrote and check it reproduces the final state.
    import jax

    from deep_staple_tpu.train.checkpoint import checkpoint_exists, restore_checkpoint

    ckpt = os.path.join(out_dir, "models", "mh-e2e_fold0_epx0")
    assert checkpoint_exists(ckpt), ckpt
    assert os.path.isdir(os.path.join(ckpt, "state.orbax"))
    template = jax.tree.map(
        lambda x: np.zeros(x.shape, x.dtype) if hasattr(x, "shape") else x,
        results[0]["state"],
    )
    restored = restore_checkpoint(ckpt, template)
    np.testing.assert_array_equal(np.asarray(restored.dp_params), dp)
    np.testing.assert_array_equal(
        np.asarray(restored.step), np.asarray(results[0]["state"].step)
    )
    print("ORBAX_ROUNDTRIP_OK", flush=True)


if __name__ == "__main__":
    main()
