"""Batch segmentation serving from a training checkpoint.

`python -m deep_staple_tpu.serve --checkpoint <dir> --inputs a.nii.gz ... \
    --output-dir out/`

A production-facing surface the reference does not have (its only inference
path is the in-training `inference_wrap`, `main_deep_staple.py:471-487`):
load a `train/checkpoint.py` checkpoint once, preprocess arbitrary NIfTI
volumes exactly like the CrossMoDa training pipeline
(`CrossmodaHybridIdLoader.py:188-218` semantics: resample -> pad -> W-crop ->
z-normalize), run the jitted eval forward at the reference's x2.0 eval scale
(`HybridIdLoader.py:336`), and write label maps back onto each input's
original voxel grid (nearest resize, inverse of the prep chain) with the
source affine.

The forward is compiled once per (batch, shape) and inputs are grouped into
fixed-size batches (last batch padded) so serving N volumes costs one
compile + ceil(N/B) executions. The pipeline streams: a loader thread reads +
preprocesses batch k+1 while the device executes batch k and outputs are
written as each batch completes, so peak host memory is O(batch), not O(N).
`--mesh-data N` shards each batch over a ('data',) device mesh (multi-chip
serving; gate-tested byte-identical on the virtual mesh). Throughput is
reported from host-transfer syncs (block_until_ready is unreliable over the
axon tunnel — CLAUDE.md).
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from .core.config import TrainConfig
from .data.crossmoda import _prep_volume
from .data.nifti import load_nifti, save_nifti
from .data.np_ops import resize_nd_np
from .train.checkpoint import restore_checkpoint
from .train.driver import make_model
from .train.state import create_state
from .train.step import make_eval_step


def load_serving_state(checkpoint_dir, size=(128, 128, 128)):
    """Rebuild (model, config, state) from a checkpoint directory.

    The DP-vector length is recovered from the serialized state itself, so a
    checkpoint restores standalone without the original dataset. `size` is
    the canonical training volume size (the reference's L4 level is 128^3,
    `build_levels.py:129-155`).
    """
    from flax import serialization

    checkpoint_dir = Path(checkpoint_dir)
    config = TrainConfig.from_dict(json.loads((checkpoint_dir / "config.json").read_text()))
    if (checkpoint_dir / "state.orbax").is_dir():
        # Orbax backend: a template-free restore yields the raw pytree, from
        # which the DP length is read just like the msgpack path.
        import orbax.checkpoint as ocp

        with ocp.Checkpointer(ocp.StandardCheckpointHandler()) as ckptr:
            raw = ckptr.restore((checkpoint_dir / "state.orbax").resolve())
    else:
        raw = serialization.msgpack_restore((checkpoint_dir / "state.msgpack").read_bytes())
    dataset_len = int(np.asarray(raw["dp_params"]).reshape(-1).shape[0])

    num_classes = 2
    model, in_ch = make_model(config, num_classes=num_classes)
    spatial = list(size)
    if config.crop_3d_w_dim_range:
        spatial[-1] = config.crop_3d_w_dim_range[1] - config.crop_3d_w_dim_range[0]
    state, _ = create_state(model, (1, *spatial, in_ch), dataset_len)
    state = restore_checkpoint(checkpoint_dir, state)
    return model, config, state, num_classes


def preprocess(volume, config: TrainConfig, size=(128, 128, 128)):
    return _prep_volume(
        volume, size, resample=True,
        crop_3d_w_dim_range=config.crop_3d_w_dim_range, is_label=False, normalize=True,
    )


def serve(checkpoint_dir, input_paths, output_dir, batch_size: int = 4,
          eval_scale: float = 2.0, output_space: str = "input",
          size=(128, 128, 128), mesh_data: int = 1, mesh_space: int = 1):
    size = tuple(size)
    if mesh_data > 1 or mesh_space > 1:
        if batch_size % mesh_data:
            raise ValueError(
                f"--batch-size {batch_size} must be divisible by --mesh-data {mesh_data}"
            )
        if mesh_space > 1 and size[1] % mesh_space:
            raise ValueError(
                f"volume H axis {size[1]} must be divisible by --mesh-space {mesh_space}"
            )
        if mesh_data * mesh_space > len(jax.devices()):
            raise ValueError(
                f"--mesh-data {mesh_data} x --mesh-space {mesh_space} needs "
                f"{mesh_data * mesh_space} devices, have {len(jax.devices())}"
            )
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    model, config, state, num_classes = load_serving_state(checkpoint_dir, size)
    eval_step = make_eval_step(model, config, num_classes, eval_scale_factor=eval_scale)

    # Multi-chip serving: shard each fixed-size batch over a ('data',) mesh —
    # the SAME jitted eval forward runs on every chip with its batch rows
    # (GSPMD inserts nothing model-side: the eval forward has no cross-row
    # ops except the BN running stats, which are frozen constants here).
    # --mesh-space additionally shards each volume's H axis over ('space',)
    # (GSPMD inserts the conv halo exchanges) — whole-volume serving, the
    # axis that matters at eval_scale 2.0 where a single volume is 8x the
    # training activation footprint.
    mesh = None
    if mesh_data > 1 or mesh_space > 1:
        from .parallel.mesh import make_mesh, replicate_state, shard_batch as _shard

        mesh = make_mesh(data=mesh_data, space=mesh_space)
        state = replicate_state(state, mesh)
        print(f"serving on a data={mesh_data} space={mesh_space} device mesh")

    # Streaming double-buffered pipeline: a loader thread reads + preprocesses
    # batch k+1 while the device executes batch k (JAX dispatch is async; the
    # np.asarray of the prediction is the only sync). Peak host memory is two
    # batches of preprocessed volumes, independent of the input count.
    from concurrent.futures import ThreadPoolExecutor

    path_chunks = [
        input_paths[s : s + batch_size]
        for s in range(0, len(input_paths), batch_size)
    ]
    if not path_chunks:
        print("served 0 volumes (no inputs)")
        return []

    def _load_chunk(paths):
        vols, metas = [], []
        for p in paths:
            img = load_nifti(p)
            data = img.get_fdata()
            vols.append(preprocess(data, config, size))
            metas.append((Path(p), data.shape, img.affine))
        pad = batch_size - len(vols)
        return np.stack(vols + [vols[-1]] * pad), metas

    _write_output = _make_output_writer(output_dir, config, size, eval_scale, output_space)
    out_paths = []
    served = 0
    voxels = 0
    t0 = time.time()
    n_exec = 0
    with ThreadPoolExecutor(max_workers=1) as ex:
        fut = ex.submit(_load_chunk, path_chunks[0])
        for i in range(len(path_chunks)):
            batch_np, chunk_metas = fut.result()
            if i + 1 < len(path_chunks):
                fut = ex.submit(_load_chunk, path_chunks[i + 1])
            batch = {
                "image": jnp.asarray(batch_np),
                "label": jnp.zeros(batch_np.shape, jnp.int32),
            }
            if mesh is not None:
                batch = _shard(batch, mesh, spatial_axis=mesh_space > 1)
            pred, _ = eval_step(state, batch)
            pred_np = np.asarray(pred)[: len(chunk_metas)]  # host transfer = sync
            n_exec += 1
            for p, m in zip(pred_np, chunk_metas):
                served += 1
                voxels += int(np.prod(p.shape))
                out_paths.append(_write_output(p, m))
    dt = time.time() - t0
    print(f"served {served} volumes in {dt:.2f}s "
          f"({n_exec} executions, {voxels/max(dt,1e-9)/1e6:.0f} M voxel/s incl. writeout)")
    return out_paths


def _make_output_writer(output_dir, config, size, eval_scale, output_space):
    def _write_output(pred, meta):
        path, orig_shape, affine = meta
        if output_space == "input":
            # Invert the prep chain: nearest-resize the eval-scale prediction
            # back onto the ORIGINAL voxel grid. The W-crop region outside
            # [crop_lo, crop_hi) is background by construction.
            crop = config.crop_3d_w_dim_range
            at_size_w = (crop[1] - crop[0]) if crop else size[-1]
            pred_model = resize_nd_np(
                pred.astype(np.float32), (*size[:-1], at_size_w), mode="nearest"
            )
            full = np.zeros(size, np.float32)
            if crop:
                full[..., crop[0] : crop[1]] = pred_model
            else:
                full = pred_model
            out = resize_nd_np(full, orig_shape, mode="nearest").astype(np.int16)
        else:
            # Eval-grid output: rescale the affine so the header stays
            # geometrically correct. The resample chain uses torch-style
            # align_corners=False center mapping (np_ops._axis_linear):
            # eval voxel j along axis a maps to source coordinate
            # (j + 0.5) * orig_a/(size_a * eval_scale) - 0.5 (+ the W-crop
            # offset mapped back to source voxels), so both the column
            # scales AND the half-voxel translation shift are applied.
            out = pred.astype(np.int16)
            affine = np.array(affine, np.float64)
            crop = config.crop_3d_w_dim_range
            scales = [orig_shape[a] / size[a] / eval_scale for a in range(3)]
            new_aff = affine.copy()
            shift = np.zeros(3)
            for a in range(3):
                new_aff[:3, a] = affine[:3, a] * scales[a]
                shift += affine[:3, a] * (0.5 * scales[a] - 0.5)
            if crop:
                shift += affine[:3, 2] * (crop[0] * orig_shape[2] / size[2])
            new_aff[:3, 3] = affine[:3, 3] + shift
            affine = new_aff
        out_path = output_dir / (path.name.replace(".nii.gz", "").replace(".nii", "") + "_seg.nii.gz")
        save_nifti(out_path, out, affine=affine)
        print(f"  {path.name} -> {out_path.name} (fg voxels: {int((out > 0).sum())})")
        return out_path

    return _write_output


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--checkpoint", required=True, help="directory with state.msgpack + config.json")
    ap.add_argument("--inputs", nargs="+", required=True, help="input NIfTI volumes")
    ap.add_argument("--output-dir", required=True)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--eval-scale", type=float, default=2.0,
                    help="reference eval pre-interpolation (HybridIdLoader.py:336)")
    ap.add_argument("--output-space", choices=("input", "eval"), default="input")
    ap.add_argument("--size", type=int, nargs=3, default=(128, 128, 128),
                    help="canonical training volume size (L4 default)")
    ap.add_argument("--mesh-data", type=int, default=1,
                    help="shard each batch over this many devices (must divide --batch-size)")
    ap.add_argument("--mesh-space", type=int, default=1,
                    help="additionally shard each volume's H axis over this many devices "
                         "(whole-volume serving; composes with --mesh-data)")
    args = ap.parse_args(argv)
    from .core.cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    serve(args.checkpoint, args.inputs, args.output_dir, args.batch_size,
          args.eval_scale, args.output_space, tuple(args.size), args.mesh_data,
          args.mesh_space)


if __name__ == "__main__":
    main()
