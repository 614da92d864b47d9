"""Training driver: folds -> epochs -> fused device steps.

Capability parity with `train_DL` (`main_deep_staple.py:491-1086`):
deterministic split (every atlas_count-th 3D idx of the first num_val_images
fixed images is validation, :554-558 — the KFold object the reference builds
and then discards is omitted deliberately, see SURVEY.md §7 "known bugs"),
optional label disturbance, per-sample metric precompute (class weights,
fixed weighting), epoch/batch loop with the reference's scheduler quirk
(ExponentialLR stepped per batch only in epochs where epx % atlas_count == 0,
:794-795), per-epoch validation at eval scale, DP<->dice correlations,
periodic checkpointing, and the train_label_snapshot export.
"""

from __future__ import annotations

import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import DataParamMode, TrainConfig
from ..core.determinism import reset_determinism
from ..models import MobileNetLRASPP3D, LRASPPMobileNetV3Large2D
from ..ops.dice import batch_dice_over_all, batch_dice_per_class, dice3d, dice2d
from ..ops.resample import interpolate_sample
from ..utils.logging import MetricWriter, get_global_idx, log_class_dices, log_data_parameter_stats
from .checkpoint import checkpoint_exists, restore_checkpoint, save_checkpoint
from .optim import exp_lr, cosine_warm_restarts_lr
from .snapshot import export_train_label_snapshot
from .state import create_state
from .step import make_eval_step, make_train_step, resolve_augment_order


def dp_in_target_pos_ratio(dp_values, disturbed_idxs, target_pos: str = "min") -> float:
    """Fraction of disturbed samples found among the |disturbed| lowest (or
    highest) data parameters — the reference's oracle metric for validating
    that DPs detect corrupted labels
    (`calc_inst_parameters_in_target_pos_ratio`, main_deep_staple.py:320-333)."""
    assert target_pos in ("min", "max")
    disturbed_idxs = np.asarray(disturbed_idxs)
    if disturbed_idxs.size == 0:
        return float("nan")
    dp_values = np.asarray(dp_values)
    order = np.argsort(dp_values)
    if target_pos == "max":
        order = order[::-1]
    target = set(order[: len(disturbed_idxs)].tolist())
    return sum(1.0 for i in disturbed_idxs if int(i) in target) / len(disturbed_idxs)


def pearson_corr(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.std() == 0 or b.std() == 0:
        return float("nan")
    return float(np.corrcoef(a, b)[0, 1])


def spearman_corr(a, b):
    """Spearman rho without scipy: Pearson on average ranks."""

    def _rank(x):
        # tie-averaged ranks straight from the unique() decomposition
        vals, inv, counts = np.unique(x, return_inverse=True, return_counts=True)
        csum = np.cumsum(counts) - 1
        start = csum - counts + 1
        avg = (start + csum) / 2.0
        return avg[inv]

    return pearson_corr(_rank(np.asarray(a)), _rank(np.asarray(b)))


def make_model(config: TrainConfig, num_classes: int):
    in_ch = 12 if config.use_mind else 1
    dtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else None
    if config.use_2d_normal_to is not None:
        if config.bn_mode != "batch":
            # The 2D model is the torchvision-parity restatement and carries
            # no bn_mode lever (the async/slab BN bandwidth levers are 3D
            # volume optimizations, models/norm.py) — say so instead of
            # silently training with exact BN while the driver builds a
            # pointless warmup model.
            print(
                f"bn_mode {config.bn_mode!r} is a 3D-path lever; the 2D model "
                "uses exact BatchNorm"
            )
        return LRASPPMobileNetV3Large2D(num_classes=num_classes, dtype=dtype), in_ch
    return (
        MobileNetLRASPP3D(
            num_classes=num_classes,
            use_checkpointing=config.use_checkpointing,
            dtype=dtype,
            axis_name=None,
            bn_mode=config.bn_mode,
        ),
        in_ch,
    )


def precompute_sample_metrics(dataset, train_idxs, num_classes: int, use_2d: bool, batch: int = 4):
    """Per-sample dice(label vs modified) + gt voxel count + class bincount at
    the x2.0 eval scale (reference :626-656 computes on eval-mode samples)."""
    dice_fn = dice2d if use_2d else dice3d

    @jax.jit
    def _metrics(lbl, mod):
        lbl2 = interpolate_sample(None, lbl, 2.0, use_2d)[1]
        mod2 = interpolate_sample(None, mod, 2.0, use_2d)[1]
        dsc = dice_fn(
            jax.nn.one_hot(lbl2, num_classes, dtype=jnp.int32),
            jax.nn.one_hot(mod2, num_classes, dtype=jnp.int32),
            one_hot_torch_style=True,
            nan_for_unlabeled_target=False,
        )
        reduce_axes = tuple(range(1, mod2.ndim))
        gt_num = jnp.sum(mod2 > 0, axis=reduce_axes).astype(jnp.float32)
        bn = jnp.bincount(mod2.reshape(-1), length=num_classes)
        return dsc, gt_num, bn

    n = len(dataset)
    wise_dice = np.zeros((n, num_classes), np.float32)
    gt_num = np.zeros((n,), np.float32)
    bn_count = np.zeros((num_classes,), np.int64)

    dataset.eval(use_modified=True)
    idx_list = [int(i) for i in train_idxs]
    for s in range(0, len(idx_list), batch):
        chunk = idx_list[s : s + batch]
        hb = dataset.sample_batch(chunk, use_modified=True)
        dsc, gts, bn = _metrics(jnp.asarray(hb["label"]), jnp.asarray(hb["modified_label"]))
        wise_dice[chunk] = np.asarray(dsc)
        gt_num[chunk] = np.asarray(gts)
        bn_count += np.asarray(bn, np.int64)

    class_weights = 1.0 / np.power(bn_count.astype(np.float64), 0.35)
    class_weights /= class_weights.mean()
    fixed_weighting = np.log(gt_num + np.e) + np.e
    return wise_dice, gt_num, bn_count, class_weights.astype(np.float32), fixed_weighting.astype(np.float32)


def train_dl(run_name: str, config: TrainConfig, dataset, atlas_count=None, writer: MetricWriter | None = None):
    """Returns a dict with final state, metrics history, and snapshot path."""
    reset_determinism(config.seed)
    atlas_count = atlas_count if atlas_count is not None else config.atlas_count
    # Multi-host: every process runs the full loop (collectives must be
    # entered by all), but only process 0 writes artifacts (metrics JSONL,
    # checkpoints, snapshots, figures).
    nproc, is_main = jax.process_count(), jax.process_index() == 0
    if nproc > 1 and config.mesh_data_axis % nproc:
        raise ValueError(
            f"mesh_data_axis={config.mesh_data_axis} must divide over "
            f"{nproc} processes (equal batch rows per host)"
        )
    # orbax's Checkpointer.save is a GLOBAL collective (it barriers in
    # multihost.sync_global_processes), so unlike the process-0-only msgpack
    # write, EVERY process enters save_checkpoint for the orbax backend;
    # mdl_save_prefix must be shared storage (same requirement the resume
    # cross-check below enforces).
    orbax_collective_save = nproc > 1 and config.checkpoint_backend == "orbax"
    writer = writer or MetricWriter(
        jsonl_path=str(Path(config.output_dir) / f"{run_name}_metrics.jsonl")
        if (config.log_jsonl and is_main)
        else None,
    )

    use_dp = config.data_param_mode == DataParamMode.INSTANCE_PARAMS
    use_2d = config.use_2d_normal_to is not None
    num_classes = len(dataset.label_tags)
    results = {}

    num_folds = 1 if config.only_first_fold or config.fold_override is not None else config.num_folds
    fold_range = (
        [config.fold_override] if config.fold_override is not None else list(range(num_folds))
    )

    for fold_idx in fold_range:
        if config.debug:
            num_val_images, fold_atlas_count = 2, 1
        else:
            num_val_images, fold_atlas_count = config.num_val_images, atlas_count

        all_len = dataset.__len__(use_2d_override=False)
        val_3d_idxs = list(range(0, min(num_val_images * fold_atlas_count, all_len), fold_atlas_count))
        train_3d_idxs = list(range(min(num_val_images * fold_atlas_count, all_len), all_len))

        if use_2d:
            train_2d_ids = []
            for id_dict in dataset.get_id_dicts():
                if id_dict["3d_dataset_idx"] in set(train_3d_idxs) and id_dict["2d_id"] in dataset.label_data_2d:
                    train_2d_ids.append(id_dict["2d_id"])
            train_idxs = np.asarray(dataset.switch_2d_identifiers(train_2d_ids))
        else:
            train_idxs = np.asarray(train_3d_idxs)

        print(f"Fold {fold_idx}: {len(train_idxs)} train instances, {len(val_3d_idxs)} val images")

        # --- optional label disturbance (reference :564-587) ---
        if config.disturbed_percentage > 0.0:
            _, _, all_mod = dataset.get_data()
            sums = all_mod[train_idxs].reshape(len(train_idxs), -1).sum(-1)
            non_empty = train_idxs[sums > 0]
            k = int(len(non_empty) * config.disturbed_percentage)
            proposed = np.random.choice(non_empty, size=k, replace=False)
            dataset.disturb_idxs(
                proposed,
                disturbance_mode=config.disturbance_mode,
                disturbance_strength=config.disturbance_strength,
            )
        disturbed_bool_vect = np.zeros(len(dataset), np.float32)
        if dataset.disturbed_idxs:
            disturbed_bool_vect[np.asarray(dataset.disturbed_idxs)] = 1.0
        clean_idxs = train_idxs[~np.isin(train_idxs, dataset.disturbed_idxs)]
        print("Disturbed indexes:", sorted(dataset.disturbed_idxs))

        # --- per-sample metric precompute (reference :626-656) ---
        wise_dice, gt_num, bn_count, class_weights, fixed_weighting = precompute_sample_metrics(
            dataset, train_idxs, num_classes, use_2d
        )

        # --- model + state ---
        model, in_ch = make_model(config, num_classes)
        sample0 = dataset[int(train_idxs[0])]
        base_spatial = sample0["image"].shape
        init_spatial = tuple(int(s * 1.5) for s in base_spatial) if not use_2d else base_spatial
        input_shape = (1,) + init_spatial + (in_ch,)

        dp_override_values = None
        if use_dp and config.override_embedding_weights:
            from ..data.snapshot_io import load_snapshot

            snap = load_snapshot(config.fixed_weight_file)
            ids = dataset.get_2d_ids() if use_2d else dataset.get_3d_ids()
            dp_override_values = np.zeros(len(dataset), np.float32)
            for _id, w in zip(snap["d_ids"], np.asarray(snap["data_parameters"]).reshape(-1)):
                if _id in ids:
                    dp_override_values[ids.index(_id)] = w

        state, tx = create_state(
            model,
            input_shape,
            dataset_len=len(dataset),
            seed=config.seed,
            init_inst_param=config.init_inst_param,
            use_data_params=use_dp,
            dp_override_values=dp_override_values,
        )

        # --- device mesh (TPU-native; the reference is single-GPU) ---
        # State replicated, batches sharded over ('data',) and optionally the
        # volume H axis over ('space',). The jitted step is unchanged: GSPMD
        # inserts the collectives (grad psum, global-batch BN stats, DP
        # scatter-add) from the input shardings.
        mesh = None
        if (config.mesh_data_axis > 1 or config.mesh_space_axis > 1
                or config.mesh_model_axis > 1):
            from ..parallel.mesh import make_mesh, replicate_state, shard_batch
            from ..parallel.multihost import (
                host_shard_indices, local_batch_to_global, replicate_to_mesh,
            )

            if config.mesh_model_axis > 1 and nproc > 1:
                raise ValueError(
                    "mesh_model_axis > 1 is single-process only (tensor-parallel "
                    "state sharding uses device_put onto addressable devices)"
                )
            mesh = make_mesh(
                data=config.mesh_data_axis, space=config.mesh_space_axis,
                model=config.mesh_model_axis,
            )
            print(
                f"Device mesh: data={config.mesh_data_axis} space={config.mesh_space_axis}"
                f" model={config.mesh_model_axis}"
                + (f" over {nproc} hosts" if nproc > 1 else "")
            )

        # --- pipeline parallelism (config validates exclusivity with the
        # mesh_* axes): stage 0 (him+lom) on device 0, stage 1 (aspp+head+
        # losses) on device 1, GPipe microbatches (parallel/pipeline.py). ---
        pp_devices = None
        if config.mesh_pipe_stages > 1:
            if nproc > 1:
                raise ValueError(
                    "mesh_pipe_stages > 1 is single-process only (stages are "
                    "placed on explicit local devices)"
                )
            devs = jax.devices()
            if len(devs) < config.mesh_pipe_stages:
                raise ValueError(
                    f"mesh_pipe_stages={config.mesh_pipe_stages} needs that "
                    f"many devices (have {len(devs)})"
                )
            pp_devices = devs[: config.mesh_pipe_stages]
            print(
                f"Pipeline parallelism: {config.mesh_pipe_stages} stages x "
                f"{config.pipe_microbatches} microbatches on "
                f"{[str(d) for d in pp_devices]}"
            )

        epx_start = config.checkpoint_epx or 0
        ckpt_name = config.checkpoint_name or run_name
        ckpt_path = Path(config.mdl_save_prefix) / f"{ckpt_name}_fold{fold_idx}_epx{epx_start}"
        if config.auto_resume and config.checkpoint_epx is None:
            # Crash recovery: restore the newest checkpoint this run/fold
            # reached and continue AFTER it (checkpoints are written at the
            # end of their epoch). Explicit checkpoint_epx keeps the
            # reference's re-run-that-epoch semantics.
            import re as _re

            pat = _re.compile(rf"^{_re.escape(ckpt_name)}_fold{fold_idx}_epx(\d+)$")
            newest = -1
            for d in Path(config.mdl_save_prefix).glob(f"{ckpt_name}_fold{fold_idx}_epx*"):
                m = pat.match(d.name)
                if m and checkpoint_exists(d):
                    newest = max(newest, int(m.group(1)))
            if newest >= 0:
                ckpt_path = Path(config.mdl_save_prefix) / f"{ckpt_name}_fold{fold_idx}_epx{newest}"
                epx_start = newest + 1
                print(f"Auto-resume: newest checkpoint {ckpt_path}, continuing at epoch {epx_start}")
        epx = max(epx_start - 1, 0)  # snapshot dir name if the loop is empty
        if nproc > 1:
            # Only process 0 WRITES checkpoints, but every process scans and
            # restores them independently — without shared storage the hosts
            # would silently resume from different epochs (or one fresh, one
            # restored) and assemble a "replicated" state from divergent
            # local trees. Cross-check before touching the state.
            from jax.experimental import multihost_utils

            mine = np.array([epx_start, int(checkpoint_exists(ckpt_path))], np.int32)
            seen = np.asarray(multihost_utils.process_allgather(mine))
            if not (seen == seen[0]).all():
                raise RuntimeError(
                    f"multi-host resume state differs across processes "
                    f"(per-host [epx_start, ckpt_found] = {seen.tolist()}): "
                    f"mdl_save_prefix={config.mdl_save_prefix!r} must be "
                    f"shared storage visible to every host"
                )
        if checkpoint_exists(ckpt_path):
            print(f"Restoring checkpoint from {ckpt_path}")
            state = restore_checkpoint(ckpt_path, state)
        if mesh is not None:
            if config.mesh_model_axis > 1:
                # Tensor parallelism: conv channels sharded over ('model',);
                # batch/spatial shardings compose with it on the other axes.
                from ..parallel.tensor import shard_tp

                state = shard_tp(state, mesh)
            else:
                state = replicate_state(state, mesh)

        pre_interp = dataset.pre_interpolation_factor
        sep_mesh = None
        if config.augment_order.endswith("-sep") and mesh is not None:
            if config.mesh_space_axis > 1 and jax.default_backend() == "tpu":
                # The separable passes gather along EVERY spatial axis, so a
                # spatially-sharded volume can't ride them shard-locally; the
                # fused int6 warp shards natively over 'space' (element
                # gathers partition fine). (CPU virtual-device tests keep the
                # order: the XLA twin impl reshards under GSPMD.)
                print(
                    f"augment_order {config.augment_order!r} cannot run on a "
                    "spatially-sharded mesh; using 'fast-int6'"
                )
                config = config.replace(augment_order="fast-int6")
            else:
                # Batch/model meshes: the Pallas scanline passes carry no
                # GSPMD partitioning rule, so the warp runs under shard_map
                # over the 'data' axis — each device warps its local batch
                # shard, no collectives (ops/sep_warp.py::sep_warp_apply).
                sep_mesh = mesh
        effective_order = resolve_augment_order(config.augment_order, num_classes)
        if effective_order != config.augment_order:
            print(
                f"augment_order {config.augment_order!r} supports binary labels only; "
                f"using {effective_order!r} ({num_classes} classes)"
            )
            config = config.replace(augment_order=effective_order)
        if pp_devices is not None:
            from ..parallel.pipeline import make_pp_train_step

            train_step = make_pp_train_step(
                model, tx, config, class_weights, fixed_weighting,
                pre_interpolation_factor=pre_interp,
                n_micro=config.pipe_microbatches, devices=pp_devices,
            )
        else:
            train_step = make_train_step(
                model, tx, config, class_weights, fixed_weighting,
                pre_interpolation_factor=pre_interp, mesh=sep_mesh,
            )
        eval_step = make_eval_step(model, config, num_classes)
        # Async-BN warmup: the first bn_warmup_epochs run the 'slab' step
        # (identical variable tree incl. the 'count' scalars, self-consistent
        # same-batch stats) so running stats and params co-adapt before the
        # stale-stats normalization takes over — without this, async BN's
        # step-1 normalization amplifies Adam's first full-lr jump through
        # low-variance channels (core/config.py bn_warmup_epochs).
        warmup_step, warmup_epochs = None, 0
        if (
            config.bn_mode == "async" and config.bn_warmup_epochs > 0
            and config.use_2d_normal_to is None  # 2D model has no bn_mode
        ):
            warmup_epochs = config.bn_warmup_epochs
            warmup_model, _ = make_model(config.replace(bn_mode="slab"), num_classes)
            if pp_devices is not None:
                from ..parallel.pipeline import make_pp_train_step

                warmup_step = make_pp_train_step(
                    warmup_model, tx, config, class_weights, fixed_weighting,
                    pre_interpolation_factor=pre_interp,
                    n_micro=config.pipe_microbatches, devices=pp_devices,
                )
            else:
                warmup_step = make_train_step(
                    warmup_model, tx, config, class_weights, fixed_weighting,
                    pre_interpolation_factor=pre_interp, mesh=sep_mesh,
                )

        rng = jax.random.PRNGKey(config.seed + 1000 * fold_idx)
        t_start = time.time()
        sched_steps = int(np.asarray(state.sched_steps))
        step_times = []
        dispatched_steps = set()

        for epx in range(epx_start, config.epochs):
            global_idx = get_global_idx(fold_idx, epx, config.epochs)
            dataset.train(use_modified=True)

            profiling = config.profile_dir is not None and epx == config.profile_epoch
            if profiling:
                jax.profiler.start_trace(config.profile_dir)

            perm = np.random.permutation(train_idxs)
            epx_losses, dices, class_dices = [], [], []

            # One-step-deferred metric readback: the device->host sync for
            # step k happens AFTER step k+1's batch is assembled and
            # dispatched, so host-side batch prep overlaps device compute
            # (JAX dispatch is async; values are unchanged, only the sync
            # point moves).
            pending_metrics = None

            def _consume(metrics_dev):
                # Multi-host: per-row metrics (the (B, C) dice) stay sharded
                # over 'data', so each host only holds its own rows —
                # allgather them so epoch means cover the GLOBAL batch
                # (scalars are already fully replicated and pass through).
                if nproc > 1:
                    from jax.experimental import multihost_utils

                    metrics_dev = jax.tree.map(
                        lambda a: a
                        if a.sharding.is_fully_replicated
                        else multihost_utils.process_allgather(a, tiled=True),
                        metrics_dev,
                    )
                metrics = jax.tree.map(np.asarray, metrics_dev)
                epx_losses.append(float(metrics["loss"]))
                b_dice = metrics["dice"]
                dices.append(batch_dice_over_all(b_dice, exclude_bg=True))
                class_dices.append(
                    batch_dice_per_class(b_dice, dataset.label_tags, exclude_bg=True)
                )

            for bstart in range(0, len(perm), config.batch_size):
                bidx = perm[bstart : bstart + config.batch_size]
                if mesh is not None:
                    usable = (len(bidx) // config.mesh_data_axis) * config.mesh_data_axis
                    if usable == 0:
                        continue  # remainder smaller than the data axis
                    bidx = bidx[:usable]
                if pp_devices is not None and config.pipe_microbatches > 1:
                    # GPipe microbatches split the batch evenly; trim the
                    # epoch-remainder batch like the mesh path does.
                    usable = (
                        len(bidx) // config.pipe_microbatches
                    ) * config.pipe_microbatches
                    if usable == 0:
                        continue
                    bidx = bidx[:usable]
                if mesh is not None and nproc > 1:
                    # Each host loads + feeds only its own contiguous row block;
                    # the global sharded batch is assembled across processes.
                    local_bidx = host_shard_indices(bidx, nproc, jax.process_index())
                    host_batch = dataset.sample_batch(local_bidx)
                    batch = local_batch_to_global(
                        host_batch, mesh, spatial_axis=config.mesh_space_axis > 1
                    )
                elif mesh is not None:
                    host_batch = dataset.sample_batch(bidx)
                    batch = shard_batch(host_batch, mesh, spatial_axis=config.mesh_space_axis > 1)
                else:
                    host_batch = dataset.sample_batch(bidx)
                    batch = {k: jnp.asarray(v) for k, v in host_batch.items()}

                lr = (
                    exp_lr(config.lr, sched_steps)
                    if not use_2d
                    else cosine_warm_restarts_lr(config.lr, sched_steps)
                )
                rng, step_rng = jax.random.split(rng)
                step_fn = warmup_step if epx < warmup_epochs and warmup_step is not None else train_step
                if nproc > 1 and id(step_fn) not in dispatched_steps:
                    # AOT-compile, then rendezvous all processes before the
                    # first dispatch (of EACH step variant — the warmup and
                    # steady steps are separate compilations): the step's
                    # collectives open their transport rendezvous at dispatch
                    # time, and compile/dataset-load skew between hosts can
                    # exceed the transport's connect timeout (multihost.py).
                    from ..parallel.multihost import coordination_barrier

                    step_fn.lower(state, batch, lr, step_rng).compile()
                    coordination_barrier(
                        f"first-train-step-fold{fold_idx}-{len(dispatched_steps)}"
                    )
                dispatched_steps.add(id(step_fn))
                t0 = time.time()
                state, metrics = step_fn(state, batch, lr, step_rng)
                if pending_metrics is not None:
                    _consume(pending_metrics)
                pending_metrics = metrics
                step_times.append(time.time() - t0)

                # Scheduler quirk: step per batch when epx % atlas_count == 0 (:794-795).
                if config.use_scheduling and epx % fold_atlas_count == 0:
                    sched_steps += 1


                # DP scatter figures every 10 batches (reference :797-806)
                batch_no = bstart // config.batch_size
                if use_dp and config.save_dp_figures and is_main and batch_no % 10 == 0:
                    from ..utils.visualization import save_parameter_figure

                    train_params = np.asarray(state.dp_params)[train_idxs]
                    pcc = pearson_corr(train_params, wise_dice[train_idxs][:, 1])
                    fig_path = (
                        Path(config.output_dir)
                        / f"{run_name}_fold{fold_idx}_figures"
                        / f"dp_figure_epx{epx:03d}_batch{batch_no:03d}.png"
                    )
                    save_parameter_figure(
                        fig_path, run_name,
                        f"corr. coeff. DP vs. dice(expert label, train gt): {pcc:4f}",
                        train_params, train_params / fixed_weighting[train_idxs],
                        wise_dice[train_idxs][:, 1],
                    )

                if config.debug:
                    break

            if pending_metrics is not None:
                _consume(pending_metrics)

            if pp_devices is not None:
                # After the batch loop the stage trees are committed to their
                # pipeline devices; the single-device jitted eval/snapshot
                # paths need consistently-placed arguments. One 1.2M-param
                # transfer per epoch — the first step of the next epoch
                # re-stages the trees.
                state = jax.device_put(state, pp_devices[0])

            if profiling:
                jax.profiler.stop_trace()
                print(f"profiler trace written to {config.profile_dir}")

            state = state.replace(sched_steps=jnp.asarray(sched_steps, jnp.int32))

            # --- epoch logging (reference :811-854) ---
            print(f"### Log epoch {epx} @ {time.time()-t_start:.2f}s")
            writer.log({"ref_epoch_idx": epx}, step=global_idx)
            writer.log({f"losses/loss_fold{fold_idx}": float(np.mean(epx_losses))}, step=global_idx)
            mean_dice = float(np.nanmean(dices))
            print(f"dice_mean_wo_bg_fold{fold_idx} {mean_dice*100:.2f}%")
            writer.log({f"scores/dice_mean_wo_bg_fold{fold_idx}": mean_dice}, step=global_idx)
            log_class_dices(writer, "scores/dice_mean_", f"_fold{fold_idx}", class_dices, global_idx)

            if use_dp:
                train_params = np.asarray(state.dp_params)[train_idxs]
                order = np.argsort(train_params)
                target_dice = wise_dice[train_idxs][:, 1]
                pcc = pearson_corr(train_params[order], target_dice[order])
                scc = spearman_corr(train_params[order], target_dice[order])
                writer.log(
                    {
                        f"data_parameters/pearson_corr_coeff_fold{fold_idx}": pcc,
                        f"data_parameters/spearman_corr_coeff_fold{fold_idx}": scc,
                    },
                    step=global_idx,
                )
                log_data_parameter_stats(
                    writer, f"data_parameters/iter_stats_fold{fold_idx}", global_idx,
                    np.asarray(state.dp_params),
                )

            if (is_main or orbax_collective_save) and (
                (epx % config.save_every == 0) or (epx + 1 == config.epochs)
            ):
                _path = Path(config.mdl_save_prefix) / f"{run_name}_fold{fold_idx}_epx{epx}"
                save_checkpoint(_path, state, config, backend=config.checkpoint_backend)

            # --- validation (reference :876-955) ---
            dataset.eval()
            val_dices, val_class_dices = [], []
            for val_idx in val_3d_idxs:
                # Always a full 3D volume (reference :883 get_3d_item) — in 2D
                # mode the eval step unstacks/restacks internally; val_3d_idxs
                # are 3D indices, so sample_batch (2D-indexed there) is wrong.
                s3 = dataset.get_3d_item(val_idx)
                val_batch = {
                    "image": jnp.asarray(s3["image"][None].astype(np.float32)),
                    "label": jnp.asarray(s3["label"][None].astype(np.int32)),
                }
                if mesh is not None:
                    # single volume: replicate (batch 1 can't split over
                    # 'data'); multi-host safe — every process passes the
                    # same full array.
                    val_batch = replicate_to_mesh(val_batch, mesh)
                _, b_dice = eval_step(state, val_batch)
                b_dice = np.asarray(b_dice)
                val_dices.append(batch_dice_over_all(b_dice, exclude_bg=True))
                val_class_dices.append(batch_dice_per_class(b_dice, dataset.label_tags, exclude_bg=True))
            mean_val = float(np.nanmean(val_dices)) if val_dices else float("nan")
            print(f"val_dice_mean_wo_bg_fold{fold_idx} {mean_val*100:.2f}%")
            writer.log({f"scores/val_dice_mean_wo_bg_fold{fold_idx}": mean_val}, step=global_idx)
            log_class_dices(writer, "scores/val_dice_mean_", f"_fold{fold_idx}", val_class_dices, global_idx)

            if config.debug:
                break

        # --- snapshot export (reference :963-1045; process 0 only — the
        # inference inside runs on local devices, no collectives) ---
        snapshot_path = None
        if use_dp and is_main:
            snapshot_path = (
                Path(config.output_dir) / f"{run_name}_fold{fold_idx}_epx{epx}" / "train_label_snapshot.npz"
            )
            snapshot = export_train_label_snapshot(
                snapshot_path, state, model, config, dataset, train_idxs, disturbed_bool_vect,
                save_labels=config.save_labels,
            )
            if config.export_pth_snapshot:
                from ..data.snapshot_io import save_snapshot_pth

                save_snapshot_pth(snapshot_path.with_suffix(".pth"), snapshot)
            # Overview image of DP-sorted samples (the reference builds this at
            # :1047-1084 but hard-disables it with skip_writeout=True :1057;
            # here config.do_plot enables it).
            if config.do_plot and config.save_labels and len(train_idxs) <= 150:
                from ..utils.visualization import visualize_seg

                overlay = [
                    f"id:{d} dp:{float(w):.2f}"
                    for d, w in zip(snapshot["d_ids"], snapshot["data_parameters"])
                ]
                visualize_seg(
                    in_type="batch_3D", reduce_dim="W",
                    img=snapshot["labels"],
                    seg=4 * snapshot["train_predictions"][:, None].squeeze(1)
                    if snapshot["train_predictions"].ndim == 4 else 4 * snapshot["train_predictions"],
                    ground_truth=snapshot["modified_labels"],
                    overlay_text=overlay,
                    annotate_color=(255, 0, 0),  # red disturb markers
                    frame_elements=list(snapshot["disturb_flags"]),
                    n_per_row=70,
                    file_path=snapshot_path.parent / "data_parameter_weighted_samples.png",
                )

        results[fold_idx] = {
            "state": state,
            "snapshot_path": snapshot_path,
            "train_idxs": train_idxs,
            "clean_idxs": clean_idxs,
            "wise_dice": wise_dice,
            "mean_step_time": float(np.mean(step_times[2:])) if len(step_times) > 2 else float("nan"),
            "writer": writer,
        }

    return results
