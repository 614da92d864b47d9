"""Configuration system.

The reference keeps a flat `DotDict` literal of ~40 hyperparameters in the
training script (`main_deep_staple.py:75-137`) plus enums in
`utils/common_utils.py:27-36`. Here the same surface is a typed dataclass with
CLI + sweep adapters; a `DotDict` shim is kept for dict-style consumers.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from enum import Enum, auto

from typing import Optional, Tuple


class DataParamMode(Enum):
    INSTANCE_PARAMS = auto()
    DISABLED = auto()


class LabelDisturbanceMode(Enum):
    FLIP_ROLL = auto()
    AFFINE = auto()


class DotDict(dict):
    """dot.notation dict (reference `utils/common_utils.py:11-23`)."""

    def __getattr__(self, item):
        try:
            return self[item]
        except KeyError as e:
            raise AttributeError from e

    __setattr__ = dict.__setitem__
    __delattr__ = dict.__delitem__


@dataclass
class TrainConfig:
    """Mirror of the reference `config_dict` (`main_deep_staple.py:75-137`),
    plus TPU-specific knobs at the bottom."""

    num_folds: int = 3
    only_first_fold: bool = True

    use_mind: bool = False
    epochs: int = 40

    batch_size: int = 8
    val_batch_size: int = 1
    use_2d_normal_to: Optional[str] = None

    num_val_images: int = 20
    atlas_count: int = 1

    dataset: str = "crossmoda"
    dataset_directory: str = "data/crossmoda_dataset"
    reg_state: Optional[str] = "acummulate_every_third_deeds_FT2_MT1"
    train_set_max_len: Optional[int] = None
    crop_3d_w_dim_range: Optional[Tuple[int, int]] = (45, 95)
    crop_2d_slices_gt_num_threshold: int = 0

    lr: float = 0.01
    use_scheduling: bool = True

    # Data parameter config (reference :101-107)
    data_param_mode: DataParamMode = DataParamMode.INSTANCE_PARAMS
    init_inst_param: float = 0.0
    lr_inst_param: float = 0.1
    use_risk_regularization: bool = True
    use_fixed_weighting: bool = True
    use_ool_dp_loss: bool = True

    # Pretrained data-parameter loading (reference :109-113)
    fixed_weight_file: Optional[str] = None
    fixed_weight_min_quantile: Optional[float] = None
    fixed_weight_min_value: Optional[float] = None
    override_embedding_weights: bool = False

    save_every: int = 200
    mdl_save_prefix: str = "data/models"

    debug: bool = False
    wandb_mode: str = "disabled"
    do_sweep: bool = False

    checkpoint_name: Optional[str] = None
    fold_override: Optional[int] = None
    checkpoint_epx: Optional[int] = None
    # Crash/preemption recovery: when no explicit checkpoint_epx is given,
    # restore the NEWEST saved checkpoint of this run/fold (whatever epoch it
    # reached) and continue at the epoch after it. Re-running the identical
    # command after an interruption picks up where it stopped; a completed
    # run becomes a no-op re-export. The reference's resume needs the epoch
    # spelled out by hand (`main_deep_staple.py:122-125`).
    auto_resume: bool = False

    do_plot: bool = False
    save_dp_figures: bool = False
    save_labels: bool = True

    disturbance_mode: Optional[LabelDisturbanceMode] = None
    disturbance_strength: float = 0.0
    disturbed_percentage: float = 0.0

    device: str = "tpu"  # informational; JAX picks the platform

    # --- TPU-native additions (no reference equivalent) ---
    # 'fused': single-jit step, DP loss sees stop_gradient(logits) from the
    #   pre-update params. 'strict': second forward pass with the *updated*
    #   params, bitwise-matching the reference's out-of-line schedule
    #   (`main_deep_staple.py:723-729`).
    ool_mode: str = "strict"
    # Additionally export train_label_snapshot.pth in the reference's torch
    # format (readable by the reference consensus notebook + fixed-weight
    # reload) next to the native .npz snapshot.
    export_pth_snapshot: bool = False
    # 'msgpack' (single flax msgpack file) or 'orbax' (Orbax standard
    # checkpoint directory — sharding-aware, readable by orbax tooling).
    # Restore auto-detects whichever is on disk (train/checkpoint.py).
    checkpoint_backend: str = "msgpack"
    compute_dtype: str = "float32"  # 'bfloat16' recommended on TPU
    # 'reference': interpolate-then-warp (reference-exact order);
    # 'fast': warp at base resolution then resize — same augmentation
    # distribution, ~3x less gather work; '{fast,reference}-bf16': pack the
    # image warp's x-corner pairs into one gather word (4 gathers instead of
    # 8, ~0.4% voxel rounding << the pipeline's own noise);
    # '{fast,reference}-int8': quad-pack the whole 2x2 in-plane corner
    # footprint (2 image gathers + 1 label gather, ~1%-of-absmax
    # quantization, still below the pipeline's own additive noise);
    # '{fast,reference}-int6': ONE fused warp for image AND both labels
    # (2 gathers total; int6 image quad + 2-bit label codes share each
    # 32-bit word, quantization variance carved out of the noise budget;
    # binary labels only). See ops/augment.py.
    augment_order: str = "reference"
    # 'batch': exact nn.BatchNorm train-mode semantics (reference parity).
    # 'async': normalize through the (stop-gradient) running statistics while
    # still updating them from the current batch — one-step-stale stats break
    # the stats->normalize sequential HBM dependency so XLA fuses both into a
    # single read pass over each conv output (models/norm.py); fastest, but
    # staleness amplifies early-training parameter jumps (measured transient
    # in tests/test_norm.py). 'slab': same-batch statistics from a D-strided
    # slab subsample — self-consistent (no transient), stats pass shrinks to
    # 1/stride of the volume. Fast-preset bandwidth levers in the int6-warp
    # spirit; DP-recovery-oracle gated.
    bn_mode: str = "batch"
    # When bn_mode='async': number of initial epochs trained with the 'slab'
    # step instead (same variable tree, self-consistent same-batch stats).
    # Async normalization through stats seeded at RANDOM-INIT params
    # amplifies Adam's first full-lr jump through low-variance channels
    # (measured 2e8 toy loss transient, tests/test_norm.py); one epoch of
    # slab warmup lets stats and params co-adapt, after which the switch is
    # smooth (toy gate: no transient at the boundary). Ignored otherwise.
    bn_warmup_epochs: int = 1
    use_checkpointing: bool = True
    # Device mesh for the production driver (train_dl): batches are sharded
    # over ('data',) and optionally the volume H axis over ('space',); state
    # is replicated — unless mesh_model_axis > 1, in which case the conv
    # channels are tensor-parallel-sharded over ('model',) and the optimizer
    # runs sharded too (parallel/tensor.py). 1x1x1 = single chip. Batches
    # whose size does not divide mesh_data_axis are truncated to the largest
    # multiple (and skipped if 0).
    mesh_data_axis: int = 1  # data-parallel shards
    mesh_space_axis: int = 1  # spatial (volume H) shards for whole-volume work
    mesh_model_axis: int = 1  # tensor-parallel shards (conv channel sharding)
    # Pipeline parallelism (GPipe, parallel/pipeline.py): 2 places stage 0
    # (him+lom) on device 0 and stage 1 (aspp+head+upsample+losses) on device
    # 1 along the reference's own checkpoint-segment cut
    # (MobileNet_LR_ASPP_3D.py:206-232). pipe_microbatches splits each batch
    # into GPipe microbatches so the two stages overlap; with 1 microbatch
    # the step equals the single-device step exactly (gate-tested in f64);
    # with >1, CE/DP losses and gradients still accumulate exactly (global-
    # denominator CE, full-batch DP pass on stage 1) but BatchNorm batch
    # statistics become per-microbatch (parallel-accumulation means — the
    # standard GPipe semantics). Exclusive with the mesh_* axes and
    # multi-host; 3D path only.
    mesh_pipe_stages: int = 1
    pipe_microbatches: int = 1
    # Note: under GSPMD jit, BatchNorm batch statistics are computed over the
    # GLOBAL batch automatically (a mean over the sharded batch axis), i.e.
    # sync-BN is inherent — stronger than the reference's per-device BN.
    # There is deliberately no sync_batchnorm flag: it would be a no-op.
    #
    # Multi-host (pod slice) launch: set dist_num_processes > 1 and launch one
    # process per host; main() calls jax.distributed.initialize() before any
    # device use, the mesh then spans the pod, and each host feeds only its
    # own batch rows (parallel/multihost.py). Only process 0 writes artifacts.
    dist_num_processes: Optional[int] = None
    dist_coordinator: Optional[str] = None  # "host0-addr:port"; None = auto (TPU metadata)
    dist_process_id: Optional[int] = None  # None = auto
    seed: int = 0
    output_dir: str = "data/output"
    log_jsonl: bool = True
    # jax.profiler trace of training steps (SURVEY.md §5: the reference has no
    # profiling; here a trace dir enables XLA-level step profiles).
    profile_dir: Optional[str] = None
    profile_epoch: int = 1  # epoch whose steps are traced

    def __post_init__(self):
        # Typo'd modes previously fell through every `== 'async'` /
        # `in ('async', 'slab')` check and silently trained with exact BN.
        if self.bn_mode not in ("batch", "async", "slab"):
            raise ValueError(
                f"bn_mode {self.bn_mode!r} (expected 'batch', 'async' or 'slab')"
            )
        if self.mesh_pipe_stages not in (1, 2):
            raise ValueError(
                f"mesh_pipe_stages {self.mesh_pipe_stages!r} (the model has "
                "exactly one natural stage cut — him+lom | aspp+head — so "
                "only 1 or 2 stages exist)"
            )
        if self.pipe_microbatches < 1:
            raise ValueError(f"pipe_microbatches {self.pipe_microbatches!r} < 1")
        if self.mesh_pipe_stages > 1:
            if (self.mesh_data_axis > 1 or self.mesh_space_axis > 1
                    or self.mesh_model_axis > 1):
                raise ValueError(
                    "mesh_pipe_stages > 1 is exclusive with the mesh_* axes "
                    "(pipeline stages are placed on explicit devices, not a "
                    "GSPMD mesh)"
                )
            if self.use_2d_normal_to is not None:
                raise ValueError(
                    "mesh_pipe_stages > 1 supports the 3D model only (the 2D "
                    "torchvision-style model has no him/lom|aspp/head cut)"
                )
            if self.batch_size % self.pipe_microbatches:
                raise ValueError(
                    f"batch_size {self.batch_size} not divisible by "
                    f"pipe_microbatches {self.pipe_microbatches}"
                )
            if (self.data_param_mode == DataParamMode.INSTANCE_PARAMS
                    and not self.use_ool_dp_loss):
                raise ValueError(
                    "mesh_pipe_stages > 1 requires the out-of-line DP "
                    "schedule (use_ool_dp_loss=True): the non-OOL DP loss "
                    "backprops its batch-coupled weight normalization into "
                    "the model, which does not decompose over microbatches"
                )

    def replace(self, **kw) -> "TrainConfig":
        return dataclasses.replace(self, **kw)

    @classmethod
    def tpu_production(cls, **kw) -> "TrainConfig":
        """The recommended TPU production configuration.

        Dataclass field defaults above reproduce the reference's semantics
        exactly (fp32, strict out-of-line DP schedule, reference augmentation
        order, activation remat) for parity testing. This preset is the
        framework's own TPU-native operating point — identical training
        mathematics, restructured for the hardware:

          * ool_mode='fused': the DP loss consumes stop_gradient(logits) from
            the CE pass instead of a second forward — same DP gradient,
            evaluated at the pre-update params (one forward less).
          * augment_order='fast-sep': warp at base resolution then
            matmul-resize, with the warp itself as a separable 3-pass
            scanline resampling (ops/sep_warp.py) — Mosaic lane-gather
            kernels at ~2.3G elem/s replace the scalar-issue-bound
            arbitrary-index gathers (~122M idx/s). The affine part inverts
            exactly; the b-spline part by a coarse-lattice fixed point
            (in-range coordinate error p99 < 0.25 voxel, labels ~99.7%
            identical to the joint warp — tests/test_sep_warp.py). Measured:
            558 -> 446 ms/step on v5e-1 (benchmarks/probe_sep_step.py).
            Binary labels only — the driver auto-downgrades to 'fast-int8'
            for other class counts (train/step.py::resolve_augment_order).
            On multi-device meshes the passes run under shard_map over the
            'data' axis (each device warps its local batch shard —
            ops/sep_warp.py::sep_warp_apply); only spatially-sharded TPU
            meshes downgrade to 'fast-int6' (the previous production order,
            2 fused arbitrary-index gathers), since the passes gather along
            every spatial axis. 'fast-bf16' and the exact-f32 orders remain
            available.
          * compute_dtype='bfloat16': MXU-native precision, f32 params.
          * use_checkpointing=False: remat is the reference's GPU-memory
            workaround; these activations fit v5e HBM.
          * bn_mode='async' (+ 1 slab warmup epoch): BN normalizes through
            the one-step-stale running stats so the stats reduction and the
            normalize+act epilogue fuse into ONE HBM pass over each conv
            output, and the backward drops the batch-stat coupling terms.
            Measured: fast-int6 step 650.7 -> 558.0 ms (-14.2%) on v5e-1.
            The warmup epoch runs same-batch slab-subsampled stats (stable
            by construction) so stats and params co-adapt before staleness
            begins; eval/validation/serving semantics are exactly
            nn.BatchNorm eval in every mode (models/norm.py).

        The DP-recovery / disturbance oracles pass under this preset
        (tests/test_disturbance_recovery.py), i.e. the capability the
        framework exists for is unchanged. Selected by
        `python -m deep_staple_tpu.main --preset production` and measured as
        the headline in bench.py.
        """
        base = dict(
            ool_mode="fused",
            augment_order="fast-sep",
            compute_dtype="bfloat16",
            use_checkpointing=False,
            bn_mode="async",
        )
        base.update(kw)
        return cls(**base)

    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        for k, v in d.items():
            if isinstance(v, Enum):
                d[k] = str(v)
        return d

    @classmethod
    def from_dict(cls, d: dict) -> "TrainConfig":
        fields = {f.name: f for f in dataclasses.fields(cls)}
        kw = {}
        for k, v in d.items():
            if k not in fields:
                continue
            if k == "data_param_mode" and isinstance(v, str):
                v = DataParamMode[v.split(".")[-1]]
            if k == "disturbance_mode" and isinstance(v, str):
                v = LabelDisturbanceMode[v.split(".")[-1]]
            kw[k] = v
        return cls(**kw)


def _smart_value(s: str):
    """Parse a CLI string: ''/'none' -> None, 'a,b' -> tuple of ints,
    otherwise int -> float -> str."""
    if s is None or s.lower() in ("", "none", "null"):
        return None
    if "," in s:
        return tuple(int(p) for p in s.split(",") if p != "")
    for cast in (int, float):
        try:
            return cast(s)
        except ValueError:
            continue
    return s


def add_cli_args(parser, config: TrainConfig = TrainConfig()):
    """Register every config field as a CLI flag (the reference has no train
    CLI; preprocessing scripts do, e.g. `build_levels.py:294-298`).

    Typed from each field's default: bools accept true/false, ints/floats are
    cast, None-able and tuple fields go through `_smart_value` (so
    `--crop-3d-w-dim-range 45,95` and `--crop-3d-w-dim-range none` both work).
    Every flag is registered under BOTH spellings (`--batch-size` and
    `--batch_size`) — reference users come from torch-style underscore CLIs.
    """
    for f in dataclasses.fields(config):
        names = ["--" + f.name.replace("_", "-")]
        if "_" in f.name:
            names.append("--" + f.name)  # underscore alias, same dest
        default = getattr(config, f.name)
        if isinstance(default, bool):
            parser.add_argument(*names, type=lambda s: s.lower() in ("1", "true", "yes"), default=default)
        elif isinstance(default, Enum):
            parser.add_argument(*names, type=str, default=str(default))
        elif isinstance(default, int):
            parser.add_argument(*names, type=int, default=default)
        elif isinstance(default, float):
            parser.add_argument(*names, type=float, default=default)
        elif isinstance(default, str):
            parser.add_argument(*names, type=str, default=default)
        else:  # Optional[...] and tuples
            parser.add_argument(*names, type=_smart_value, default=default)
    return parser


def add_preset_arg(parser):
    """`--preset {reference,production}` for training-style CLIs."""
    parser.add_argument(
        "--preset", choices=("reference", "production"), default="reference",
        help="'reference' = reference-exact semantics (fp32, strict OOL, "
        "reference augment order, remat); 'production' = the recommended "
        "TPU operating point (fused OOL, fast-sep augment order — auto-"
        "downgraded to fast-int8 for non-binary datasets and to fast-int6 "
        "on spatially-sharded TPU meshes — bfloat16, no remat, async BN — see "
        "TrainConfig.tpu_production). Explicit flags override "
        "the preset either way.",
    )
    return parser


def apply_preset(overrides: dict, preset: str, argv_tokens) -> dict:
    """Merge a named preset into parsed CLI overrides, in place.

    Explicit flags always win over the preset: a field counts as explicit when
    its `--flag` token appears in argv. Only fields the preset actually
    changes from the dataclass defaults are merged, so unrelated flags are
    never touched.
    """
    if preset == "production":
        explicit = {
            tok.split("=")[0].lstrip("-").replace("-", "_")
            for tok in argv_tokens
            if tok.startswith("--")
        }
        base = TrainConfig().to_dict()
        for k, v in TrainConfig.tpu_production().to_dict().items():
            if v != base[k] and k not in explicit:
                overrides[k] = v
    return overrides
