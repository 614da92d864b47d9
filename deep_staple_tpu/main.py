"""Experiment driver CLI.

Capability parity with `main_deep_staple.py`'s L7 layer: `normal_run`
(:1133-1144), grid `sweep_run` (:1099-1181), config overrides via CLI flags
(the reference has none for training; added here).

Usage:
    python -m deep_staple_tpu.main --epochs 40 --reg-state acummulate_every_third_deeds_FT2_MT1
    python -m deep_staple_tpu.main --do-sweep true
"""

from __future__ import annotations

import argparse
import itertools
import time

from .core.cache import enable_persistent_compile_cache
from .core.config import TrainConfig, add_cli_args, add_preset_arg, apply_preset
from .train.driver import train_dl
from .train.prepare import prepare_data

# Grid sweep spec, mirroring sweep_config_dict (`main_deep_staple.py:1099-1130`).
SWEEP_PARAMETERS = {
    "use_risk_regularization": [False, True],
    "use_fixed_weighting": [False, True],
}
SWEEP_METRIC = "scores/val_dice_mean_tumour_fold0"  # goal: maximize


def normal_run(config: TrainConfig, run_name: str | None = None):
    if run_name is None and config.auto_resume and not config.checkpoint_name:
        # A generated run name is a fresh timestamp every invocation, so the
        # newest-checkpoint scan could never match a previous run's files —
        # the advertised "re-run the same command" crash recovery needs a
        # stable name to scan under.
        raise ValueError(
            "--auto-resume needs a stable checkpoint identity: pass "
            "--run-name (or --checkpoint-name) matching the interrupted run"
        )
    run_name = run_name or f"run-{int(time.time())}"
    print("Running", run_name)
    dataset, atlas_count = prepare_data(config)
    return train_dl(run_name, config, dataset, atlas_count)


def sweep_run(config: TrainConfig):
    """Grid sweep over SWEEP_PARAMETERS; returns {override_tuple: results}."""
    keys = list(SWEEP_PARAMETERS.keys())
    all_results = {}
    best = (None, float("-inf"))
    for values in itertools.product(*(SWEEP_PARAMETERS[k] for k in keys)):
        overrides = dict(zip(keys, values))
        cfg = config.replace(**overrides)
        run_name = "sweep-" + "-".join(f"{k}={v}" for k, v in overrides.items())
        results = normal_run(cfg, run_name)
        all_results[tuple(values)] = results
        writer = results[list(results)[0]]["writer"]
        vals = [r.get(SWEEP_METRIC) for r in writer.history if SWEEP_METRIC in r]
        score = max(v for v in vals if v == v) if vals else float("-inf")
        if score > best[1]:
            best = (overrides, score)
    print(f"Best sweep config: {best[0]} ({SWEEP_METRIC}={best[1]:.4f})")
    return all_results


def build_wandb_sweep_config(config: TrainConfig, sweep_parameters=None, metric=SWEEP_METRIC) -> dict:
    """Merge the full config into a wandb sweep spec, reference semantics
    (`main_deep_staple.py:1160-1181`): swept keys keep their 'values' lists,
    every other config field becomes a fixed {'value': v} parameter so the
    agent's wandb.config carries the complete configuration; Enum entries are
    stringified (wandb would otherwise identify them by numerical index)."""
    from enum import Enum

    sweep_parameters = sweep_parameters if sweep_parameters is not None else SWEEP_PARAMETERS
    merged = {
        "method": "grid",
        "metric": {"goal": "maximize", "name": metric},
        "parameters": {k: {"values": list(v)} for k, v in sweep_parameters.items()},
    }
    for k, v in config.to_dict().items():  # to_dict already stringifies Enums
        if k not in sweep_parameters:
            merged["parameters"][k] = {"value": v}
    for pd in merged["parameters"].values():
        if "value" in pd and isinstance(pd["value"], Enum):
            pd["value"] = str(pd["value"])
        if "values" in pd:
            pd["values"] = [str(e) if isinstance(e, Enum) else e for e in pd["values"]]
    return merged


def wandb_sweep_run(config: TrainConfig, wandb=None):
    """wandb-agent sweep (reference `main_deep_staple.py:1146-1181`): register
    the merged sweep, let the agent drive trials, each trial re-reading its
    overrides from wandb.config. Falls back to the grid `sweep_run` when wandb
    is not importable (this framework never hard-depends on wandb)."""
    if wandb is None:
        try:
            import wandb  # type: ignore[no-redef]
        except ImportError:
            print("wandb not importable; falling back to the grid sweep driver")
            return sweep_run(config)

    def _trial():
        with wandb.init(mode=config.wandb_mode) as run:
            overrides = dict(wandb.config)
            cfg = TrainConfig.from_dict({**config.to_dict(), **overrides})
            print("Running", run.name)
            dataset, atlas_count = prepare_data(cfg)
            return train_dl(run.name, cfg, dataset, atlas_count)

    sweep_id = wandb.sweep(build_wandb_sweep_config(config), project="deep_staple_tpu")
    wandb.agent(sweep_id, function=_trial)
    return sweep_id


def maybe_init_distributed(config: TrainConfig):
    """Join the multi-host job when configured (no-op otherwise).

    Must run before any JAX backend/device use in this process. The reference
    is strictly single-GPU (SURVEY.md §2.7); this is the standard JAX pod
    launch: every host runs the same command, process 0's address as the
    coordinator (all three fields are auto-discovered on Cloud TPU pods, so
    `--dist-num-processes N` alone suffices there).
    """
    if not config.dist_num_processes or config.dist_num_processes <= 1:
        return False
    import jax

    jax.distributed.initialize(
        coordinator_address=config.dist_coordinator,
        num_processes=config.dist_num_processes,
        process_id=config.dist_process_id,
    )
    print(
        f"distributed: process {jax.process_index()}/{jax.process_count()}, "
        f"{len(jax.local_devices())} local of {len(jax.devices())} devices"
    )
    return True


def main(argv=None):
    # allow_abbrev=False: abbreviated flags would evade apply_preset's
    # explicit-flag detection (token match) and get silently clobbered.
    parser = argparse.ArgumentParser(description="DeepSTAPLE-TPU training", allow_abbrev=False)
    parser.add_argument("--run-name", default=None,
                        help="stable run name (default: run-<timestamp>); required for "
                        "--auto-resume to find this run's checkpoints across invocations")
    add_preset_arg(parser)
    add_cli_args(parser)
    args = parser.parse_args(argv)
    overrides = vars(args).copy()
    run_name = overrides.pop("run_name")
    preset = overrides.pop("preset")
    import sys

    apply_preset(overrides, preset, argv if argv is not None else sys.argv[1:])
    config = TrainConfig.from_dict(overrides)
    enable_persistent_compile_cache()
    maybe_init_distributed(config)
    if config.do_sweep:
        if config.wandb_mode != "disabled":
            return wandb_sweep_run(config)
        return sweep_run(config)
    return normal_run(config, run_name)


if __name__ == "__main__":
    main()
