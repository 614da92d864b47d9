"""Minimal wandb stand-in for running the reference training script offline.

The reference (`/root/reference/main_deep_staple.py`) drives wandb throughout
(init :1134-1137, logs :818-854, run.name :617). This shim reproduces exactly
the API surface that script touches so it can run as an oracle process with
zero network access, and additionally records every `wandb.log` call to a
JSONL file (env REF_ORACLE_WANDB_LOG) so the harness can compare the
reference's loss/DP-correlation trajectories against the rebuild's.

Semantics note: real wandb snapshots the config at init() and stringifies
Enum values — the reference *depends* on this (`main_deep_staple.py:417`
compares `config.data_param_mode == str(DataParamMode.INSTANCE_PARAMS)`),
so the shim does the same.
"""

import json
import os
from enum import Enum


class _Config(dict):
    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:  # pragma: no cover - attribute protocol
            raise AttributeError(name) from e


def _snapshot(cfg):
    out = _Config()
    for k, v in dict(cfg or {}).items():
        out[k] = str(v) if isinstance(v, Enum) else v
    return out


def _jsonable(v):
    if hasattr(v, "item") and getattr(v, "numel", lambda: 2)() == 1:
        try:
            return v.item()
        except Exception:
            return repr(type(v))
    if isinstance(v, (int, float, str, bool)) or v is None:
        return v
    try:
        return float(v)
    except Exception:
        return repr(type(v))


class Settings:
    def __init__(self, **kwargs):
        self.kwargs = kwargs


class Table:
    def __init__(self, columns=None, data=None, **kwargs):
        self.columns = columns
        self.data = data


def plot_table(vega_spec_name=None, data_table=None, fields=None, **kwargs):
    return {"vega_spec_name": vega_spec_name}


class Run:
    def __init__(self, name):
        self.name = name

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


run = None
config = _Config()


def init(project=None, group=None, job_type=None, config=None, settings=None,
         mode=None, **kwargs):
    global run
    globals()["config"] = _snapshot(config)
    run = Run(os.environ.get("REF_ORACLE_RUN_NAME", "refrun"))
    return run


def log(payload, step=None, **kwargs):
    path = os.environ.get("REF_ORACLE_WANDB_LOG")
    if not path:
        return
    rec = {"step": step}
    rec.update({k: _jsonable(v) for k, v in payload.items()})
    with open(path, "a") as f:
        f.write(json.dumps(rec) + "\n")


def sweep(sweep_config, project=None, **kwargs):  # pragma: no cover
    raise RuntimeError("wandb shim: sweeps not supported in oracle runs")


def agent(sweep_id, function=None, **kwargs):  # pragma: no cover
    raise RuntimeError("wandb shim: sweeps not supported in oracle runs")
