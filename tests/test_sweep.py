"""Grid-sweep driver smoke on the synthetic fixture (reference sweep:
`main_deep_staple.py:1099-1181`)."""

import numpy as np
import pytest

from deep_staple_tpu.core.config import TrainConfig
from deep_staple_tpu import main as main_mod


def test_sweep_runs_all_grid_points(tmp_path, monkeypatch):
    from deep_staple_tpu.data.synthetic import generate_synthetic_crossmoda

    generate_synthetic_crossmoda(tmp_path, num_cases=3, atlas_count=2, size=(12, 12, 12), seed=0)
    config = TrainConfig(
        dataset="synthetic",
        reg_state="synthetic",
        dataset_directory=str(tmp_path),
        crop_3d_w_dim_range=None,
        epochs=1,
        batch_size=4,
        num_val_images=1,
        use_checkpointing=False,
        ool_mode="fused",
        save_every=1000,
        save_labels=False,
        output_dir=str(tmp_path / "out"),
        mdl_save_prefix=str(tmp_path / "models"),
        log_jsonl=False,
        do_sweep=True,
    )
    # shrink the grid to 2 points for the smoke test
    monkeypatch.setattr(main_mod, "SWEEP_PARAMETERS", {"use_risk_regularization": [False, True]})
    results = main_mod.sweep_run(config)
    assert len(results) == 2
    for res in results.values():
        hist = res[0]["writer"].history
        assert any("scores/val_dice_mean_wo_bg_fold0" in r for r in hist)


def test_build_wandb_sweep_config_merge_semantics():
    """Reference merge (`main_deep_staple.py:1160-1181`): swept keys keep
    'values', every other config field becomes a fixed 'value', Enums are
    stringified."""
    config = TrainConfig(epochs=7)
    merged = main_mod.build_wandb_sweep_config(config)
    params = merged["parameters"]
    assert merged["method"] == "grid"
    assert merged["metric"]["name"] == main_mod.SWEEP_METRIC
    for k, vals in main_mod.SWEEP_PARAMETERS.items():
        assert params[k] == {"values": list(vals)}
        assert "value" not in params[k]
    assert params["epochs"] == {"value": 7}
    # Enum fields arrive stringified, never as Enum objects.
    assert params["data_param_mode"]["value"] == "DataParamMode.INSTANCE_PARAMS"
    from enum import Enum

    for pd in params.values():
        for v in [pd.get("value")] + list(pd.get("values", [])):
            assert not isinstance(v, Enum)


class _FakeRun:
    name = "fake-run-1"

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


class _FakeWandb:
    """Minimal wandb.sweep/agent/init/config surface for the adapter test."""

    def __init__(self, trial_overrides):
        self.sweep_configs = []
        self.agent_calls = []
        self.config = dict(trial_overrides)
        self.logged = []

    def sweep(self, cfg, project=None):
        self.sweep_configs.append((cfg, project))
        return "sweep-xyz"

    def agent(self, sweep_id, function):
        self.agent_calls.append(sweep_id)
        function()  # one trial

    def init(self, **kw):
        self.init_kw = kw
        return _FakeRun()

    def log(self, metrics, step=None):
        self.logged.append((metrics, step))

    def finish(self):
        self.finished = True


def test_wandb_sweep_run_agent_wiring(tmp_path, monkeypatch):
    """The wandb path registers the merged sweep and each agent trial re-reads
    overrides from wandb.config into a fresh TrainConfig."""
    seen = {}

    def fake_prepare(cfg):
        seen["config"] = cfg
        return "DATASET", 3

    def fake_train(run_name, cfg, dataset, atlas_count):
        seen["train"] = (run_name, cfg.use_risk_regularization, dataset, atlas_count)
        return {}

    monkeypatch.setattr(main_mod, "prepare_data", fake_prepare)
    monkeypatch.setattr(main_mod, "train_dl", fake_train)

    base = TrainConfig(use_risk_regularization=False, epochs=5)
    fake = _FakeWandb(trial_overrides={"use_risk_regularization": True})
    sweep_id = main_mod.wandb_sweep_run(base, wandb=fake)

    assert sweep_id == "sweep-xyz"
    assert fake.agent_calls == ["sweep-xyz"]
    cfg_merged, project = fake.sweep_configs[0]
    assert cfg_merged["parameters"]["epochs"] == {"value": 5}
    # the trial consumed the agent's override, not the base value
    assert seen["config"].use_risk_regularization is True
    assert seen["config"].epochs == 5
    assert seen["train"] == ("fake-run-1", True, "DATASET", 3)


def test_metric_writer_wandb_mode(monkeypatch):
    """MetricWriter's wandb sink: init with the configured mode, scalar logs
    forwarded without the private _step/_t keys, finish on close."""
    import sys

    from deep_staple_tpu.utils.logging import MetricWriter

    fake = _FakeWandb(trial_overrides={})
    monkeypatch.setitem(sys.modules, "wandb", fake)
    w = MetricWriter(wandb_mode="offline", run_name="t")
    w.log({"scores/val": 0.5}, step=3)
    w.close()
    assert fake.init_kw["mode"] == "offline"
    assert fake.logged == [({"scores/val": 0.5}, 3)]
    assert fake.finished
