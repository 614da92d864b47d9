"""Subprocess smoke of the real entry points (`python -m deep_staple_tpu.main`
and `python -m deep_staple_tpu.consensus`) on the synthetic fixture — catches
arg-parsing / config-threading regressions the in-process tests can't."""

import glob
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO  # axon site dropped: CPU-only subprocess
    env.pop("PALLAS_AXON_POOL_IPS", None)
    # Share the suite's persistent compile cache (conftest.py) — subprocess
    # CPU compiles of the train step dominate these tests' wall-clock.
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(REPO, ".jax_cache_cpu")
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "2"
    return env


@pytest.fixture(scope="module")
def cli_run(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    from deep_staple_tpu.data.synthetic import generate_synthetic_crossmoda

    generate_synthetic_crossmoda(root, num_cases=3, atlas_count=2, size=(12, 12, 12), seed=1)
    cmd = [
        sys.executable, "-m", "deep_staple_tpu.main",
        "--dataset", "synthetic", "--reg-state", "synthetic",
        "--dataset-directory", str(root), "--crop-3d-w-dim-range", "none",
        "--epochs", "1", "--batch-size", "4", "--num-val-images", "1",
        "--use-checkpointing", "false", "--ool-mode", "fused",
        "--export-pth-snapshot", "true",
        "--output-dir", str(root / "out"), "--mdl-save-prefix", str(root / "models"),
    ]
    proc = subprocess.run(cmd, env=_clean_env(), cwd=REPO, capture_output=True, text=True, timeout=540)
    return root, proc


def test_main_cli_trains_and_exports(cli_run):
    root, proc = cli_run
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "dice_mean_wo_bg_fold0" in proc.stdout
    assert "val_dice_mean_wo_bg_fold0" in proc.stdout
    snaps = glob.glob(str(root / "out" / "*" / "train_label_snapshot.npz"))
    assert len(snaps) == 1
    # --export-pth-snapshot wrote the reference-format twin
    assert glob.glob(str(root / "out" / "*" / "train_label_snapshot.pth"))
    assert glob.glob(str(root / "models" / "*_epx0" / "state.msgpack"))
    assert glob.glob(str(root / "out" / "*_metrics.jsonl"))


def test_consensus_cli_consumes_snapshot(cli_run):
    root, proc = cli_run
    assert proc.returncode == 0, proc.stderr[-3000:]
    snap = glob.glob(str(root / "out" / "*" / "train_label_snapshot.npz"))[0]
    out = root / "consensus" / "cd.pkl"
    proc2 = subprocess.run(
        [sys.executable, "-m", "deep_staple_tpu.consensus",
         "--snapshot", snap, "--output", str(out), "--staple-iters", "30"],
        env=_clean_env(), cwd=REPO, capture_output=True, text=True, timeout=540,
    )
    assert proc2.returncode == 0, proc2.stderr[-3000:]
    assert "DP consensus mean dice" in proc2.stdout
    assert out.is_file()

    import pickle

    with open(out, "rb") as f:
        cd = pickle.load(f)
    fixed = next(iter(cd.values()))
    m_ids = [k for k, v in fixed.items() if isinstance(v, dict)]
    assert {"staple_sensitivity", "staple_specificity"} <= set(fixed[m_ids[0]])
    assert np.isfinite(fixed["dp_consensus_oracle_dice"]).all()


def test_pipeline_cli_end_to_end(tmp_path):
    """`python -m deep_staple_tpu.pipeline`: train -> consensus -> nnU-Net
    export in ONE command (the reference needs its training script + the
    consensus notebook + the nnU-Net prep script for this chain)."""
    import json

    from deep_staple_tpu.data.synthetic import generate_synthetic_crossmoda

    generate_synthetic_crossmoda(tmp_path, num_cases=3, atlas_count=3, size=(12, 12, 12), seed=2)
    proc = subprocess.run(
        [sys.executable, "-m", "deep_staple_tpu.pipeline",
         "--dataset", "synthetic", "--reg-state", "synthetic",
         "--dataset-directory", str(tmp_path), "--crop-3d-w-dim-range", "none",
         "--epochs", "1", "--batch-size", "4", "--num-val-images", "1",
         "--use-checkpointing", "false", "--ool-mode", "fused",
         "--staple-iterations", "30",
         "--nnunet-dir", str(tmp_path / "nnunet"),
         "--plot-dir", str(tmp_path / "plots"),
         "--output-dir", str(tmp_path / "out"), "--mdl-save-prefix", str(tmp_path / "models")],
        env=_clean_env(), cwd=REPO, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-3000:] + proc.stdout[-1500:]
    assert "DP consensus mean dice" in proc.stdout
    assert "pipeline summary" in proc.stdout

    summary = json.loads((tmp_path / "out" / "pipeline_summary.json").read_text())
    fold = summary["0"]
    assert os.path.isfile(fold["snapshot"])
    assert os.path.isfile(fold["consensus_dicts"])
    assert np.isfinite(fold["dices"]["dp_consensus"])
    # nnU-Net task folders with labels
    assert fold["nnunet_tasks"]
    labels = glob.glob(str(tmp_path / "nnunet" / "fold0" / "Task*" / "labelsTr" / "*.nii.gz"))
    assert labels
    # --plot-dir wrote the consensus boxplot + per-case weighting figures
    assert os.path.isfile(tmp_path / "plots" / "fold0" / "consensus_boxplot.png")
    assert glob.glob(str(tmp_path / "plots" / "fold0" / "weighting_*.png"))


def test_apply_preset_merges_and_respects_explicit_flags():
    """`--preset production` semantics: merge TrainConfig.tpu_production into
    the parsed overrides, but any flag present on the command line wins."""
    from deep_staple_tpu.core.config import TrainConfig, apply_preset

    prod = TrainConfig.tpu_production().to_dict()
    o = TrainConfig().to_dict()
    apply_preset(o, "production", ["--epochs", "2"])
    assert o["ool_mode"] == prod["ool_mode"] == "fused"
    assert o["augment_order"] == prod["augment_order"]
    assert o["compute_dtype"] == "bfloat16"

    # explicit flag (either --flag value or --flag=value form) wins
    o2 = TrainConfig().to_dict()
    apply_preset(o2, "production", ["--ool-mode=strict"])
    assert o2["ool_mode"] == "strict"

    # reference preset is a no-op
    o3 = TrainConfig().to_dict()
    apply_preset(o3, "reference", [])
    assert o3 == TrainConfig().to_dict()


def test_compile_cache_helper(monkeypatch, tmp_path):
    """CLI entry points enable XLA's persistent compile cache; an explicit
    JAX_COMPILATION_CACHE_DIR is honored by returning early (jax reads it),
    and the default resolves to the repo-local .jax_cache SHARED with
    bench.py/the probes (one cache for every entry point)."""
    import jax

    from deep_staple_tpu.core.cache import enable_persistent_compile_cache

    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", "/some/where")
    assert enable_persistent_compile_cache() == "/some/where"

    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR")
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    prev = jax.config.jax_compilation_cache_dir
    try:
        out = enable_persistent_compile_cache()
        expected = os.path.join(REPO, ".jax_cache")  # bench.py's cache dir
        assert out == expected
        assert os.path.isdir(expected)
        assert jax.config.jax_compilation_cache_dir == out
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_doctor_cli_cpu_environment():
    """`python -m deep_staple_tpu.doctor` passes in the CPU test environment
    and reports the key checks (doctor.py — device probes run in
    subprocesses with timeouts so a dead accelerator tunnel cannot hang it)."""
    proc = subprocess.run(
        [sys.executable, "-m", "deep_staple_tpu.doctor", "--timeout", "120"],
        env=_clean_env(), cwd=REPO, capture_output=True, text=True, timeout=480,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr[-2000:]
    for needle in ("jax / jaxlib", "accelerator backend", "8-device virtual mesh",
                   "all checks passed"):
        assert needle in proc.stdout, proc.stdout


def test_bench_canary_gate_backoff(monkeypatch):
    """bench._wait_for_healthy_tpu: immediate no-op on CPU; on a wedged
    tunnel (simulated TimeoutExpired) it backs off and retries, then settles
    after a healthy canary."""
    import bench

    # CPU env -> no-op, no subprocess
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    calls = []
    monkeypatch.setattr(bench.time, "sleep", lambda s: calls.append(("sleep", s)))
    bench._wait_for_healthy_tpu()
    assert calls == []

    # wedge then recovery: first canary times out, second succeeds
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    attempts = []

    class FakeProc:
        returncode = 0
        stdout = "canary-ok\n"
        stderr = ""

    def fake_run(cmd, timeout=None, capture_output=None, text=None):
        attempts.append(timeout)
        if len(attempts) == 1:
            raise subprocess.TimeoutExpired(cmd, timeout)
        return FakeProc()

    import subprocess as _sp
    monkeypatch.setattr(_sp, "run", fake_run)  # bench imports subprocess lazily
    bench._wait_for_healthy_tpu(attempts=3, canary_timeout=7, backoff=11, settle=13)
    assert attempts == [7, 7]            # retried exactly once after the wedge
    assert ("sleep", 11) in calls        # backed off between attempts
    assert calls[-1] == ("sleep", 13)    # settled after the healthy canary


def test_bench_pipelined_measurement_threads_state_and_defers_readback():
    """bench._pipelined_ms_per_step: chains `steps` state-threaded calls with
    the driver's deferred-readback pattern — each step's loss is consumed
    exactly once, one step late (the final one after the loop), and the
    returned state has advanced through every step."""
    import jax

    import bench

    reads = []

    class Loss:
        """Records when the host actually reads the value."""

        def __init__(self, i):
            self.i = i

        def __array__(self, dtype=None, copy=None):
            reads.append(self.i)
            return np.asarray(float(self.i), dtype=dtype or np.float32)

    calls = []

    def fake_step(state, batch, lr, key):
        assert batch is BATCH_SENTINEL and lr == 0.01
        calls.append(int(state))
        return state + 1, {"loss": Loss(len(calls))}

    BATCH_SENTINEL = object()
    state, key, ms = bench._pipelined_ms_per_step(
        fake_step, 0, BATCH_SENTINEL, jax.random.PRNGKey(0), 4
    )
    assert state == 4 and calls == [0, 1, 2, 3]
    # losses 1..4 each read once, in order, loss i consumed after call i+1
    assert reads == [1, 2, 3, 4]
    assert ms >= 0.0
    assert isinstance(key, jax.Array) and key.shape == (2,)


def test_bench_headline_basis_prefers_pipelined_steady_state():
    """bench._headline_basis: the headline seconds come from the pipelined
    steady state when measured (the sustained training throughput), with the
    rounds-1-4 synced median preserved as `synced_ms_per_step`; without a
    pipelined measurement it falls back to the synced median and says so."""
    import bench

    sec, fields = bench._headline_basis(0.4422, 407.7)
    assert sec == 407.7 / 1000.0
    assert fields == {
        "synced_ms_per_step": 442.2,
        "pipelined_ms_per_step": 407.7,
        "timing_basis": "pipelined-steady-state",
    }

    sec, fields = bench._headline_basis(0.4422, None)
    assert sec == 0.4422
    assert fields == {"synced_ms_per_step": 442.2, "timing_basis": "synced-median"}


def _wait_until(pred, timeout=10.0):
    import time

    t0 = time.time()
    while time.time() - t0 < timeout:
        if pred():
            return True
        time.sleep(0.02)
    return pred()


def test_bench_watchdog_bounds_a_dead_tunnel(monkeypatch, capsys):
    """bench._start_watchdog: on a dead tunnel (nothing measured by the
    deadline) it prints THE one JSON line with an explicit error and exits
    nonzero; if the headline already landed, the real number survives."""
    import json as _json

    import bench

    exited = []
    monkeypatch.setattr(bench.os, "_exit", lambda rc: exited.append(rc))

    # nothing measured -> explicit tpu-unreachable line, rc 1
    bench._EMITTED = False
    bench._HEADLINE_SEC.clear()
    bench._start_watchdog(0.05)
    assert _wait_until(lambda: exited)
    line = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["error"] == "tpu_unreachable_deadline"
    assert line["value"] == 0.0 and line["vs_baseline"] is None
    assert exited == [1]

    # headline landed, a SECONDARY metric hung -> real number, rc 0
    bench._EMITTED = False
    bench._HEADLINE_SEC.append(0.5)
    bench._start_watchdog(0.05)
    assert _wait_until(lambda: len(exited) >= 2)
    line = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["value"] == 2.0 and line["error"] == "watchdog_after_headline"
    assert exited[1] == 0

    # a line already emitted -> watchdog is a no-op (no double print/exit)
    n = len(exited)
    bench._start_watchdog(0.05)
    import time as _time

    _time.sleep(0.3)
    assert capsys.readouterr().out == "" and len(exited) == n
    bench._EMITTED = False
    bench._HEADLINE_SEC.clear()


def test_underscore_flag_aliases_and_auto_resume_guard():
    """Every config flag parses under BOTH spellings (torch users copy
    underscore flags from the reference's config_dict), and --auto-resume
    without a stable run identity fails fast instead of silently never
    finding the previous run's checkpoints."""
    import argparse

    from deep_staple_tpu.core.config import TrainConfig, add_cli_args
    from deep_staple_tpu.main import normal_run

    p = argparse.ArgumentParser(allow_abbrev=False)
    add_cli_args(p)
    a = p.parse_args([
        "--batch_size", "8", "--mesh-data-axis", "2",
        "--data_param_mode", "DISABLED", "--export_pth_snapshot", "true",
    ])
    assert (a.batch_size, a.mesh_data_axis) == (8, 2)
    assert a.export_pth_snapshot is True

    with pytest.raises(ValueError, match="auto-resume"):
        normal_run(TrainConfig(auto_resume=True))
