"""Platform-name normalization (core/platform.py).

The TPU box is re-imaged between sessions and the accelerator plugin's
registered platform name is unstable ('axon' vs 'tpu', and late-registering
early in boot). These tests pin the repair logic without ever touching an
accelerator.
"""

import os

import pytest

from deep_staple_tpu.core import platform as plat


REAL_ERROR = (
    "RuntimeError: Unable to initialize backend 'axon': Backend 'axon' is "
    "not in the list of known backends: ['cpu', 'tpu']. (set JAX_PLATFORMS='' "
    "to automatically choose an available backend)"
)


def test_parse_known_backends_real_message():
    assert plat._parse_known_backends(REAL_ERROR) == ["cpu", "tpu"]


def test_parse_known_backends_no_match():
    assert plat._parse_known_backends("some other failure") == []


@pytest.mark.parametrize(
    "known,expect",
    [
        (["cpu", "tpu"], "tpu"),
        (["cpu", "gpu"], "gpu"),
        (["cpu"], ""),
        ([], ""),
    ],
)
def test_pick_replacement(known, expect):
    assert plat.pick_replacement(known) == expect


@pytest.fixture
def fresh(monkeypatch):
    monkeypatch.setattr(plat, "_NORMALIZED", False)
    return monkeypatch


def test_normalize_noop_on_cpu(fresh):
    fresh.setenv("JAX_PLATFORMS", "cpu")
    calls = []
    fresh.setattr(plat, "registered_platforms", lambda **kw: calls.append(1) or [])
    assert plat.normalize_jax_platforms() == "cpu"
    assert calls == []  # never probes on cpu


def test_normalize_rewrites_stale_name(fresh):
    fresh.setenv("JAX_PLATFORMS", "axon")
    fresh.setattr(plat, "registered_platforms", lambda **kw: ["cpu", "tpu"])
    assert plat.normalize_jax_platforms(verbose=False) == "tpu"
    assert os.environ["JAX_PLATFORMS"] == "tpu"


def test_normalize_keeps_registered_name(fresh):
    fresh.setenv("JAX_PLATFORMS", "axon")
    fresh.setattr(plat, "registered_platforms", lambda **kw: ["axon", "cpu", "tpu"])
    assert plat.normalize_jax_platforms(verbose=False) == "axon"
    assert os.environ["JAX_PLATFORMS"] == "axon"


def test_normalize_probe_failure_leaves_env(fresh):
    fresh.setenv("JAX_PLATFORMS", "axon")
    fresh.setattr(plat, "registered_platforms", lambda **kw: [])
    assert plat.normalize_jax_platforms(verbose=False) == "axon"
    assert os.environ["JAX_PLATFORMS"] == "axon"


def test_normalize_unsets_when_no_accelerator(fresh):
    fresh.setenv("JAX_PLATFORMS", "axon")
    fresh.setattr(plat, "registered_platforms", lambda **kw: ["cpu"])
    assert plat.normalize_jax_platforms(verbose=False) == ""
    assert "JAX_PLATFORMS" not in os.environ


def test_normalize_memoized(fresh):
    fresh.setenv("JAX_PLATFORMS", "axon")
    calls = []
    fresh.setattr(
        plat, "registered_platforms", lambda **kw: calls.append(1) or ["cpu", "tpu"]
    )
    plat.normalize_jax_platforms(verbose=False)
    # second call must not probe again even though env is now non-cpu ('tpu')
    plat.normalize_jax_platforms(verbose=False)
    assert len(calls) == 1


def test_registered_platforms_real_subprocess():
    # Integration: the CPU-only registry probe must at least see 'cpu'.
    known = plat.registered_platforms(timeout=180)
    assert "cpu" in known
