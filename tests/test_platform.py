"""Platform-name normalization (core/platform.py).

The TPU box is re-imaged between sessions and the accelerator plugin's
registered platform name is unstable ('axon' vs 'tpu', and late-registering
early in boot). The repair is IN-PROCESS (initialize, parse jax's
unknown-backend error, rewrite, retry once) — a subprocess probe counts as a
second TPU client on this image and wedges the tunnel. These tests pin the
repair logic without ever touching an accelerator: the backend-init and
config-apply seams are monkeypatched.
"""

import os

import pytest

from deep_staple_tpu.core import platform as plat


REAL_ERROR = (
    "Unable to initialize backend 'axon': Backend 'axon' is "
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

    applied = []

    def fake_apply(value):
        applied.append(value)
        if value:
            monkeypatch.setenv("JAX_PLATFORMS", value)
        else:
            monkeypatch.delenv("JAX_PLATFORMS", raising=False)

    monkeypatch.setattr(plat, "_apply_platform", fake_apply)
    monkeypatch.applied = applied
    return monkeypatch


def _failing_then_ok(message, calls):
    """_try_backends stub: unknown-backend error on the first call only."""

    def stub():
        calls.append(1)
        if len(calls) == 1:
            raise RuntimeError(message)

    return stub


def test_normalize_noop_on_cpu(fresh):
    fresh.setenv("JAX_PLATFORMS", "cpu")
    calls = []
    fresh.setattr(plat, "_try_backends", lambda: calls.append(1))
    assert plat.normalize_jax_platforms() == "cpu"
    assert calls == []  # never initializes under a CPU override


def test_normalize_rewrites_stale_name(fresh):
    fresh.setenv("JAX_PLATFORMS", "axon")
    calls = []
    fresh.setattr(plat, "_try_backends", _failing_then_ok(REAL_ERROR, calls))
    assert plat.normalize_jax_platforms(verbose=False) == "tpu"
    assert os.environ["JAX_PLATFORMS"] == "tpu"
    assert len(calls) == 2  # failed init + successful retry


def test_normalize_keeps_registered_name(fresh):
    fresh.setenv("JAX_PLATFORMS", "axon")
    fresh.setattr(plat, "_try_backends", lambda: None)
    assert plat.normalize_jax_platforms(verbose=False) == "axon"
    assert os.environ["JAX_PLATFORMS"] == "axon"
    assert fresh.applied == []  # no rewrite when init succeeds


def test_normalize_unparseable_error_raises(fresh):
    fresh.setenv("JAX_PLATFORMS", "axon")

    def broken():
        raise RuntimeError("tunnel exploded")

    fresh.setattr(plat, "_try_backends", broken)
    with pytest.raises(RuntimeError, match="tunnel exploded"):
        plat.normalize_jax_platforms(verbose=False)


def test_normalize_unsets_when_no_accelerator(fresh):
    fresh.setenv("JAX_PLATFORMS", "axon")
    calls = []
    msg = "Backend 'axon' is not in the list of known backends: ['cpu']."
    fresh.setattr(plat, "_try_backends", _failing_then_ok(msg, calls))
    assert plat.normalize_jax_platforms(verbose=False) == ""
    assert "JAX_PLATFORMS" not in os.environ


def test_normalize_memoized(fresh):
    fresh.setenv("JAX_PLATFORMS", "axon")
    calls = []
    fresh.setattr(plat, "_try_backends", _failing_then_ok(REAL_ERROR, calls))
    plat.normalize_jax_platforms(verbose=False)
    # second call must not re-initialize even though env is now 'tpu'
    plat.normalize_jax_platforms(verbose=False)
    assert len(calls) == 2
