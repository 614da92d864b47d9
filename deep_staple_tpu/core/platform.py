"""JAX platform-name normalization for the remote TPU tunnel.

The machine exposing the TPU is re-imaged between sessions and the
accelerator plugin's registration is not stable across images or early in
boot: observed r4 (2026-08-19, uptime ~55 min), ``JAX_PLATFORMS=axon`` (the
value the image itself exports) failed backend resolution with

    RuntimeError: Unable to initialize backend 'axon': Backend 'axon' is
    not in the list of known backends: ['cpu', 'tpu'].

while ``JAX_PLATFORMS=tpu`` reached the same chip; minutes later 'axon'
registered fine too. Unattended entry points (bench.py, ``__graft_entry__``,
the CLIs) must survive both a renamed platform and a late-registering
plugin, so they call :func:`normalize_jax_platforms` BEFORE the first
``import jax``.

The probe is deliberately tunnel-safe: it lists the *registered backend
factories* in a ``JAX_PLATFORMS=cpu`` subprocess (plugin factories register
at import/discovery; only initialization opens the tunnel), so it never
counts as a TPU client — launching TPU clients back-to-back wedges the
tunnel (CLAUDE.md). Only when the configured platform name is absent from
the registry does it rewrite ``os.environ['JAX_PLATFORMS']`` to the best
registered accelerator name.

No reference counterpart (the reference assumes a local CUDA device,
``main_deep_staple.py:35``).
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

_KNOWN_RE = re.compile(r"not in the list of known backends:\s*\[([^\]]*)\]")

# Runs with JAX_PLATFORMS=cpu: factory registration (including PJRT plugin
# discovery) happens during backends() resolution, but only the *selected*
# platform is initialized — the accelerator tunnel is never touched.
_PROBE = (
    "import jax; jax.devices(); "
    "from jax._src import xla_bridge; "
    "print('KNOWN', ','.join(sorted(xla_bridge._backend_factories.keys())))"
)


def _parse_known_backends(text: str) -> list[str]:
    """Extract backend names from jax's unknown-backend error message."""
    m = _KNOWN_RE.search(text)
    if not m:
        return []
    return [tok.strip().strip("'\"") for tok in m.group(1).split(",") if tok.strip()]


def pick_replacement(known: list[str]) -> str:
    """Choose a replacement platform string from jax's known-backend list.

    Prefers an accelerator name; falls back to '' (= let jax auto-pick)."""
    for cand in ("tpu", "gpu", "cuda", "rocm"):
        if cand in known:
            return cand
    return ""


def registered_platforms(timeout: int = 120) -> list[str]:
    """Backend factory names registered in a fresh CPU-only interpreter.

    Returns [] when the probe fails (old jax private-attr drift, broken
    install) — callers must treat that as "unknown", not "none"."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _PROBE],
            capture_output=True, text=True, timeout=timeout, env=env,
        )
    except Exception:
        return []
    for line in reversed(proc.stdout.splitlines()):
        if line.startswith("KNOWN "):
            return [t for t in line[len("KNOWN "):].split(",") if t]
    return []


_NORMALIZED = False  # once per process: the answer cannot change underneath us


def normalize_jax_platforms(timeout: int = 120, verbose: bool = True) -> str:
    """Fix a stale/unregistered ``JAX_PLATFORMS`` env var in-place.

    Must be called before the first ``import jax`` in this process (jax
    freezes the platform at backend init). Returns the final env value.
    Leaves the environment untouched when the configured name is registered,
    or when the registry probe itself fails. Memoized: repeat calls are free.
    """
    global _NORMALIZED
    plats = os.environ.get("JAX_PLATFORMS", "")
    if plats in ("", "cpu") or _NORMALIZED:
        return plats
    _NORMALIZED = True
    known = registered_platforms(timeout=timeout)
    if not known:
        return plats  # probe failed: don't guess
    wanted = [p for p in plats.split(",") if p]
    if all(p in known for p in wanted):
        return plats
    repl = pick_replacement(known)
    if verbose:
        print(
            f"deep_staple_tpu: JAX_PLATFORMS={plats!r} is not registered in this "
            f"image (known: {known}); normalizing to {repl or 'auto'!r}",
            file=sys.stderr,
        )
    if repl:
        os.environ["JAX_PLATFORMS"] = repl
    else:
        os.environ.pop("JAX_PLATFORMS", None)
    return repl
