"""JAX platform-name normalization for the remote TPU tunnel.

The machine exposing the TPU is re-imaged between sessions and the
accelerator plugin's registration is not stable across images or early in
boot: observed r4 (2026-08-19, uptime ~55 min), ``JAX_PLATFORMS=axon`` (the
value the image itself exports) failed backend resolution with

    RuntimeError: Unable to initialize backend 'axon': Backend 'axon' is
    not in the list of known backends: ['cpu', 'tpu'].

while ``JAX_PLATFORMS=tpu`` reached the same chip; minutes later 'axon'
registered fine too. Unattended entry points (bench.py, ``__graft_entry__``,
the CLIs via core/cache.py) must survive both a renamed platform and a
late-registering plugin.

The recovery is deliberately IN-PROCESS and lazy: initialize the backend,
and only if that raises jax's unknown-backend error, parse the known-backend
list out of the message, rewrite the platform config, and retry once. An
earlier revision probed the registry in a ``JAX_PLATFORMS=cpu`` subprocess —
that was wrong on this image: the accelerator plugin's sitecustomize runs in
EVERY interpreter and its ``register()`` does
``jax.config.update("jax_platforms", "axon,cpu")``, overriding the env var,
so the "cpu-only" probe initialized the remote backend and counted as a full
TPU client. Launching TPU clients back-to-back wedges the tunnel (CLAUDE.md:
<~2 min between client launches); the probe put every entry point's real
client inside that window (observed: bench.py's canary timing out right
after the probe, 2026-08-19). In-process there is exactly ONE client — the
entry point itself — and a failed resolution caches nothing
(``xla_bridge.backends()`` only memoizes on success), so the retry is safe.

No reference counterpart (the reference assumes a local CUDA device,
``main_deep_staple.py:35``).
"""

from __future__ import annotations

import os
import re
import sys

_KNOWN_RE = re.compile(r"not in the list of known backends:\s*\[([^\]]*)\]")


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


def _try_backends() -> None:
    """Resolve + initialize jax's backends (isolated for tests)."""
    import jax

    jax.devices()


def _apply_platform(value: str) -> None:
    """Point both the live jax config and the env (for child processes) at
    ``value`` ('' = auto-pick)."""
    import jax

    jax.config.update("jax_platforms", value or "")
    if value:
        os.environ["JAX_PLATFORMS"] = value
    else:
        os.environ.pop("JAX_PLATFORMS", None)


_NORMALIZED = False  # once per process: the answer cannot change underneath us


def normalize_jax_platforms(verbose: bool = True) -> str:
    """Initialize the backend, repairing a stale/unregistered platform name.

    Returns the effective platform string ('' = jax auto-pick). No-op on
    cpu (never forces an accelerator connection under a CPU override) and
    memoized. Raises when even the replacement platform fails — entry points
    that must not die wrap this in try/except (core/cache.py does).
    """
    global _NORMALIZED
    plats = os.environ.get("JAX_PLATFORMS", "")
    if plats in ("", "cpu") or _NORMALIZED:
        return plats
    _NORMALIZED = True
    try:
        _try_backends()
        return plats
    except RuntimeError as err:
        known = _parse_known_backends(str(err))
        if not known:
            raise
        repl = pick_replacement(known)
        if verbose:
            print(
                f"deep_staple_tpu: JAX_PLATFORMS={plats!r} is not registered in "
                f"this image (known: {known}); normalizing to {repl or 'auto'!r}",
                file=sys.stderr,
            )
        _apply_platform(repl)
        _try_backends()
        return repl
