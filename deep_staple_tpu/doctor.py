"""Environment diagnostics: `python -m deep_staple_tpu.doctor`.

Production-ops helper with no reference counterpart (the reference assumes a
working local CUDA device). Checks the things that actually fail in
deployment, in dependency order, and NEVER hangs: device backends are probed
in a subprocess with a timeout, because a dead or wedged remote TPU tunnel
blocks `jax.devices()` forever inside the caller (the failure mode this tool
exists to diagnose — see CLAUDE.md "tunnel wedge").

Checks:
  1. interpreter + library versions (jax/flax/optax/numpy; torch optional),
  2. accelerator backend: subprocess `jax.devices()` probe with timeout —
     distinguishes "no accelerator", "backend initialized", and "backend
     init HANGS (remote tunnel unreachable/wedged)",
  3. virtual multi-chip mesh: subprocess CPU probe with
     --xla_force_host_platform_device_count=8 (the same recipe the test
     suite and `__graft_entry__.dryrun_multichip` use),
  4. persistent compile caches (.jax_cache / .jax_cache_cpu),
  5. the optional C++ native library (NIfTI fast path + STAPLE cross-check).

Exit code: 0 when every required check passes (versions, some usable
backend, virtual mesh); optional checks (native lib, torch, caches) only
warn.
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent

OK, WARN, FAIL = "ok", "warn", "FAIL"


def _report(name: str, status: str, detail: str = "") -> bool:
    pad = " " * max(1, 34 - len(name))
    print(f"  {name}{pad}[{status}]  {detail}".rstrip())
    return status != FAIL


def _subprocess_probe(code: str, timeout: int, env_overrides=None,
                      scrub_plugin_site: bool = False):
    """Run a python snippet in a clean subprocess; return (status, output).

    status: 'ok' (rc 0), 'error' (nonzero rc), 'timeout' (hung — the
    canonical symptom of an unreachable remote accelerator tunnel).

    scrub_plugin_site: drop sitecustomize dirs that register a remote TPU
    plugin from PYTHONPATH. CPU-only probes need this: such sitecustomize
    modules open the accelerator tunnel in EVERY interpreter regardless of
    JAX_PLATFORMS, so a dead tunnel would hang even the pure-CPU checks."""
    env = dict(os.environ)
    env.update(env_overrides or {})
    if scrub_plugin_site:
        pypath = [
            p for p in env.get("PYTHONPATH", "").split(os.pathsep)
            if p and "axon" not in p
        ]
        env["PYTHONPATH"] = os.pathsep.join([str(_REPO)] + pypath)
        env.pop("PALLAS_AXON_POOL_IPS", None)
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=timeout, env=env, cwd=str(_REPO),
        )
    except subprocess.TimeoutExpired:
        return "timeout", ""
    out = (proc.stdout + proc.stderr).strip()
    return ("ok" if proc.returncode == 0 else "error"), out


def check_versions() -> bool:
    good = True
    try:
        import jax, jaxlib  # noqa

        good &= _report("jax / jaxlib", OK, f"{jax.__version__} / {jaxlib.__version__}")
    except Exception as e:  # pragma: no cover - jax is a hard dependency
        good &= _report("jax", FAIL, repr(e))
    for mod in ("flax", "optax", "numpy"):
        try:
            m = __import__(mod)
            good &= _report(mod, OK, getattr(m, "__version__", "?"))
        except Exception as e:
            good &= _report(mod, FAIL, repr(e))
    try:
        import torch

        _report("torch (optional, parity tests)", OK, torch.__version__)
    except Exception:
        _report("torch (optional, parity tests)", WARN, "not importable")
    try:
        import orbax.checkpoint  # noqa

        _report("orbax (optional, ckpt backend)", OK, "")
    except Exception:
        _report("orbax (optional, ckpt backend)", WARN, "not importable")
    return good


def check_accelerator(timeout: int) -> bool:
    code = (
        "import jax; ds = jax.devices(); "
        "print('ACCEL', jax.default_backend(), len(ds))"
    )
    status, out = _subprocess_probe(code, timeout)
    renamed = ""
    if status == "error" and "not in the list of known backends" in out:
        # Box re-images can rename the TPU plugin's platform ('axon' -> 'tpu'
        # in r4) while the env still exports the stale name; retry under the
        # name this image actually registers (core/platform.py).
        from .core.platform import _parse_known_backends, pick_replacement

        repl = pick_replacement(_parse_known_backends(out))
        stale = os.environ.get("JAX_PLATFORMS", "")
        status, out = _subprocess_probe(code, timeout, {"JAX_PLATFORMS": repl})
        renamed = f" (env names stale platform {stale!r}; works as {repl or 'auto'!r})"
    if status == "ok":
        # tagged line: plugin sitecustomize modules print warnings around it
        tagged = [l for l in out.splitlines() if l.startswith("ACCEL ")]
        _, backend, n = (tagged[-1].split() + ["?", "?"])[:3] if tagged else ("", "?", "?")
        return _report("accelerator backend", OK, f"{backend}, {n} device(s){renamed}")
    if status == "timeout":
        return _report(
            "accelerator backend", FAIL,
            f"jax.devices() hung >{timeout}s — remote TPU tunnel unreachable or "
            "wedged; retry later or run with JAX_PLATFORMS=cpu",
        )
    return _report("accelerator backend", FAIL, out[-200:])


def check_cpu_fallback(timeout: int) -> bool:
    status, out = _subprocess_probe(
        "import jax, jax.numpy as jnp; import numpy as np; "
        "x = jnp.ones((64, 64)) + 1; assert float(np.asarray(x).sum()) == 8192; "
        "print('cpu-ok')",
        timeout, {"JAX_PLATFORMS": "cpu"}, scrub_plugin_site=True,
    )
    if status == "ok":
        return _report("cpu fallback", OK, "")
    return _report("cpu fallback", FAIL, out[-200:] or status)


def check_virtual_mesh(timeout: int) -> bool:
    flags = os.environ.get("XLA_FLAGS", "")
    flags = " ".join(
        f for f in flags.split() if "xla_force_host_platform_device_count" not in f
    )
    env = {
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": (flags + " --xla_force_host_platform_device_count=8").strip(),
    }
    code = (
        "import jax, numpy as np; import jax.numpy as jnp; "
        "from jax.sharding import Mesh, NamedSharding, PartitionSpec as P; "
        "mesh = Mesh(np.array(jax.devices()).reshape(8), ('data',)); "
        "x = jax.device_put(jnp.arange(16.0), NamedSharding(mesh, P('data'))); "
        "print('mesh-ok', float(jax.jit(lambda a: a.sum())(x)))"
    )
    status, out = _subprocess_probe(code, timeout, env, scrub_plugin_site=True)
    if status == "ok" and "mesh-ok" in out:
        return _report("8-device virtual mesh (GSPMD)", OK, "")
    return _report("8-device virtual mesh (GSPMD)", FAIL, out[-200:] or status)


def check_compile_caches() -> bool:
    for name in (".jax_cache", ".jax_cache_cpu"):
        d = _REPO / name
        if d.is_dir() and any(d.iterdir()):
            n = sum(1 for _ in d.iterdir())
            _report(f"compile cache {name}", OK, f"{n} entries")
        else:
            _report(f"compile cache {name}", WARN, "empty (first runs will compile slowly)")
    return True


def check_native() -> bool:
    try:
        from .data import native_io

        lib = native_io._find_lib()
        if lib is None:
            # _find_lib already attempted an autobuild from source; reaching
            # here means it failed or was opted out. The autobuilder records
            # the compiler's stderr so the cause is actionable.
            if os.environ.get("DEEPSTAPLE_NO_AUTOBUILD"):
                why = "autobuild opted out via DEEPSTAPLE_NO_AUTOBUILD=1"
            else:
                why = native_io.LAST_AUTOBUILD_ERROR or "autobuild failed (no error recorded)"
            _report("native C++ lib", WARN,
                    f"absent: {why} (run native/build.sh for fast IO)")
        else:
            _report("native C++ lib", OK, "")
    except Exception as e:
        _report("native C++ lib", WARN, f"probe failed: {e!r}")
    return True


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--timeout", type=int, default=120,
                   help="per-probe subprocess timeout in seconds")
    args = p.parse_args(argv)

    print("deep_staple_tpu doctor")
    print(f"  repo: {_REPO}")
    print(f"  python: {sys.version.split()[0]}  JAX_PLATFORMS={os.environ.get('JAX_PLATFORMS', '(unset)')}")
    good = check_versions()
    accel = check_accelerator(args.timeout)
    good &= check_cpu_fallback(args.timeout)
    good &= check_virtual_mesh(args.timeout)
    check_compile_caches()
    check_native()
    if not accel:
        # A dead accelerator is a FAIL for production but the CPU path may
        # still be fully usable — reflect that in the summary text.
        print("summary: accelerator unavailable; CPU paths "
              + ("usable" if good else "ALSO failing"))
        return 1
    print("summary: " + ("all checks passed" if good else "FAILURES above"))
    return 0 if good else 1


if __name__ == "__main__":
    sys.exit(main())
