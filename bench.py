"""Benchmark harness. Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: full DeepSTAPLE train steps/sec at the reference's training
workload — batch 8, 128x128x(95-45) crops pre-interpolated x1.5 to
192x192x75 (`main_deep_staple.py:84,95`, `HybridIdLoader.py:327`), with
on-device augmentation, class-weighted CE fwd/bwd + AdamW, the out-of-line DP
pass, and the SparseAdam DP update all included — everything the reference
does per batch.

The headline runs the framework's PRODUCTION configuration
(`TrainConfig.tpu_production()`: fused OOL schedule, base-resolution fused
int6 warp (image + both labels in 2 gathers), bfloat16 compute, no remat —
same training mathematics and augmentation distribution, restructured for the
TPU; the DP-recovery oracles pass under it,
tests/test_disturbance_recovery.py). The
reference-exact strict/fp32-gather parity mode is measured and printed to
stderr as well, so both numbers are always on record.

vs_baseline: ratio against the reference-equivalent PyTorch step measured on
this machine (torch is CPU-only in this image; the reference never published
GPU throughput — SURVEY.md §6). The torch number is measured once at a reduced
batch and scaled linearly, then cached in BENCH_BASELINE.json.

Secondary numbers (strict parity mode, consensus fusion voxels/sec, STAPLE EM)
go to stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time
from pathlib import Path

import numpy as np

BASELINE_CACHE = Path(__file__).parent / "BENCH_BASELINE.json"

BATCH = 8
BASE_SPATIAL = (128, 128, 50)  # post W-crop 45:95
AUG_SPATIAL = (192, 192, 75)  # x1.5 pre-interpolation


def _eprint(*a):
    print(*a, file=sys.stderr)


def _enable_compile_cache():
    # Shared with every CLI entry point (core/cache.py resolves to the same
    # repo-local .jax_cache), so a step compiled by the pipeline is warm here.
    try:
        from deep_staple_tpu.core.cache import enable_persistent_compile_cache

        enable_persistent_compile_cache()
    except Exception:
        pass


def _profile_device_ms(once, iters: int = 3):
    """Total XLA-Ops device time per step from a short profiler trace.

    Wall timings over the axon tunnel carry a ~29ms dispatch+sync floor
    (CLAUDE.md); the xplane trace's device_duration is the honest on-chip
    number (same parsing as benchmarks/profile_model.py)."""
    import glob as _glob
    import tempfile

    import jax

    trace_dir = tempfile.mkdtemp(prefix="benchtrace_")
    jax.profiler.start_trace(trace_dir)
    for _ in range(iters):
        once()
    jax.profiler.stop_trace()
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    total_ps = 0
    for path in _glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                           recursive=True):
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if "TPU" not in plane.name and not plane.name.startswith("/device"):
                continue
            for line in plane.lines:
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    total_ps += ev.duration_ps
    if total_ps == 0:
        return None
    return total_ps / 1e9 / iters


def _pipelined_ms_per_step(train_step, state, batch, key, steps: int):
    """Steady-state pipelined wall clock of a state-threaded step chain.

    The production driver reads each step's metrics ONE STEP DEFERRED
    (train/driver.py pending_metrics), so the ~29ms tunnel dispatch+sync
    floor overlaps the next step's device work instead of serializing after
    it. This chains `steps` state-threaded calls with that same deferred
    host readback (the host transfer of step i-1's loss is the only sync —
    block_until_ready is unreliable over the tunnel) and divides the
    end-to-end wall by the count. Each step's state depends on the previous
    one and a host transfer lands every iteration, so no device work can be
    elided — this IS the throughput a training run sustains, and (since r5)
    the headline is computed from it; the per-step-synced median is kept in
    the JSON as `synced_ms_per_step` for cross-round comparability (r4's
    headline basis).

    Returns (state, key, ms_per_step).
    """
    import jax

    pending = None
    t0 = time.time()
    for _ in range(steps):
        key, k = jax.random.split(key)
        state, m = train_step(state, batch, 0.01, k)
        if pending is not None:
            _ = float(np.asarray(pending))  # host transfer = real sync
        pending = m["loss"]
    _ = float(np.asarray(pending))
    return state, key, (time.time() - t0) / steps * 1000


def measure_tpu_train_step(steps: int = 10, compute_dtype: str = "bfloat16",
                           ool_mode: str = "strict", augment_order: str = "reference",
                           use_checkpointing: bool = True, bn_mode: str = "batch",
                           profile: bool = False):
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from deep_staple_tpu.core.config import TrainConfig
    from deep_staple_tpu.train.driver import make_model
    from deep_staple_tpu.train.state import create_state
    from deep_staple_tpu.train.step import make_train_step

    dataset_len = 1070
    config = TrainConfig(
        use_checkpointing=use_checkpointing, ool_mode=ool_mode, compute_dtype=compute_dtype,
        augment_order=augment_order, bn_mode=bn_mode,
    )
    model, _ = make_model(config, num_classes=2)
    state, tx = create_state(model, (1,) + AUG_SPATIAL + (1,), dataset_len)
    class_weights = np.array([0.5, 1.5], np.float32)
    fixed_weighting = np.full((dataset_len,), 8.0, np.float32)
    train_step = make_train_step(
        model, tx, config, class_weights, fixed_weighting, pre_interpolation_factor=1.5
    )

    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.randn(BATCH, *BASE_SPATIAL).astype(np.float32)),
        "label": jnp.asarray((rng.rand(BATCH, *BASE_SPATIAL) > 0.9).astype(np.int32)),
        "modified_label": jnp.asarray((rng.rand(BATCH, *BASE_SPATIAL) > 0.9).astype(np.int32)),
        "dataset_idx": jnp.arange(BATCH, dtype=jnp.int32),
    }
    key = jax.random.PRNGKey(0)

    # compile + warmup. Sync via a host transfer of the loss: on the axon
    # tunnel jax.block_until_ready returns immediately (documented in
    # CLAUDE.md), so only a device->host read is a real barrier.
    t0 = time.time()
    state, m = train_step(state, batch, 0.01, key)
    _ = float(np.asarray(m["loss"]))
    _eprint(f"compile+first step: {time.time()-t0:.1f}s")

    times = []
    for i in range(steps):
        key, k = jax.random.split(key)
        t0 = time.time()
        state, m = train_step(state, batch, 0.01, k)
        _ = float(np.asarray(m["loss"]))  # host transfer = real sync
        times.append(time.time() - t0)
    sec = float(np.median(times))
    _eprint(
        f"TPU train step [{ool_mode}/{augment_order}/remat={use_checkpointing}]: "
        f"{sec*1000:.1f} ms/step (median of {steps})"
    )
    if not profile:
        return sec
    pipelined_ms = None
    try:
        state, key, pipelined_ms = _pipelined_ms_per_step(
            train_step, state, batch, key, steps
        )
        _eprint(
            f"  pipelined (deferred-readback, driver pattern): "
            f"{pipelined_ms:.1f} ms/step over {steps} chained steps"
        )
    except Exception as e:
        _eprint(f"  pipelined measurement skipped: {e}")
    device_ms = None
    try:
        holder = {"state": state, "key": key}

        def once():
            holder["key"], k = jax.random.split(holder["key"])
            holder["state"], m = train_step(holder["state"], batch, 0.01, k)
            return float(np.asarray(m["loss"]))

        device_ms = _profile_device_ms(once)
        if device_ms:
            _eprint(f"  device time (profiler): {device_ms:.1f} ms/step")
    except Exception as e:
        _eprint(f"  device-time profiling skipped: {e}")
    return sec, device_ms, pipelined_ms


def measure_torch_baseline() -> float:
    """Seconds per reference train step at BATCH via cached measurement."""
    if BASELINE_CACHE.is_file():
        cached = json.loads(BASELINE_CACHE.read_text())
        if cached.get("batch") == BATCH and tuple(cached.get("spatial", ())) == AUG_SPATIAL:
            return float(cached["sec_per_step"])
    from benchmarks.torch_reference_step import measure_reference_step_time

    # batch 2 (not 1): torch BatchNorm3d in train mode needs >1 value per
    # channel after the ASPP global pooling branch.
    small_batch = 2
    t = measure_reference_step_time(small_batch, AUG_SPATIAL, steps=2)
    sec = t * (BATCH / small_batch)  # linear batch scaling (CPU conv3d is compute-bound)
    BASELINE_CACHE.write_text(
        json.dumps(
            {
                "sec_per_step": sec,
                "batch": BATCH,
                "spatial": AUG_SPATIAL,
                "measured_batch": small_batch,
                "hardware": "host CPU (torch has no accelerator in this image)",
            },
            indent=2,
        )
    )
    return sec


def measure_serving(batch: int = 4, spatial=(256, 256, 100), iters: int = 5):
    """Serving throughput (VERDICT r4 #6): eval-mode forward + argmax at the
    reference's validation/serving resolution (x2.0 eval scale of the
    128x128x50 crop, `HybridIdLoader.py:336` -> 256x256x100), bf16, single
    chip. batch=4 is the serve CLI's default (`serve.py::serve`); it also
    amortizes the ~29ms tunnel dispatch+sync floor that dominates smaller
    batches (b2 measured 17.3 vol/s, b4 19.7). Device-resident input;
    checkpoint restore and NIfTI I/O excluded (host I/O is tunnel-bound in
    this environment). Returns volumes/s."""
    import jax
    import jax.numpy as jnp

    from deep_staple_tpu.models import MobileNetLRASPP3D

    model = MobileNetLRASPP3D(num_classes=2, use_checkpointing=False,
                              dtype=jnp.bfloat16)
    x = jnp.zeros((batch,) + spatial + (1,), jnp.float32)
    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1,) + spatial + (1,), jnp.float32), train=False))()

    @jax.jit
    def infer(variables, x):
        out = model.apply(variables, x, train=False)["out"]
        return jnp.argmax(out, axis=-1).astype(jnp.int32)

    # Sync via a SCALAR host transfer: np.asarray on the full label map would
    # pull ~50MB over the tunnel per call and time the wire, not the chip.
    pred = infer(variables, x)
    _ = int(pred[0, 0, 0, 0])
    times = []
    for _i in range(iters):
        t0 = time.time()
        pred = infer(variables, x)
        _ = int(pred[0, 0, 0, 0])
        times.append(time.time() - t0)
    vps = batch / float(np.median(times))
    _eprint(f"serving: {vps:.2f} volumes/s (eval fwd+argmax, b{batch} @ "
            f"{spatial[0]}x{spatial[1]}x{spatial[2]} bf16)")
    return vps


def measure_consensus_fusion(cases: int = 4, raters: int = 10, spatial=(256, 256, 100)):
    import jax
    import jax.numpy as jnp

    from deep_staple_tpu.consensus.voting import calc_dp_consensus

    rng = np.random.RandomState(0)
    lbls = jnp.asarray((rng.rand(raters, *spatial) > 0.7).astype(np.float32))
    dps = jnp.asarray(rng.randn(raters).astype(np.float32))
    fused = jax.jit(calc_dp_consensus)
    out = fused(lbls, dps)
    _ = float(np.asarray(out.reshape(-1)[0]))  # host transfer = real sync
    times = []
    for _ in range(cases):
        t0 = time.time()
        out = fused(lbls, dps)
        _ = float(np.asarray(out.reshape(-1)[0]))
        times.append(time.time() - t0)
    voxels = raters * np.prod(spatial)
    vps = voxels / float(np.median(times))
    _eprint(f"consensus fusion: {vps/1e9:.2f} Gvoxel/s ({raters} raters @ {spatial})")
    return vps


def measure_staple(raters: int = 10, spatial=(256, 256, 100), iters: int = 50):
    """Device-resident EM compute (host->device transfer of the label stack is
    tunnel-bound in this environment and excluded; timing syncs via a small
    host transfer of the result — block_until_ready does not reliably block
    on the axon tunnel)."""
    import jax
    import jax.numpy as jnp

    from deep_staple_tpu.consensus.staple import _staple_em
    from deep_staple_tpu.consensus.staple_pallas import _staple_em_pallas

    rng = np.random.RandomState(0)
    truth = rng.rand(*spatial) > 0.8
    stack = np.stack(
        [np.roll(truth, rng.randint(-2, 3, 3), (0, 1, 2)) for _ in range(raters)]
    ).reshape(raters, -1).astype(np.float32)
    dec = jnp.asarray(stack)
    _ = np.asarray(dec[0, 0])
    prior = jnp.clip(jnp.mean(dec), 1e-7, 1 - 1e-7)
    for name, fn in (("xla", _staple_em), ("pallas fused", _staple_em_pallas)):
        out = fn(dec, prior, iters, 1e-7)
        _ = np.asarray(out[0])
        ts = []
        for _k in range(3):
            t0 = time.time()
            out = fn(dec, prior, iters, 1e-7)
            _ = np.asarray(out[0])
            ts.append(time.time() - t0)
        dt = min(ts)
        _eprint(
            f"STAPLE EM [{name}]: {dt/iters*1000:.2f} ms/iter @ {raters} raters x {spatial} "
            f"({raters*np.prod(spatial)*iters/dt/1e9:.1f} Gvoxel-decisions/s)"
        )


def _wait_for_healthy_tpu(attempts: int = 3, canary_timeout: int = 300,
                          backoff: int = 600, settle: int = 180) -> None:
    """Gate the benchmark on a tunnel-health canary.

    The axon TPU tunnel has a documented wedge mode (CLAUDE.md): a client
    launched too soon after a previous client's exit can hang forever before
    device init, and the wedge persists on the remote side for tens of
    minutes. Since this harness may be invoked unattended right after other
    TPU processes were killed, probe the backend in a SUBPROCESS with a
    timeout first; on a wedge, back off and retry instead of hanging the
    whole benchmark. After a healthy canary, wait `settle` seconds so the
    real run itself is not the too-soon next client.

    The canary doubles as the platform-name repair point: a box re-image can
    leave a stale JAX_PLATFORMS ('axon' when only 'tpu' registers, r4). That
    failure is a fast unknown-backend error, not a hang — parse the known
    list from the child's stderr, rewrite the env (this process has not
    initialized jax yet), and retry immediately without the wedge backoff.
    """
    import os
    import subprocess

    from deep_staple_tpu.core.platform import _parse_known_backends, pick_replacement

    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        return
    code = (
        "import jax, jax.numpy as jnp, numpy as np; "
        "x = jnp.ones((128, 128)) + 1; "
        "assert float(np.asarray(x).sum()) > 0; print('canary-ok')"
    )
    renamed = False
    for attempt in range(attempts):
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, "-c", code], timeout=canary_timeout,
                capture_output=True, text=True,
            )
            if proc.returncode == 0 and "canary-ok" in proc.stdout:
                _eprint(f"tpu canary ok ({time.time()-t0:.0f}s); settling {settle}s")
                time.sleep(settle)
                return
            _eprint(f"tpu canary rc={proc.returncode}: {proc.stderr.strip()[-200:]}")
            known = _parse_known_backends(proc.stderr)
            if known and not renamed:
                repl = pick_replacement(known)
                _eprint(f"canary hit a stale platform name (known: {known}); "
                        f"retrying with JAX_PLATFORMS={repl or 'auto'!r}")
                if repl:
                    os.environ["JAX_PLATFORMS"] = repl
                else:
                    os.environ.pop("JAX_PLATFORMS", None)
                renamed = True
                continue  # name repair, not a wedge: no backoff
        except subprocess.TimeoutExpired:
            _eprint(f"tpu canary timed out after {canary_timeout}s "
                    f"(attempt {attempt + 1}/{attempts}) — tunnel likely wedged")
        if attempt + 1 < attempts:
            _eprint(f"backing off {backoff}s before the next canary")
            time.sleep(backoff)
    _eprint("proceeding without a healthy canary (last resort)")


# Single-shot emitter for THE one JSON line. The watchdog and the normal
# end-of-main path race only when the tunnel dies mid-run; whoever gets here
# first wins and the line is printed exactly once.
_EMIT_LOCK = threading.Lock()
_EMITTED = False
_HEADLINE_SEC: list[float] = []  # filled once the headline measurement lands


def _emit(value: float, vs, error: str | None = None, extra: dict | None = None):
    global _EMITTED
    with _EMIT_LOCK:
        if _EMITTED:
            return
        _EMITTED = True
    line = {
        "metric": "train_steps_per_sec_3d_b8_192x192x75",
        "value": round(value, 4),
        "unit": "steps/s",
        "vs_baseline": (round(vs, 2) if vs is not None and vs == vs else None),
        # vs_baseline compares this chip against the reference PyTorch step on
        # THIS HOST's CPU (torch has no accelerator in this image; the
        # reference never published GPU throughput — SURVEY.md §6). The ratio
        # must not travel without that context.
        "baseline_kind": "torch-cpu-same-host",
    }
    if extra:
        line.update(extra)
    if error:
        line["error"] = error
    print(json.dumps(line), flush=True)


def _headline_basis(sec_tpu: float, pipelined_ms):
    """(seconds-per-step for the headline, JSON fields naming the basis).

    The headline is the pipelined steady state when measured — the driver's
    deferred-readback pattern (`_pipelined_ms_per_step`): each chained step
    depends on the previous state and a host transfer lands every iteration,
    so no device work can be elided; it is what a training run sustains. The
    per-call-synced median carries a ~29ms tunnel dispatch+sync artifact that
    production overlaps away; it stays in the JSON as `synced_ms_per_step`
    (the rounds-1-4 headline basis) for cross-round comparison.
    """
    fields = {"synced_ms_per_step": round(sec_tpu * 1000.0, 1)}
    if pipelined_ms:
        fields["pipelined_ms_per_step"] = round(pipelined_ms, 1)
        fields["timing_basis"] = "pipelined-steady-state"
        return pipelined_ms / 1000.0, fields
    fields["timing_basis"] = "synced-median"
    return sec_tpu, fields


def _floor_and_mfu(device_ms):
    """Aggregate per-op floor + MFU fields (benchmarks/floor_table.py)."""
    try:
        sys.path.insert(0, str(Path(__file__).parent / "benchmarks"))
        from floor_table import MXU_TFLOPS, step_floor

        info = step_floor()
        out = {"floor_ms": round(info["floor_total_ms"], 1)}
        if device_ms:
            out["device_ms"] = round(device_ms, 1)
            out["pct_of_floor"] = round(
                info["floor_total_ms"] / device_ms * 100, 1)
            out["mfu_pct"] = round(
                info["model_flops_fwd_bwd"] / (device_ms / 1e3)
                / (MXU_TFLOPS * 1e12) * 100, 2)
        return out
    except Exception as e:  # never break the headline
        _eprint(f"floor/mfu fields skipped: {e}")
        return {"device_ms": round(device_ms, 1)} if device_ms else {}


def _cached_vs_baseline(sec_tpu: float):
    """vs_baseline from the cached torch measurement only (never measures)."""
    try:
        cached = json.loads(BASELINE_CACHE.read_text())
        if cached.get("batch") == BATCH and tuple(cached.get("spatial", ())) == AUG_SPATIAL:
            return float(cached["sec_per_step"]) / sec_tpu
    except Exception:
        pass
    return None


def _start_watchdog(deadline: float):
    """Guarantee bench terminates and prints its JSON line within `deadline`s.

    A dead (not merely wedged) axon tunnel hangs device transfers FOREVER —
    the canary gate above retries with backoff, but if the tunnel never comes
    back the unattended benchmark would otherwise block inside the first
    host read and the driver records nothing at all. On expiry: if the
    headline measurement already landed, print the REAL number (a later
    secondary metric was what hung); otherwise print an explicit
    tpu-unreachable error line and exit nonzero.
    """
    t0 = time.time()

    def fire():
        time.sleep(max(0.0, deadline - (time.time() - t0)))
        with _EMIT_LOCK:
            done = _EMITTED
        if done:
            return
        _eprint(f"bench watchdog: {deadline:.0f}s deadline hit — TPU tunnel "
                "unreachable or a measurement hung (diagnose with "
                "`python -m deep_staple_tpu.doctor`)")
        if _HEADLINE_SEC:
            sec = _HEADLINE_SEC[0]
            _emit(1.0 / sec, _cached_vs_baseline(sec), error="watchdog_after_headline")
            os._exit(0)
            return  # only reached when _exit is stubbed in tests
        _emit(0.0, None, error="tpu_unreachable_deadline")
        os._exit(1)

    threading.Thread(target=fire, daemon=True).start()


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--skip-baseline", action="store_true")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--skip-canary", action="store_true",
                   help="skip the tunnel-health canary gate (interactive use)")
    p.add_argument("--deadline", type=float,
                   default=float(os.environ.get("BENCH_DEADLINE_S", 4800)),
                   help="hard wall-clock bound (s): bench always prints its JSON "
                   "line and exits by then, even over a dead TPU tunnel; <=0 disables")
    args = p.parse_args(argv)

    if args.deadline > 0:
        _start_watchdog(args.deadline)
    # Canary FIRST: normalize_jax_platforms initializes the backend
    # IN-PROCESS (core/platform.py — a subprocess probe counts as a second
    # TPU client and wedges the tunnel), so on a wedged tunnel it would hang
    # bench itself. The canary subprocess also repairs a stale platform name
    # (box re-image, r4: 'axon' -> 'tpu') from its own failure message.
    if not args.skip_canary:
        _wait_for_healthy_tpu()
    try:
        from deep_staple_tpu.core.platform import normalize_jax_platforms

        normalize_jax_platforms()
    except Exception as e:
        _eprint(f"platform normalization skipped: {e}")

    # HEADLINE: the production preset (TrainConfig.tpu_production — fused OOL,
    # fast-sep augment order: separable 3-pass warp on Mosaic lane-gather
    # kernels (ops/sep_warp.py; 558 -> 446 ms/step vs the int6 fused
    # arbitrary-index warp — benchmarks/probe_sep_step.py), bf16 compute,
    # no remat, async BN). Remat stays off: it is the reference's GPU-memory
    # workaround (MobileNet_LR_ASPP_3D.py:206-222), semantically a no-op; at
    # these shapes activations fit v5e HBM and the extra forward costs
    # ~240ms/step (profiler-attributed). bn_mode='async' is the steady-state
    # step the driver runs after its 1-epoch slab warmup (models/norm.py;
    # measured 650.7 -> 558.0 ms on v5e-1).
    sec_tpu, device_ms, pipelined_ms = measure_tpu_train_step(
        args.steps, args.dtype, ool_mode="fused", augment_order="fast-sep",
        use_checkpointing=False, bn_mode="async", profile=True,
    )
    sec_eff, basis_fields = _headline_basis(sec_tpu, pipelined_ms)
    _HEADLINE_SEC.append(sec_eff)
    extra = _floor_and_mfu(device_ms)
    extra.update(basis_fields)
    try:
        # previous production order (int8 quad-packed image warp + separate
        # label gather; also what non-binary datasets auto-downgrade to)
        measure_tpu_train_step(
            args.steps, args.dtype, ool_mode="fused", augment_order="fast-int8",
            use_checkpointing=False,
        )
    except Exception as e:
        _eprint(f"fast-int8 bench skipped: {e}")
    # secondary numbers (stderr): reference-exact parity mode, consensus, STAPLE
    try:
        # reference-exact parity mode: strict OOL second forward, reference
        # augmentation order, exact f32 gathers
        measure_tpu_train_step(args.steps, args.dtype, use_checkpointing=False)
    except Exception as e:
        _eprint(f"strict parity bench skipped: {e}")
    try:
        # reference interpolation ORDER with the packed image warp
        measure_tpu_train_step(
            args.steps, args.dtype, ool_mode="strict", augment_order="reference-bf16",
            use_checkpointing=False,
        )
    except Exception as e:
        _eprint(f"reference-bf16 bench skipped: {e}")
    try:
        extra["serving_volumes_per_sec"] = round(measure_serving(), 2)
    except Exception as e:
        _eprint(f"serving bench skipped: {e}")
    try:
        measure_consensus_fusion()
    except Exception as e:  # secondary metric; never break the headline
        _eprint(f"consensus bench skipped: {e}")
    try:
        measure_staple()
    except Exception as e:
        _eprint(f"staple bench skipped: {e}")

    value = 1.0 / sec_eff
    if args.skip_baseline:
        vs = None
    else:
        try:
            sec_ref = measure_torch_baseline()
            _eprint(f"torch reference baseline: {sec_ref:.2f} s/step (CPU)")
            vs = sec_ref / sec_eff
        except Exception as e:
            _eprint(f"baseline measurement failed: {e}")
            vs = None

    _emit(value, vs, extra=extra)


if __name__ == "__main__":
    main()
