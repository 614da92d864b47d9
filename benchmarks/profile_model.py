"""Profile the model fwd/bwd (or the full train step with --step) on the TPU
and print per-module device-time attribution parsed from the xplane trace.

Per-call wall timings over the axon tunnel include a ~29ms dispatch+sync
floor, so ONLY the profiler's device_duration is trusted here (CLAUDE.md).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/profile_model.py [--step] [--remat]
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import re
import tempfile

import numpy as np

import jax
import jax.numpy as jnp


def run_model(remat: bool, iters: int = 3):
    from deep_staple_tpu.models import MobileNetLRASPP3D

    model = MobileNetLRASPP3D(
        num_classes=2, use_checkpointing=remat, dtype=jnp.bfloat16
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 192, 192, 75, 1), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x[:1], train=False)

    def loss_fn(params, batch_stats, x):
        out, upd = model.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=True,
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(1)},
        )
        return jnp.mean(out["out"].astype(jnp.float32) ** 2), upd

    @jax.jit
    def step(params, batch_stats, x):
        (l, _), g = jax.value_and_grad(loss_fn, has_aux=True)(params, batch_stats, x)
        gsum = sum(jnp.sum(leaf.astype(jnp.float32)) for leaf in jax.tree.leaves(g))
        return l + 1e-30 * gsum

    p, bs = variables["params"], variables["batch_stats"]
    l = step(p, bs, x)
    print("compiled; loss:", float(np.asarray(l)), flush=True)
    return lambda: float(np.asarray(step(p, bs, x)))


def run_train_step(fast: bool = False, iters: int = 3, order: str = None, ool: str = None, bn: str = None):
    from deep_staple_tpu.core.config import TrainConfig
    from deep_staple_tpu.train.driver import make_model
    from deep_staple_tpu.train.state import create_state
    from deep_staple_tpu.train.step import make_train_step

    config = (
        TrainConfig(use_checkpointing=False, ool_mode=ool or "fused",
                    compute_dtype="bfloat16", augment_order=order or "fast",
                    bn_mode=bn or "batch")
        if fast else
        TrainConfig(use_checkpointing=False, ool_mode=ool or "strict",
                    compute_dtype="bfloat16", augment_order=order or "reference",
                    bn_mode=bn or "batch")
    )
    model, _ = make_model(config, num_classes=2)
    state, tx = create_state(model, (1, 192, 192, 75, 1), 1070)
    train_step = make_train_step(
        model, tx, config, np.array([0.5, 1.5], np.float32),
        np.full((1070,), 8.0, np.float32), pre_interpolation_factor=1.5,
    )
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.randn(8, 128, 128, 50).astype(np.float32)),
        "label": jnp.asarray((rng.rand(8, 128, 128, 50) > 0.9).astype(np.int32)),
        "modified_label": jnp.asarray((rng.rand(8, 128, 128, 50) > 0.9).astype(np.int32)),
        "dataset_idx": jnp.arange(8, dtype=jnp.int32),
    }
    key = jax.random.PRNGKey(0)
    holder = {"state": state, "key": key}

    def once():
        holder["key"], k = jax.random.split(holder["key"])
        holder["state"], m = train_step(holder["state"], batch, 0.01, k)
        return float(np.asarray(m["loss"]))

    print("compiling train step...", flush=True)
    print("loss:", once(), flush=True)
    return once


_MODULE_PATTERNS = [
    ("warp-sep-pass (pallas)", re.compile(r"pallas|sep_warp")),
    ("warp-gathers", re.compile(r"take_along_axis|gather")),
    # him/lom/aspp/head must come BEFORE transpose/copy: backward ops are
    # named "transpose(jvp(...))/lom/..." and should land in their module
    # bucket. Patterns must be PATH-anchored ("/aspp/"): every op label
    # contains the class name "MobileNetLRASPP3D", so a bare "ASPP" pattern
    # swallowed head/resize/glue ops into the aspp bucket (r5 discovery —
    # the "aspp 49ms" r4 attribution was really aspp 21.6 + head 22.0).
    ("model him (blocks 0-1)", re.compile(r"/him/")),
    ("model lom (blocks 2-9)", re.compile(r"/lom/")),
    ("model aspp", re.compile(r"/aspp/")),
    ("model head", re.compile(r"/head/")),
    ("transpose/copy", re.compile(r"transpose|copy")),
    ("resize/interp", re.compile(r"resize|interpolate")),
    ("optimizer/while", re.compile(r"while")),
]


def _bucket(label: str) -> str:
    for name, pat in _MODULE_PATTERNS:
        if pat.search(label):
            return name
    return "other"


def attribute(trace_dir: str, top: int = 40):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        print("no xplane found under", trace_dir)
        return
    by_op = collections.Counter()
    total = 0
    for path in paths:
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if "TPU" not in plane.name and not plane.name.startswith("/device"):
                continue
            ev_meta = plane.event_metadata
            st_meta = plane.stat_metadata
            for line in plane.lines:
                if line.name not in ("XLA Ops",):
                    continue
                for ev in line.events:
                    meta = ev_meta[ev.metadata_id]
                    dur = ev.duration_ps
                    total += dur
                    # Source attribution lives in the metadata stats
                    # ("tf_op"/"op_name" -> jit(step)/.../module/op path).
                    label = meta.name
                    for st in list(ev.stats) + list(meta.stats):
                        nm = st_meta[st.metadata_id].name
                        v = st.str_value or (
                            st_meta[st.ref_value].name if st.ref_value else ""
                        )
                        if nm in ("tf_op", "op_name") and v:
                            label = v[:160]
                    by_op[label] += dur
    if total == 0:
        print("no XLA Ops events found; planes were:")
        for path in paths[:1]:
            xs = xplane_pb2.XSpace()
            with open(path, "rb") as f:
                xs.ParseFromString(f.read())
            for plane in xs.planes:
                print("  plane:", plane.name, [l.name for l in plane.lines][:6])
        return
    print(f"total device time: {total/1e9:.2f} ms (all XLA Ops, {len(paths)} planes)")
    buckets = collections.Counter()
    for name, dur in by_op.items():
        buckets[_bucket(name)] += dur
    print("per-module buckets:")
    for name, dur in buckets.most_common():
        print(f"  {dur/1e9:9.2f} ms  {name}")
    print(f"top {top} ops:")
    for name, dur in by_op.most_common(top):
        print(f"  {dur/1e9:9.2f} ms  {name[:110]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--step", action="store_true", help="profile the full strict train step")
    ap.add_argument("--fast", action="store_true", help="with --step: the fused/fast/no-remat variant")
    ap.add_argument("--order", default=None, help="override augment order (e.g. fast-bf16)")
    ap.add_argument("--ool", default=None, help="override ool mode (strict/fused)")
    ap.add_argument("--bn", default=None, help="override bn mode (batch/async/slab)")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    print("devices:", jax.devices(), flush=True)
    once = (
        run_train_step(args.fast, order=args.order, ool=args.ool, bn=args.bn)
        if args.step else run_model(args.remat)
    )
    once()

    trace_dir = tempfile.mkdtemp(prefix="jaxtrace_")
    jax.profiler.start_trace(trace_dir)
    for _ in range(args.iters):
        once()
    jax.profiler.stop_trace()
    print("trace dir:", trace_dir, flush=True)
    attribute(trace_dir)


if __name__ == "__main__":
    main()
