"""A/B probe of the model fwd/bwd at the strict-bench scale for each
depthwise implementation (see models/lraspp3d.py::ConvBN.depthwise_impl).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_model.py [impl ...]

Timing: host-transfer sync (block_until_ready lies on the axon tunnel).
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def bench_impl(impl: str, remat: bool = False, iters: int = 5):
    from deep_staple_tpu.models import MobileNetLRASPP3D

    model = MobileNetLRASPP3D(
        num_classes=2, use_checkpointing=remat, dtype=jnp.bfloat16,
        depthwise_impl=impl,
    )
    x = jnp.asarray(np.random.RandomState(0).randn(8, 192, 192, 75, 1).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x[:1], train=False)

    def loss_fn(params, batch_stats, x):
        out, upd = model.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=True,
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(1)},
        )
        return jnp.mean(out["out"].astype(jnp.float32) ** 2), upd

    @jax.jit
    def step(params, batch_stats, x):
        (l, upd), g = jax.value_and_grad(loss_fn, has_aux=True)(params, batch_stats, x)
        # Fold every grad leaf into the scalar so the backward is not DCE'd.
        gsum = sum(jnp.sum(leaf.astype(jnp.float32)) for leaf in jax.tree.leaves(g))
        return l + 1e-30 * gsum

    p, bs = variables["params"], variables["batch_stats"]
    t0 = time.time()
    l = step(p, bs, x)
    _ = float(np.asarray(l))
    print(f"[{impl} remat={remat}] compile+first: {time.time()-t0:.1f}s", flush=True)
    ts = []
    for _ in range(iters):
        t0 = time.time()
        l = step(p, bs, x)
        _ = float(np.asarray(l))
        ts.append(time.time() - t0)
    print(f"[{impl} remat={remat}] fwd/bwd: {np.median(ts)*1000:.1f} ms", flush=True)


if __name__ == "__main__":
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    print("devices:", jax.devices())
    impls = sys.argv[1:] or ["xla", "hybrid"]
    for impl in impls:
        try:
            bench_impl(impl)
        except Exception as e:
            print(f"[{impl}] FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
