"""The single train-state pytree.

The reference keeps seven statefuls (model, optimizer, scheduler, DP embedding,
DP optimizer, two AMP GradScalers — `main_deep_staple.py:378-466`). On TPU
bf16 needs no loss scaling, the scheduler is a pure function of the step
counter, and everything else folds into one pytree checkpointed atomically.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct

from .optim import SparseAdamState, make_model_optimizer, sparse_adam_init


@struct.dataclass
class DeepStapleState:
    step: jnp.ndarray  # global batch counter
    sched_steps: jnp.ndarray  # scheduler step counter (reference quirk :794-795)
    params: Any
    batch_stats: Any
    opt_state: Any
    dp_params: Optional[jnp.ndarray]  # f32[dataset_len], the data parameters
    dp_opt_state: Optional[SparseAdamState]


def create_state(
    model,
    input_shape,
    dataset_len: int,
    seed: int = 0,
    init_inst_param: float = 0.0,
    use_data_params: bool = True,
    dp_override_values=None,
    weight_decay: float = 0.01,
) -> tuple[DeepStapleState, Any]:
    """Initialize model params + DP vector; returns (state, optimizer)."""
    rng = jax.random.PRNGKey(seed)
    # jit the init: eager flax init dispatches hundreds of tiny ops, which is
    # painfully slow over a remote-TPU tunnel; one jitted (and persistently
    # cached) executable instead.
    init_fn = jax.jit(partial(model.init, train=False))
    variables = init_fn({"params": rng}, jnp.zeros(input_shape, jnp.float32))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    tx = make_model_optimizer(weight_decay)
    opt_state = tx.init(params)

    if use_data_params:
        if dp_override_values is not None:
            dp_params = jnp.asarray(dp_override_values, jnp.float32).reshape(-1)
            assert dp_params.shape[0] == dataset_len
        else:
            # Reference inits the embedding normal(mean=init, std=0.00) :438 —
            # i.e. a constant fill.
            dp_params = jnp.full((dataset_len,), init_inst_param, jnp.float32)
        dp_opt_state = sparse_adam_init(dp_params)
    else:
        dp_params = None
        dp_opt_state = None

    state = DeepStapleState(
        step=jnp.zeros((), jnp.int32),
        sched_steps=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        dp_params=dp_params,
        dp_opt_state=dp_opt_state,
    )
    return state, tx
