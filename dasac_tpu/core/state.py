"""Train-state pytree: all mutable algorithm state made explicit.

Replaces the reference's module buffers / second nn.Module teacher
(models/sac.py:52-63) with plain arrays that jit, shard, and checkpoint
cleanly (SURVEY.md §7 hard part #3):
  * params / batch_stats          — student network
  * teacher_params / teacher_stats — EMA momentum network
  * opt_state                     — optimizer state (4 LR groups)
  * running_conf [C]              — moving class prior
  * slow_init                     — teacher lazy-init flag (0/1 float)
  * step                          — global iteration counter
"""

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    teacher_params: Any
    teacher_stats: Any
    opt_state: Any
    running_conf: jnp.ndarray
    slow_init: jnp.ndarray
    step: jnp.ndarray


def create_train_state(model, tx, num_classes, sample_shape, rng=None):
    """Initialize the full state from a model + optax transform.

    The teacher starts as an independent copy of the student's init (the
    reference builds a second backbone; the first teacher update overwrites
    it wholesale anyway, sac.py:74-81).
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1,) + tuple(sample_shape), jnp.float32)
    variables = model.init({"params": rng}, x, train=False, update_stats=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = tx.init(params)
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        teacher_params=jax.tree.map(jnp.copy, params),
        teacher_stats=jax.tree.map(jnp.copy, batch_stats),
        opt_state=opt_state,
        running_conf=jnp.zeros((num_classes,), jnp.float32),
        slow_init=jnp.zeros((), jnp.float32),
        step=jnp.zeros((), jnp.int32),
    )
