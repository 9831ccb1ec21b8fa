"""Core layers: convolution helpers and cross-replica (sync) BatchNorm.

The sync BN is the TPU-native replacement for the reference's
``nn.SyncBatchNorm`` conversion (``models/deeplabv2.py:183``): batch statistics
are averaged across the data-parallel mesh axis with ``lax.pmean`` inside the
compiled step — no NCCL, no wrapper modules.

Three BN modes (SURVEY.md §7 "hard parts" #2):
  * train (ABN baseline): normalize with batch stats, update running stats,
    affine trainable;
  * frozen (SAC student/teacher): normalize with running stats, no updates —
    pass ``use_running_average=True``;
  * stats-only (ABN target pass): run with ``use_running_average=False`` under
    ``lax.stop_gradient`` / no grad wrt params, keep only the new batch_stats.
"""

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class SyncBatchNorm(nn.Module):
    """BatchNorm2d with optional cross-replica statistics.

    Statistics and affine parameters are float32 regardless of compute dtype.
    Running-stat update matches torch semantics: ``running <- (1-m)*running +
    m*batch`` with torch momentum m=0.1 (our ``decay``=0.9) and the unbiased
    variance used for the running estimate.
    """

    features: int
    decay: float = 0.9
    eps: float = 1e-5
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)

        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            reduce_axes = tuple(range(x.ndim - 1))  # all but channel
            mean = jnp.mean(xf, axis=reduce_axes)
            mean_sq = jnp.mean(jnp.square(xf), axis=reduce_axes)
            count = 1.0
            for a in reduce_axes:
                count *= x.shape[a]
            if self.axis_name is not None:
                # cross-replica sync: one fused pmean over [mean, mean_sq]
                mean, mean_sq = jax.lax.pmean((mean, mean_sq), self.axis_name)
                count = count * jax.lax.psum(1.0, self.axis_name)
            var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)

            if not self.is_initializing():
                unbiased = var * (count / jnp.maximum(count - 1.0, 1.0))
                ra_mean.value = self.decay * ra_mean.value + (1.0 - self.decay) * mean
                ra_var.value = self.decay * ra_var.value + (1.0 - self.decay) * unbiased

        # fold (mean, var, scale, bias) into one multiply-add computed in the
        # compute dtype: per-channel f32 coefficients are exact; doing the
        # per-pixel arithmetic in bf16 keeps the elementwise pass fusable
        # into the conv epilogue instead of a 4x-traffic f32 round-trip
        inv = jax.lax.rsqrt(var + self.eps) * scale
        shift = bias - mean * inv
        y = x.astype(self.dtype) * inv.astype(self.dtype) \
            + shift.astype(self.dtype)
        return y


def conv_init_normal(stddev=0.01):
    """Reference init for from-scratch conv layers (normal(0, 0.01),
    deeplabv2.py:110,137)."""
    return nn.initializers.normal(stddev=stddev)
