"""Pallas TPU kernel: fused per-pixel CE negative log-likelihood.

The XLA formulation (:func:`dasac_tpu.sac.core._nll`) materializes the
full-resolution f32 log-softmax map as the backward residual — at the
flagship SAC shape a ``[8,512,1024,19]`` f32 tensor written in forward and
re-read in backward for EACH of the two CE branches.  After the bf16-refine
and matmul-resize adoptions those paired maps are the last f32 HBM traffic
left in the step (PARITY.md "where the bytes go").

This kernel streams pixel tiles through VMEM and keeps only the (bf16)
logits as the residual: the backward pass recomputes the softmax on the fly
and emits the gradient directly in the logits dtype.  Nothing full-res in
f32 ever touches HBM.

Semantics match ``_nll`` with ``compute_dtype=float32`` (the reference CE:
torch ``ignore_index=255`` zeroing + ``.mean()``, /root/reference/
train.py:130-140 and models/sac.py:119-149): per-pixel
``nll = logsumexp(logits) - logits[label]`` in f32, zeroed where
``label == 255``; gradient ``g * (softmax - onehot)`` there, zero at
ignored pixels.  The row-wise reduction order over C differs from XLA's,
so values agree to float32 roundoff (~1e-6 relative), not bitwise.

Wired behind ``TPU.CE_IMPL = "pallas"`` (default "xla"); on CPU the kernel
runs in interpreter mode so the CPU test suite exercises the same code.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

IGNORE = 255

# pixels (rows) per grid step: 1024 rows x 128 padded lanes of f32 = 512 KB
# VMEM per logits buffer — comfortable with double buffering
_BLK = 1024


def _interpret():
    # Mosaic on any TPU backend (incl. the axon remote plugin, which
    # reports "tpu"); interpreter on CPU so the simulated-mesh test suite
    # runs the identical kernel code
    return jax.default_backend() != "tpu"


def _fwd_kernel(x_ref, lbl_ref, nll_ref):
    x = x_ref[...].astype(jnp.float32)                     # [BLK, C]
    lbl = lbl_ref[...]                                     # [BLK, 1] int32
    m = jnp.max(x, axis=-1, keepdims=True)
    lse = jnp.log(jnp.sum(jnp.exp(x - m), axis=-1, keepdims=True)) + m
    cls = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    picked = jnp.sum(jnp.where(cls == lbl, x, 0.0), axis=-1, keepdims=True)
    valid = lbl != IGNORE
    nll_ref[...] = jnp.where(valid, lse - picked, 0.0)


def _bwd_kernel(x_ref, lbl_ref, g_ref, dx_ref):
    x = x_ref[...].astype(jnp.float32)                     # [BLK, C]
    lbl = lbl_ref[...]                                     # [BLK, 1]
    g = g_ref[...]                                         # [BLK, 1] f32
    m = jnp.max(x, axis=-1, keepdims=True)
    e = jnp.exp(x - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    cls = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    onehot = (cls == lbl).astype(jnp.float32)
    gv = jnp.where(lbl != IGNORE, g, 0.0)
    dx_ref[...] = (gv * (p - onehot)).astype(dx_ref.dtype)


def _row_specs(c):
    """Grid/specs tiling the flattened [N, C] pixel rows."""
    return dict(
        in_specs=[
            pl.BlockSpec((_BLK, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLK, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )


@functools.partial(jax.jit, inline=True)
def _fwd_call(x, lbl):
    n, c = x.shape
    return pl.pallas_call(
        _fwd_kernel,
        grid=(pl.cdiv(n, _BLK),),
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
        out_specs=pl.BlockSpec((_BLK, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=6 * n * c,
            bytes_accessed=n * c * x.dtype.itemsize + 8 * n,
            transcendentals=n * (c + 1)),
        interpret=_interpret(),
        **_row_specs(c),
    )(x, lbl)


@functools.partial(jax.jit, inline=True)
def _bwd_call(x, lbl, g):
    n, c = x.shape
    specs = _row_specs(c)
    specs["in_specs"].append(
        pl.BlockSpec((_BLK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM))
    return pl.pallas_call(
        _bwd_kernel,
        grid=(pl.cdiv(n, _BLK),),
        out_shape=jax.ShapeDtypeStruct((n, c), x.dtype),
        out_specs=pl.BlockSpec((_BLK, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=8 * n * c,
            bytes_accessed=2 * n * c * x.dtype.itemsize + 8 * n,
            transcendentals=n * c),
        interpret=_interpret(),
        **specs,
    )(x, lbl, g)


@jax.custom_vjp
def _nll_rows(x, lbl):
    return _fwd_call(x, lbl)


def _nll_rows_fwd(x, lbl):
    return _fwd_call(x, lbl), (x, lbl)


def _nll_rows_bwd(res, g):
    x, lbl = res
    dx = _bwd_call(x, lbl, g)
    return dx, np.zeros(lbl.shape, dtype=jax.dtypes.float0)


_nll_rows.defvjp(_nll_rows_fwd, _nll_rows_bwd)


def nll_pallas(logits, labels):
    """Per-pixel NLL with ignore masking, softmax recomputed in backward.

    Args:
        logits: ``[..., C]`` float array (bf16 or f32).
        labels: ``[...]`` integer labels, 255 = ignore.
    Returns:
        f32 ``[...]`` NLL, zero at ignored pixels.  Differentiable w.r.t.
        ``logits`` (gradient emitted in the logits dtype).
    """
    batch = logits.shape[:-1]
    c = logits.shape[-1]
    n = int(np.prod(batch)) if batch else 1
    x2 = logits.reshape(n, c)
    l2 = labels.reshape(n, 1).astype(jnp.int32)
    return _nll_rows(x2, l2).reshape(batch)
