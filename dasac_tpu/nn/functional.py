"""Shared functional ops for the model layer (NHWC, XLA-friendly).

Implements the two interpolation conventions the reference mixes:
  * ``align_corners=True`` bilinear resize (used for logit upsampling,
    reference ``models/basenet.py:143`` and ``deeplabv2.py:217``)
  * ceil-mode max pooling (reference ResNet stem, ``deeplabv2.py:126``)

Everything here is pure, static-shaped, and jit/vmap compatible.
"""

import jax
import jax.numpy as jnp
import numpy as np


def _linear_indices_weights(in_size, out_size):
    """Gather indices + lerp weights for align_corners=True resampling."""
    if out_size == 1 or in_size == 1:
        idx0 = np.zeros(out_size, dtype=np.int32)
        idx1 = np.zeros(out_size, dtype=np.int32)
        w = np.zeros(out_size, dtype=np.float32)
        return idx0, idx1, w
    src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    idx0 = np.floor(src).astype(np.int32)
    idx0 = np.clip(idx0, 0, in_size - 2)
    idx1 = idx0 + 1
    w = (src - idx0).astype(np.float32)
    return idx0, idx1, w


# "matmul" computes the bilinear resize as two interpolation-matrix
# contractions on the MXU instead of two gathers + lerps — identical
# weights (equal to the gather path and torch align_corners within 4e-7),
# and it eliminates the layout-copy traffic the gathers forced: measured
# 579 -> 422 ms/step on the flagship SAC step (PARITY.md).  "gather" keeps
# the original formulation (cfg TPU.RESIZE_METHOD).
RESIZE_METHOD = "matmul"


def _linear_matrix(in_size, out_size):
    """Dense [out, in] align-corners interpolation matrix (two taps/row)."""
    i0, i1, w = _linear_indices_weights(in_size, out_size)
    m = np.zeros((out_size, in_size), np.float32)
    rows = np.arange(out_size)
    np.add.at(m, (rows, i0), 1.0 - w)
    np.add.at(m, (rows, i1), w)
    return m


def resize_bilinear_align_corners(x, size, compute_dtype=jnp.float32):
    """Bilinear resize with align_corners=True semantics.

    Args:
        x: [..., H, W, C] array.
        size: (out_h, out_w) python ints (static).
        compute_dtype: interpolation dtype.  Default f32; bf16 halves the
            full-resolution intermediate traffic of the upsample (the
            TPU.REFINE_DTYPE experiment, see train/steps.py).
    Returns:
        [..., out_h, out_w, C] array, same dtype as ``x``.
    """
    out_h, out_w = int(size[0]), int(size[1])
    in_h, in_w = x.shape[-3], x.shape[-2]
    if (in_h, in_w) == (out_h, out_w):
        return x
    orig_dtype = x.dtype
    xf = x.astype(compute_dtype)

    if RESIZE_METHOD == "matmul":
        mh = jnp.asarray(_linear_matrix(in_h, out_h)).astype(compute_dtype)
        mw = jnp.asarray(_linear_matrix(in_w, out_w)).astype(compute_dtype)
        xf = jnp.einsum("oi,...iwc->...owc", mh, xf)
        xf = jnp.einsum("pj,...hjc->...hpc", mw, xf)
        return xf.astype(orig_dtype)

    i0, i1, wy = _linear_indices_weights(in_h, out_h)
    top = jnp.take(xf, i0, axis=-3)
    bot = jnp.take(xf, i1, axis=-3)
    wy = jnp.asarray(wy).astype(compute_dtype).reshape((-1, 1, 1))
    xf = top * (1.0 - wy) + bot * wy

    j0, j1, wx = _linear_indices_weights(in_w, out_w)
    left = jnp.take(xf, j0, axis=-2)
    right = jnp.take(xf, j1, axis=-2)
    wx = jnp.asarray(wx).astype(compute_dtype).reshape((-1, 1))
    xf = left * (1.0 - wx) + right * wx

    return xf.astype(orig_dtype)


def resize_nearest(x, size):
    """Nearest-neighbor resize (PIL-style: src = floor(o * in/out + eps))."""
    out_h, out_w = int(size[0]), int(size[1])
    in_h, in_w = x.shape[-3], x.shape[-2]
    if (in_h, in_w) == (out_h, out_w):
        return x
    # PIL NEAREST picks src index floor((o + 0.5) * in / out)
    iy = np.minimum(
        ((np.arange(out_h) + 0.5) * in_h / out_h).astype(np.int32), in_h - 1
    )
    ix = np.minimum(
        ((np.arange(out_w) + 0.5) * in_w / out_w).astype(np.int32), in_w - 1
    )
    x = jnp.take(x, iy, axis=-3)
    x = jnp.take(x, ix, axis=-2)
    return x


def max_pool_ceil(x, window=3, stride=2, padding=1):
    """Max pool over [N,H,W,C] with torch ceil_mode=True semantics.

    With ceil mode the last window may start inside the padded input and run
    past it; we pad with -inf up to the required extent.
    """
    n, h, w, c = x.shape

    def _out_size(s):
        return int(np.ceil((s + 2 * padding - window) / stride)) + 1

    oh, ow = _out_size(h), _out_size(w)
    # required padded extent so every window is in-bounds
    need_h = (oh - 1) * stride + window
    need_w = (ow - 1) * stride + window
    pad_h_hi = need_h - h - padding
    pad_w_hi = need_w - w - padding
    # NOTE: init value must be a Python scalar literal so lax dispatches to
    # the reduce_window_max primitive (differentiable / remat-compatible);
    # a traced array falls back to the generic reduce_window.
    neg = float("-inf") if jnp.issubdtype(x.dtype, jnp.floating) \
        else int(jnp.iinfo(x.dtype).min)
    xp = jnp.pad(
        x,
        ((0, 0), (padding, pad_h_hi), (padding, pad_w_hi), (0, 0)),
        constant_values=neg,
    )
    return jax.lax.reduce_window(
        xp,
        neg,
        jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )


def max_pool(x, window=2, stride=2):
    """Plain VALID max pool (VGG-style, floor mode)."""
    return jax.lax.reduce_window(
        x,
        float("-inf"),  # literal: keeps the differentiable max primitive
        jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )
